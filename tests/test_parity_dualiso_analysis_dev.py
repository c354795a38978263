"""Direct host-vs-device parity for the dual-ISO analysis stages.

The device analysis (`ops/dualiso_analysis_dev.py`) is otherwise gated only
indirectly — through the full-path PSNR tests and the sharded-vs-unsharded
equality test (both device-vs-device or device-vs-oracle). This pins each
stage straight against the reference-exact host implementation
(`ops/dualiso_analysis.py`, hdr.c:441-823):

- field identification and white detection are integer order statistics on
  both sides, so they must agree EXACTLY;
- the exposure fit's RANSAC scoring runs f64 on host and f32 on device, so
  near-ties on the 0.002-EV search grid may resolve one step apart — the
  fitted gain is held to two grid steps and the derived scalars follow.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import dualiso_analysis as ana
from mlvfs_tpu.ops import dualiso_analysis_dev as dev

H, W, BLACK = 242, 384, 2048


def _frames(n):
    out = []
    for seed in range(n):
        spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=seed)
        out.append(synth.make_frame_data(spec, np.random.default_rng(seed)))
    return out


def test_fields_and_white_exact():
    frames = _frames(6)
    max_pix = W * H // 2 // 9
    batch = jnp.asarray(np.stack(frames))
    okd, ibd = dev.fields_stat_batch(batch, BLACK, 0)
    okd, ibd = np.asarray(okd), np.asarray(ibd)
    any_ok = False
    ib_all = []
    for i, frame in enumerate(frames):
        okh, ibh = ana.identify_bright_and_dark_fields(frame, BLACK, active_y1=0)
        assert bool(okd[i]) == bool(okh)
        if okh:
            assert list(ibd[i]) == list(ibh)
            any_ok = True
        ib_all.append(ibh if okh else [False, False, True, True])
    assert any_ok, "no synthetic frame passed field identification"

    wdd, wbd = dev.white_detect_batch(
        batch, jnp.asarray(np.stack(ib_all), bool), (0, 0, H, W), max_pix
    )
    for i, frame in enumerate(frames):
        wdh, wbh = ana.white_detect(frame, ib_all[i], (0, 0, H, W))
        assert (int(wdd[i]), int(wbd[i])) == (wdh, wbh)


def test_match_exposures_close():
    frames = _frames(6)
    batch = jnp.asarray(np.stack(frames))
    fits, ibs = [], []
    for frame in frames:
        okh, ibh = ana.identify_bright_and_dark_fields(frame, BLACK, active_y1=0)
        if not okh:
            ibh = [False, False, True, True]
        wdh, wbh = ana.white_detect(frame, ibh, (0, 0, H, W))
        fit = ana.match_exposures(frame, ibh, BLACK * 64, min(wdh, wbh) * 64, active_y1=0)
        fits.append((fit, min(wdh, wbh)))
        ibs.append(ibh)

    min20s = jnp.asarray([[m * 64 for (_, m) in fits]], jnp.int32)[0]
    okd, a_d, b_d, wd_d = dev.match_exposures_batch(
        batch,
        jnp.asarray(np.stack(ibs), bool),
        jnp.full(len(frames), BLACK * 64, jnp.int32),
        min20s,
        (H, W),
        0,
    )
    checked = 0
    for i, (fit, _) in enumerate(fits):
        assert bool(okd[i]) == bool(fit.ok)
        if not fit.ok:
            continue
        checked += 1
        dev_ev = -np.log2(float(a_d[i]))
        host_ev = -np.log2(fit.a)
        assert abs(dev_ev - host_ev) <= 0.004 + 1e-6, (i, dev_ev, host_ev)
        tol_b = abs(fit.b) * 0.01 + 16384 * 0.004 * np.log(2) + 1
        assert abs(float(b_d[i]) - fit.b) <= tol_b, (i, float(b_d[i]), fit.b)
        assert abs(int(wd_d[i]) - fit.white_darkened) <= max(
            2, int(abs(fit.white_darkened) * 0.005)
        )
    assert checked, "no synthetic frame produced an accepted exposure fit"
