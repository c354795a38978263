"""Measure the VPU issue-rate floor claim (VERDICT r4 task 3).

BASELINE.md used to argue the three dual-ISO reconstruction kernels
(AMaZE demosaic mega-kernel, edge_pick, alias filter) sit at a VPU
issue-rate floor from hand-counted stencil budgets. This harness replaces
the hand counts with measurements, in three stages:

1. CALIBRATION CEILINGS (real TPU) — kernels whose per-element op mix is
   known by construction, timed with the repo's chained-dispatch
   methodology; the SLOPE between two chain depths cancels the constant
   dispatch/memory term. Because the production kernels are VMEM-resident
   Pallas kernels, the price list comes from Pallas calibration kernels
   in the same regime (one (256,1280) VMEM block per grid step):
     pl_fma      a fori_loop x*a+b chain (f32 and int32) — the pure
                 arithmetic ceiling.
     pl_stencil  an S-tap pltpu.roll(x,s)*w accumulator — prices one
                 in-VMEM lane-roll + FMA per tap, the data-movement issue
                 cost that HLO counts as zero flops.
     pl_cmpsel   a fori_loop where(x>c1, x-c2, x+c3) chain (int32) —
                 prices a compare+select pair (the kernels branch a lot).
   Plain-XLA chains were measured first and REJECTED as the price source:
   the jnp.roll chain leaves fusion and materializes every rolled copy
   through HBM (~17.4 ps/elem-tap, ~bandwidth-bound), and the where-chain
   jumps fusion regimes between depths. The XLA fma chain (which does
   stay fused) is kept as a cross-check of the Pallas arithmetic ceiling,
   and the XLA stencil is kept as the measured record of WHY the
   production stencils are Pallas kernels.

2. OP CENSUS (CPU subprocess, compiler-derived) — each production
   kernel's XLA formulation (the exact-math twin the Pallas kernels are
   ULP/bit-gated against) is lowered and its StableHLO parsed into
   per-element counts by category: ARITH (flop-like), CMPSEL (compare/
   select/clamp), MOVE (slice/concat/pad/reverse/dynamic-slice/transpose
   — lane/sublane data movement). Unoptimized StableHLO = the algorithm
   as written (pre-CSE, backend-independent); an optimized-HLO census was
   tried and rejected — CPU-backend expansions inflate it (alias measured
   ~9000 arith elems/px vs 527 HLO flops/px) and the unrolled demosaic
   trips XLA:CPU's slow-compile path. The three calibration kernels are
   censused with the SAME parser, so the calibration slopes convert
   census elements into measured seconds:
       c_arith = fma slope / censused arith elems per iter
       c_mv    = (stencil slope - fma-content) / censused move elems/tap
       c_cs    = (cmpsel slope - arith-content) / censused cmpsel elems
   lax.scan is monkeypatched to a full Python unroll first so the
   demosaic's raster passes are counted per step.

3. UTILIZATION — predicted issue time (census counts x measured per-
   category costs) / measured production-kernel time at 1080p batch 16.
   1.0 = every cycle explained by issued vector ops at calibration rates;
   lower = headroom (or an op mix the three calibrations under-price).

Caveats stated where used: the census runs on CPU-optimized HLO (same
parser for calibrations and kernels, so category units are consistent),
and the Pallas production kernels are census-approximated by their XLA
twins (same algorithm, ULP/bit-gated equal).

Run (default env = relay TPU):  python tools/profile_vpu_floor.py
Counting-only (CPU subprocess): _VPU_COUNT=1 python tools/profile_vpu_floor.py
"""

import json
import math
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W, B = 1080, 1920, 16

# calibration chain depths (slope between the two cancels constants)
FMA_KS = (128, 192, 256)
STN_SS = (16, 32, 48)
CS_KS = (64, 128)
BC = 64  # calibration batch; P = BC*1024*1280 elements
CAL_REPS = 5  # min over reps per depth: host/relay dispatch noise is ~ms


# --------------------------------------------------------------------- #
# calibration kernel definitions — shared by census (CPU) + timing (TPU)
# --------------------------------------------------------------------- #

def _fma_chain(jnp, x, a, b, K):
    for _ in range(K):
        x = x * a
        x = x + b
    return x


def _stencil_chain(jnp, x, w, S):
    acc = x * w
    for s in range(1, S):
        acc = acc + jnp.roll(x, s, axis=-1) * w
    return acc * jnp.float32(1.0 / S)


def _cmpsel_chain(jnp, x, K):
    for i in range(K):
        x = jnp.where(x > (7 * i + 3), x - (5 * i + 1), x + (3 * i + 2))
    return x


# Pallas VMEM-resident variants — the regime the production kernels run
# in. (The plain-XLA chains above were measured first and REJECTED as the
# cost source: a jnp.roll chain at this shape leaves fusion and
# materializes every rolled copy through HBM — measured 17.4 ps/elem-tap,
# ~55x the VMEM tap below — and the where-chain jumps regimes between
# depths 64->128 (6.2 -> 27.4 ms). Useful as the quantitative reason the
# production stencils are Pallas kernels, useless as a VPU price list.)

_CAL_ROWS = 128  # rows per grid step; width fixed at 1280 lanes


def _pallas_cal(kind, K, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # straight-line unrolled chains (like the production kernels): a
    # fori_loop body was measured 5.5x slower per FMA (loop-carried VMEM
    # round trip per iteration) and rejected.
    def kern(s_ref, x_ref, o_ref):
        x = x_ref[...]
        if kind == "fma":
            a, b = s_ref[0], s_ref[1]
            v = x
            for _ in range(K):
                v = v * a + b
            o_ref[...] = v
        elif kind == "stencil":
            w = s_ref[0]
            acc = x * w
            for s in range(1, K):
                acc = acc + pltpu.roll(x, s, axis=1) * w
            o_ref[...] = acc * dtype(1.0 / K)
        elif kind == "cmpsel":
            v = x
            for i in range(K):
                v = jnp.where(v > 7 * i + 3, v - (5 * i + 1), v + (3 * i + 2))
            o_ref[...] = v

    @jax.jit
    def run(x, scal):
        R, Wd = x.shape
        return pl.pallas_call(
            kern,
            grid=(R // _CAL_ROWS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_CAL_ROWS, Wd), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((_CAL_ROWS, Wd), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(scal, x)

    return run


# --------------------------------------------------------------------- #
# counting mode: CPU subprocess — census of calibrations + kernel twins
# --------------------------------------------------------------------- #

ARITH = {
    "add", "subtract", "multiply", "divide", "maximum", "minimum", "abs",
    "negate", "sign", "power", "sqrt", "rsqrt", "cbrt", "exponential",
    "exponential_minus_one", "log", "log_plus_one", "floor", "ceil",
    "round_nearest_afz", "round_nearest_even", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "and", "or", "xor",
    "not", "popcnt", "count_leading_zeros", "convert", "tanh", "logistic",
    "sine", "cosine", "atan2", "remainder", "reduce",
}
CMPSEL = {"compare", "select", "clamp"}
MOVE = {
    "slice", "concatenate", "pad", "reverse", "transpose",
    "dynamic_slice", "dynamic_update_slice", "gather", "scatter", "iota",
}
# zero-cost / bookkeeping: constant, reshape (bitcast on TPU),
# broadcast_in_dim (mostly scalar splats here — a small undercount where a
# row vector is broadcast), return/func/call structure.

_ST_RE = re.compile(r"stablehlo\.([a-z_0-9]+)")
_TEN_RE = re.compile(r"tensor<([0-9]+(?:x[0-9]+)*)x[a-z][a-z0-9]*>")


_FUNC_RE = re.compile(r"func\.func[^@]*@([\w$]+)\(")
_CALL_RE = re.compile(r"\bcall @([\w$]+)\(")


def _census_text(txt):
    """Parse unoptimized StableHLO text into per-category element counts.

    Backend-independent "algorithm as written" budget: pre-CSE, pre-fusion
    (the jnp formulations bind intermediates, so duplication is minimal).
    Helper functions (jnp.where's @_where etc.) appear once in the module
    but are called many times, so per-function counts are weighted by the
    call graph. The calibration chains are censused with the SAME parser,
    so category units stay consistent when priced by the TPU slopes.
    """
    funcs = {}  # name -> {"counts": {...}, "calls": {callee: n}}
    cur = None
    for line in txt.splitlines():
        fm = _FUNC_RE.search(line)
        if fm:
            cur = fm.group(1)
            funcs[cur] = {"counts": {"arith": 0, "cmpsel": 0, "move": 0},
                          "calls": {}}
            continue
        if cur is None:
            continue
        cm = _CALL_RE.search(line)
        if cm:
            callee = cm.group(1)
            funcs[cur]["calls"][callee] = funcs[cur]["calls"].get(callee, 0) + 1
        m = _ST_RE.search(line)
        if not m:
            continue
        op = m.group(1)
        if op in ARITH:
            cat = "arith"
        elif op in CMPSEL:
            cat = "cmpsel"
        elif op in MOVE:
            cat = "move"
        else:
            continue
        # result type: first tensor after '->' when a signature is printed,
        # else the trailing ': tensor<...>' annotation
        seg = line.rsplit("->", 1)[-1]
        tens = _TEN_RE.findall(seg)
        if not tens:
            continue  # scalar result
        n = 1
        for d in tens[0].split("x"):
            n *= int(d)
        if n > 1:
            funcs[cur]["counts"][cat] += n

    memo = {}

    def total(name):
        if name in memo:
            return memo[name]
        f = funcs.get(name)
        if f is None:
            return {"arith": 0, "cmpsel": 0, "move": 0}
        memo[name] = dict(f["counts"])  # set before recursing (cycle guard)
        acc = dict(f["counts"])
        for callee, n in f["calls"].items():
            sub = total(callee)
            for k in acc:
                acc[k] += n * sub[k]
        memo[name] = acc
        return acc

    entry = "main" if "main" in funcs else next(iter(funcs))
    return total(entry)


def count_main():
    os.environ.update(
        MLVFS_AMAZE_PALLAS="0",
        MLVFS_TPU_EDGE_PALLAS="0",
        MLVFS_TPU_ALIAS_PALLAS="0",
    )
    import jax
    import jax.numpy as jnp
    from jax import lax

    def scan_py(f, init, xs=None, length=None, **kw):
        n = length if xs is None else jax.tree.leaves(xs)[0].shape[0]
        carry, ys = init, []
        for i in range(n):
            x = None if xs is None else jax.tree.map(lambda a: a[i], xs)
            carry, y = f(carry, x)
            ys.append(y)
        out = (
            jax.tree.map(lambda *a: jnp.stack(a), *ys)
            if ys and ys[0] is not None
            else None
        )
        return carry, out

    lax.scan = scan_py

    def census(fn, *args):
        lowered = jax.jit(fn).lower(*args)
        d = lowered.cost_analysis()
        d = d[0] if isinstance(d, (list, tuple)) else d
        flops = float(d.get("flops", 0.0)) if d else 0.0
        cn = _census_text(lowered.as_text())
        cn["flops"] = flops
        return cn

    from mlvfs_tpu.ops.amaze import edge_pick_xla
    from mlvfs_tpu.ops.amaze_core import amaze_demosaic
    from mlvfs_tpu.ops.dualiso_full import _alias_filter_xla

    out = {}
    # calibration kernels first: census at BOTH timing depths and take the
    # marginal per-iteration counts — exactly the thing the timing slope
    # measures (differences out tap 0 / the final scale).
    xf = jnp.zeros((4, 1024, 1280), jnp.float32)  # census batch 4 is enough
    xi = jnp.zeros((4, 1024, 1280), jnp.int32)

    def marginal(name, mk, init, depths):
        c0 = census(mk(depths[0]), init)
        c1 = census(mk(depths[1]), init)
        d = depths[1] - depths[0]
        out[name] = {k: (c1[k] - c0[k]) / d for k in ("arith", "cmpsel", "move")}
        out[name]["iters"] = 1  # already per-iteration (marginal)
        print(f"census {name:12s} {json.dumps(out[name])}", flush=True)

    marginal("cal_fma",
             lambda K: (lambda x: _fma_chain(
                 jnp, x, jnp.float32(1.0000001), jnp.float32(1e-7), K)),
             xf, FMA_KS)
    marginal("cal_stencil",
             lambda S: (lambda x: _stencil_chain(jnp, x, jnp.float32(0.01), S)),
             xf, STN_SS)
    marginal("cal_cmpsel",
             lambda K: (lambda x: _cmpsel_chain(jnp, x, K)),
             xi, CS_KS)

    ev = jnp.zeros((H, W), jnp.int32)
    s = jnp.zeros((H,), jnp.int32)
    restricted = jnp.zeros((H, W), bool)
    am = jnp.zeros((H, W), jnp.int32)
    skip = jnp.zeros((H, W), bool)
    raw = jnp.zeros((H, W), jnp.float32)
    out["pick"] = census(
        lambda a, b, c, ss, r: edge_pick_xla(a, b, c, ss, r, H, W),
        ev, ev, ev, s, restricted,
    )
    print(f"census {'pick':12s} {json.dumps(out['pick'])}", flush=True)
    out["alias"] = census(lambda a, sk: _alias_filter_xla(a, sk, H, W), am, skip)
    print(f"census {'alias':12s} {json.dumps(out['alias'])}", flush=True)
    out["demosaic"] = census(lambda r: sum(amaze_demosaic(r)), raw)
    print(f"census {'demosaic':12s} {json.dumps(out['demosaic'])}", flush=True)
    print("FLOPS_JSON " + json.dumps(out), flush=True)


# --------------------------------------------------------------------- #
# timing mode: real TPU — calibration ceilings + production kernel legs
# --------------------------------------------------------------------- #

def timing_main(cen):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mlvfs_tpu.format import synth
    from mlvfs_tpu.ops import evmath

    print("devices:", jax.devices(), flush=True)
    P = BC * 1024 * 1280
    x0f = jnp.zeros((BC, 1024, 1280), jnp.float32)
    x0i = jnp.zeros((BC, 1024, 1280), jnp.int32)

    print("== calibration ==", flush=True)

    def _slope_lsq(times):
        # least-squares slope over all depths, s / element-iter
        ks = sorted(times)
        n = len(ks)
        mk = sum(ks) / n
        mt = sum(times[k] for k in ks) / n
        num = sum((k - mk) * (times[k] - mt) for k in ks)
        den = sum((k - mk) ** 2 for k in ks)
        return num / den / P

    def _timed_depth(name, f, init, extra, K):
        # min over CAL_REPS chained-dispatch reps: host/relay dispatch noise
        # on this shared box is ~ms-scale and strictly additive, so the min
        # is the cleanest estimator of device time per chain.
        y = f(init, *extra)
        float(y.sum())  # warm + fence (relay doesn't honor block_until_ready)
        best = float("inf")
        iters = 8
        for _ in range(CAL_REPS):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(y, *extra)
            float(y.sum())
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"  {name:12s} depth={K}: {best*1e3:8.3f} ms (min of "
              f"{CAL_REPS})", flush=True)
        return best

    def run_cal(name, init, mk, depths, *extra):
        # constants ride as runtime args so XLA cannot fold the chain into
        # one affine op; sync via a device reduce + scalar transfer (the
        # relay does not honor block_until_ready as a fence).
        times = {}
        for K in depths:
            times[K] = _timed_depth(name, jax.jit(mk(K)), init, extra, K)
        slope = _slope_lsq(times)
        print(f"  {name:12s} slope {slope*1e15:9.3f} fs/elem-iter", flush=True)
        return slope

    s_fma_f32 = run_cal(
        "fma_f32", x0f,
        lambda K: (lambda x, a, b: _fma_chain(jnp, x, a, b, K)),
        FMA_KS, jnp.float32(1.0000001), jnp.float32(1e-7),
    )
    # XLA stencil/cmpsel chains: measured once as the REJECTED regime
    # record (HBM-materialized rolls / fusion-boundary jumps) — see the
    # module docstring. Not used for pricing.
    s_stencil_xla = run_cal(
        "xla_stencil", x0f,
        lambda S: (lambda x, w: _stencil_chain(jnp, x, w, S)),
        STN_SS, jnp.float32(0.01),
    )
    ceil_f32 = 2.0 / s_fma_f32
    print(f"  fma ceiling (XLA fused chain): f32 {ceil_f32/1e12:.3f}"
          f" THLO-flops/s", flush=True)

    print("== Pallas VMEM calibration (production-kernel regime) ==", flush=True)
    x0f2 = jnp.zeros((BC * 1024, 1280), jnp.float32)
    x0i2 = jnp.zeros((BC * 1024, 1280), jnp.int32)

    def run_pallas(name, kind, dtype, init, scal, depths):
        times = {}
        for K in depths:
            f = _pallas_cal(kind, K, dtype)
            times[K] = _timed_depth(name, f, init, (scal,), K)
        slope = _slope_lsq(times)
        # linearity check: with 3 depths, report how far the middle point
        # sits off the end-to-end chord (regime changes between depths —
        # the r5 first-pass failure mode — show up here, noise does not
        # survive the min-of-reps).
        ks = sorted(times)
        if len(ks) >= 3:
            k0, km, k1 = ks[0], ks[len(ks) // 2], ks[-1]
            chord = times[k0] + (times[k1] - times[k0]) * (km - k0) / (k1 - k0)
            dev = (times[km] - chord) / chord
            print(f"  {name:12s} linearity: mid-depth off chord by "
                  f"{dev*100:+.1f}%", flush=True)
        print(f"  {name:12s} slope {slope*1e15:9.3f} fs/elem-iter", flush=True)
        return slope

    PL_KS = (32, 96, 160)  # straight-line unrolled Mosaic programs
    sp_fma_f = run_pallas("pl_fma_f32", "fma", jnp.float32, x0f2,
                          jnp.asarray([1.0000001, 1e-7], jnp.float32), PL_KS)
    sp_fma_i = run_pallas("pl_fma_i32", "fma", jnp.int32, x0i2,
                          jnp.asarray([3, 1], jnp.int32), PL_KS)
    sp_stn = run_pallas("pl_stencil", "stencil", jnp.float32, x0f2,
                        jnp.asarray([0.01], jnp.float32), STN_SS)
    sp_cs = run_pallas("pl_cmpsel", "cmpsel", jnp.int32, x0i2,
                       jnp.asarray([0], jnp.int32), PL_KS)

    # per-element costs in the VMEM regime. Census units: one shifted read
    # in the XLA twins appears as slice+concat = 2 MOVE elements, and one
    # compare+select pair = 2 CMPSEL elements, so the per-roll / per-pair
    # calibration prices are halved to price one censused element.
    c_arith_f = sp_fma_f / 2.0
    c_arith_i = sp_fma_i / 2.0
    c_roll = sp_stn - 2.0 * c_arith_f  # one pltpu.roll, per element
    c_mv = c_roll / 2.0
    c_cs = (sp_cs - 2.0 * c_arith_i) / 2.0
    print(f"  measured VMEM costs (fs/elem): arith f32 {c_arith_f*1e15:.1f} "
          f"/ i32 {c_arith_i*1e15:.1f}, roll {c_roll*1e15:.1f} "
          f"(move elem {c_mv*1e15:.1f}), cmpsel elem {c_cs*1e15:.1f}",
          flush=True)
    print(f"  XLA-chain roll for comparison: "
          f"{(s_stencil_xla - 2*c_arith_f)*1e15:.1f} fs (HBM-materialized; "
          f"the reason the production stencils are Pallas)", flush=True)

    # ------------------------------------------------------------------ #
    print("== production kernels (Pallas path) ==", flush=True)
    BLACK = 2048
    black20, white20 = BLACK * 64, 10000 * 64
    spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
    rng = np.random.default_rng(3)
    frame = synth.make_frame_data(spec, rng)
    img1 = jax.device_put(frame)  # ONE frame over the relay
    imgs = jax.jit(lambda x: jnp.tile(x[None], (B, 1, 1)))(img1)
    jax.block_until_ready(imgs)
    raw = jax.jit(lambda x: (x.astype(jnp.int32) << 6) & 0xFFFFF)(imgs)
    jax.block_until_ready(raw)
    s_arr = jnp.asarray(
        np.where((np.arange(H) % 4 == 1) | (np.arange(H) % 4 == 3), 1, -1)[None]
        .repeat(B, 0),
        jnp.int32,
    )

    def ev_of(x):
        return evmath.raw2ev20(x, black20)

    def timeit(name, fn, *args, iters=6):
        f = jax.jit(fn)
        c = f(jnp.zeros((), jnp.float32), *args)
        float(c)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                c = f(c, *args)
            float(c)
            best = min(best, (time.perf_counter() - t0) / iters / B)
        dt = best
        print(f"  {name:10s} {dt*1e3:7.3f} ms/frame (min of 3)", flush=True)
        return dt

    def leg_pick(c, x):
        from mlvfs_tpu.ops.amaze_edge_pallas import edge_pick

        def one(r, ss):
            ev = ev_of(r)
            restricted = r < (white20 - 1000)
            return edge_pick(ev, ev, ev, ss, restricted, H, W)

        o = jax.vmap(one)(x, s_arr)
        return c + o.sum(dtype=jnp.float32) * 1e-9

    def leg_alias(c, x):
        from mlvfs_tpu.ops.alias_pallas import alias_filter

        def one(r):
            am = (r & 0xFFFF).astype(jnp.int32)
            skip = r > (white20 - 1000)
            return alias_filter(am, skip, H, W)

        o = jax.vmap(one)(x)
        return c + o.sum(dtype=jnp.float32) * 1e-9

    def leg_demosaic(c, x):
        from mlvfs_tpu.ops.amaze_core import amaze_demosaic

        def one(r):
            red, grn, blu = amaze_demosaic(r.astype(jnp.float32))
            return red + grn + blu

        o = jax.vmap(one)(x)
        return c + o.sum(dtype=jnp.float32) * 1e-9

    t_pick = timeit("pick", leg_pick, raw)
    t_alias = timeit("alias", leg_alias, raw)
    t_dem = timeit("demosaic", leg_demosaic, raw)

    print("== utilization: predicted issue time / measured ==", flush=True)
    px = H * W
    for name, t, c_arith in (
        ("pick", t_pick, c_arith_i),       # EV/int32-dominated
        ("alias", t_alias, c_arith_i),
        ("demosaic", t_dem, c_arith_f),    # float pipeline
    ):
        c = cen[name]
        a_px, m_px, s_px = c["arith"] / px, c["move"] / px, c["cmpsel"] / px
        fl = c["flops"]
        pred = (c["arith"] * c_arith + c["move"] * c_mv + c["cmpsel"] * c_cs)
        ach = fl / t
        print(
            f"  {name:10s} census/px: arith {a_px:7.1f} move {m_px:7.1f} "
            f"cmpsel {s_px:6.1f} | flops {fl/px:7.1f}/px achieved "
            f"{ach/1e12:6.3f} Tflop/s ({ach/ceil_f32*100:4.1f}% fma-ceiling) | "
            f"predicted issue {pred*1e3:6.3f} ms vs measured {t*1e3:6.3f} ms "
            f"=> utilization {pred/t*100:5.1f}%",
            flush=True,
        )


def main():
    if os.environ.get("_VPU_COUNT") == "1":
        count_main()
        return
    # counting subprocess on clean CPU env first (fast; avoids relay compiles)
    env = {
        k: v
        for k, v in os.environ.items()
        if not (k.startswith(("AXON_", "PALLAS_AXON", "TPU_")) or k == "PYTHONPATH")
    }
    env.update(_VPU_COUNT="1", JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    cache = os.environ.get("_VPU_CENSUS_CACHE")
    if cache and os.path.exists(cache):
        with open(cache) as f:
            cen = json.load(f)
        print(f"(census loaded from {cache})", flush=True)
    else:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("FLOPS_JSON ")]
        if not line:
            print(out.stdout)
            print(out.stderr, file=sys.stderr)
            raise SystemExit("census subprocess failed")
        cen = json.loads(line[0][len("FLOPS_JSON "):])
        if cache:
            with open(cache, "w") as f:
                json.dump(cen, f)
    for k, v in cen.items():
        if k.startswith("cal_"):
            continue
        print(f"count {k:10s} {v['flops']:.4e} flops/frame "
              f"({v['flops']/(H*W):7.1f} /px)", flush=True)
    timing_main(cen)


if __name__ == "__main__":
    main()
