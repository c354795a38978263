"""64K-entry int32 LUT lookup via MXU one-hot matmuls vs XLA gather.

result[i] = T[idx[i]]: idx = 256*hi + lo. Row select = onehot(hi) @ T2
(256 x 768: three bf16-exact 8-bit chunks of T side by side), column
select = mask by onehot(lo) + rowsum. Exact: one-hots are 0/1, chunk
values < 256, f32 accumulation of <=256 such terms is exact.

Measured (v5e, 16.6M lookups): 72 ms vs 122 ms for the XLA gather —
1.7x, bounded by the VPU one-hot/select work rather than the MXU. Kept
as a documented lever: integrating it into chroma smoothing would cut
its raw2ev stage ~40% for nontrivial complexity, so the production ops
keep the plain gather until a stronger formulation appears.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops.luts import raw2ev_lut

H, W, B = 1080, 1920, 8
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 1 << 16, (B, H, W), dtype=np.uint16))
T_np = np.asarray(raw2ev_lut(2048, size=1 << 16)).astype(np.int64)
T_np = np.where(T_np < -(1 << 20), -(1 << 20), T_np)  # INT_MIN -> in-range sentinel
BIAS = 1 << 20
Tb = (T_np + BIAS).astype(np.int64)
assert Tb.min() >= 0 and Tb.max() < (1 << 24)
c0 = (Tb & 255).reshape(256, 256)
c1 = ((Tb >> 8) & 255).reshape(256, 256)
c2 = ((Tb >> 16) & 255).reshape(256, 256)
T2_j = jnp.asarray(np.concatenate([c0, c1, c2], 1).astype(np.float32), jnp.bfloat16)

TILE = 1024  # pixels per grid step, sublane axis

def kern(idx_ref, t_ref, out_ref):
    ix = idx_ref[:].astype(jnp.int32)          # (TILE, 1)
    hi = ix >> 8
    lo = ix & 255
    r = jax.lax.broadcasted_iota(jnp.int32, (TILE, 256), 1)
    oh_hi = (r == hi).astype(jnp.bfloat16)
    rows = jnp.dot(oh_hi, t_ref[:], preferred_element_type=jnp.float32)  # (TILE, 768)
    sel = r == lo
    p0 = jnp.where(sel, rows[:, 0:256], 0.0).sum(axis=1, keepdims=True)
    p1 = jnp.where(sel, rows[:, 256:512], 0.0).sum(axis=1, keepdims=True)
    p2 = jnp.where(sel, rows[:, 512:768], 0.0).sum(axis=1, keepdims=True)
    val = (p0 + p1 * 256.0 + p2 * 65536.0).astype(jnp.int32)
    out_ref[:] = val - (1 << 20)

def lut_mxu(x):
    flat = x.reshape(-1, 1)
    n = flat.shape[0]
    out = pl.pallas_call(
        kern,
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((256, 768), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
    )(flat, T2_j)
    return out.reshape(x.shape)

lut_dev = jnp.asarray(T_np.astype(np.int32))

def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args); float(c)
    t0 = time.perf_counter()
    for _ in range(iters): c = f(c, *args)
    float(c)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch", flush=True)

print("devices:", jax.devices(), flush=True)
got = np.asarray(jax.jit(lut_mxu)(idx))
want = np.asarray(lut_dev)[np.asarray(idx).astype(np.int64)]
print("exact:", np.array_equal(got, want), flush=True)
timeit("mxu 2-level lookup", lambda c, x: c + lut_mxu(x).astype(jnp.float32).sum(), idx)
timeit("xla gather", lambda c, x: c + lut_dev[x.astype(jnp.int32)].astype(jnp.float32).sum(), idx)
