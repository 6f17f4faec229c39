"""Microbench: per-NTT-slot modular matmul as a batched int8 MXU GEMM.

Candidate replacement for the fused fold/expand kernels' in-kernel VPU
MAC contraction (_matmul_limb_2d): contract K=(s,j,k) with q prescaled
into (i-major out-limb, j-input-limb) int8 planes per slot, batched over
(crt limb, z).  Measures the dot itself, the i-limb recombination, and
the realistic end-to-end slice (kernel-A-layout G -> transposes -> dot
-> recombine -> invNTT-ready layout) at the round-0 production shape.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, preset
from spiral_tpu.arith.mod import mod_ctx

p = preset("spiral_20_256")
d = p.poly_len
t_gsw, n1, n2 = p.t_gsw, p.n1, p.n2
m2 = t_gsw * n1            # 27
m_out = 64                 # round 0
N = m_out * n2             # 128
K = 2 * 4 * m2             # (s, j, k) = 216
M = 4 * n1                 # (i, r) = 12
MODS = (P_I, B_I)

rng = np.random.default_rng(0)
Qpre = jnp.asarray(rng.integers(0, 128, size=(2, d, K, M), dtype=np.int8))
# kernel-A layout: (li, s, j, m2, m_out, n2, d)
G_A = jnp.asarray(rng.integers(
    0, 128, size=(2, 2, 4, m2, m_out, n2, d), dtype=np.int8))
corr = jnp.asarray(rng.integers(0, P_I, size=(n1, 2, d), dtype=np.uint32))


@jax.jit
def dot_only(G_A, Qpre):
    G = G_A.reshape(2, K, N, d)
    return jax.lax.dot_general(
        Qpre, G,
        dimension_numbers=(((2,), (1,)), ((0, 1), (0, 3))),
        preferred_element_type=jnp.int32)       # (2, d, M, N)


@jax.jit
def full(G_A, Qpre, corr):
    out = dot_only(G_A, Qpre)                    # (2, d, 12, N)
    res = []
    for li, pm in enumerate(MODS):
        ctx = mod_ctx(pm)
        o = out[li]                              # (d, 12, N) int32, i-major
        o0, o1, o2, o3 = (o[:, i * n1:(i + 1) * n1] for i in range(4))
        r01 = ctx.reduce_u32((o0 + (o1 << 7)).astype(jnp.uint32))
        r23 = ctx.reduce_u32((o2 + (o3 << 7)).astype(jnp.uint32))
        w = (1 << 14) % pm
        r23 = ctx.mul_shoup(r23, jnp.uint32(w), jnp.uint32((w << 32) // pm))
        v = ctx.add(r01, r23)                    # (d, n1, N)
        c = corr[:, li, :].T[:, :, None]         # (d, n1, 1)
        v = ctx.add(v, jnp.broadcast_to(c, v.shape))
        res.append(v)
    v = jnp.stack(res)                           # (2, d, n1, N)
    # -> (m_out, n1, n2, 2, d) for the inverse NTT
    v = v.reshape(2, d, n1, m_out, n2)
    return v.transpose(3, 2, 4, 0, 1)


def timeit(name, fn, *args, n=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)


timeit("dot_only", dot_only, G_A, Qpre)
timeit("full", full, G_A, Qpre, corr)
