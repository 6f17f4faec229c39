"""Time fold paths at the production shape on the attached backend."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, preset

p = preset("spiral_20_256")
d = p.poly_len
rng = np.random.default_rng(0)


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


m = p.num_per
# route through a jit so the buffers are device-resident program outputs
# (plain jnp.asarray(host) arrays can re-ship through the dev tunnel on
# every dispatch — tools/bench_pallas_overhead.py findings)
_dev = jax.jit(lambda x: x + 0)
cts = _dev(rr((m, p.n1, p.n2, d)))
qp = _dev(rr((p.nu_2, p.n1, p.m2, d)))
qn = _dev(rr((p.nu_2, p.n1, p.m2, d)))
jax.block_until_ready((cts, qp, qn))


def timeit(name, fn, n=20):
    # block_until_ready under-reports over the remote tunnel; queue n
    # dispatches (device executes serially) and fetch the last result —
    # per-iteration time amortizes the single RTT
    jax.device_get(fn())     # warm/compile
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn()
    jax.device_get(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


from spiral_tpu.server.fold import fold_rounds
from spiral_tpu.server.fold_pallas import fold_rounds_fused, fold_rounds_mxu

xla = jax.jit(lambda c, a, b: fold_rounds(c, a, b, p, fused=False))
fused = jax.jit(lambda c, a, b: fold_rounds_fused(c, a, b, p))
mxu = jax.jit(lambda c, a, b: fold_rounds_mxu(c, a, b, p))
timeit("fold xla   ", lambda: xla(cts, qp, qn))
timeit("fold fused ", lambda: fused(cts, qp, qn))
timeit("fold mxu   ", lambda: mxu(cts, qp, qn))

# single round (the big one): m=128 -> 64
one_x = jax.jit(lambda c, a, b: fold_rounds(c, a, b, p, 0, 1, fused=False))
one_f = jax.jit(lambda c, a, b: fold_rounds_fused(c, a, b, p, 0, 1))
one_m = jax.jit(lambda c, a, b: fold_rounds_mxu(c, a, b, p, 0, 1))
timeit("round0 xla  ", lambda: one_x(cts, qp, qn))
timeit("round0 fused", lambda: one_f(cts, qp, qn))
timeit("round0 mxu  ", lambda: one_m(cts, qp, qn))
