"""Device-true fold-path timing via the profiling.py method: K chained
seed-perturbed iterations inside one jit (serial scalar dependency
defeats CSE and amortizes the tunnel RTT), fetch one scalar, min over
reps.  Compares the unfused XLA chain, the all-VMEM mega-kernel, and the
MXU-contraction path at the production spiral_20_256 shape."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, preset
from spiral_tpu.server.fold import fold_rounds
from spiral_tpu.server.fold_pallas import fold_rounds_fused, fold_rounds_mxu

p = preset("spiral_20_256")
d = p.poly_len
rng = np.random.default_rng(0)
ITERS = 32   # dilutes the ~22 ms per-execution staging fixed cost


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


m = p.num_per
_dev = jax.jit(lambda x: x + 0)
cts = _dev(rr((m, p.n1, p.n2, d)))
qp = _dev(rr((p.nu_2, p.n1, p.m2, d)))
qn = _dev(rr((p.nu_2, p.n1, p.m2, d)))
jax.block_until_ready((cts, qp, qn))


def timeit(name, fold_fn, reps=3):
    @jax.jit
    def iterated(cts, qp, qn):
        def body(i, acc):
            out = fold_fn(cts + acc, qp, qn)
            return acc + out.ravel()[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

    int(iterated(cts, qp, qn))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(iterated(cts, qp, qn))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / ITERS * 1e3:.2f} ms", flush=True)


timeit("fold xla  ", lambda c, a, b: fold_rounds(c, a, b, p, fused=False))
timeit("fold fused", lambda c, a, b: fold_rounds_fused(c, a, b, p))
timeit("fold mxu  ", lambda c, a, b: fold_rounds_mxu(c, a, b, p))
timeit("round0 fused", lambda c, a, b: fold_rounds_fused(c, a, b, p, 0, 1))
timeit("round0 mxu  ", lambda c, a, b: fold_rounds_mxu(c, a, b, p, 0, 1))
