"""Measure fixed per-invocation cost of a pallas_call on this TPU:
a trivial copy kernel over a small block, chained n times inside one jit
(fori_loop, data dependency), vs the same chain of pure-XLA adds.
Also: one K2-even keyswitch call at N=64 chained 100x."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.uint32(1)


def pallas_copy(x):
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(x.shape, lambda: (0,) * x.ndim,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(x.shape, lambda: (0,) * x.ndim,
                               memory_space=pltpu.VMEM),
    )(x)


def timeit(name, fn, x, n=100):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v), x)

    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e6:.1f} us/call", flush=True)


x = jnp.zeros((8, 2048), dtype=jnp.uint32)
timeit("xla_add(8,2048)", lambda v: v + 1, x)
timeit("pallas_copy(8,2048)", pallas_copy, x)
x2 = jnp.zeros((256, 2048), dtype=jnp.uint32)
timeit("pallas_copy(256,2048)", pallas_copy, x2)

from spiral_tpu.params import B_I, P_I, preset
from spiral_tpu.server.expand_pallas import keyswitch_fused

p = preset("spiral_20_256")
d = p.poly_len
rng = np.random.default_rng(0)


def rr(shape):
    a = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    b = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([a, b], axis=-2))


W_l = rr((2, p.m_exp, d))
evens = rr((32, 2, 1, d))
timeit("K2even N=64(T=32)",
       lambda a: keyswitch_fused(a, a, W_l, p.m_exp, False), evens, n=50)
