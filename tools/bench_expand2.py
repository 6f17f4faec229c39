"""Device-true expansion attribution (chained-prefix method, device-
resident operands): per production round of spiral_20_256, time K1
(inv NTT + automorph) and K2 (keyswitch even/odd) via n chained
iterations inside one jit."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, preset
from spiral_tpu.server.expand_pallas import inv_ntt_automorph, keyswitch_fused

p = preset("spiral_20_256")
d = p.poly_len
g, stop = p.g, p.stopround
print(f"g={g} stop={stop} m_exp={p.m_exp} m_exp_right={p.m_exp_right}",
      flush=True)
rng = np.random.default_rng(0)
_dev = jax.jit(lambda x: x + 0)


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return _dev(jnp.asarray(np.stack([x, y], axis=-2)))


def timeit(fn, x, *args, n=48, reps=3):
    # operands as jit ARGUMENTS (captured device arrays add a large
    # per-execution staging cost on this backend), scalar-accumulator
    # chaining, and int() fetch for the sync (block_until_ready
    # under-reports over the tunnel) — the profiling.py method
    @jax.jit
    def run(x, *args):
        def body(i, acc):
            out = fn(x + acc, *args)
            return acc + out.ravel()[0]
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    int(run(x, *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    return best / n


W_l = rr((2, p.m_exp, d))
W_r = rr((2, p.m_exp_right, d))
jax.block_until_ready((W_l, W_r))

tot_k1 = tot_e = tot_o = 0.0
for r in range(g):
    t = (d >> r) + 1
    N = 1 << (r + 1)
    odd_active = (stop == 0 or r <= stop)
    cv = rr((N, 2, 1, d))
    evens, odds = _dev(cv[0::2]), _dev(cv[1::2])

    k1_in = cv if odd_active else evens
    t_k1 = timeit(lambda x: inv_ntt_automorph(x, t, False), k1_in)
    t_e = timeit(lambda a, W: keyswitch_fused(a, a, W, p.m_exp, False),
                 evens, W_l)
    t_o = 0.0
    if odd_active:
        t_o = timeit(lambda a, W: keyswitch_fused(a, a, W,
                                                  p.m_exp_right, False),
                     odds, W_r)
    tot_k1 += t_k1
    tot_e += t_e
    tot_o += t_o
    print(f"r={r} N={N:3d} K1={t_k1*1e3:7.3f}ms K2e={t_e*1e3:7.3f}ms "
          f"K2o={t_o*1e3:7.3f}ms", flush=True)

print(f"TOTAL K1={tot_k1*1e3:.2f}ms K2even={tot_e*1e3:.2f}ms "
      f"K2odd={tot_o*1e3:.2f}ms sum={(tot_k1+tot_e+tot_o)*1e3:.2f}ms")
