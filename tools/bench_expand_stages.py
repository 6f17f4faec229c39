"""Attribute device time inside the fused expansion path, per round and
per kernel (K1 inv-NTT+automorph, K2 keyswitch even m_exp / odd
m_exp_right), at the production spiral_20_256 shapes.  Run on TPU."""
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
rng = np.random.default_rng(0)


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


def timeit(fn, x, *args, n=20):
    # chain n iterations inside ONE jit (fori_loop with a data
    # dependency) so the host<->TPU tunnel RTT is paid once, not per
    # call — per-call dispatch through the tunnel is ~3 ms, far above
    # the device times being measured
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v, *args), x)

    out = jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / n


W_l = rr((2, p.m_exp, d))
W_r = rr((2, p.m_exp_right, d))

tot_k1 = tot_e = tot_o = 0.0
for r in range(g):
    t = (d >> r) + 1
    N = 1 << (r + 1)
    Ne = No = N // 2
    odd_active = (stop == 0 or r <= stop)
    cv = rr((N, 2, 1, d))
    evens, odds = cv[0::2], cv[1::2]

    k1_in = cv if odd_active else evens
    t_k1 = timeit(lambda x: inv_ntt_automorph(x, t, False), k1_in)
    t_e = timeit(lambda a: keyswitch_fused(a, a, W_l, p.m_exp, False),
                 evens)
    t_o = 0.0
    if odd_active:
        t_o = timeit(lambda a: keyswitch_fused(a, a, W_r,
                                               p.m_exp_right, False),
                     odds)
    tot_k1 += t_k1
    tot_e += t_e
    tot_o += t_o
    print(f"r={r} N={N:3d} K1={t_k1*1e3:7.2f}ms K2e={t_e*1e3:7.2f}ms "
          f"K2o={t_o*1e3:7.2f}ms", flush=True)

print(f"TOTAL K1={tot_k1*1e3:.2f}ms K2even={tot_e*1e3:.2f}ms "
      f"K2odd={tot_o*1e3:.2f}ms sum={(tot_k1+tot_e+tot_o)*1e3:.2f}ms")
