"""Micro-profiler for the expansion/fold building blocks at real shapes.

Times each primitive (batched NTT fwd/inv, gadget decomposition,
key-switch matmul, automorph, external-product matmul) in isolation with
K repetitions fused inside one jit (seed-perturbed to defeat CSE), so the
numbers are device-true.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_parts.py
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="spiral_20_256")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")

    from spiral_tpu.params import preset, P_I, B_I
    from spiral_tpu.arith.ntt import crt_ntt
    from spiral_tpu.core.poly import matmul_raw, automorph_raw
    from spiral_tpu.core.gadget import (gadget_invert_raw,
                                        gadget_invert_signed_raw)

    p = preset(args.preset)
    d = p.poly_len
    eng = crt_ntt(d)
    rng = np.random.default_rng(0)
    K = args.iters

    def rand(shape):
        mods = np.array([P_I, B_I], dtype=np.uint64)
        v = rng.integers(0, 1 << 28, size=shape + (2, d), dtype=np.uint64)
        return jnp.asarray((v % mods[:, None]).astype(np.uint32))

    def bench(name, fn, *arrs):
        """fn(*arrs, it) run K times inside one jit with a serial data
        dependency between iterations (each run perturbs the input with a
        scalar from the previous output, so nothing can be elided or
        overlapped); report per-iter ms."""
        @jax.jit
        def loop(*arrs):
            carry = jnp.uint32(0)
            acc = jnp.uint32(0)
            for it in range(K):
                r = fn(arrs[0] + carry, *arrs[1:], it)
                carry = jnp.ravel(r)[0] & jnp.uint32(1)
                acc = acc + jnp.ravel(r)[-1]
            return acc

        # int() fetches the scalar to the host — the only reliable sync
        # over the remote-TPU tunnel (block_until_ready under-reports)
        int(loop(*arrs))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(*arrs))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{name:44s} {best * 1e3:8.3f} ms/iter", flush=True)
        return best

    # --- expansion round shapes (the worst round: r = g-1, evens) ---------
    n_ev = p.dim0                      # 256 cts in the last round
    cv = rand((n_ev, 2, 1))
    print(f"preset={args.preset} d={d} dim0={p.dim0} "
          f"m_exp={p.m_exp} m_exp_right={p.m_exp_right} m2={p.m2}",
          flush=True)

    bench(f"inverse NTT batch ({n_ev} cts x 2 polys)",
          lambda cv, it: eng.inverse(cv + jnp.uint32(it)), cv)
    c = rand((n_ev, 2, 1))
    bench(f"automorph batch ({n_ev} cts)",
          lambda c, it: automorph_raw(c + jnp.uint32(it), (d >> 1) + 1), c)
    c0 = rand((n_ev, 1, 1))
    bench(f"gadget_invert m_exp={p.m_exp} ({n_ev} cts)",
          lambda c0, it: gadget_invert_raw(c0 + jnp.uint32(it), p.m_exp, 1),
          c0)
    ginv = rand((n_ev, p.m_exp, 1))
    bench(f"forward NTT ginv ({n_ev} x {p.m_exp} polys)",
          lambda g, it: eng.forward(g + jnp.uint32(it)), ginv)
    W = rand((2, p.m_exp))
    gn = rand((n_ev, p.m_exp, 1))
    bench(f"keyswitch matmul W(2x{p.m_exp}) x ({n_ev} cts)",
          lambda W, gn, it: matmul_raw(W, gn + jnp.uint32(it)), W, gn)

    # --- odd slots with the wide gadget -----------------------------------
    n_od = 32
    g2 = rand((n_od, p.m_exp_right, 1))
    bench(f"forward NTT ginv_right ({n_od} x {p.m_exp_right})",
          lambda g, it: eng.forward(g + jnp.uint32(it)), g2)
    W2 = rand((2, p.m_exp_right))
    bench(f"keyswitch matmul W(2x{p.m_exp_right}) x ({n_od} cts)",
          lambda W, gn, it: matmul_raw(W, gn + jnp.uint32(it)), W2, g2)

    # --- fold round 1 shapes ----------------------------------------------
    m = p.num_per // 2
    cts = rand((2 * m, p.n1, p.n2))
    bench(f"fold: signed ginv t_gsw={p.t_gsw} ({2 * m} cts)",
          lambda c, it: gadget_invert_signed_raw(c + jnp.uint32(it),
                                                 p.t_gsw, p.n1), cts)
    gnf = rand((2 * m, p.m2, p.n2))
    bench(f"fold: forward NTT ({2 * m} x {p.m2} x {p.n2})",
          lambda g, it: eng.forward(g + jnp.uint32(it)), gnf)
    q = rand((p.n1, p.m2))
    gh = rand((m, p.m2, p.n2))
    bench(f"fold: ext-product matmul q(3x{p.m2}) x ({m} cts)",
          lambda q, g, it: matmul_raw(q, g + jnp.uint32(it)), q, gh)
    prod = rand((m, p.n1, p.n2))
    bench(f"fold: inverse NTT ({m} x {p.n1} x {p.n2})",
          lambda pr, it: eng.inverse(pr + jnp.uint32(it)), prod)
    return 0


if __name__ == "__main__":
    sys.exit(main())
