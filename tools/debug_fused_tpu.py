"""Bisect the fused Pallas kernels on TPU: compiled vs interpret,
bit-level, per kernel.  Run on a TPU host: python tools/debug_fused_tpu.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, Params

rng = np.random.default_rng(0)


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    eq = np.array_equal(a, b)
    print(f"{name}: {'OK' if eq else 'MISMATCH'}", flush=True)
    if not eq:
        bad = np.argwhere(a != b)
        print("  first bad idx:", bad[0], "of", bad.shape[0], "diffs")
        i = tuple(bad[0])
        print("  interp:", a[i], "compiled:", b[i])
    return eq


def main():
    p = Params(nu_1=3, nu_2=2, p_db=256, t_gsw=3, t_conv=4,
               t_exp=8, t_exp_right=8)
    d = p.poly_len

    # 0. the standalone NTT engine (sanity: covered by test_ntt_pallas)
    from spiral_tpu.arith.ntt_pallas import CrtNttPallas
    e_i = CrtNttPallas(d, interpret=True)
    e_c = CrtNttPallas(d, interpret=False)
    x = rr((8, d))
    cmp("ntt fwd", e_i.forward(x), e_c.forward(x))
    cmp("ntt inv", e_i.inverse(x), e_c.inverse(x))

    # 1. fused fold round
    from spiral_tpu.server.fold_pallas import fold_rounds_fused
    m = 4
    cts = rr((m, p.n1, p.n2, d))
    qp = rr((p.nu_2, p.n1, p.m2, d))
    qn = rr((p.nu_2, p.n1, p.m2, d))
    fi = fold_rounds_fused(cts, qp, qn, p, interpret=True)
    fc = fold_rounds_fused(cts, qp, qn, p, interpret=False)
    cmp("fold", fi, fc)

    # 2. expansion K1 (inv NTT + automorph)
    from spiral_tpu.server.expand_pallas import (inv_ntt_automorph,
                                                 keyswitch_fused)
    cv = rr((4, p.base_dim, 1, d))
    t = (d >> 1) + 1
    ai = inv_ntt_automorph(cv, t, True)
    ac = inv_ntt_automorph(cv, t, False)
    cmp("expand K1 (invntt+automorph)", ai, ac)

    # 3. expansion K2 (gadget + fwd NTT + W matmul)
    ca = rr((4, p.base_dim, 1, d))
    W = rr((p.base_dim, p.m_exp, d))
    ki = keyswitch_fused(cv, ca, W, p.m_exp, True)
    kc = keyswitch_fused(cv, ca, W, p.m_exp, False)
    cmp("expand K2 (keyswitch)", ki, kc)

    # K2 with the 1-bit odd gadget width
    Wr = rr((p.base_dim, p.m_exp_right, d))
    ki = keyswitch_fused(cv, ca, Wr, p.m_exp_right, True)
    kc = keyswitch_fused(cv, ca, Wr, p.m_exp_right, False)
    cmp("expand K2 right", ki, kc)


if __name__ == "__main__":
    main()
