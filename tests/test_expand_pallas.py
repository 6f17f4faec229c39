"""Fused expansion Pallas kernels vs the unfused path: bit-exact equality.

Interpret mode on the CPU backend.  Unlike the fold test, the whole
expansion consumes and produces NTT-domain tensors, so the fused path is
checked against the unfused path after mapping both to coefficient
domain THROUGH THEIR OWN engine — inputs are generated in coefficient
domain and transformed per-engine the same way.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from spiral_tpu.params import B_I, P_I, Params
from spiral_tpu.arith.ntt import crt_ntt
from spiral_tpu.arith.ntt_pallas import crt_ntt_pallas
from spiral_tpu.server.expand import coefficient_expansion


def _rand_residues(rng, shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


def _run_both(p, g, stopround, max_bits, seed):
    d = p.poly_len
    rng = np.random.default_rng(seed)
    cv0_c = _rand_residues(rng, (p.base_dim, 1, d))
    Wl_c = [_rand_residues(rng, (p.base_dim, p.m_exp, d)) for _ in range(g)]
    Wr_c = [_rand_residues(rng, (p.base_dim, p.m_exp_right, d))
            for _ in range(g)]

    outs = []
    for eng, fused in ((crt_ntt(d), False), (crt_ntt_pallas(d), True)):
        cv = eng.forward(cv0_c)
        Wl = [eng.forward(w) for w in Wl_c]
        Wr = [eng.forward(w) for w in Wr_c]
        res = coefficient_expansion(cv, g, Wl, Wr, p,
                                    max_bits_to_gen_right=max_bits,
                                    stopround=stopround, fused=fused)
        outs.append(np.asarray(eng.inverse(res)))
    return outs


@pytest.mark.parametrize("stopround", [0, 1])
def test_expand_fused_bit_exact(stopround):
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=2, t_conv=4,
               t_exp=4, t_exp_right=2)
    g = 3
    max_bits = p.t_gsw * p.further_dims if stopround else 0
    ref, fused = _run_both(p, g, stopround, max_bits, seed=3)
    np.testing.assert_array_equal(ref, fused)


def test_expand_fused_bit_exact_i8_digits():
    # production gadget widths: t_exp=8 -> bits_per=8 (int8 digits with
    # the -128 bias + bias*NTT(ones) correction), t_exp_right=56 ->
    # bits_per=2 (int8 digits, no bias)
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=2, t_conv=4,
               t_exp=8, t_exp_right=56)
    ref, fused = _run_both(p, 3, 1, p.t_gsw * p.further_dims, seed=5)
    np.testing.assert_array_equal(ref, fused)
