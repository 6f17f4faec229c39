"""Fused packing kernel vs the unfused chain: bit-exact equality.

Outputs are NTT-domain and the engines' slot orders differ, so each
path gets the SAME coefficient-domain inputs transformed by its own
engine and the comparison happens back in coefficient domain."""
import numpy as np
import jax.numpy as jnp

from spiral_tpu.params import B_I, P_I, Params
from spiral_tpu.arith.ntt import crt_ntt
from spiral_tpu.arith.ntt_pallas import crt_ntt_pallas
from spiral_tpu.pack import pack_ciphertexts
from spiral_tpu.server.pack_pallas import pack_ciphertexts_fused


def _rand_residues(rng, shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


def _run_case(t_conv, seed, out_n=2):
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=9, t_conv=t_conv,
               t_exp=8, t_exp_right=8, out_n=out_n)
    d, T = p.poly_len, p.out_n ** 2
    rng = np.random.default_rng(seed)
    cts = _rand_residues(rng, (T, 2, 1, d))
    vw_c = _rand_residues(rng, (p.out_n, p.out_n + 1, p.m_conv, d))
    eng, pe = crt_ntt(d), crt_ntt_pallas(d)
    ref = pack_ciphertexts(cts, eng.forward(vw_c), p, fused=False)
    fused = pack_ciphertexts_fused(cts, pe.forward(vw_c), p,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(eng.inverse(ref)),
                                  np.asarray(pe.inverse(fused)))


def test_pack_fused_bit_exact_i8():
    # m_conv=8 -> 7-bit unsigned digits (plain int8 path)
    _run_case(t_conv=4, seed=17)


def test_pack_fused_bit_exact_2d():
    # m_conv=6 -> 10-bit digits (per-limb u32 path)
    _run_case(t_conv=3, seed=19)


def test_pack_fused_bit_exact_out_n4():
    _run_case(t_conv=4, seed=23, out_n=4)
