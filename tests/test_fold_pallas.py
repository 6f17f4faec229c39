"""Fused fold mega-kernel vs the unfused chain: bit-exact equality.

Runs the Pallas kernel in interpret mode on the CPU backend (the TPU
compiled path is exercised by bench/e2e on hardware).  The query tensors
are NTT-domain and engine orders differ, so each path receives the SAME
coefficient-domain queries transformed by its own engine; both produce
coefficient-domain outputs, which must agree bit-for-bit.
"""
import numpy as np
import jax.numpy as jnp

from spiral_tpu.params import B_I, P_I, Params
from spiral_tpu.arith.ntt import crt_ntt
from spiral_tpu.arith.ntt_pallas import crt_ntt_pallas
from spiral_tpu.server.fold import fold_rounds
from spiral_tpu.server.fold_pallas import fold_rounds_fused, fold_rounds_mxu


def _rand_residues(rng, shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


def _setup(p, seed):
    rng = np.random.default_rng(seed)
    m = 1 << p.nu_2
    d = p.poly_len
    cts = _rand_residues(rng, (m, p.n1, p.n2, d))
    qp_c = _rand_residues(rng, (p.nu_2, p.n1, p.m2, d))
    qn_c = _rand_residues(rng, (p.nu_2, p.n1, p.m2, d))
    eng, pe = crt_ntt(d), crt_ntt_pallas(d)
    return (cts, eng.forward(qp_c), eng.forward(qn_c),
            pe.forward(qp_c), pe.forward(qn_c))


def test_fold_fused_bit_exact():
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=3, t_conv=4,
               t_exp=8, t_exp_right=8)
    cts, qp, qn, qp_p, qn_p = _setup(p, 7)
    ref = fold_rounds(cts, qp, qn, p)
    fused = fold_rounds_fused(cts, qp_p, qn_p, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


def test_fold_fused_bit_exact_i8_digits():
    # t_gsw=9 -> bits_per=7: exercises the signed-int8 digit path (one
    # digit tensor shared by both CRT limbs, single-limb NTT matmul)
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=9, t_conv=4,
               t_exp=8, t_exp_right=8)
    cts, qp, qn, qp_p, qn_p = _setup(p, 13)
    ref = fold_rounds(cts, qp, qn, p)
    fused = fold_rounds_fused(cts, qp_p, qn_p, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


def test_fold_mxu_bit_exact():
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=3, t_conv=4,
               t_exp=8, t_exp_right=8)
    cts, qp, qn, qp_p, qn_p = _setup(p, 7)
    ref = fold_rounds(cts, qp, qn, p)
    mxu = fold_rounds_mxu(cts, qp_p, qn_p, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mxu))


def test_fold_mxu_bit_exact_i8_digits():
    # production widths: t_gsw=9 -> bits_per=7 signed-int8 digit path
    p = Params(nu_1=2, nu_2=3, p_db=256, t_gsw=9, t_conv=4,
               t_exp=8, t_exp_right=8)
    cts, qp, qn, qp_p, qn_p = _setup(p, 13)
    ref = fold_rounds(cts, qp, qn, p)
    mxu = fold_rounds_mxu(cts, qp_p, qn_p, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mxu))


def test_fold_mxu_partial_rounds():
    p = Params(nu_1=2, nu_2=3, p_db=256, t_gsw=2, t_conv=4,
               t_exp=8, t_exp_right=8)
    cts, qp, qn, qp_p, qn_p = _setup(p, 11)
    ref = fold_rounds(cts, qp, qn, p, 0, 2)
    mxu = fold_rounds_mxu(cts, qp_p, qn_p, p, 0, 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(mxu))
    ref2 = fold_rounds(ref, qp, qn, p, start_round=2)
    mxu2 = fold_rounds_mxu(mxu, qp_p, qn_p, p, start_round=2,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(mxu2))


def test_fold_fused_batch_bit_exact():
    # batched fused fold (per-query q blocks in the kernel grid) vs the
    # vmapped unfused chain, production-width i8 digits
    import jax
    from spiral_tpu.server.fold_pallas import fold_rounds_fused_batch
    p = Params(nu_1=2, nu_2=3, p_db=256, t_gsw=9, t_conv=4,
               t_exp=8, t_exp_right=8)
    rng = np.random.default_rng(31)
    B, m, d = 2, 1 << p.nu_2, p.poly_len
    cts_b = _rand_residues(rng, (B, m, p.n1, p.n2, d))
    qp_c = _rand_residues(rng, (B, p.nu_2, p.n1, p.m2, d))
    qn_c = _rand_residues(rng, (B, p.nu_2, p.n1, p.m2, d))
    eng, pe = crt_ntt(d), crt_ntt_pallas(d)
    ref = jax.vmap(lambda c, qp, qn: fold_rounds(c, qp, qn, p,
                                                 fused=False))(
        cts_b, eng.forward(qp_c), eng.forward(qn_c))
    got = fold_rounds_fused_batch(cts_b, pe.forward(qp_c),
                                  pe.forward(qn_c), p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _setup_pack(p, seed, T):
    rng = np.random.default_rng(seed)
    m = 1 << p.nu_2
    d = p.poly_len
    cts = _rand_residues(rng, (T, m, 2, 1, d))
    qp_c = _rand_residues(rng, (p.nu_2, 2, 2 * p.t_gsw, d))
    qn_c = _rand_residues(rng, (p.nu_2, 2, 2 * p.t_gsw, d))
    eng, pe = crt_ntt(d), crt_ntt_pallas(d)
    return (cts, eng.forward(qp_c), eng.forward(qn_c),
            pe.forward(qp_c), pe.forward(qn_c))


def test_fold_pack_fused_bit_exact():
    # t_gsw=9 -> unsigned 7-bit digits (plain int8, no bias)
    from spiral_tpu.pack import fold_pack_rounds
    from spiral_tpu.server.fold_pallas import fold_pack_rounds_fused
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=9, t_conv=4,
               t_exp=8, t_exp_right=8, out_n=2)
    cts, qp, qn, qp_p, qn_p = _setup_pack(p, 23, T=4)
    ref = fold_pack_rounds(cts, qp, qn, p)
    fused = fold_pack_rounds_fused(cts, qp_p, qn_p, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


def test_fold_pack_fused_bit_exact_bias8():
    # t_gsw=7 -> unsigned 8-bit digits (int8 with bias-128 recentring)
    from spiral_tpu.pack import fold_pack_rounds
    from spiral_tpu.server.fold_pallas import fold_pack_rounds_fused
    p = Params(nu_1=2, nu_2=3, p_db=256, t_gsw=7, t_conv=4,
               t_exp=8, t_exp_right=8, out_n=2)
    cts, qp, qn, qp_p, qn_p = _setup_pack(p, 29, T=4)
    ref = fold_pack_rounds(cts, qp, qn, p)
    fused = fold_pack_rounds_fused(cts, qp_p, qn_p, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


def test_fold_fused_partial_rounds():
    p = Params(nu_1=2, nu_2=3, p_db=256, t_gsw=2, t_conv=4,
               t_exp=8, t_exp_right=8)
    cts, qp, qn, qp_p, qn_p = _setup(p, 11)
    # two local rounds, then the remaining one from start_round=2 (the
    # sharded serving split in pir.py)
    ref = fold_rounds(cts, qp, qn, p, 0, 2)
    fused = fold_rounds_fused(cts, qp_p, qn_p, p, 0, 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))
    ref2 = fold_rounds(ref, qp, qn, p, start_round=2)
    fused2 = fold_rounds_fused(fused, qp_p, qn_p, p, start_round=2,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(fused2))


def test_fold_pack_fused_batch_bit_exact():
    import jax
    from spiral_tpu.pack import fold_pack_rounds
    from spiral_tpu.server.fold_pallas import fold_pack_rounds_fused_batch
    p = Params(nu_1=2, nu_2=2, p_db=256, t_gsw=9, t_conv=4,
               t_exp=8, t_exp_right=8, out_n=2)
    rng = np.random.default_rng(37)
    B, T, m, d = 2, 4, 1 << p.nu_2, p.poly_len
    cts_b = _rand_residues(rng, (B, T, m, 2, 1, d))
    qp_c = _rand_residues(rng, (B, p.nu_2, 2, 2 * p.t_gsw, d))
    qn_c = _rand_residues(rng, (B, p.nu_2, 2, 2 * p.t_gsw, d))
    eng, pe = crt_ntt(d), crt_ntt_pallas(d)
    ref = jax.vmap(lambda c, qp, qn: fold_pack_rounds(c, qp, qn, p,
                                                      fused=False))(
        cts_b, eng.forward(qp_c), eng.forward(qn_c))
    got = fold_pack_rounds_fused_batch(cts_b, pe.forward(qp_c),
                                       pe.forward(qn_c), p,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
