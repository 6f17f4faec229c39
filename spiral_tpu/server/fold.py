"""GSW external-product folding (ref: src/spiral.cpp:1349-1410
foldOneFurtherDimension + split_and_crt + cpu_mul_query_by_ct).

Each round halves the ciphertext count via the homomorphic mux
C <- Q_neg (.) C_even + Q (.) C_odd, where (.) is the external product
Q . G^{-1}_signed(C).  All per-round work is batched over the surviving
ciphertexts; rounds are sequential (log2(num_per) of them).

Ciphertext rows are stored in BIT-REVERSED further-index order (see
server/db.py), so round s pairs ADJACENT cts (positions 2k, 2k+1) while
still selecting bit (nu_2 - 1 - s) of the further index: position 2k has
an even bit-reversed value, i.e. its further index has that bit 0.
Adjacent pairing is what makes the fold shardable — on a row-sharded mesh
the first log2(rows_per_device) rounds touch only local pairs (the
standard distributed tree reduction), whereas the reference's
(i, i + num_per/2) pairing would exchange half the cts every round.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..arith.ntt import crt_ntt
from ..core.poly import add_raw, matmul_raw
from ..core.gadget import gadget_invert_signed_raw


def ext_product_mxu(q, gn):
    """Batched external-product matmul on the MXU.

    q: (R, M, 2, d) NTT; gn: (m, M, C, 2, d) NTT ->
    (m, R, C, 2, d).  Both operands split into 7-bit int8 limbs; the
    whole per-slot contraction becomes one batched int8 matmul with the
    ct batch folded into the output dim (the same scheme as the
    first-dim kernel, server/firstdim.py; ref counterpart:
    src/spiral.cpp:464-582 cpu_mul_query_by_ct).  Exact for M <= 2^17.

    NOT used in the production fold: measured on v5e, the int8 limb-split
    transposes of the (large) gn operand cost more than the VPU
    half-product matmul they replace (fold delta 10.4 -> 13.9 ms at
    spiral_20_256).  Kept as the building block for shapes with a large
    contraction/output where the MXU wins (see server/firstdim.py)."""
    from .firstdim import N_LIMBS, _mxu_contract, _to_limbs_i8

    R, M = q.shape[0], q.shape[1]
    m, _, C, crt, d = gn.shape
    ql = _to_limbs_i8(q)                        # (R, M, 2, d, 4)
    lhs = ql.transpose(2, 3, 0, 4, 1).reshape(crt, d, R * N_LIMBS, M)
    gl = _to_limbs_i8(gn)                       # (m, M, C, 2, d, 4)
    rhs = gl.transpose(3, 4, 1, 0, 2, 5).reshape(crt, d, M,
                                                 m * C * N_LIMBS)
    res = _mxu_contract(rhs, lhs, R,
                        row_major=True)         # (2, d, R, m*C)
    return res.reshape(crt, d, R, m, C).transpose(3, 2, 4, 0, 1)


def fold_rounds(cts_coeff: jnp.ndarray, q_pos: jnp.ndarray,
                q_neg: jnp.ndarray, params: Params, start_round: int = 0,
                num_rounds: int | None = None,
                fused: bool | None = None) -> jnp.ndarray:
    """Run `num_rounds` fold rounds (all remaining if None) starting at
    global round index `start_round` (selects q_pos/q_neg slots).

    cts_coeff: (m, n1, n2, 2, d) coeff domain, bit-reversed row order.
    q_pos/q_neg: (nu_2, n1, m2, 2, d) NTT domain, slot s selecting bit
    (nu_2 - 1 - s) of the further index.
    Returns the (m / 2^num_rounds, n1, n2, 2, d) survivors.

    Dispatch (SPIRAL_FOLD): "fused" (default on TPU under the Pallas NTT
    engine) runs the all-in-VMEM mega-kernel; "mxu" runs the
    digits+NTT Pallas kernel with the external-product contraction as a
    batched int8 MXU GEMM (ablation: the GEMM itself is ~50x faster than
    the VPU MACs but the mandatory slot-major relayout of the digit-NTT
    tensor costs more than the contraction saves — measured r5,
    tools/bench_fold2.py: 34 ms vs 10.9 fused); "xla" forces the unfused
    chain below.  fused=False pins the unfused chain regardless (callers
    that vmap this function)."""
    import os
    import jax
    mode = os.environ.get("SPIRAL_FOLD", "")
    if mode != "xla" and fused is not False:
        from .fold_pallas import (fold_fused_supported, fold_rounds_fused,
                                  fold_rounds_mxu)
        if fold_fused_supported(params) and (
                fused or mode in ("fused", "mxu") or
                jax.default_backend() == "tpu"):
            impl = fold_rounds_mxu if mode == "mxu" else fold_rounds_fused
            return impl(cts_coeff, q_pos, q_neg, params,
                        start_round=start_round, num_rounds=num_rounds)
    eng = crt_ntt(params.poly_len)
    m = cts_coeff.shape[0]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    for r in range(start_round, start_round + rounds):
        m //= 2
        # de-interleave BEFORE the gadget decomposition: the strided copy
        # touches the small ct tensor, not the t_gsw-times-larger digit
        # tensor, and everything downstream is contiguous
        pairs = jnp.concatenate([cts_coeff[0::2], cts_coeff[1::2]])
        ginv = gadget_invert_signed_raw(pairs, params.t_gsw, params.n1)
        gn = eng.forward(ginv)          # (2m, m2, n2, 2, d)
        # VPU half-product matmuls beat the MXU limb path here (measured:
        # ext_product_mxu's limb-split transposes cost more than the tiny
        # contraction saves — see that function's docstring)
        prod = add_raw(matmul_raw(q_neg[r], gn[:m]),
                       matmul_raw(q_pos[r], gn[m:]))
        cts_coeff = eng.inverse(prod)
    return cts_coeff


def fold_ciphertexts(cts_coeff: jnp.ndarray, q_pos: jnp.ndarray,
                     q_neg: jnp.ndarray, params: Params,
                     start_round: int = 0,
                     fused: bool | None = None) -> jnp.ndarray:
    """Fold all the way down; returns the single surviving ct
    (n1, n2, 2, d), coeff domain."""
    return fold_rounds(cts_coeff, q_pos, q_neg, params,
                       start_round=start_round, fused=fused)[0]
