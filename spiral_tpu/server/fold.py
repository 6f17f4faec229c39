"""GSW external-product folding (ref: src/spiral.cpp:1349-1410
foldOneFurtherDimension + split_and_crt + cpu_mul_query_by_ct).

Each round halves the ciphertext count via the homomorphic mux
C <- Q_neg (.) C_lo + Q (.) C_hi, where (.) is the external product
Q . G^{-1}_signed(C).  All per-round work is batched over the surviving
ciphertexts; rounds are sequential (log2(num_per) of them).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..arith.ntt import crt_ntt
from ..core.poly import add_raw, matmul_raw
from ..core.gadget import gadget_invert_signed_raw


def fold_ciphertexts(cts_coeff: jnp.ndarray, q_pos: jnp.ndarray,
                     q_neg: jnp.ndarray, params: Params) -> jnp.ndarray:
    """cts_coeff: (num_per, n1, n2, 2, d) coeff domain.
    q_pos/q_neg: (nu_2, n1, m2, 2, d) NTT domain, slot s selecting bit
    (nu_2 - 1 - s) of the further index.
    Returns the single surviving ct (n1, n2, 2, d), coeff domain."""
    eng = crt_ntt(params.poly_len)
    num_per = cts_coeff.shape[0]
    cur = 0
    while num_per >= 2:
        num_per //= 2
        # one batched decomposition + NTT over both halves
        ginv = gadget_invert_signed_raw(cts_coeff[:2 * num_per],
                                        params.t_gsw, params.n1)
        gn = eng.forward(ginv)          # (2*num_per, m2, n2, 2, d)
        prod = add_raw(matmul_raw(q_neg[cur], gn[:num_per]),
                       matmul_raw(q_pos[cur], gn[num_per:]))
        cts_coeff = eng.inverse(prod)
        cur += 1
    return cts_coeff[0]
