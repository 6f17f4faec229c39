"""Ciphertext composition and conversion.

scal_to_mat: scalar Regev (n0 x 1) -> matrix Regev (n1 x n0) via the
key-switch matrix W (ref: src/spiral.cpp:1834-1983, batched over all
2^nu_1 cts at once).

regev_to_gsw: t_gsw scalar Regev cts (encrypting bit*z^j) -> one n1 x m2
GSW ct via V plus per-digit scalToMat blocks and the reference's column
permutation (ref: src/spiral.cpp:1985-2025).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..arith.ntt import crt_ntt
from ..core.poly import add_raw, matmul_raw
from ..core.gadget import gadget_invert_raw


def _ginv_col0_ntt(cv, m_conv: int, eng):
    """G^{-1} of row 0 of each scalar ct, NTT'd: (N, m_conv, 1, 2, d)."""
    c_coeff = eng.inverse(cv)
    return eng.forward(gadget_invert_raw(c_coeff[:, 0:1], m_conv, 1)), c_coeff


def _special_distribute(ginv_ntt):
    """(N, m_conv, 1, 2, d) -> (N, 2*m_conv, 2, 2, d) block-diag duplicate
    (ref: src/spiral.cpp:1834-1848)."""
    N, m_conv = ginv_ntt.shape[0], ginv_ntt.shape[1]
    z = jnp.zeros_like(ginv_ntt)
    col0 = jnp.concatenate([ginv_ntt, z], axis=2)   # (N, m_conv, 2, 2, d)
    col1 = jnp.concatenate([z, ginv_ntt], axis=2)
    inter = jnp.stack([col0, col1], axis=2)          # (N, m_conv, 2, 2, 2, d)
    d = ginv_ntt.shape[-1]
    return inter.reshape(N, 2 * m_conv, 2, 2, d)


def scal_to_mat_batch(cv, W, params: Params, ginv_ntt=None):
    """cv: (N, n0, 1, 2, d) NTT scalar-Regev cts.
    W: (n1, n0*m_conv, 2, d) NTT.  Returns (N, n1, n0, 2, d)."""
    eng = crt_ntt(params.poly_len)
    if ginv_ntt is None:
        ginv_ntt, _ = _ginv_col0_ntt(cv, params.m_conv, eng)
    bd = _special_distribute(ginv_ntt)               # (N, 2m_conv, 2, 2, d)
    prod = matmul_raw(W, bd)                         # (N, n1, n0, 2, d)
    c1 = cv[:, 1:2, 0]                               # (N, 1, 2, d)
    # add c1 at (row 1, col 0) and (row 2, col 1)  (ref: spiral.cpp:1881-1884)
    n1, n0 = params.n1, params.n0
    pad = jnp.zeros_like(prod)
    pad = pad.at[:, 1, 0].set(c1[:, 0])
    pad = pad.at[:, 2, 1].set(c1[:, 0])
    return add_raw(prod, pad)


def regev_to_gsw_batch(cv, W, V, params: Params):
    """cv: (nu_2, t_gsw, n0, 1, 2, d) NTT scalar cts (digit-major per GSW).
    W: (n1, n0*m_conv, 2, d); V: (n1, 2*m_conv, 2, d).
    Returns (nu_2, n1, m2, 2, d) GSW cts."""
    eng = crt_ntt(params.poly_len)
    nu2, t = cv.shape[0], cv.shape[1]
    m_conv, n1, n0 = params.m_conv, params.n1, params.n0
    flat = cv.reshape((nu2 * t,) + cv.shape[2:])
    c_coeff = eng.inverse(flat)
    ginv0 = eng.forward(gadget_invert_raw(c_coeff[:, 0:1], m_conv, 1))
    ginv1 = eng.forward(gadget_invert_raw(c_coeff[:, 1:2], m_conv, 1))

    # scalToMat block per digit, reusing ginv0 (ref scalToMatFast)
    stm = scal_to_mat_batch(flat, W, params, ginv_ntt=ginv0)
    stm = stm.reshape((nu2, t, n1, n0, 2, params.poly_len))

    # ginv_Chat: (nu2, 2*m_conv, t, 2, d); column j from ct j
    g0 = ginv0.reshape((nu2, t, m_conv, 2, params.poly_len))
    g1 = ginv1.reshape((nu2, t, m_conv, 2, params.poly_len))
    chat = jnp.concatenate([g0, g1], axis=2).transpose(0, 2, 1, 3, 4)
    prod = matmul_raw(V, chat)                       # (nu2, n1, t, 2, d)

    # permuted layout: col (n0+1)*j = prod[:, :, j]; cols +1..+n0 = stm[j]
    # (ref: spiral.cpp:2019-2022)
    blocks = jnp.concatenate(
        [prod.transpose(0, 2, 1, 3, 4)[:, :, :, None], stm],
        axis=3)  # (nu2, t, n1, 1+n0, 2, d)
    out = blocks.transpose(0, 2, 1, 3, 4, 5).reshape(
        (nu2, n1, t * (n0 + 1), 2, params.poly_len))
    return out
