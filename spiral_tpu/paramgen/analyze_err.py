"""Empirical noise analysis (ref: analyze_err.py + util.cpp get_log_var).

Collects signed decode-error samples from end-to-end runs, reports the
empirical log2 variance, and extrapolates the decode-failure rate under a
hypothetical modulus via the subgaussian tail — the tooling used to
validate the analytical 2^-40 model against reality.
"""
from __future__ import annotations

import math

import numpy as np

from ..params import Params, Q


def error_samples(final_ct_host: np.ndarray, S_centered_rows, pt_expected,
                  params: Params) -> np.ndarray:
    """Signed error e = S*ct - Delta*pt over R_Q (pre-modswitch), flattened.

    final_ct_host: (n1, n2, d) ints mod Q.  S_centered_rows: the secret
    S = [Sp | I] rows as centered int arrays (n0, n1, d) with small Sp.
    pt_expected: (n0, n2, d) ints mod p.
    """
    n0, n2, d = pt_expected.shape
    delta = params.scale_k
    p_db = params.p_db
    errs = []
    for r in range(n0):
        for c in range(n2):
            acc = np.zeros(d, dtype=object)
            for m in range(S_centered_rows.shape[1]):
                s_poly = S_centered_rows[r, m]
                b_poly = np.asarray(final_ct_host[m, c], dtype=object)
                full = np.convolve(s_poly.astype(object), b_poly)
                res = full[:d].copy()
                res[:d - 1] -= full[d:]
                acc = (acc + res) % Q
            pt = pt_expected[r, c].astype(object)
            ptc = np.where(pt >= p_db // 2, pt - p_db, pt)
            diff = (acc - delta * ptc) % Q
            diff = np.where(diff >= Q // 2, diff - Q, diff)
            errs.append(diff)
    return np.concatenate(errs)


def log2_variance(errs: np.ndarray) -> float:
    v = np.var(errs.astype(np.float64))
    return math.log2(v) if v > 0 else 0.0


def empirical_subgaussian_width(errs: np.ndarray) -> float:
    """sqrt(variance) interpreted as the subgaussian parameter."""
    return float(np.sqrt(np.var(errs.astype(np.float64))))


def extrapolate_p_err(errs: np.ndarray, params: Params) -> float:
    """log2 failure probability at the configured q' from measured width
    (the analyze_err.py extrapolation)."""
    from .noise import p_err_bits
    s_e = float(np.var(errs.astype(np.float64)))
    return p_err_bits(params.p_db, params.arb_qprime, s_e,
                      n=params.n0, d=params.poly_len)
