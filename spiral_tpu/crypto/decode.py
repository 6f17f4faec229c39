"""Client-side response decoding (host, exact integers).

Implements the two-modulus recombination decode (ref: src/spiral.cpp:
1429-1477, src/testing.cpp:1086-1122): row 0 of the response is rescaled
to q', the remaining rows to q_1 = 4p; the client multiplies row 0 by Sp
over R_{q'} and recombines.  The R_{q'} product uses the fact that Sp is
small (gaussian/ternary), so an int64 negacyclic convolution is exact:
|Sp| <= 64, d <= 2048, q' < 2^37 -> products < 2^53.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..params import Params, Q
from ..core.rescale import rescale_array


def negacyclic_conv_small(a_small: np.ndarray, b: np.ndarray, q: int
                          ) -> np.ndarray:
    """a (int64 small, length d) (*) b (values < q, length d) mod q."""
    d = len(a_small)
    assert int(np.max(np.abs(a_small)) if d else 0) * d * q < 2 ** 62
    full = np.convolve(a_small.astype(np.int64), b.astype(np.int64))
    res = full[:d].copy()
    res[: d - 1] -= full[d:]
    return res % q


@dataclasses.dataclass
class Response:
    """Two-modulus modswitched response (host object arrays)."""

    first_row: np.ndarray   # (1, cols, d) values mod q'
    rest_rows: np.ndarray   # (rows-1, cols, d) values mod 4p


def modswitch_response(ct_host: np.ndarray, params: Params) -> Response:
    """ct_host: (rows, cols, d) object ints mod Q -> Response."""
    qp = params.arb_qprime
    q1 = 4 * params.p_db
    return Response(
        first_row=rescale_array(ct_host[:1], Q, qp),
        rest_rows=rescale_array(ct_host[1:], Q, q1),
    )


def modswitch_response_from_residues(final_np: np.ndarray,
                                     params: Params) -> Response:
    """(rows, cols, 2, d) u32 residue tensor (host) -> Response, via the
    native runtime (exact; falls back to python ints)."""
    from .. import native
    from ..params import B_I, P_I
    from ..arith.crt import P_INV_MOD_B
    v = native.crt_lift_u64(final_np[..., 0, :], final_np[..., 1, :],
                            P_I, B_I, P_INV_MOD_B)
    return Response(
        first_row=native.rescale_u64(v[:1], Q, params.arb_qprime),
        rest_rows=native.rescale_u64(v[1:], Q, 4 * params.p_db),
    )


def modswitch_device(final, params: Params):
    """On-device two-modulus modswitch of the folded ct.

    final: (rows, cols, 2, d) u32 residue tensor (device).  Returns
    (first_row, rest_rows) u32 device arrays — jit this as the last
    server stage so modswitch time is part of the measured server compute
    (as in the reference's time_modswitch; ref: src/spiral.cpp:40-78).
    Bit-identical to modswitch_response_from_residues.
    """
    from ..core.rescale import rescale_residues_device
    first = rescale_residues_device(
        final[:1, :, 0, :], final[:1, :, 1, :], params.arb_qprime)
    rest = rescale_residues_device(
        final[1:, :, 0, :], final[1:, :, 1, :], 4 * params.p_db)
    return first, rest


def response_from_device_rows(first, rest) -> Response:
    """Fetch modswitched rows to the host Response container."""
    return Response(first_row=np.asarray(first).astype(object),
                    rest_rows=np.asarray(rest).astype(object))


def decode_response(resp: Response, Sp_centered: np.ndarray, params: Params
                    ) -> np.ndarray:
    """Recombine to the plaintext matrix (ref: spiral.cpp:1452-1475).

    Sp_centered: (n, k, d) int64.  Returns (n, cols, d) ints mod p_db.
    """
    qp = params.arb_qprime
    q1 = 4 * params.p_db
    p = params.p_db
    n, k, d = Sp_centered.shape
    cols = resp.first_row.shape[1]
    assert resp.first_row.shape[0] == k == 1, "k_param == 1 supported"

    out = np.empty((n, cols, d), dtype=object)
    denom = qp * (q1 // p)
    for r in range(n):
        for c in range(cols):
            sp = negacyclic_conv_small(
                Sp_centered[r, 0], np.asarray(resp.first_row[0, c],
                                              dtype=np.int64), qp)
            val_first = np.where(sp >= qp // 2, sp - qp, sp).astype(np.int64)
            vr = np.asarray(resp.rest_rows[r, c], dtype=np.int64)
            val_rest = np.where(vr >= q1 // 2, vr - q1, vr)
            rr = val_first.astype(object) * q1 + val_rest.astype(object) * qp
            sign = np.where(rr >= 0, 1, -1)
            num = rr + sign * (denom // 2)
            res = num // denom + np.where((num % denom != 0) & (sign < 0), 1, 0)
            out[r, c] = res % p
    return out
