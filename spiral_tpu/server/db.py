"""Database encoding and layout (ref: src/spiral.cpp:1028-1172 load_db).

The plaintext database is total_n records, each an n0 x n2 matrix of
polynomials mod p_db.  Records are centered mod p, lifted to R_Q, NTT'd,
and arranged with the NTT slot z as the leading batch axis and the
first-dimension index contiguous in the contraction axis:

    db[i (num_per), c (n2), j*n0+m (K), limb, z]

which is the jnp-native analog of the reference's packed z-major layout
(spiral.cpp:1138-1154); the contraction axis K = dim0*n0 feeds the
first-dimension multiply directly.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..params import B_I, P_I, Params
from ..arith.ntt import crt_ntt


@dataclasses.dataclass
class EncodedDb:
    data: jnp.ndarray      # (num_per, n2, dim0*n0, 2, d) u32, NTT domain
    params: Params


def random_db(params: Params, rng: np.random.Generator) -> np.ndarray:
    """Host plaintexts: (total_n, n0, n2, d) ints in [0, p_db)."""
    return rng.integers(
        0, params.p_db,
        size=(params.total_n, params.n0, params.n2, params.poly_len),
        dtype=np.int64)


def encode_db(pts: np.ndarray, params: Params) -> EncodedDb:
    """Center mod p, lift to residues, NTT, reorder to the serving layout."""
    p_db = params.p_db
    centered = np.where(pts >= p_db // 2, pts - p_db, pts)
    limb_p = np.where(centered < 0, centered + P_I, centered).astype(np.uint32)
    limb_b = np.where(centered < 0, centered + B_I, centered).astype(np.uint32)
    res = jnp.asarray(np.stack([limb_p, limb_b], axis=-2))
    ntt = crt_ntt(params.poly_len).forward(res)  # (total_n, n0, n2, 2, d)
    # item i_total -> (j = i_total // num_per, ii = i_total % num_per)
    t = ntt.reshape(params.dim0, params.num_per, params.n0, params.n2, 2,
                    params.poly_len)
    # -> (num_per, n2, dim0, n0, 2, d) -> flatten (dim0, n0) into K
    t = t.transpose(1, 3, 0, 2, 4, 5)
    t = t.reshape(params.num_per, params.n2, params.dim0 * params.n0, 2,
                  params.poly_len)
    return EncodedDb(data=t, params=params)
