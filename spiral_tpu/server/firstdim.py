"""First-dimension multiply: the rate-limiting database-streaming kernel
(ref: src/spiral.cpp:628-999 multiplyQueryByDatabase).

out[i, r, c] = sum_{j,m} Q[j*n0+m, r] * DB[i, c, j*n0+m]   (per limb, per z)

The jnp path reuses the chunked half-product contraction from
core.poly.matmul_raw; a Pallas kernel replaces it on TPU for HBM-bound
streaming (see server/firstdim_pallas.py in later rounds).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.poly import matmul_raw
from .db import EncodedDb


def reorient_query(cts) -> jnp.ndarray:
    """dim0 matrix-Regev cts (dim0, n1, n0, 2, d) NTT ->
    (K=dim0*n0, n1, 2, d)  (ref: spiral.cpp:410-433 reorientCiphertexts)."""
    dim0, n1, n0 = cts.shape[0], cts.shape[1], cts.shape[2]
    t = cts.transpose(0, 2, 1, 3, 4)  # (dim0, n0, n1, 2, d)
    return t.reshape(dim0 * n0, n1, cts.shape[3], cts.shape[4])


def multiply_query_by_db(db: EncodedDb, query_k: jnp.ndarray) -> jnp.ndarray:
    """query_k: (K, n1, 2, d) NTT.  Returns (num_per, n1, n2, 2, d) NTT."""
    out = matmul_raw(db.data, query_k)       # (num_per, n2, n1, 2, d)
    return out.transpose(0, 2, 1, 3, 4)
