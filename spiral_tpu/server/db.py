"""Database encoding and layout (ref: src/spiral.cpp:1028-1172 load_db).

The plaintext database is total_n records, each an n0 x n2 matrix of
polynomials mod p_db.  Records are centered mod p, lifted to R_Q, NTT'd,
and arranged with the NTT slot z as the leading batch axis and the
first-dimension index contiguous in the contraction axis:

    db[i (num_per), c (n2), j*n0+m (K), limb, z]

which is the jnp-native analog of the reference's packed z-major layout
(spiral.cpp:1138-1154); the contraction axis K = dim0*n0 feeds the
first-dimension multiply directly.

The num_per axis stores further-index ii at position bitrev(ii) so that
GSW fold rounds pair ADJACENT rows (see server/fold.py) — the layout
choice that makes folding shardable over a device mesh.
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


def bitrev_perm(n: int) -> np.ndarray:
    """perm[pos] = further-index stored at pos (bit-reversal, self-inverse)."""
    bits = n.bit_length() - 1
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i] = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
    return out


def random_db(params: Params, rng: np.random.Generator) -> np.ndarray:
    """Host plaintexts: (total_n, n0, n2, d) ints in [0, p_db)."""
    return rng.integers(
        0, params.p_db,
        size=(params.total_n, params.n0, params.n2, params.poly_len),
        dtype=np.int64)


def encode_db_chunked(pts: np.ndarray, params: Params,
                      chunk_items: int = 8192) -> EncodedDb:
    """Streaming encode for large databases: upload each block as centered
    int16/int32 plaintexts (2-4 B/coeff instead of 8 B of residues — host
    link bandwidth is the ingest bottleneck), then lift + NTT + relayout
    in one jitted device program per block."""
    import jax

    p_db = params.p_db
    num_per, dim0, n0, n2, d = (params.num_per, params.dim0, params.n0,
                                params.n2, params.poly_len)
    eng = crt_ntt(d)
    small = p_db <= (1 << 15)
    dtype = np.int16 if small else np.int32

    perm = jnp.asarray(bitrev_perm(num_per))

    @jax.jit
    def encode_block(centered):
        c = centered.astype(jnp.int32)      # |centered| <= p_db/2 < 2^19
        neg = c < 0
        limb_p = jnp.where(neg, c + np.int32(P_I), c).astype(jnp.uint32)
        limb_b = jnp.where(neg, c + np.int32(B_I), c).astype(jnp.uint32)
        res = jnp.stack([limb_p, limb_b], axis=-2)
        ntt = eng.forward(res)                  # (nb*num_per, n0, n2, 2, d)
        nb = centered.shape[0] // num_per
        t = ntt.reshape(nb, num_per, n0, n2, 2, d)
        t = t.transpose(1, 3, 0, 2, 4, 5).reshape(
            num_per, n2, nb * n0, 2, d)
        return t[perm]                  # bit-reversed row order (fold.py)

    out = jnp.zeros((num_per, n2, dim0 * n0, 2, d), dtype=jnp.uint32)
    jb = max(1, chunk_items // num_per)
    while dim0 % jb != 0:        # one block shape -> one compile
        jb -= 1
    for j0 in range(0, dim0, jb):
        j1 = j0 + jb
        block = pts[j0 * num_per:j1 * num_per]
        centered = np.where(block >= p_db // 2,
                            block.astype(np.int64) - p_db,
                            block).astype(dtype)
        out = jax.lax.dynamic_update_slice(
            out, encode_block(jnp.asarray(centered)),
            (0, 0, j0 * n0, 0, 0))
    return EncodedDb(data=out, params=params)


@dataclasses.dataclass
class ShardedLimbsDb:
    """A database already in the MXU int8-limb serving layout and already
    placed/sharded over a device mesh (row-major column order, first-dim
    rows split over the mesh's "db" axis).  Produced by the multi-host
    ingest path (dist/multihost.py), where each process encodes only its
    own row range and no host ever materialises the full database."""
    limbs: jnp.ndarray     # (2, d, K, num_per*n2*4) int8, row-sharded
    params: Params


@dataclasses.dataclass
class ImplicitDb:
    """Implicit huge-database mode (ref: src/spiral.cpp:1032-1081
    dummyWorkingSet / --random-data): a random slab covering `slab_per`
    first-dim rows is streamed `num_chunks` times by the first-dim kernel,
    so timing matches a real `num_per = slab_per * num_chunks` database
    without materialising it.  Correctness is intentionally unchecked in
    this mode (ref: exp_lut.json is_corr=false entries)."""
    slab_limbs: jnp.ndarray   # (2, d, K, slab_per*n2*4) int8, MXU layout
    slab_per: int
    num_chunks: int
    params: Params


def random_implicit_db(params: Params, rng: np.random.Generator,
                       max_slab_bytes: int = 2 << 30) -> ImplicitDb:
    """Build the random working-set slab directly in NTT-domain residues
    (uniform mod p — the NTT of a uniform DB is uniform), sized to fit
    `max_slab_bytes` of int8 MXU limbs."""
    from .firstdim import db_to_mxu_limbs

    num_per, n2, d = params.num_per, params.n2, params.poly_len
    K = params.dim0 * params.n0
    row_bytes = n2 * K * 2 * d * 4            # int8 limbs per first-dim row
    slab_per = max(1, min(num_per, max_slab_bytes // row_bytes))
    while num_per % slab_per != 0:
        slab_per -= 1
    data = np.stack([
        rng.integers(0, P_I, size=(slab_per, n2, K, d), dtype=np.uint64),
        rng.integers(0, B_I, size=(slab_per, n2, K, d), dtype=np.uint64),
    ], axis=-2).astype(np.uint32)
    slab_limbs = db_to_mxu_limbs(jnp.asarray(data))
    return ImplicitDb(slab_limbs=slab_limbs, slab_per=slab_per,
                      num_chunks=num_per // slab_per, params=params)


def random_implicit_pack_db(params: Params, rng: np.random.Generator,
                            max_slab_bytes: int = 2 << 30) -> ImplicitDb:
    """Implicit working-set slab for the pack variant: rows are the
    (trial, num_per) groups of the pack serving layout (trial-major),
    streamed num_chunks times (ref --random-data in testing.cpp:385)."""
    from .firstdim import db_to_mxu_limbs

    d = params.poly_len
    K = params.dim0
    rows = params.out_n ** 2 * params.num_per
    row_bytes = K * 2 * d * 4
    slab_rows = max(1, min(rows, max_slab_bytes // row_bytes))
    while rows % slab_rows != 0:
        slab_rows -= 1
    data = np.stack([
        rng.integers(0, P_I, size=(slab_rows, 1, K, d), dtype=np.uint64),
        rng.integers(0, B_I, size=(slab_rows, 1, K, d), dtype=np.uint64),
    ], axis=-2).astype(np.uint32)
    return ImplicitDb(slab_limbs=db_to_mxu_limbs(jnp.asarray(data)),
                      slab_per=slab_rows, num_chunks=rows // slab_rows,
                      params=params)


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
    t = t[jnp.asarray(bitrev_perm(params.num_per))]   # fold.py row order
    return EncodedDb(data=t, params=params)
