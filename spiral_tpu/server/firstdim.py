"""First-dimension multiply: the rate-limiting database-streaming kernel
(ref: src/spiral.cpp:628-999 multiplyQueryByDatabase).

out[i, r, c] = sum_{j,m} Q[j*n0+m, r] * DB[i, c, j*n0+m]   (per limb, per z)

Two implementations:

* matmul_raw path — portable u32 half-product contraction (VPU).
* MXU path — each 28-bit residue splits into four 7-bit limbs; the whole
  per-slot contraction becomes ONE batched int8 matmul with int32
  accumulation (exact: products <= 127^2, K <= 2^17), with the limb index
  folded into the matmul M/N dims.  This is the TPU-native redesign of the
  reference's packed-u64 AVX-512 kernel: the MXU replaces _mm512_mul_epu32
  and the limb recombination replaces the per-64-term Barrett pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I
from ..arith.mod import mod_ctx
from ..core.poly import matmul_raw
from .db import EncodedDb

LIMB_BITS = 7
N_LIMBS = 4


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


# ---------------------------------------------------------------------------
# MXU int8-limb path

def _to_limbs_i8(v, axis_last: bool = True):
    """u32 residues -> stacked 7-bit limbs as int8 on a new trailing axis."""
    limbs = [((v >> (LIMB_BITS * j)) & jnp.uint32(0x7F)).astype(jnp.int8)
             for j in range(N_LIMBS)]
    return jnp.stack(limbs, axis=-1)


@functools.partial(jax.jit, static_argnames=("row_major", "shards"))
def db_to_mxu_limbs(db_data, row_major: bool = False, shards: int = 0):
    """(num_per, n2, K, 2, d) u32 -> (2, d, K, N_LIMBS*num_per*n2) int8.

    Default column order is limb-MAJOR (j, row): the recombination then
    slices whole row-blocks per limb pair — the layout the fused Pallas
    kernel needs (Mosaic cannot split the minor axis below 128 lanes).
    row_major=True emits (row, j) columns instead — required when the
    column axis is row-sharded over a device mesh (dist/shard.py).
    shards=S emits (shard, j, row_local, c) columns: splitting the
    column axis over S devices then yields a LIMB-MAJOR mini-DB per
    shard, so the fused Pallas kernel runs under the mesh whenever the
    per-shard column count num_per*n2/S is a multiple of 128
    (VERDICT r4 next #4)."""
    num_per, n2, K = db_data.shape[0], db_data.shape[1], db_data.shape[2]
    d = db_data.shape[-1]
    limbs = _to_limbs_i8(db_data)            # (num_per, n2, K, 2, d, 4)
    if shards:
        assert not row_major and num_per % shards == 0
        v = limbs.reshape(shards, num_per // shards, n2, K, 2, d, N_LIMBS)
        t = v.transpose(4, 5, 3, 0, 6, 1, 2)    # (2, d, K, S, 4, npl, n2)
    elif row_major:
        t = limbs.transpose(3, 4, 2, 0, 1, 5)   # (2, d, K, np, n2, 4)
    else:
        t = limbs.transpose(3, 4, 2, 5, 0, 1)   # (2, d, K, 4, np, n2)
    return t.reshape(2, d, K, N_LIMBS * num_per * n2)


def _mxu_contract(db_limbs, lhs, G: int,
                  row_major: bool = False) -> jnp.ndarray:
    """Shared MXU contraction + limb recombination.

    db_limbs: (2, d, K, N=4*m) int8, columns limb-major (j, row) by
    default / (row, j) when row_major; lhs: (2, d, G*4, K) int8 query
    limbs (limb axis fastest within each group of 4 rows).
    Returns (2, d, G, m) u32 residues."""
    crt, d, K, N = db_limbs.shape
    m = N // N_LIMBS

    # batched int8 matmul, exact in int32: (2, d, G*4, K) @ (2, d, K, N)
    out = jax.lax.dot_general(
        lhs, db_limbs,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)    # (2, d, G*4, N)

    if row_major:
        out = out.reshape(crt, d, G, N_LIMBS, m, N_LIMBS)
        out = jnp.moveaxis(out, -1, -2)      # -> (..., i, j, m)
    else:
        out = out.reshape(crt, d, G, N_LIMBS, N_LIMBS, m)
    results = []
    for li, p in enumerate((P_I, B_I)):
        ctx = mod_ctx(p)
        o = out[li]                           # (d, G, i, j, m)
        acc = None
        for s in range(2 * N_LIMBS - 1):
            # S_s = sum over limb pairs with i+j == s; |pairs| <= 4,
            # each entry < K*127^2 so the s32 sum stays positive
            terms = [o[:, :, i, s - i]
                     for i in range(max(0, s - N_LIMBS + 1),
                                    min(N_LIMBS, s + 1))]
            S = terms[0]
            for t in terms[1:]:
                S = S + t
            r = ctx.reduce_u32(S.astype(jnp.uint32))
            w = (1 << (LIMB_BITS * s)) % p
            ws = (w << 32) // p
            r = ctx.mul_shoup(r, jnp.uint32(w), jnp.uint32(ws))
            acc = r if acc is None else ctx.add(acc, r)
        results.append(acc)                   # (d, G, m)
    return jnp.stack(results)                 # (2, d, G, m)


# ---------------------------------------------------------------------------
# Fused Pallas first-dim kernel: int8 matmul + limb recombination in one
# kernel, so the int32 product tensor (4x the output bytes) never touches
# HBM and the database streams once at full bandwidth
# (ref kernel being beaten: src/spiral.cpp:640-745 AVX-512).

_BD = 8   # NTT slots per kernel invocation


def _solinas_reduce(v, p: int):
    """v mod p for u32 v and p = 2^28 - c: fold the high bits down with
    v = hi*2^28 + lo ≡ lo + hi*c, once or twice until the one-subtract
    bound holds (both CRT moduli need <= 2 folds)."""
    c = (1 << 28) - p
    mask = jnp.uint32((1 << 28) - 1)
    pp = jnp.uint32(p)
    s = (v & mask) + (v >> 28) * jnp.uint32(c)
    bound = (1 << 28) + 16 * c
    if bound >= 2 * p:
        s = (s & mask) + (s >> 28) * jnp.uint32(c)
        assert (1 << 28) + (bound >> 28) * c < 2 * p
    return jnp.where(s >= pp, s - pp, s)


def _mul_shoup_k(y, w: int, p: int):
    """y*w mod p, w constant (Shoup); carry-safe 16-bit-split umulhi."""
    ws = (w << 32) // p
    a0 = y & jnp.uint32(0xFFFF)
    a1 = y >> 16
    b0 = jnp.uint32(ws & 0xFFFF)
    b1 = jnp.uint32(ws >> 16)
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    t = (lo >> 16) + (m1 & jnp.uint32(0xFFFF)) + (m2 & jnp.uint32(0xFFFF))
    q = a1 * b1 + (m1 >> 16) + (m2 >> 16) + (t >> 16)
    pp = jnp.uint32(p)
    r = jnp.uint32(w) * y - q * pp
    return jnp.where(r >= pp, r - pp, r)


def _fdim_fused_kernel(G: int, m: int):
    def one_limb(out, p: int):
        # out: (BD, 4G, 4m) int32, rows (i, g) i-major, cols (j, row)
        # j-major; per weight s = i + j sum the <=4 diagonal blocks,
        # reduce, scale by 2^{7s}, accumulate mod p
        acc = None
        for s in range(2 * N_LIMBS - 1):
            blocks = [out[:, i * G:(i + 1) * G,
                          (s - i) * m:(s - i + 1) * m]
                      for i in range(max(0, s - N_LIMBS + 1),
                                     min(N_LIMBS, s + 1))]
            S = blocks[0]
            for t in blocks[1:]:
                S = S + t
            r = _solinas_reduce(S.astype(jnp.uint32), p)
            w = (1 << (LIMB_BITS * s)) % p
            if w != 1:
                r = _mul_shoup_k(r, w, p)
            if acc is None:
                acc = r
            else:
                pp = jnp.uint32(p)
                t2 = acc + r
                acc = jnp.where(t2 >= pp, t2 - pp, t2)
        return acc

    def kernel(db_ref, lhs_ref, o_ref):
        li = pl.program_id(0)
        out = jax.lax.dot_general(
            lhs_ref[0], db_ref[0],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)     # (BD, 4G, 4m)

        @pl.when(li == 0)
        def _():
            o_ref[0] = one_limb(out, P_I)

        @pl.when(li == 1)
        def _():
            o_ref[0] = one_limb(out, B_I)

    return kernel


def fused_fdim_supported_shape(shape) -> bool:
    """Mosaic constraints for the fused kernel on a (2, d, K, 4m) limb
    tensor: the recombination slices the lane axis in whole m-column
    blocks (>= 128 lanes each), and the grid tiles d by _BD."""
    crt, d, K, N = shape
    m = N // N_LIMBS
    return m % 128 == 0 and d % _BD == 0 and K % 8 == 0


def fused_fdim_supported(db_limbs) -> bool:
    return fused_fdim_supported_shape(db_limbs.shape)


def multiply_query_by_db_fused(db_limbs, query_k,
                               interpret: bool | None = None) -> jnp.ndarray:
    """Fused-kernel version of multiply_query_by_db_mxu (identical output,
    j-major layout required).  db_limbs: (2, d, K, N=4m) int8;
    query_k: (K, n1, 2, d) u32.  Returns (2, d, n1, m) u32."""
    import jax as _jax
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    crt, d, K, N = db_limbs.shape
    n1 = query_k.shape[1]
    m = N // N_LIMBS
    q_limbs = _to_limbs_i8(query_k)            # (K, n1, 2, d, 4)
    lhs = q_limbs.transpose(2, 3, 4, 1, 0)     # (2, d, 4, n1, K) i-major
    lhs = lhs.reshape(crt, d, N_LIMBS * n1, K)

    kernel = _fdim_fused_kernel(n1, m)
    return pl_.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((crt, d, n1, m), jnp.uint32),
        grid=(crt, d // _BD),
        in_specs=[
            pl_.BlockSpec((1, _BD, K, N), lambda li, zb: (li, zb, 0, 0),
                          memory_space=pltpu.VMEM),
            pl_.BlockSpec((1, _BD, N_LIMBS * n1, K),
                          lambda li, zb: (li, zb, 0, 0),
                          memory_space=pltpu.VMEM),
        ],
        out_specs=pl_.BlockSpec((1, _BD, n1, m),
                                lambda li, zb: (li, zb, 0, 0),
                                memory_space=pltpu.VMEM),
        interpret=interpret,
    )(db_limbs, lhs)


def multiply_query_by_db_mxu(db_limbs, query_k,
                             row_major: bool = False) -> jnp.ndarray:
    """db_limbs: (2, d, K, N=4*num_per*n2) int8 from db_to_mxu_limbs.
    query_k: (K, n1, 2, d) u32 NTT residues.
    Returns (2, d, n1, num_per*n2) u32."""
    crt, d, K, N = db_limbs.shape
    n1 = query_k.shape[1]
    q_limbs = _to_limbs_i8(query_k)          # (K, n1, 2, d, 4)
    lhs = q_limbs.transpose(2, 3, 1, 4, 0)   # (2, d, n1, 4, K)
    lhs = lhs.reshape(crt, d, n1 * N_LIMBS, K)
    return _mxu_contract(db_limbs, lhs, n1, row_major=row_major)


def multiply_query_by_db_mxu_batch(db_limbs, query_k_b,
                                   row_major: bool = False) -> jnp.ndarray:
    """Multi-query first-dim multiply: the database (the huge HBM operand)
    streams ONCE for the whole batch; the MXU lhs grows to B*n1*4 rows.
    TPU-native aggregate-throughput feature — the reference processes one
    query at a time (ref: src/spiral.cpp:628 has no batch axis).

    query_k_b: (B, K, n1, 2, d).  Returns (2, d, B, n1, num_per*n2)."""
    crt, d, K, N = db_limbs.shape
    B, _, n1 = query_k_b.shape[:3]
    q_limbs = _to_limbs_i8(query_k_b)          # (B, K, n1, 2, d, 4)
    lhs = q_limbs.transpose(3, 4, 0, 2, 5, 1)  # (2, d, B, n1, 4, K)
    lhs = lhs.reshape(crt, d, B * n1 * N_LIMBS, K)
    res = _mxu_contract(db_limbs, lhs, B * n1,
                        row_major=row_major)    # (2, d, B*n1, m)
    return res.reshape(crt, d, B, n1, N // N_LIMBS)


def _implicit_chunks_loop(slab_limbs, query_k, num_chunks: int, offset):
    """Stream the slab `num_chunks` times starting at global chunk index
    `offset` (traced), stacking each chunk's outputs."""
    crt, d, K, Ns = slab_limbs.shape
    n1 = query_k.shape[1]
    m_slab = Ns // N_LIMBS
    out = jnp.zeros((num_chunks, crt, d, n1, m_slab), dtype=jnp.uint32)

    def body(i, out):
        # the slot-roll makes the body i-dependent so XLA's loop-invariant
        # code motion cannot hoist the matmul out of the loop (the slab is
        # random data; per-chunk results are never decoded in this mode)
        qk = jnp.roll(query_k, offset + i, axis=-1)
        res = multiply_query_by_db_mxu(slab_limbs, qk)
        return jax.lax.dynamic_update_index_in_dim(out, res, i, axis=0)

    out = jax.lax.fori_loop(0, num_chunks, body, out)
    return out.transpose(1, 2, 3, 0, 4).reshape(
        crt, d, n1, num_chunks * m_slab)


def _implicit_chunks_loop_batch(slab_limbs, query_k_b, num_chunks: int,
                                offset):
    """Batched _implicit_chunks_loop: the slab streams num_chunks times
    with the whole batch folded into the MXU lhs (the aggregate-
    throughput win region for huge DBs — VERDICT r4 next #5)."""
    crt, d, K, Ns = slab_limbs.shape
    B, _, n1 = query_k_b.shape[:3]
    m_slab = Ns // N_LIMBS
    # accumulator keeps (B*n1) merged so the second-minor dim is a
    # sublane multiple — a (..., B, n1, m) layout pads n1 3->8 in HBM
    # (2.7x) and OOM'd the chip at spiral_24 B=8
    out = jnp.zeros((num_chunks, crt, d, B * n1, m_slab),
                    dtype=jnp.uint32)

    def body(i, out):
        qk = jnp.roll(query_k_b, offset + i, axis=-1)
        res = multiply_query_by_db_mxu_batch(slab_limbs, qk)
        return jax.lax.dynamic_update_index_in_dim(
            out, res.reshape(crt, d, B * n1, m_slab), i, axis=0)

    out = jax.lax.fori_loop(0, num_chunks, body, out)
    return out.transpose(1, 2, 3, 0, 4).reshape(
        crt, d, B, n1, num_chunks * m_slab)


@functools.partial(jax.jit, static_argnames=("num_chunks",))
def multiply_query_by_db_implicit_batch(slab_limbs, query_k_b,
                                        num_chunks: int):
    """Batched implicit first-dim multiply: (B, K, n1, 2, d) queries ->
    (2, d, B, n1, num_per*n2)."""
    return _implicit_chunks_loop_batch(slab_limbs, query_k_b, num_chunks,
                                       jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("num_chunks",))
def multiply_query_by_db_implicit(slab_limbs, query_k, num_chunks: int):
    """Implicit-DB first-dim multiply (ref: spiral.cpp:647 kernel index
    override under --random-data): stream the same slab `num_chunks` times,
    writing each chunk's outputs to its own slice — the arithmetic and HBM
    traffic per chunk match a real database pass.

    slab_limbs: (2, d, K, slab_per*n2*4); returns (2, d, n1, num_per*n2)."""
    return _implicit_chunks_loop(slab_limbs, query_k, num_chunks,
                                 jnp.int32(0))


def finish_mxu_output(res, num_per: int, n2: int):
    """(2, d, n1, num_per*n2) -> (num_per, n1, n2, 2, d)."""
    crt, d, n1, _ = res.shape
    v = res.reshape(crt, d, n1, num_per, n2)
    return v.transpose(3, 2, 4, 0, 1)


def finish_mxu_output_batch(res, num_per: int, n2: int):
    """(2, d, B, n1, num_per*n2) -> (B, num_per, n1, n2, 2, d)."""
    crt, d, B, n1, _ = res.shape
    v = res.reshape(crt, d, B, n1, num_per, n2)
    return v.transpose(2, 4, 3, 5, 0, 1)
