"""SpiralPack / SpiralStreamPack: the high-rate variant
(ref: src/testing.cpp:777-1155 testHighRate).

The scheme runs out_n^2 independent scalar-Regev PIR pipelines (base_dim=2
cts over 1x1-poly records) and packs the out_n^2 result ciphertexts into a
single (out_n+1) x out_n matrix ciphertext before the two-modulus modulus
switch.  Unlike the reference, the out_n^2 "trials" execute as one batched
tensor program (leading trial axis) instead of a serial loop
(ref: testing.cpp:1045-1062).
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from .params import Params, Q, get_bits_per
from .arith.ntt import crt_ntt
from .core.poly import PolyMat, add_raw, matmul_raw, sub_raw
from .core.gadget import build_gadget, gadget_invert_raw
from .crypto.keys import keygen, SecretKeys
from .crypto.encrypt import Encryptor
from .crypto.decode import Response, decode_response
from .core.rescale import rescale_array
from .crypto.query import (Query, encrypt_b_batch, reconstruct_cts,
                           _const_sigmas_ntt)
from .pir import ServerTimings
from .server.db import EncodedDb
from .server.expand import coefficient_expansion


# ---------------------------------------------------------------------------
# public params

@dataclasses.dataclass
class PackPublicParams:
    v_W: jnp.ndarray            # (out_n, out_n+1, m_conv, 2, d) packing keys
    W_exp_left: list | None
    W_exp_right: list | None
    V: PolyMat | None           # (2, 2*m_conv) conversion key
    size_bytes: int = 0


def pack_g_stop(params: Params) -> tuple[int, int]:
    """Expansion depth for the pack variant (ref: testing.cpp:797-799):
    stopround is used unconditionally."""
    import math
    ell = params.t_gsw
    num_bits = ell * params.further_dims + params.dim0
    g = max(1, math.ceil(math.log2(num_bits)))
    stop = max(1, math.ceil(math.log2(ell * params.further_dims)))
    return g, stop


import functools as _functools


@_functools.partial(jax.jit, static_argnums=(0, 1))
def _pack_setup_inner(p: Params, nonoise: bool, key, Sp_data, sr_data):
    """Module-level jit with the key material as ARGUMENTS so every
    PackClient shares one executable per (params, nonoise) — warm setup
    is a cache hit (see crypto/publicparams._pub_inner)."""
    import dataclasses as _dc
    from .crypto.publicparams import (KEYS_STAND_IN,
                                      expansion_keyswitch_matrices)
    d = p.poly_len
    out_n, m_conv = p.out_n, p.m_conv
    keys = _dc.replace(KEYS_STAND_IN, Sp=PolyMat(Sp_data, False),
                       sr=PolyMat(sr_data, False))
    enc = Encryptor(keys, d, nonoise=nonoise)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # packing keys: v_W[r] = Enc_S(row r = sr * g)  (ref: 917-925)
    g_vec = build_gadget(1, m_conv, d).to_ntt()
    s0g = g_vec.scalar_mul(keys.sr.to_ntt())   # 1 x m_conv
    ws = []
    for r, kk in enumerate(jax.random.split(k1, out_n)):
        AG = PolyMat.zeros(out_n, m_conv, d, ntt=True).place(s0g, r, 0)
        ws.append(enc.encrypt_matrix(kk, AG, n_out=out_n).data)
    v_W = jnp.stack(ws)

    W_exp_left = W_exp_right = []
    V = PolyMat.zeros(2, 2 * m_conv, d, ntt=True)
    if not p.direct_upload_first:
        g, stop = pack_g_stop(p)
        W_exp_left = expansion_keyswitch_matrices(
            enc, keys, k2, g, p.m_exp, d)
        W_exp_right = expansion_keyswitch_matrices(
            enc, keys, k3, stop + 1, p.m_exp_right, d)

        # V: col 2k = Enc(sr^2 z^k), col 2k+1 = Enc(sr z^k)
        # (ref: testing.cpp:931-943)
        bits = get_bits_per(m_conv)
        s0_ntt = keys.sr.to_ntt()
        s0sq = (s0_ntt @ s0_ntt)
        kcols = jax.random.split(k4, 2 * m_conv)
        for i in range(2 * m_conv):
            zj = 1 << (bits * (i // 2))
            base = s0sq if i % 2 == 0 else s0_ntt
            sigma = base.mul_const(zj).from_ntt()
            ct = enc.encrypt_simple_regev(kcols[i], sigma)
            V = V.place(ct, 0, i)
    return v_W, W_exp_left, W_exp_right, V


class PackClient:
    def __init__(self, params: Params, seed: int = 0, nonoise: bool = False):
        self.params = params
        self.nonoise = nonoise
        key = jax.random.key(seed)
        k_sk, self._k_pub, self._k_query = jax.random.split(key, 3)
        self.keys: SecretKeys = keygen(params, k_sk, n_val=params.out_n, k=1,
                                       nonoise=nonoise)
        self.enc = Encryptor(self.keys, params.poly_len, nonoise=nonoise)

    # -- setup ---------------------------------------------------------------
    def setup(self) -> PackPublicParams:
        from .crypto.publicparams import _pub_size
        p = self.params
        d = p.poly_len
        out_n, m_conv = p.out_n, p.m_conv
        v_W, W_exp_left, W_exp_right, V = _pack_setup_inner(
            p, self.nonoise, self._k_pub, self.keys.Sp.data,
            self.keys.sr.data)
        size = out_n * (out_n + 1) * m_conv * d * 56 // 8
        if W_exp_left:
            size += sum(_pub_size((w.rows, w.cols), d)
                        for w in list(W_exp_left) + list(W_exp_right))
            size += 2 * 2 * m_conv * d * 56 // 8
        else:
            W_exp_left = W_exp_right = None
            V = None
        return PackPublicParams(v_W=v_W, W_exp_left=W_exp_left,
                                W_exp_right=W_exp_right, V=V,
                                size_bytes=size)

    # -- query ---------------------------------------------------------------
    def query(self, idx: int) -> Query:
        p = self.params
        d = p.poly_len
        idx_dim0 = idx // p.num_per
        idx_further = idx % p.num_per
        ell = p.t_gsw
        bits_per = get_bits_per(ell)
        self._k_query, key = jax.random.split(self._k_query)

        seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
        knoise = jax.random.fold_in(key, 1)

        if not p.direct_upload_first:
            g, stop = pack_g_stop(p)
            sig = np.zeros(d, dtype=object)
            sig[2 * idx_dim0] = p.scale_k
            for i in range(p.further_dims):
                bit = (idx_further >> i) & 1
                for j in range(ell):
                    sig[2 * (i * ell + j) + 1] = bit << (bits_per * j)
            inv_first = pow(1 << g, -1, Q)
            inv_rest = pow(1 << (stop + 1), -1, Q)
            sig[0::2] = (sig[0::2] * inv_first) % Q
            sig[1::2] = (sig[1::2] * inv_rest) % Q
            sig_ntt = PolyMat.from_host(sig[None, None, :]).to_ntt().data[None]
            b = encrypt_b_batch(self.enc, knoise, seed, sig_ntt)
            return Query(seed=seed, packed_b=b,
                         size_bytes=p.bytes_per_poly)

        # SpiralStreamPack: upload first-dim scalars + GSW pairs
        # (col 2j: sr*val, col 2j+1: val — ref: testing.cpp:969-979)
        firsts = np.zeros(p.dim0, dtype=object)
        firsts[idx_dim0] = p.scale_k
        first_sig = _const_sigmas_ntt(firsts, d)
        s0_ntt = self.keys.sr.to_ntt()
        pair_sigs = []
        eng = crt_ntt(d)
        for i in range(p.further_dims):
            bit = (idx_further >> i) & 1
            for j in range(ell):
                val = bit << (bits_per * j)
                pair_sigs.append(s0_ntt.mul_const(val).data)
                pair_sigs.append(_const_sigmas_ntt(
                    np.array([val], dtype=object), d)[0])
        gsw_sig = jnp.stack(pair_sigs).reshape(
            len(pair_sigs), 1, 1, 2, d)
        sig_all = jnp.concatenate([first_sig, gsw_sig], axis=0)
        b = encrypt_b_batch(self.enc, knoise, seed, sig_all)
        nbytes = sig_all.shape[0] * p.bytes_per_poly
        return Query(seed=seed, first_b=b[:p.dim0], gsw_b=b[p.dim0:],
                     size_bytes=nbytes)

    def decode(self, resp: Response) -> np.ndarray:
        """(out_n, out_n, d) plaintext mod p_db."""
        return decode_response(resp, self.keys.Sp_centered, self.params)


# ---------------------------------------------------------------------------
# server

def encode_pack_db(pts: np.ndarray, params: Params) -> EncodedDb:
    """pts: (total_n, out_n, out_n, d) ints mod p_db ->
    (trials=out_n^2, num_per, 1, K=dim0, 2, d) NTT layout."""
    from .params import B_I, P_I
    p_db = params.p_db
    t = pts.transpose(1, 2, 0, 3).reshape(
        params.out_n ** 2, params.total_n, params.poly_len).astype(np.int64)
    centered = np.where(t >= p_db // 2, t - p_db, t)
    limb_p = np.where(centered < 0, centered + P_I, centered).astype(np.uint32)
    limb_b = np.where(centered < 0, centered + B_I, centered).astype(np.uint32)
    res = jnp.asarray(np.stack([limb_p, limb_b], axis=-2))
    ntt = crt_ntt(params.poly_len).forward(res)     # (T, total_n, 2, d)
    v = ntt.reshape(params.out_n ** 2, params.dim0, params.num_per, 2,
                    params.poly_len)
    v = v.transpose(0, 2, 1, 3, 4)                  # (T, num_per, dim0, 2, d)
    from .server.db import bitrev_perm
    v = v[:, jnp.asarray(bitrev_perm(params.num_per))]   # fold row order
    return EncodedDb(data=v[:, :, None, :, :, :], params=params)


def regev_to_simple_gsw(cv, V, params: Params):
    """cv: (nu2*ell, 2, 1, 2, d) NTT -> (nu2, 2, 2*ell, 2, d) GSW cts
    (ref: testing.cpp:108-140)."""
    eng = crt_ntt(params.poly_len)
    ell = params.t_gsw
    m_conv = params.m_conv
    c_coeff = eng.inverse(cv)
    ginv = eng.forward(gadget_invert_raw(c_coeff, 2 * m_conv, 2))
    tmp = matmul_raw(V, ginv)                       # (nu2*ell, 2, 1, 2, d)
    # interleave cols: even = tmp, odd = cv
    pair = jnp.stack([tmp[..., 0, :, :], cv[..., 0, :, :]], axis=2)
    # pair: (nu2*ell, 2[row], 2[col-pair], 2, d)
    out = pair.reshape(params.further_dims, ell, 2, 2, 2, params.poly_len)
    out = out.transpose(0, 2, 1, 3, 4, 5).reshape(
        params.further_dims, 2, 2 * ell, 2, params.poly_len)
    return out


def fold_pack_rounds(cts_coeff, q_pos, q_neg, params: Params,
                     start_round: int = 0, num_rounds: int | None = None,
                     fused: bool | None = None):
    """cts_coeff: (T, m, 2, 1, 2, d) coeff, rows in bit-reversed
    further-index order (adjacent pairing — see server/fold.py).
    q_pos/q_neg: (nu2, 2, 2*ell, 2, d) NTT.  Unsigned gadget decomposition
    (ref: testing.cpp:596-624).  Returns the (T, m/2^rounds, ...) survivors.

    On TPU under the Pallas NTT engine this dispatches to the fused
    fold mega-kernel with the trial axis folded into the grid
    (server/fold_pallas.fold_pack_rounds_fused, bit-exact — tests);
    SPIRAL_FOLD=xla forces the unfused chain below."""
    import os
    import jax
    mode = os.environ.get("SPIRAL_FOLD", "")
    if mode != "xla" and fused is not False:
        from .server.fold_pallas import (fold_fused_supported,
                                         fold_pack_rounds_fused)
        if fold_fused_supported(params) and (
                fused or mode in ("fused", "mxu") or
                jax.default_backend() == "tpu"):
            return fold_pack_rounds_fused(cts_coeff, q_pos, q_neg, params,
                                          start_round=start_round,
                                          num_rounds=num_rounds)
    eng = crt_ntt(params.poly_len)
    ell = params.t_gsw
    m = cts_coeff.shape[1]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    for r in range(start_round, start_round + rounds):
        m //= 2
        pairs = jnp.concatenate([cts_coeff[:, 0::2], cts_coeff[:, 1::2]],
                                axis=1)
        g = eng.forward(gadget_invert_raw(pairs, 2 * ell, 2))
        prod = add_raw(matmul_raw(q_neg[r], g[:, :m]),
                       matmul_raw(q_pos[r], g[:, m:]))
        cts_coeff = eng.inverse(prod)
    return cts_coeff


def fold_pack(cts_coeff, q_pos, q_neg, params: Params,
              start_round: int = 0, fused: bool | None = None):
    return fold_pack_rounds(cts_coeff, q_pos, q_neg, params,
                            start_round=start_round,
                            fused=fused)[:, 0]   # (T, 2, 1, 2, d)


def pack_ciphertexts(result_cts, v_W, params: Params,
                     fused: bool | None = None):
    """result_cts: (T=out_n^2, 2, 1, 2, d) coeff, trial (r, c) at r*out_n+c.
    v_W: (out_n, out_n+1, m_conv, 2, d).  Returns (out_n+1, out_n, 2, d) NTT
    (ref: testing.cpp:198-241).

    On TPU under the Pallas NTT engine this dispatches to the fused
    packing kernel (server/pack_pallas.py, bit-exact — tests);
    SPIRAL_PACK=xla forces the unfused chain, fused=False pins it
    (vmapped batch callers)."""
    import os
    import jax as _jax
    mode = os.environ.get("SPIRAL_PACK", "")
    if mode != "xla" and fused is not False:
        from .server.pack_pallas import (pack_ciphertexts_fused,
                                         pack_fused_supported)
        if pack_fused_supported(params) and (
                fused or mode == "fused" or
                _jax.default_backend() == "tpu"):
            return pack_ciphertexts_fused(result_cts, v_W, params)
    eng = crt_ntt(params.poly_len)
    out_n, m_conv, d = params.out_n, params.m_conv, params.poly_len
    ct1 = result_cts[:, 0:1]
    ct2_ntt = eng.forward(result_cts[:, 1:2])        # (T, 1, 1, 2, d)
    ginv = eng.forward(gadget_invert_raw(ct1, m_conv, 1))
    ginv = ginv.reshape(out_n, out_n, m_conv, 1, 2, d)
    prod = matmul_raw(v_W[:, None], ginv)            # (out_n, out_n, out_n+1, 1, 2, d)
    acc = prod[0]
    for r in range(1, out_n):
        acc = add_raw(acc, prod[r])                  # (out_n, out_n+1, 1, 2, d)
    ct2 = ct2_ntt.reshape(out_n, out_n, 1, 2, d)
    # embed[c, 1 + r, 0] = ct2[r, c, 0]: one transpose + zero column
    # (vectorized; a per-row .at[].set loop is O(out_n) device ops)
    ct2_t = ct2[:, :, 0].transpose(1, 0, 2, 3)       # (out_n_c, out_n, 2, d)
    embed = jnp.concatenate(
        [jnp.zeros_like(ct2_t[:, :1]), ct2_t], axis=1)[:, :, None]
    v_int = add_raw(acc, embed)                      # (out_n_c, out_n+1, 1, 2, d)
    return v_int[:, :, 0].transpose(1, 0, 2, 3)      # (out_n+1, out_n, 2, d)


class PackServer:
    """Jitted per-stage pipeline (mirrors SpiralServer's structure).

    With `mesh`, the database is row-sharded over (trial, num_per) groups:
    the first-dim multiply runs with zero collectives per device shard
    (see spiral_tpu.dist.shard)."""

    def __init__(self, params: Params, db, pub: PackPublicParams,
                 mesh=None):
        from .server.db import ImplicitDb
        self.params = params
        self.db = db
        self.pub = pub
        self.mesh = mesh
        d = params.poly_len
        self._gadget_ntt = build_gadget(
            2, 2 * params.t_gsw, d).to_ntt().data
        self._eng = crt_ntt(d)
        self._trials = params.out_n ** 2
        self._num_per = params.num_per
        if isinstance(db, ImplicitDb):
            # huge-DB implicit mode (ref --random-data): the slab streams
            # num_chunks times through the same MXU kernel
            if mesh is not None:
                raise ValueError("implicit pack DB does not support mesh")
            self._implicit_chunks = db.num_chunks
            self._db_limbs = db.slab_limbs
        else:
            # int8 limb layout for the MXU first-dim kernel: fold the
            # trial axis into the output dimension
            from .server.firstdim import db_to_mxu_limbs
            self._implicit_chunks = 0
            T, num_per = db.data.shape[0], db.data.shape[1]
            self._trials, self._num_per = T, num_per
            flat = db.data.reshape(T * num_per, 1, params.dim0, 2, d)
            if mesh is not None:
                from .dist.shard import shard_db_limbs
                self._db_limbs = shard_db_limbs(
                    db_to_mxu_limbs(flat, row_major=True), mesh)
            else:
                self._db_limbs = db_to_mxu_limbs(flat)
        self._build_stages()

    def _build_stages(self):
        p = self.params
        eng = self._eng
        pub = self.pub
        gadget_ntt = self._gadget_ntt

        def expand(seed, packed_b, fused=None):
            packed_ct = reconstruct_cts(seed, packed_b)[0]
            g, stop = pack_g_stop(p)
            ell = p.t_gsw
            cv = coefficient_expansion(
                packed_ct, g, [w.data for w in pub.W_exp_left],
                [w.data for w in pub.W_exp_right], p,
                max_bits_to_gen_right=ell * p.further_dims, stopround=stop,
                fused=fused)
            return cv[0::2][:p.dim0], cv[1::2][:ell * p.further_dims]

        def conv(gsw_src):
            q_pos = regev_to_simple_gsw(gsw_src, pub.V.data, p)
            return _neg_pair(q_pos)

        def reconstruct_direct(seed, first_b, gsw_b):
            b = jnp.concatenate([first_b, gsw_b], axis=0)
            cts = reconstruct_cts(seed, b)
            return cts[:p.dim0], cts[p.dim0:]

        def conv_direct(gsw_cts):
            ell = p.t_gsw
            pair = gsw_cts.reshape(p.further_dims, ell, 2, 2, 1, 2,
                                   p.poly_len)
            # (nu2, ell, pair, row, 2, d) -> rows out, cols 2j+pair
            q_pos = pair[:, :, :, :, 0].transpose(0, 3, 1, 2, 4, 5).reshape(
                p.further_dims, 2, 2 * ell, 2, p.poly_len)
            return _neg_pair(q_pos)

        def _neg_pair(q_pos):
            # slot s selects bit nu2-1-s (ref: testing.cpp:615-619)
            q_pos = q_pos[::-1]
            q_neg = sub_raw(jnp.broadcast_to(gadget_ntt, q_pos.shape), q_pos)
            return q_pos, q_neg

        mesh = self.mesh
        if mesh is not None:
            # DB-streaming multiply sharded over (trial, row) groups with
            # zero collectives; the tiny per-row outputs are gathered and
            # fold/pack run replicated (their cost is per-trial small —
            # the DB-dependent scaling lives in the fdim stage)
            import functools as _ft
            from jax.sharding import PartitionSpec as _P
            from .server.firstdim import multiply_query_by_db_mxu as _mxu

            @_ft.partial(jax.shard_map, mesh=mesh,
                         in_specs=(_P(None, None, None, "db"), _P()),
                         out_specs=_P(), check_vma=False)
            def _fdim_local(dbs, qk):
                res = _mxu(dbs, qk, row_major=True)
                return jax.lax.all_gather(res, "db", axis=3, tiled=True)

        n_chunks = self._implicit_chunks

        # single-device explicit DB: the fused Pallas fdim kernel (matmul
        # + limb recombination in VMEM) when shapes allow, exactly as in
        # SpiralServer (the same j-major limb layout is built above)
        import os as _os
        _mode = _os.environ.get("SPIRAL_FDIM", "")
        use_fused = False
        if mesh is None and not self._implicit_chunks and _mode != "xla":
            from .server.firstdim import fused_fdim_supported
            use_fused = (fused_fdim_supported(self._db_limbs) and
                         (_mode == "fused" or
                          jax.default_backend() == "tpu"))

        def fdim(db_limbs, first):
            from .server.firstdim import (multiply_query_by_db_fused,
                                          multiply_query_by_db_implicit,
                                          multiply_query_by_db_mxu)
            qk = first[:, :, 0]            # (K=dim0, C=ct rows, 2, d)
            if n_chunks:
                res = multiply_query_by_db_implicit(db_limbs, qk, n_chunks)
            elif mesh is not None:
                res = _fdim_local(db_limbs, qk)
            elif use_fused:
                res = multiply_query_by_db_fused(db_limbs, qk)
            else:
                res = multiply_query_by_db_mxu(db_limbs, qk)
            T, npr = self._trials, self._num_per
            v = res.reshape(2, p.poly_len, 2, T, npr)
            cts_ntt = v.transpose(3, 4, 2, 0, 1)[:, :, :, None]
            return eng.inverse(cts_ntt)

        def fold(cts_coeff, q_pos, q_neg, fused=None):
            return fold_pack(cts_coeff, q_pos, q_neg, p, fused=fused)

        def pack_stage(result, fused=None):
            packed = pack_ciphertexts(result, pub.v_W, p, fused=fused)
            coeff = eng.inverse(packed)    # (out_n+1, out_n, 2, d)
            from .crypto.decode import modswitch_device
            return modswitch_device(coeff, p)

        self._stage_expand = jax.jit(expand)
        self._stage_reconstruct = jax.jit(reconstruct_direct)
        self._stage_conv = jax.jit(conv)
        self._stage_conv_direct = jax.jit(conv_direct)
        self._stage_fdim = jax.jit(fdim)
        self._stage_fold = jax.jit(fold)
        self._stage_pack = jax.jit(pack_stage)

        # multi-query batch (same design as SpiralServer): DB streams once
        # per batch through a widened MXU lhs; everything else vmaps
        if mesh is not None:
            from .server.firstdim import (
                multiply_query_by_db_mxu_batch as _mxu_b)

            @_ft.partial(jax.shard_map, mesh=mesh,
                         in_specs=(_P(None, None, None, "db"), _P()),
                         out_specs=_P(), check_vma=False)
            def _fdim_local_batch(dbs, qk_b):
                res = _mxu_b(dbs, qk_b, row_major=True)
                return jax.lax.all_gather(res, "db", axis=4, tiled=True)

        def fdim_batch(db_limbs, first_b):
            from .server.firstdim import multiply_query_by_db_mxu_batch
            qk = first_b[:, :, :, 0]       # (B, K=dim0, rows=2, 2, d)
            if mesh is not None:
                res = _fdim_local_batch(db_limbs, qk)
            else:
                res = multiply_query_by_db_mxu_batch(db_limbs, qk)
            T, npr = self._trials, self._num_per
            B = qk.shape[0]
            v = res.reshape(2, p.poly_len, B, 2, T, npr)
            cts_ntt = v.transpose(2, 4, 5, 3, 0, 1)[:, :, :, :, None]
            return eng.inverse(cts_ntt)    # (B, T, np, 2, 1, 2, d)

        def full_packed_batch(db_limbs, seeds, packed_bs):
            first_b, gsw_src_b = jax.vmap(
                lambda s, b: expand(s, b, fused=False))(seeds, packed_bs)
            q_pos_b, q_neg_b = jax.vmap(conv)(gsw_src_b)
            cts_b = fdim_batch(db_limbs, first_b)
            results = _fold_batch(cts_b, q_pos_b, q_neg_b)
            return jax.vmap(lambda r: pack_stage(r, fused=False))(results)

        def _fold_batch(cts_b, q_pos_b, q_neg_b):
            # batched fused fold (per-query q blocks in the kernel grid)
            # on TPU; vmapped unfused chain elsewhere (a gridded
            # pallas_call is not vmappable)
            import os as _os
            if _os.environ.get("SPIRAL_FOLD", "") != "xla":
                from .server.fold_pallas import (_fold_digit_mode,
                                                 fold_fused_supported,
                                                 fold_pack_rounds_fused_batch)
                if fold_fused_supported(p) and \
                        _fold_digit_mode(p.t_gsw, signed=False)[0] == "i8u" \
                        and jax.default_backend() == "tpu":
                    return fold_pack_rounds_fused_batch(
                        cts_b, q_pos_b, q_neg_b, p)[:, :, 0]
            return jax.vmap(lambda c, qp, qn: fold(c, qp, qn,
                                                   fused=False))(
                cts_b, q_pos_b, q_neg_b)

        def full_direct_batch(db_limbs, seeds, first_bs, gsw_bs):
            first_b, gsw_cts_b = jax.vmap(reconstruct_direct)(
                seeds, first_bs, gsw_bs)
            q_pos_b, q_neg_b = jax.vmap(conv_direct)(gsw_cts_b)
            cts_b = fdim_batch(db_limbs, first_b)
            results = _fold_batch(cts_b, q_pos_b, q_neg_b)
            return jax.vmap(lambda r: pack_stage(r, fused=False))(results)

        self._stage_full_packed_batch = jax.jit(full_packed_batch)
        self._stage_full_direct_batch = jax.jit(full_direct_batch)

    @staticmethod
    def _to_response(rows):
        from .crypto.decode import response_from_device_rows
        return response_from_device_rows(*rows)

    def process_query(self, query: Query):
        timings = ServerTimings()
        t0 = time.perf_counter()
        seed = jnp.int32(query.seed)
        if query.packed_b is not None:
            first, gsw_src = self._stage_expand(seed, query.packed_b)
            first.block_until_ready()
            t1 = time.perf_counter()
            timings.expansion_us = (t1 - t0) * 1e6
            q_pos, q_neg = self._stage_conv(gsw_src)
        else:
            first, gsw_cts = self._stage_reconstruct(
                seed, query.first_b, query.gsw_b)
            t1 = time.perf_counter()
            q_pos, q_neg = self._stage_conv_direct(gsw_cts)
        q_neg.block_until_ready()
        t2 = time.perf_counter()
        timings.conversion_us = (t2 - t1) * 1e6

        cts_coeff = self._stage_fdim(self._db_limbs, first)
        cts_coeff.block_until_ready()
        t3 = time.perf_counter()
        timings.first_multiply_us = (t3 - t2) * 1e6

        result = self._stage_fold(cts_coeff, q_pos, q_neg)
        result.block_until_ready()
        t4 = time.perf_counter()
        timings.folding_us = (t4 - t3) * 1e6

        rows = self._stage_pack(result)
        rows[1].block_until_ready()
        rows[0].block_until_ready()
        t5 = time.perf_counter()
        timings.packing_us = (t5 - t4) * 1e6
        return self._to_response(rows), timings

    def process_query_batch(self, queries: list[Query]):
        """Serve a batch of pack queries in one dispatch (DB streamed once).
        Returns (list[Response], seconds)."""
        assert queries, "empty batch"
        if self._implicit_chunks:
            raise ValueError(
                "batched serving requires the explicit MXU database layout")
        seeds = jnp.asarray([q.seed for q in queries], dtype=jnp.int32)
        if queries[0].packed_b is not None:
            packed = jnp.stack([q.packed_b for q in queries])
            run = lambda: self._stage_full_packed_batch(
                self._db_limbs, seeds, packed)
        else:
            firsts = jnp.stack([q.first_b for q in queries])
            gsws = jnp.stack([q.gsw_b for q in queries])
            run = lambda: self._stage_full_direct_batch(
                self._db_limbs, seeds, firsts, gsws)
        run()[1].block_until_ready()       # warm/compile
        t0 = time.perf_counter()
        first_b, rest_b = jax.device_get(run())   # timed until host fetch
        dt = time.perf_counter() - t0
        responses = [self._to_response((first_b[i], rest_b[i]))
                     for i in range(len(queries))]
        return responses, dt

    def _run_single(self, query: Query):
        """One async-dispatched query -> modswitched device rows."""
        seed = jnp.int32(query.seed)
        if query.packed_b is not None:
            first, gsw_src = self._stage_expand(seed, query.packed_b)
            q_pos, q_neg = self._stage_conv(gsw_src)
        else:
            first, gsw_cts = self._stage_reconstruct(
                seed, query.first_b, query.gsw_b)
            q_pos, q_neg = self._stage_conv_direct(gsw_cts)
        cts = self._stage_fdim(self._db_limbs, first)
        return self._stage_pack(self._stage_fold(cts, q_pos, q_neg))

    def process_query_fused(self, query: Query):
        """Async-chained pipeline (one host round trip + device compute).
        Timed until the response rows reach the host (see
        SpiralServer.process_query_fused)."""
        self._run_single(query)[1].block_until_ready()   # warm/compile
        t0 = time.perf_counter()
        rows = jax.device_get(self._run_single(query))
        t1 = time.perf_counter()
        return self._to_response(rows), (t1 - t0)
