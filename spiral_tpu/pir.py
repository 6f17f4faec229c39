"""High-level PIR API for the Spiral and SpiralStream variants.

SpiralClient owns secrets, generates public params + queries, and decodes
responses.  SpiralServer runs the full pipeline: (expansion ->)
composition -> conversion -> first-dim multiply -> folding -> modswitch.
Stage timing uses the reference's taxonomy (ref: src/spiral.cpp:209-265
print_summary) so harness logic ports directly.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from .params import Params
from .arith.ntt import crt_ntt
from .core.poly import PolyMat, matmul_raw, sub_raw
from .core.gadget import build_gadget
from .crypto.keys import keygen, SecretKeys
from .crypto.encrypt import Encryptor
from .crypto.publicparams import PublicParams, generate_public_params
from .crypto.query import Query, generate_query, reconstruct_cts
from .crypto.decode import (Response, decode_response, modswitch_device,
                            response_from_device_rows)
from .server.db import EncodedDb, ImplicitDb, ShardedLimbsDb, encode_db
from .server.expand import coefficient_expansion, reorder_from_stopround
from .server.convert import regev_to_gsw_batch, scal_to_mat_batch
from .server.firstdim import (db_to_mxu_limbs, finish_mxu_output,
                              finish_mxu_output_batch,
                              multiply_query_by_db_implicit,
                              multiply_query_by_db_mxu,
                              multiply_query_by_db_mxu_batch, reorient_query)
from .server.fold import fold_ciphertexts, fold_rounds


class SpiralClient:
    def __init__(self, params: Params, seed: int = 0, nonoise: bool = False):
        self.params = params
        self.nonoise = nonoise
        key = jax.random.key(seed)
        k_sk, self._k_pub, self._k_query = jax.random.split(key, 3)
        self.keys: SecretKeys = keygen(params, k_sk, nonoise=nonoise)
        self.enc = Encryptor(self.keys, params.poly_len, nonoise=nonoise)

    def setup(self) -> PublicParams:
        return generate_public_params(self.params, self.keys, self.enc,
                                      self._k_pub)

    def query(self, idx: int) -> Query:
        self._k_query, k = jax.random.split(self._k_query)
        return generate_query(self.params, self.enc, k, idx)

    def decode(self, resp: Response) -> np.ndarray:
        """Returns (n0, n2, d) plaintext matrix mod p_db."""
        return decode_response(resp, self.keys.Sp_centered, self.params)


@dataclasses.dataclass
class ServerTimings:
    expansion_us: float = 0.0
    composition_us: float = 0.0
    conversion_us: float = 0.0
    first_multiply_us: float = 0.0
    folding_us: float = 0.0
    packing_us: float = 0.0
    modswitch_us: float = 0.0

    @property
    def db_independent_us(self) -> float:
        return self.expansion_us + self.composition_us + self.conversion_us

    @property
    def db_dependent_us(self) -> float:
        return self.first_multiply_us + self.folding_us + self.packing_us

    @property
    def total_us(self) -> float:
        return self.db_independent_us + self.db_dependent_us + \
            self.modswitch_us


class SpiralServer:
    """Each pipeline stage is one jitted function (built lazily per server
    instance), so a query is a handful of device dispatches instead of
    hundreds of eager ops — essential for TPU latency.

    With `mesh` (a 1-D jax.sharding.Mesh, axis "db"), the database is
    row-sharded: each device holds num_per/n_dev first-dim rows and the
    rate-limiting DB-streaming multiply runs with zero collectives; the
    early fold rounds stay sharded and XLA SPMD inserts the (tiny) ct
    exchanges as the surviving count drops below the mesh size
    (SURVEY.md §2.7 — no reference counterpart, src/spiral.cpp:1231 is
    single-core)."""

    def __init__(self, params: Params, db: EncodedDb | ImplicitDb,
                 pub: PublicParams, mesh=None):
        self.params = params
        self.db = db
        self.pub = pub
        self.mesh = mesh
        d = params.poly_len
        self._g2_ntt = build_gadget(params.n1, params.m2, d).to_ntt().data
        self._eng = crt_ntt(d)
        # int8 limb layout for the MXU first-dim kernel.  SPIRAL_FDIM:
        #   u32    portable VPU contraction on the raw residues (the TPU
        #          analog of the reference's NO_CRT/no-AVX ablations)
        #   xla    int8-limb matmul via XLA dot_general
        #   fused  Pallas kernel fusing the matmul + limb recombination
        #          (default on TPU when shapes allow)
        import os
        mode = os.environ.get("SPIRAL_FDIM", "")
        self._fdim_u32 = mode == "u32"
        self._fdim_fused = False
        if isinstance(db, ShardedLimbsDb):
            # multi-host ingest (dist/multihost.py): limbs arrive already
            # row-major + row-sharded over the (global) mesh
            if mesh is None:
                raise ValueError("ShardedLimbsDb requires a mesh")
            self._implicit_chunks = 0
            self._fdim_u32 = False
            self._fdim_fused = False
            self._db_limbs = db.limbs
        elif isinstance(db, ImplicitDb):
            self._implicit_chunks = db.num_chunks
            self._db_limbs = db.slab_limbs
            self._fdim_u32 = False
            if mesh is not None:
                n_dev = mesh.devices.size
                if db.num_chunks % n_dev != 0:
                    raise ValueError(
                        f"implicit num_chunks {db.num_chunks} not divisible "
                        f"by mesh size {n_dev}")
        else:
            self._implicit_chunks = 0
            if mesh is not None:
                from .dist.shard import shard_db_limbs
                from .server.firstdim import (N_LIMBS,
                                              fused_fdim_supported_shape)
                self._fdim_u32 = False
                n_db = mesh.shape["db"]
                m_local = params.num_per * params.n2 // n_db
                shard_shape = (2, params.poly_len, db.data.shape[2],
                               N_LIMBS * m_local)
                self._fdim_fused = (
                    mode != "xla" and params.num_per % n_db == 0 and
                    fused_fdim_supported_shape(shard_shape) and
                    (mode == "fused" or jax.default_backend() == "tpu"))
                # shard-local limb-major columns when the fused kernel can
                # run per shard (VERDICT r4 #4); plain row-major otherwise
                self._db_limbs = shard_db_limbs(
                    db_to_mxu_limbs(db.data, row_major=not self._fdim_fused,
                                    shards=n_db if self._fdim_fused else 0),
                    mesh)
            else:
                self._db_limbs = (db.data if self._fdim_u32
                                  else db_to_mxu_limbs(db.data))
                if not self._fdim_u32:
                    from .server.firstdim import fused_fdim_supported
                    self._fdim_fused = (
                        mode != "xla" and fused_fdim_supported(
                            self._db_limbs) and
                        (mode == "fused" or
                         jax.default_backend() == "tpu"))
        self._build_stages()

    def _build_stages(self):
        p = self.params
        eng = self._eng
        g2 = self._g2_ntt
        pub = self.pub

        def expand(seed, packed_b, fused=None):
            packed_ct = reconstruct_cts(seed, packed_b)[0]
            ell = p.t_gsw
            cv = coefficient_expansion(
                packed_ct, p.g, [w.data for w in pub.W_exp_left],
                [w.data for w in pub.W_exp_right], p,
                max_bits_to_gen_right=ell * p.further_dims,
                stopround=p.stopround, fused=fused)
            if p.stopround != 0:
                cv = reorder_from_stopround(cv, p.dim0, ell * p.further_dims)
            return (cv[:p.dim0], cv[p.dim0:p.dim0 + ell * p.further_dims])

        def comp(first_scalars):
            return scal_to_mat_batch(first_scalars, pub.W_conv.data, p)

        def conv(gsw_scalars):
            gsw_in = gsw_scalars.reshape(
                (p.further_dims, p.t_gsw) + gsw_scalars.shape[1:])
            gsw = regev_to_gsw_batch(gsw_in, pub.W_conv.data, pub.V.data, p)
            q_pos = gsw[::-1]
            q_neg = sub_raw(jnp.broadcast_to(g2, q_pos.shape), q_pos)
            return q_pos, q_neg

        n_chunks = self._implicit_chunks
        use_u32 = self._fdim_u32
        mesh = self.mesh

        use_fused = self._fdim_fused

        def fdim(db_limbs, C_reg):
            qk = reorient_query(C_reg)
            if n_chunks:
                res = multiply_query_by_db_implicit(db_limbs, qk, n_chunks)
            elif use_u32:
                out = matmul_raw(db_limbs, qk)    # (num_per, n2, n1, 2, d)
                return eng.inverse(out.transpose(0, 2, 1, 3, 4))
            elif use_fused:
                from .server.firstdim import multiply_query_by_db_fused
                res = multiply_query_by_db_fused(db_limbs, qk)
            else:
                res = multiply_query_by_db_mxu(db_limbs, qk)
            cts_ntt = finish_mxu_output(res, p.num_per, p.n2)
            return eng.inverse(cts_ntt)

        def fold(cts_coeff, q_pos, q_neg, fused=None):
            return fold_ciphertexts(cts_coeff, q_pos, q_neg, p,
                                    fused=fused)

        if mesh is not None:
            # Row-sharded serving: each device streams only its DB shard
            # (zero-collective first-dim multiply) and runs the first
            # log2(rows/device) fold rounds on local adjacent pairs (rows
            # are bit-reversed — server/fold.py); the n_dev survivors are
            # then gathered (one tiny ct each) and the last log2(n_dev)
            # rounds finish replicated.  SURVEY.md §2.7.
            import functools as _ft
            from jax.sharding import PartitionSpec as _P
            from .server.firstdim import _implicit_chunks_loop

            n_db = mesh.shape["db"]
            local_rows = p.num_per // n_db
            r_loc = local_rows.bit_length() - 1
            db_spec = _P() if n_chunks else _P(None, None, None, "db")

            fdim_fused = getattr(self, "_fdim_fused", False)

            def _local_cts(dbs, qk):
                """Per-device fdim + inverse NTT: (local_rows, n1, n2, 2, d)."""
                if n_chunks:
                    local_chunks = n_chunks // n_db
                    i = jax.lax.axis_index("db")
                    res = _implicit_chunks_loop(dbs, qk, local_chunks,
                                                i * local_chunks)
                elif fdim_fused:
                    # shard-local limb-major layout (db_to_mxu_limbs
                    # shards=n_db): each device's shard is a j-major
                    # mini-DB, so the fused Pallas kernel runs per shard
                    from .server.firstdim import multiply_query_by_db_fused
                    res = multiply_query_by_db_fused(dbs, qk)
                else:
                    res = multiply_query_by_db_mxu(dbs, qk,
                                                   row_major=True)
                return eng.inverse(finish_mxu_output(res, local_rows, p.n2))

            # the whole DB-dependent phase runs in one shard_map: local
            # fdim, local fold rounds, one tiny ct all-gather, then the
            # last log2(n_db) rounds computed redundantly per device
            # (check_vma off: the gathered tail is replicated by value)
            @_ft.partial(jax.shard_map, mesh=mesh,
                         in_specs=(db_spec, _P(), _P(), _P()),
                         out_specs=_P(), check_vma=False)
            def _fdim_fold_all(dbs, qk, q_pos, q_neg):
                cts = _local_cts(dbs, qk)
                surv = fold_rounds(cts, q_pos, q_neg, p, 0, r_loc)
                gathered = jax.lax.all_gather(surv, "db", axis=0,
                                              tiled=True)
                return fold_ciphertexts(gathered, q_pos, q_neg, p,
                                        start_round=r_loc)

            def fdim_fold_sharded(db_limbs, C_reg, q_pos, q_neg):
                return _fdim_fold_all(db_limbs, reorient_query(C_reg),
                                      q_pos, q_neg)

            self._fdim_fold_sharded = fdim_fold_sharded

            @_ft.partial(jax.shard_map, mesh=mesh,
                         in_specs=(db_spec, _P(), _P(), _P()),
                         out_specs=_P(), check_vma=False)
            def _fdim_fold_all_batch(dbs, qk_b, q_pos_b, q_neg_b):
                # shard-local limb-major shards read as row_major=False
                res = multiply_query_by_db_mxu_batch(
                    dbs, qk_b, row_major=not fdim_fused)
                cts_b = eng.inverse(
                    finish_mxu_output_batch(res, local_rows, p.n2))
                surv_b = jax.vmap(
                    lambda c, qp, qn: fold_rounds(c, qp, qn, p, 0, r_loc,
                                                  fused=False)
                )(cts_b, q_pos_b, q_neg_b)              # (B, 1, ...)
                gathered = jax.lax.all_gather(surv_b, "db", axis=1,
                                              tiled=True)
                return jax.vmap(
                    lambda s, qp, qn: fold_ciphertexts(
                        s, qp, qn, p, start_round=r_loc, fused=False)
                )(gathered, q_pos_b, q_neg_b)

            def fdim_fold_sharded_batch(db_limbs, C_reg_b, q_pos_b,
                                        q_neg_b):
                return _fdim_fold_all_batch(
                    db_limbs, jax.vmap(reorient_query)(C_reg_b),
                    q_pos_b, q_neg_b)

            self._fdim_fold_sharded_batch = fdim_fold_sharded_batch

        def modswitch(final):
            return modswitch_device(final, p)

        def reconstruct_direct(seed, first_b, gsw_b):
            """Subround-aware reconstruction + per-part expansion
            (ref: src/spiral.cpp:2058-2177)."""
            plan = p.expansion_plan()
            b = jnp.concatenate([first_b, gsw_b], axis=0)
            cts = reconstruct_cts(seed, b)
            n_first = plan["first"]["n_cts"]
            parts = []
            for part, sl in (("first", cts[:n_first]),
                             ("rest", cts[n_first:])):
                pp = plan[part]
                if pp["direct"]:
                    parts.append(sl)
                    continue
                g = pp["g"]
                # fused=False: a vmapped pallas_call would need a batched
                # grid; these per-part expansions are tiny (small g)
                ex = jax.vmap(lambda c: coefficient_expansion(
                    c, g, [w.data for w in pub.W_exp_left][:g],
                    [w.data for w in pub.W_exp_right][:g], p,
                    fused=False))(sl)
                parts.append(ex[:, :pp["bits"]].reshape(
                    (-1,) + sl.shape[1:]))
            return parts[0], parts[1]

        # mesh mode fuses the DB-dependent stages (sharded fdim + local
        # fold rounds + replicated tail); single-device keeps them separate
        def serve_db(db_limbs, C_reg, q_pos, q_neg):
            if mesh is not None:
                return self._fdim_fold_sharded(db_limbs, C_reg, q_pos,
                                               q_neg)
            return fold(fdim(db_limbs, C_reg), q_pos, q_neg)

        self._stage_expand = jax.jit(expand)
        self._stage_reconstruct = jax.jit(reconstruct_direct)
        self._stage_comp = jax.jit(comp)
        self._stage_conv = jax.jit(conv)
        self._stage_fdim = jax.jit(fdim)
        self._stage_fold = jax.jit(fold)
        self._stage_serve_db = jax.jit(serve_db)
        self._stage_modswitch = jax.jit(modswitch)

        # whole-pipeline single-dispatch programs: over a remote-attached
        # TPU every dispatch/sync costs tens of ms of tunnel latency, so
        # the serving path compiles the full query->response computation
        # into ONE XLA program per query form
        def full_packed(db_limbs, seed, packed_b):
            first_scalars, gsw_scalars = expand(seed, packed_b)
            return modswitch(serve_db(
                db_limbs, comp(first_scalars), *conv(gsw_scalars)))

        def full_direct(db_limbs, seed, first_b, gsw_b):
            first_scalars, gsw_scalars = reconstruct_direct(
                seed, first_b, gsw_b)
            return modswitch(serve_db(
                db_limbs, comp(first_scalars), *conv(gsw_scalars)))

        self._stage_full_packed = jax.jit(full_packed)
        self._stage_full_direct = jax.jit(full_direct)

        # multi-query batch: every query-sized stage vmaps over the batch;
        # the first-dim multiply instead folds the batch into the MXU lhs
        # so the database (the huge HBM operand) streams ONCE per batch —
        # aggregate throughput scales superlinearly in B on an HBM-bound
        # database.  No reference counterpart (single query at a time).
        def fdim_batch(db_limbs, C_reg_b):
            qk = jax.vmap(reorient_query)(C_reg_b)   # (B, K, n1, 2, d)
            if n_chunks:
                from .server.firstdim import (
                    multiply_query_by_db_implicit_batch)
                res = multiply_query_by_db_implicit_batch(db_limbs, qk,
                                                          n_chunks)
            else:
                res = multiply_query_by_db_mxu_batch(db_limbs, qk)
            cts_ntt = finish_mxu_output_batch(res, p.num_per, p.n2)
            return eng.inverse(cts_ntt)

        def serve_db_batch(db_limbs, C_reg_b, q_pos_b, q_neg_b):
            if mesh is not None:
                return self._fdim_fold_sharded_batch(
                    db_limbs, C_reg_b, q_pos_b, q_neg_b)
            cts_b = fdim_batch(db_limbs, C_reg_b)
            # batched fused fold: the batch folds into the kernel grid
            # with per-query q blocks (vmapping a gridded pallas_call is
            # unsupported, so this is a dedicated batch entry point)
            import os as _os
            if _os.environ.get("SPIRAL_FOLD", "") != "xla":
                from .server.fold_pallas import (fold_fused_supported,
                                                 fold_rounds_fused_batch)
                if fold_fused_supported(p) and \
                        jax.default_backend() == "tpu":
                    return fold_rounds_fused_batch(
                        cts_b, q_pos_b, q_neg_b, p)[:, 0]
            return jax.vmap(
                lambda c, qp, qn: fold(c, qp, qn, fused=False)
            )(cts_b, q_pos_b, q_neg_b)

        def full_packed_batch(db_limbs, seeds, packed_bs):
            first_b, gsw_b = jax.vmap(
                lambda s, b: expand(s, b, fused=False))(seeds, packed_bs)
            C_reg_b = jax.vmap(comp)(first_b)
            q_pos_b, q_neg_b = jax.vmap(conv)(gsw_b)
            finals = serve_db_batch(db_limbs, C_reg_b, q_pos_b, q_neg_b)
            return jax.vmap(modswitch)(finals)

        def full_direct_batch(db_limbs, seeds, first_bs, gsw_bs):
            first_b, gsw_b = jax.vmap(reconstruct_direct)(
                seeds, first_bs, gsw_bs)
            C_reg_b = jax.vmap(comp)(first_b)
            q_pos_b, q_neg_b = jax.vmap(conv)(gsw_b)
            finals = serve_db_batch(db_limbs, C_reg_b, q_pos_b, q_neg_b)
            return jax.vmap(modswitch)(finals)

        self._stage_full_packed_batch = jax.jit(full_packed_batch)
        self._stage_full_direct_batch = jax.jit(full_direct_batch)

    def final_ciphertext(self, query: Query):
        """Pre-modswitch folded ct (n1, n2, 2, d) — the error-analysis hook
        (ref: --output-err dump, src/spiral.cpp:1517-1535)."""
        seed = jnp.int32(query.seed)
        if query.packed_b is not None:
            first_scalars, gsw_scalars = self._stage_expand(
                seed, query.packed_b)
        else:
            first_scalars, gsw_scalars = self._stage_reconstruct(
                seed, query.first_b, query.gsw_b)
        C_reg = self._stage_comp(first_scalars)
        q_pos, q_neg = self._stage_conv(gsw_scalars)
        if self.mesh is not None:
            return self._stage_serve_db(self._db_limbs, C_reg, q_pos, q_neg)
        cts_coeff = self._stage_fdim(self._db_limbs, C_reg)
        return self._stage_fold(cts_coeff, q_pos, q_neg)

    def _run_single(self, query: Query):
        """One-dispatch whole-pipeline execution (serving hot path)."""
        seed = jnp.int32(query.seed)
        if query.packed_b is not None:
            return self._stage_full_packed(self._db_limbs, seed,
                                           query.packed_b)
        return self._stage_full_direct(self._db_limbs, seed,
                                       query.first_b, query.gsw_b)

    @staticmethod
    def encode_database(pts: np.ndarray, params: Params) -> EncodedDb:
        return encode_db(pts, params)

    def process_query(self, query: Query):
        p = self.params
        tick = time.perf_counter
        timings = ServerTimings()

        t0 = tick()
        seed = jnp.int32(query.seed)
        if query.packed_b is not None:
            first_scalars, gsw_scalars = self._stage_expand(
                seed, query.packed_b)
            first_scalars.block_until_ready()
            t1 = tick()
            timings.expansion_us = (t1 - t0) * 1e6
        else:
            first_scalars, gsw_scalars = self._stage_reconstruct(
                seed, query.first_b, query.gsw_b)
            t1 = tick()

        C_reg = self._stage_comp(first_scalars)
        C_reg.block_until_ready()
        t2 = tick()
        timings.composition_us = (t2 - t1) * 1e6

        q_pos, q_neg = self._stage_conv(gsw_scalars)
        q_neg.block_until_ready()
        t3 = tick()
        timings.conversion_us = (t3 - t2) * 1e6

        if self.mesh is not None:
            # sharded serving fuses fdim + fold (per-device local rounds +
            # replicated tail) — reported as one combined stage
            final = self._stage_serve_db(self._db_limbs, C_reg, q_pos,
                                         q_neg)
            final.block_until_ready()
            t5 = tick()
            timings.first_multiply_us = (t5 - t3) * 1e6
        else:
            cts_coeff = self._stage_fdim(self._db_limbs, C_reg)
            cts_coeff.block_until_ready()
            t4 = tick()
            timings.first_multiply_us = (t4 - t3) * 1e6

            final = self._stage_fold(cts_coeff, q_pos, q_neg)
            final.block_until_ready()
            t5 = tick()
            timings.folding_us = (t5 - t4) * 1e6

        # modulus switch (two-modulus response, on-device exact)
        first, rest = self._stage_modswitch(final)
        rest.block_until_ready()
        t6 = tick()
        timings.modswitch_us = (t6 - t5) * 1e6
        return response_from_device_rows(first, rest), timings

    def process_query_batch(self, queries: list[Query]):
        """Serve a batch of queries in ONE device dispatch; the database
        streams from HBM once for the whole batch.  Returns
        (list[Response], seconds).  All queries must share the upload form
        (the Params fix it).  First call per batch size pays the compile."""
        assert queries, "empty batch"
        if self._fdim_u32:
            raise ValueError(
                "batched serving requires the MXU database layout")
        seeds = jnp.asarray([q.seed for q in queries], dtype=jnp.int32)
        tick = time.perf_counter
        if queries[0].packed_b is not None:
            packed = jnp.stack([q.packed_b for q in queries])
            run = lambda: self._stage_full_packed_batch(
                self._db_limbs, seeds, packed)
        else:
            firsts = jnp.stack([q.first_b for q in queries])
            gsws = jnp.stack([q.gsw_b for q in queries])
            run = lambda: self._stage_full_direct_batch(
                self._db_limbs, seeds, firsts, gsws)
        run()[1].block_until_ready()     # warm/compile
        t0 = tick()
        first_b, rest_b = jax.device_get(run())   # timed until host fetch
        dt = tick() - t0
        responses = [response_from_device_rows(first_b[i], rest_b[i])
                     for i in range(len(queries))]
        return responses, dt

    def process_query_fused(self, query: Query):
        """Async-chained pipeline; returns (Response, server_seconds).
        The first call pays stage compiles; callers should warm up.
        The timed window ends when the response rows have REACHED THE
        HOST (device_get), not at block_until_ready — the latter
        under-reports over a remote-attached TPU tunnel, and a served
        response must cross to the host anyway."""
        tick = time.perf_counter
        self._run_single(query)[1].block_until_ready()   # warm/compile
        t0 = tick()
        first, rest = jax.device_get(self._run_single(query))
        t1 = tick()
        return response_from_device_rows(first, rest), (t1 - t0)


def run_pir(params: Params, idx: int | None = None, seed: int = 0,
            nonoise: bool = False, rng: np.random.Generator | None = None):
    """Self-checking end-to-end run (the reference's oracle pattern,
    SURVEY.md §4.2).  Returns (correct, timings, client, server)."""
    from .server.db import random_db

    rng = rng or np.random.default_rng(seed)
    idx = int(rng.integers(0, params.total_n)) if idx is None else idx
    client = SpiralClient(params, seed=seed, nonoise=nonoise)
    pub = client.setup()
    pts = random_db(params, rng)
    db = encode_db(pts, params)
    server = SpiralServer(params, db, pub)
    query = client.query(idx)
    resp, timings = server.process_query(query)
    out = client.decode(resp)
    correct = bool(np.array_equal(out, pts[idx].astype(object)))
    return correct, timings, client, server
