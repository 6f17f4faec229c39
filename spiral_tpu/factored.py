"""Oversized-item support: items spanning `factor` records
(ref: select_params.py:291-303 — the reference reruns the binary factor
times; here the factor instances run as one batched tensor program and
share a single query).

An item of F records is stored column-wise: chunk f of every item forms
sub-database f.  One query selects index `idx` in every sub-database at
once; responses decode to the F chunks of the item.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .params import Params
from .arith.ntt import crt_ntt
from .core.poly import matmul_raw
from .crypto.decode import (Response, decode_response,
                            response_from_device_rows)
from .crypto.query import Query
from .pir import ServerTimings, SpiralClient
from .server.db import EncodedDb, encode_db
from .server.fold import fold_ciphertexts
from .server.firstdim import reorient_query


def encode_factored_db(pts: np.ndarray, params: Params) -> EncodedDb:
    """pts: (total_n, factor, n0, n2, d) -> stacked encoded DBs with a
    leading factor axis."""
    F = pts.shape[1]
    dbs = [encode_db(pts[:, f], params).data for f in range(F)]
    return EncodedDb(data=jnp.stack(dbs), params=params)


class FactoredSpiralServer:
    """Runs the server pipeline over all factor sub-databases at once,
    reusing a SpiralServer's query-processing stages."""

    def __init__(self, params: Params, db: EncodedDb, pub):
        from .pir import SpiralServer
        self.params = params
        self.factor = db.data.shape[0]
        self.db = db
        # base server used for expansion/composition/conversion stages
        self._base = SpiralServer(
            params, EncodedDb(data=db.data[0], params=params), pub)
        eng = crt_ntt(params.poly_len)
        p = params

        def fdim_fold(db_all, C_reg, q_pos, q_neg):
            qk = reorient_query(C_reg)
            out = matmul_raw(db_all, qk)          # (F, num_per, n2, n1, 2, d)
            cts = eng.inverse(out.transpose(0, 1, 3, 2, 4, 5))
            finals = jax.vmap(
                lambda c: fold_ciphertexts(c, q_pos, q_neg, p))(cts)
            from .crypto.decode import modswitch_device
            return jax.vmap(lambda f: modswitch_device(f, p))(finals)

        self._fdim_fold = jax.jit(fdim_fold)

    def process_query(self, query: Query):
        b = self._base
        p = self.params
        t0 = time.perf_counter()
        seed = jnp.int32(query.seed)
        if query.packed_b is not None:
            first_scalars, gsw_scalars = b._stage_expand(seed, query.packed_b)
        else:
            first_scalars, gsw_scalars = b._stage_reconstruct(
                seed, query.first_b, query.gsw_b)
        C_reg = b._stage_comp(first_scalars)
        q_pos, q_neg = b._stage_conv(gsw_scalars)
        firsts, rests = self._fdim_fold(self.db.data, C_reg, q_pos, q_neg)
        rests.block_until_ready()
        t1 = time.perf_counter()
        resps = [response_from_device_rows(firsts[f], rests[f])
                 for f in range(self.factor)]
        timings = ServerTimings(first_multiply_us=(t1 - t0) * 1e6)
        return resps, timings


def decode_factored(client: SpiralClient, resps) -> np.ndarray:
    """-> (factor, n0, n2, d) item chunks."""
    return np.stack([client.decode(r) for r in resps])
