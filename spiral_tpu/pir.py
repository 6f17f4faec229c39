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
from .core.poly import PolyMat, sub_raw
from .core.gadget import build_gadget
from .crypto.keys import keygen, SecretKeys
from .crypto.encrypt import Encryptor
from .crypto.publicparams import PublicParams, generate_public_params
from .crypto.query import Query, generate_query
from .crypto.decode import Response, decode_response, modswitch_response
from .server.db import EncodedDb, encode_db
from .server.expand import coefficient_expansion, reorder_from_stopround
from .server.convert import regev_to_gsw_batch, scal_to_mat_batch
from .server.firstdim import multiply_query_by_db, reorient_query
from .server.fold import fold_ciphertexts


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
    def __init__(self, params: Params, db: EncodedDb, pub: PublicParams):
        self.params = params
        self.db = db
        self.pub = pub
        d = params.poly_len
        self._g2_ntt = build_gadget(params.n1, params.m2, d).to_ntt().data
        self._eng = crt_ntt(d)

    @staticmethod
    def encode_database(pts: np.ndarray, params: Params) -> EncodedDb:
        return encode_db(pts, params)

    def _expand_query(self, query: Query):
        """Returns (first_scalars (dim0,n0,1,2,d), gsw_scalars
        (nu2*t,n0,1,2,d))."""
        p = self.params
        if query.packed_ct is not None:
            g, stop = p.g, p.stopround
            ell = p.t_gsw
            cv = coefficient_expansion(
                query.packed_ct, g, [w.data for w in self.pub.W_exp_left],
                [w.data for w in self.pub.W_exp_right], p,
                max_bits_to_gen_right=ell * p.further_dims, stopround=stop)
            if stop != 0:
                cv = reorder_from_stopround(cv, p.dim0,
                                            ell * p.further_dims)
            first = cv[:p.dim0]
            gsw = cv[p.dim0:p.dim0 + ell * p.further_dims]
            return first, gsw
        return query.first_cts, query.gsw_cts

    def process_query(self, query: Query):
        p = self.params

        def tick():
            return time.perf_counter()

        timings = ServerTimings()
        t0 = tick()
        first_scalars, gsw_scalars = self._expand_query(query)
        first_scalars.block_until_ready()
        t1 = tick()
        timings.expansion_us = (t1 - t0) * 1e6 if query.packed_ct is not None \
            else 0.0

        # composition: scalar -> matrix Regev, all dim0 at once
        C_reg = scal_to_mat_batch(first_scalars, self.pub.W_conv.data, p)
        C_reg.block_until_ready()
        t2 = tick()
        timings.composition_us = (t2 - t1) * 1e6

        # conversion: build nu_2 GSW cts; slot s selects bit nu_2-1-s
        gsw_in = gsw_scalars.reshape(
            (p.further_dims, p.t_gsw) + gsw_scalars.shape[1:])
        gsw = regev_to_gsw_batch(gsw_in, self.pub.W_conv.data,
                                 self.pub.V.data, p)
        q_pos = gsw[::-1]
        q_neg = sub_raw(jnp.broadcast_to(self._g2_ntt, q_pos.shape), q_pos)
        q_neg.block_until_ready()
        t3 = tick()
        timings.conversion_us = (t3 - t2) * 1e6

        # first-dimension multiply
        qk = reorient_query(C_reg)
        cts_ntt = multiply_query_by_db(self.db, qk)
        cts_coeff = self._eng.inverse(cts_ntt)
        cts_coeff.block_until_ready()
        t4 = tick()
        timings.first_multiply_us = (t4 - t3) * 1e6

        # folding
        final = fold_ciphertexts(cts_coeff, q_pos, q_neg, p)
        final.block_until_ready()
        t5 = tick()
        timings.folding_us = (t5 - t4) * 1e6

        # modulus switch (two-modulus response)
        final_host = PolyMat(final, ntt=False).to_host_int()
        resp = modswitch_response(final_host, p)
        t6 = tick()
        timings.modswitch_us = (t6 - t5) * 1e6
        return resp, timings


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
