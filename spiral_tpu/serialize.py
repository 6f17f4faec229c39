"""Wire formats: bit-packed responses, seeded queries, DB checkpointing.

Response serialization matches the reference's accounting exactly: row 0
at q'-width bits per coefficient, remaining rows at log2(4p) bits
(ref: src/spiral.cpp:40-78 modswitch + write_arbitrary_bits,
src/client.cpp:90-112 load_modswitched_into_ct).  The reference stubs DB
save/load (spiral.cpp:1095-1162 TODOs); here it's implemented over the
encoded serving tensor.
"""
from __future__ import annotations

import json
import math
import pathlib

import numpy as np

from . import native
from .params import Params
from .crypto.decode import Response
from .crypto.query import Query


def response_to_bytes(resp: Response, params: Params) -> bytes:
    qp_bits = params.bits_to_hold_arb_qprime
    q1_bits = int(math.log2(4 * params.p_db))
    first = np.asarray(resp.first_row, dtype=np.uint64).ravel()
    rest = np.asarray(resp.rest_rows, dtype=np.uint64).ravel()
    b1 = native.bit_pack(first, qp_bits)
    b2 = native.bit_pack(rest, q1_bits)
    header = len(b1).to_bytes(4, "little")
    return header + b1 + b2


def response_from_bytes(data: bytes, params: Params, rows: int,
                        cols: int) -> Response:
    qp_bits = params.bits_to_hold_arb_qprime
    q1_bits = int(math.log2(4 * params.p_db))
    d = params.poly_len
    b1_len = int.from_bytes(data[:4], "little")
    b1 = data[4:4 + b1_len]
    b2 = data[4 + b1_len:]
    first = native.bit_unpack(b1, qp_bits, cols * d).reshape(1, cols, d)
    rest = native.bit_unpack(b2, q1_bits, (rows - 1) * cols * d).reshape(
        rows - 1, cols, d)
    return Response(first_row=first, rest_rows=rest)


QUERY_MAGIC = b"SPQ2"   # v2: 8-byte NTT-engine tag between magic and seed


def query_to_bytes(query: Query, params: Params) -> bytes:
    """Seed + b-polynomials, Garner-packed at logQ=56 bits/coefficient.

    (The NTT-domain residue pair maps bijectively to a 56-bit word via the
    Garner lift, so this matches the reference's logQ-per-coefficient
    query accounting.)
    """
    from .arith.crt import P_INV_MOD_B
    from .arith.ntt import ntt_engine_name
    from .params import B_I, P_I
    eng = ntt_engine_name(params.poly_len).encode()[:8].ljust(8)
    parts = [QUERY_MAGIC, eng, int(query.seed).to_bytes(4, "little")]
    for field in (query.packed_b, query.first_b, query.gsw_b):
        if field is None:
            parts.append((0).to_bytes(4, "little"))
            continue
        h = np.asarray(field)
        v = native.crt_lift_u64(h[..., 0, :], h[..., 1, :], P_I, B_I,
                                P_INV_MOD_B)
        packed = native.bit_pack(v.ravel().astype(np.uint64), 56)
        parts.append(len(packed).to_bytes(4, "little"))
        parts.append(int(np.prod(v.shape[:-1])).to_bytes(4, "little"))
        parts.append(packed)
    return b"".join(parts)


def query_from_bytes(data: bytes, params: Params) -> Query:
    from .params import B_I, P_I
    import jax.numpy as jnp
    from .arith.ntt import ntt_engine_name
    if data[:4] == b"SPQ1":
        raise ValueError(
            "query uses the retired SPQ1 wire format (no NTT-engine tag); "
            "re-serialize it with this library version")
    if data[:4] != QUERY_MAGIC:
        raise ValueError(f"bad query magic {data[:4]!r}")
    eng = data[4:12].decode().strip()
    active = ntt_engine_name(params.poly_len)
    if eng != active:
        raise ValueError(
            f"query was serialized under NTT engine {eng!r}; active engine "
            f"is {active!r} (slot orders differ) — pin both sides with "
            f"spiral_tpu.arith.ntt.set_engine or SPIRAL_NTT")
    seed = int.from_bytes(data[12:16], "little")
    off = 16
    d = params.poly_len
    fields = []
    for _ in range(3):
        blen = int.from_bytes(data[off:off + 4], "little")
        off += 4
        if blen == 0:
            fields.append(None)
            continue
        npolys = int.from_bytes(data[off:off + 4], "little")
        off += 4
        v = native.bit_unpack(data[off:off + blen], 56, npolys * d)
        off += blen
        v = v.reshape(npolys // 1, 1, 1, d) if npolys else v
        x = (v % np.uint64(P_I)).astype(np.uint32)
        y = (v % np.uint64(B_I)).astype(np.uint32)
        fields.append(jnp.asarray(np.stack([x, y], axis=-2)))
    return Query(seed=seed, packed_b=fields[0], first_b=fields[1],
                 gsw_b=fields[2], size_bytes=len(data))


def save_db(db, path: str) -> None:
    """Checkpoint the encoded serving tensor (+ params) to disk."""
    from .arith.ntt import ntt_engine_name
    p = pathlib.Path(path)
    np.save(str(p.with_suffix(".npy")), np.asarray(db.data))
    import dataclasses
    meta = dataclasses.asdict(db.params)
    meta["__ntt_engine__"] = ntt_engine_name(db.params.poly_len)
    # first-dim row order: fold pairs ADJACENT rows, which requires the
    # bit-reversed layout written by encode_db (server/db.py).  Untagged
    # checkpoints predate that layout and would fold wrong rows silently,
    # so load_db rejects them (same retirement pattern as the SPQ1 query
    # format above).
    meta["__layout__"] = "bitrev-v1"
    p.with_suffix(".json").write_text(json.dumps(meta))


def load_db(path: str):
    import jax.numpy as jnp
    from .server.db import EncodedDb
    from .arith.ntt import ntt_engine_name
    p = pathlib.Path(path)
    data = np.load(str(p.with_suffix(".npy")))
    meta = json.loads(p.with_suffix(".json").read_text())
    eng = meta.pop("__ntt_engine__", "mxu")
    layout = meta.pop("__layout__", None)
    if layout != "bitrev-v1":
        raise ValueError(
            f"DB checkpoint has row layout {layout!r}; this build folds "
            "adjacent bit-reversed rows ('bitrev-v1') and an untagged "
            "(pre-layout-tag) checkpoint would decode the wrong record — "
            "re-encode the database with encode_db + save_db")
    params = Params(**meta)
    active = ntt_engine_name(params.poly_len)
    if eng != active:
        raise ValueError(
            f"DB was encoded under NTT engine {eng!r}; active engine is "
            f"{active!r} (slot orders differ) — re-encode the DB or pin "
            f"the engine with spiral_tpu.arith.ntt.set_engine")
    return EncodedDb(data=jnp.asarray(data), params=params)


# ---------------------------------------------------------------------------
# Public parameters (offline upload).  The reference accounts these via
# add_pub_param (src/spiral.cpp runConversionImproved) but never serializes
# them; here they get a real wire format so a CPU/GPU client can ship key
# material to a TPU server.  All matrices are NTT-domain, so the engine tag
# is checked on load (ADVICE r2: untagged NTT-domain channels decode wrong).

PUB_MAGIC = b"SPP1"


def public_params_to_bytes(pub) -> bytes:
    """Serialize PublicParams (pir) or PackPublicParams (pack)."""
    from .arith.ntt import ntt_engine_name
    import io
    d = None
    fields = {}
    for name in ("W_exp_left", "W_exp_right", "W_conv", "V", "v_W"):
        v = getattr(pub, name, None)
        if v is None:
            continue
        if isinstance(v, (list, tuple)):
            arr = np.stack([np.asarray(getattr(w, "data", w)) for w in v]) \
                if len(v) else np.zeros((0,), dtype=np.uint32)
        else:
            arr = np.asarray(getattr(v, "data", v))
        fields[name] = arr
        if arr.size:
            d = arr.shape[-1]
    eng = ntt_engine_name(d or 2048).encode()[:8].ljust(8)
    buf = io.BytesIO()
    np.savez(buf, **fields)
    payload = buf.getvalue()
    return PUB_MAGIC + eng + len(payload).to_bytes(8, "little") + payload


def public_params_from_bytes(data: bytes, params: Params):
    """Returns a PublicParams (or PackPublicParams if v_W present)."""
    from .arith.ntt import ntt_engine_name
    import io
    import jax.numpy as jnp
    from .core.poly import PolyMat
    if data[:4] != PUB_MAGIC:
        raise ValueError(f"bad public-params magic {data[:4]!r}")
    eng = data[4:12].decode().strip()
    active = ntt_engine_name(params.poly_len)
    if eng != active:
        raise ValueError(
            f"public params were serialized under NTT engine {eng!r}; "
            f"active engine is {active!r} (slot orders differ)")
    plen = int.from_bytes(data[12:20], "little")
    z = np.load(io.BytesIO(data[20:20 + plen]))

    def mats(name):
        if name not in z:
            return None
        arr = z[name]
        return [PolyMat(jnp.asarray(a), ntt=True) for a in arr] or None

    def mat(name):
        return (PolyMat(jnp.asarray(z[name]), ntt=True)
                if name in z else None)

    if "v_W" in z:
        from .pack import PackPublicParams
        return PackPublicParams(
            v_W=jnp.asarray(z["v_W"]),
            W_exp_left=mats("W_exp_left"), W_exp_right=mats("W_exp_right"),
            V=mat("V"), size_bytes=len(data))
    from .crypto.publicparams import PublicParams
    return PublicParams(
        W_exp_left=mats("W_exp_left"), W_exp_right=mats("W_exp_right"),
        W_conv=mat("W_conv"), V=mat("V"), size_bytes=len(data))
