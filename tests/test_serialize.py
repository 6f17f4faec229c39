"""Wire-format round trips: response, query, DB checkpoint."""
import numpy as np
import jax.numpy as jnp

from spiral_tpu.params import preset
from spiral_tpu.crypto.decode import Response
from spiral_tpu.crypto.query import Query
from spiral_tpu.serialize import (load_db, query_from_bytes, query_to_bytes,
                                  response_from_bytes, response_to_bytes,
                                  save_db)

rng = np.random.default_rng(4)


def test_response_roundtrip():
    p = preset("tiny")
    d = p.poly_len
    first = rng.integers(0, p.arb_qprime, size=(1, p.n2, d),
                         dtype=np.uint64)
    rest = rng.integers(0, 4 * p.p_db, size=(p.n1 - 1, p.n2, d),
                        dtype=np.uint64)
    resp = Response(first_row=first, rest_rows=rest)
    blob = response_to_bytes(resp, p)
    assert len(blob) <= p.response_size_bytes() + 16
    back = response_from_bytes(blob, p, p.n1, p.n2)
    np.testing.assert_array_equal(np.asarray(back.first_row, dtype=np.uint64),
                                  first)
    np.testing.assert_array_equal(np.asarray(back.rest_rows, dtype=np.uint64),
                                  rest)


def test_query_roundtrip():
    from spiral_tpu.params import P_I, B_I
    p = preset("tiny")
    d = p.poly_len
    b = np.stack([
        rng.integers(0, P_I, size=(1, 1, 1, d), dtype=np.uint64),
        rng.integers(0, B_I, size=(1, 1, 1, d), dtype=np.uint64),
    ], axis=-2).astype(np.uint32)
    q = Query(seed=12345, packed_b=jnp.asarray(b), size_bytes=0)
    blob = query_to_bytes(q, p)
    back = query_from_bytes(blob, p)
    assert back.seed == 12345
    np.testing.assert_array_equal(np.asarray(back.packed_b), b)
    assert back.first_b is None and back.gsw_b is None


def test_db_checkpoint(tmp_path):
    from spiral_tpu.server.db import encode_db, random_db
    p = preset("tiny")
    pts = random_db(p, rng)
    db = encode_db(pts, p)
    save_db(db, str(tmp_path / "db"))
    back = load_db(str(tmp_path / "db"))
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(db.data))
    assert back.params == p


def test_query_old_format_rejected():
    import pytest
    p = preset("tiny")
    with pytest.raises(ValueError, match="SPQ1"):
        query_from_bytes(b"SPQ1" + b"\x00" * 32, p)
    with pytest.raises(ValueError, match="magic"):
        query_from_bytes(b"XXXX" + b"\x00" * 32, p)


def test_public_params_roundtrip():
    from spiral_tpu.pir import SpiralClient
    from spiral_tpu.serialize import (public_params_from_bytes,
                                      public_params_to_bytes)
    p = preset("tiny")
    client = SpiralClient(p, seed=3)
    pub = client.setup()
    blob = public_params_to_bytes(pub)
    back = public_params_from_bytes(blob, p)
    np.testing.assert_array_equal(np.asarray(back.W_conv.data),
                                  np.asarray(pub.W_conv.data))
    np.testing.assert_array_equal(np.asarray(back.V.data),
                                  np.asarray(pub.V.data))
    assert len(back.W_exp_left) == len(pub.W_exp_left)
    for a, b in zip(back.W_exp_right, pub.W_exp_right):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_pack_public_params_roundtrip():
    from spiral_tpu.pack import PackClient
    from spiral_tpu.serialize import (public_params_from_bytes,
                                      public_params_to_bytes)
    p = preset("tiny_pack")
    client = PackClient(p, seed=3)
    pub = client.setup()
    back = public_params_from_bytes(public_params_to_bytes(pub), p)
    np.testing.assert_array_equal(np.asarray(back.v_W), np.asarray(pub.v_W))
    np.testing.assert_array_equal(np.asarray(back.V.data),
                                  np.asarray(pub.V.data))
