"""Native host runtime vs the pure-python reference implementations."""
import numpy as np
import pytest

from spiral_tpu import native
from spiral_tpu.params import B_I, P_I, Q
from spiral_tpu.arith.crt import P_INV_MOD_B
from spiral_tpu.core.rescale import pack_bits, rescale_array, unpack_bits

rng = np.random.default_rng(9)


@pytest.fixture(scope="module", autouse=True)
def needs_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_center_lift():
    pts = rng.integers(0, 256, size=1000, dtype=np.int16)
    lp, lb = native.center_lift(pts, 256, P_I, B_I)
    c = np.where(pts >= 128, pts.astype(np.int64) - 256, pts)
    np.testing.assert_array_equal(lp, np.where(c < 0, c + P_I, c))
    np.testing.assert_array_equal(lb, np.where(c < 0, c + B_I, c))


def test_crt_lift():
    v = rng.integers(0, Q, size=1000, dtype=np.uint64)
    xs = (v % P_I).astype(np.uint32)
    ys = (v % B_I).astype(np.uint32)
    out = native.crt_lift_u64(xs, ys, P_I, B_I, P_INV_MOD_B)
    np.testing.assert_array_equal(out, v)


def test_rescale_matches_python():
    v = rng.integers(0, Q, size=2000, dtype=np.uint64)
    for out_mod in (1 << 20, 4 * 256, 786433):
        got = native.rescale_u64(v, Q, out_mod)
        want = rescale_array(v.astype(object), Q, out_mod)
        np.testing.assert_array_equal(got.astype(object), want)


def test_bitpack_roundtrip_and_python_parity():
    for width in (14, 20, 21, 37):
        vals = rng.integers(0, 1 << width, size=500, dtype=np.uint64)
        packed = native.bit_pack(vals, width)
        assert packed == pack_bits(vals.astype(object), width)
        back = native.bit_unpack(packed, width, len(vals))
        np.testing.assert_array_equal(back, vals)
        back_py = unpack_bits(packed, width, len(vals))
        np.testing.assert_array_equal(back_py.astype(np.uint64), vals)
