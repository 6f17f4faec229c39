"""Golden cross-validation against the REFERENCE implementation
(BASELINE.md:63, VERDICT r2 missing #2).

These tests compile the reference's own C++ sources (/root/reference,
built via golden/build_reference.sh with a local HEXL shim) and compare
its behavior against spiral_tpu — cross-implementation checks that are
NOT self-referential:

* negacyclic-convolution golden vectors computed by the reference's
  compiled NTT kernels (src/core.cpp + src/constants.cpp tables) must
  match our NTT engines bit-for-bit;
* the reference binary's end-to-end run must self-verify
  ("Is correct?: 1") and its communication accounting (query/response
  bytes) must match our Params methods.
"""
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists() or shutil.which("g++") is None,
    reason="reference sources or g++ unavailable")


def _build(out: str, srcs: list, extra: str = "") -> pathlib.Path:
    path = pathlib.Path("/tmp") / out
    if path.exists():
        return path
    macros = ("-DTEXP=8 -DTEXPRIGHT=56 -DTCONV=4 -DTGSW=8 -DQPBITS=20 "
              "-DPVALUE=256 -DQNUMFIRST=1 -DQNUMREST=0 -DOUTN=2")
    cmd = (f"g++ -O2 -std=c++17 -march=native -w -I{REF}/include "
           f"-I{REPO}/golden/shim {macros} {extra} "
           f"{' '.join(srcs)} -o {path}")
    subprocess.run(cmd, shell=True, check=True, capture_output=True)
    return path


def _xorshift64_stream(n):
    s = 0x9E3779B97F4A7C15
    mask = (1 << 64) - 1
    out = []
    for _ in range(n):
        s ^= (s << 13) & mask
        s ^= s >> 7
        s ^= (s << 17) & mask
        out.append(s)
    return out


def test_ntt_convolution_matches_reference_kernels():
    """Our NTT engines must reproduce the reference's compiled Harvey NTT
    (tables from src/constants.cpp) on a negacyclic product, bit-for-bit
    in coefficient space."""
    import jax.numpy as jnp
    from spiral_tpu.params import B_I, P_I
    from spiral_tpu.arith.ntt import crt_ntt

    tool = _build("spiral_golden_nttdump",
                  [str(REPO / "golden" / "ntt_dump.cpp"),
                   str(REF / "src" / "core.cpp"),
                   str(REF / "src" / "constants.cpp")])
    out = subprocess.run([str(tool)], capture_output=True, text=True,
                         check=True).stdout.splitlines()
    assert out[0] == "roundtrip 1"
    vals = np.array([int(x) for x in out[1].split()[1:]], dtype=np.uint64)
    d = vals.size // 2
    want = vals.reshape(2, d)            # limb-major (p then b)

    rs = _xorshift64_stream(2 * d)
    a = np.array(rs[:d], dtype=np.uint64)
    b = np.array(rs[d:], dtype=np.uint64)

    def residues(v):
        return np.stack([v % P_I, v % B_I], axis=0).astype(np.uint32)

    eng = crt_ntt(d)
    fa = eng.forward(jnp.asarray(residues(a)[None].transpose(0, 1, 2)
                                 .reshape(1, 2, d)))
    fb = eng.forward(jnp.asarray(residues(b).reshape(1, 2, d)))
    prod = []
    for li, q in enumerate((P_I, B_I)):
        v = (np.asarray(fa)[0, li].astype(np.uint64) *
             np.asarray(fb)[0, li].astype(np.uint64)) % q
        prod.append(v.astype(np.uint32))
    got = np.asarray(eng.inverse(
        jnp.asarray(np.stack(prod)[None]))).astype(np.uint64)[0]
    np.testing.assert_array_equal(got, want)


def test_reference_binary_e2e_and_comm_contract():
    """The reference binary (paper (20,256) gadget parameters on a tiny
    2^4 DB) must decode correctly, and its reported communication sizes
    must match our Params accounting: the binary reports a full 2-poly
    RLWE ct upload (our queries are seed-compressed to the b-poly, the
    accounting select_params.py uses for exp_lut query_sz), and response
    bytes must match response_size_bytes exactly."""
    from spiral_tpu.params import Params

    binary = _build(
        "spiral_golden_ref",
        [str(REF / "src" / s) for s in
         ("spiral.cpp", "core.cpp", "constants.cpp", "poly.cpp",
          "util.cpp", "client.cpp", "testing.cpp")])
    r = subprocess.run([str(binary), "2", "2", "3", "a"],
                       capture_output=True, text=True, timeout=600,
                       cwd="/tmp")
    assert "Is correct?: 1" in r.stdout, r.stdout[-2000:]

    def field(name):
        for line in r.stdout.splitlines():
            if name in line:
                return int(line.split(":")[-1].strip())
        raise AssertionError(f"missing {name}")

    p = Params(nu_1=2, nu_2=2, p_db=256, q_prime_bits=20, t_gsw=8,
               t_conv=4, t_exp=8, t_exp_right=56)
    assert field("Response size") == p.response_size_bytes()
    # binary uploads (-a, b); we seed-compress to b only
    assert field("Total online query size") == 2 * p.query_size_bytes()
