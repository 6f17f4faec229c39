"""Unit tests for the cross-system adapter layer (ref: run_scheme.py).

Competitor analyzers are tested on canned stdout shaped like the
reference's regex contracts (run_scheme.py:71-77,109-112,145-149) so no
external binaries are needed.
"""
import pytest

from spiral_tpu.run_scheme import (MAX_ITEM_BYTES, OTHER_PP_SZ,
                                   SystemUnavailable, analyze_fastpir,
                                   analyze_onionpir, analyze_sealpir,
                                   get_factor, get_pp_size, run_system)

SEALPIR_OUT = """
Main:    Query size bytes        : 65536
Server: expansion time for batch: 120 ms
Main:    PIRServer reply generation time (online) : 820 ms
Main:    Reply size bytes        : 328000
"""

FASTPIR_OUT = """
Main:   Query size (bytes)      : 131072
Main:   Response generation time (us)   : 910000
Main:   Response size (bytes)   : 262144
"""

ONIONPIR_OUT = """
Server: rlwe exansion time  = 85
Server: expand after first diemension = 12
Main: PIRServer reply generation time (online) : 712 ms
Main:    Reply size bytes        : 126976
"""


def test_factor():
    assert get_factor(256, 3072) == 1
    assert get_factor(3072, 3072) == 1
    assert get_factor(3073, 3072) == 2
    assert get_factor(100000, 30720) == 4


def test_sealpir_analyzer():
    r = analyze_sealpir(SEALPIR_OUT, 20, 256, 1, streaming=False)
    # expansion counted once, db-dependent part times factor
    assert r == {"total_us": 820000, "resp_sz": 328000, "query_sz": 65536}
    r2 = analyze_sealpir(SEALPIR_OUT, 20, 6144, 2, streaming=False)
    assert r2["total_us"] == (2 * (820 - 120) + 120) * 1000
    assert r2["resp_sz"] == 2 * 328000
    rs = analyze_sealpir(SEALPIR_OUT, 20, 3072, 1, streaming=True)
    assert rs["tput"] == pytest.approx(
        (1 << 20) * 3072 / ((820 - 120) * 1000))


def test_fastpir_analyzer():
    r = analyze_fastpir(FASTPIR_OUT, 20, 256, 3, streaming=False)
    assert r == {"total_us": 3 * 910000, "resp_sz": 3 * 262144,
                 "query_sz": 131072}


def test_onionpir_analyzer():
    r = analyze_onionpir(ONIONPIR_OUT, 20, 256, 1, streaming=False)
    assert r["total_us"] == 712000  # factor*(total-exp) + exp
    assert r["query_sz"] == 63488
    assert r["resp_sz"] == 126976


def test_nopriv():
    assert run_system("nopriv", 20, 256) == {
        "total_us": 0, "resp_sz": 256, "query_sz": 0}


def test_competitor_unavailable(monkeypatch):
    monkeypatch.delenv("SEALPIR_BIN", raising=False)
    with pytest.raises(SystemUnavailable):
        run_system("sealpir", 20, 256)


def test_pp_size():
    for s in OTHER_PP_SZ:
        assert get_pp_size(s) == OTHER_PP_SZ[s]
        assert s in MAX_ITEM_BYTES
    assert get_pp_size("spiral", {"param_sz": 123}) == 123
    assert get_pp_size("spiralstream",
                       {"other_data": {"param_sz": 9}}) == 9


def test_param_sz_accounting():
    """public_param_size_bytes mirrors the generated material exactly."""
    from spiral_tpu.params import preset
    from spiral_tpu.pir import SpiralClient
    p = preset("tiny")
    client = SpiralClient(p, seed=0, nonoise=True)
    pub = client.setup()
    assert p.public_param_size_bytes() == pub.size_bytes
