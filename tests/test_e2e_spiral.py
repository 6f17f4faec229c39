"""End-to-end tests for the Spiral (expansion) and SpiralStream variants."""
import numpy as np
import pytest

from spiral_tpu.params import preset
from spiral_tpu.pir import run_pir


@pytest.mark.parametrize("nonoise", [True, False])
def test_spiralstream_e2e(nonoise):
    correct, timings, _, _ = run_pir(preset("tiny_stream"), nonoise=nonoise)
    assert correct


@pytest.mark.parametrize("nonoise", [True, False])
def test_spiral_e2e(nonoise):
    correct, timings, _, _ = run_pir(preset("tiny"), nonoise=nonoise)
    assert correct


@pytest.mark.parametrize("nonoise", [True, False])
def test_spiral_subrounds_e2e(nonoise):
    """Partial direct upload: 2 expandable first-dim cts + 4 GSW-source cts
    (ref: src/spiral.cpp:2058-2177 subround machinery)."""
    correct, timings, _, _ = run_pir(preset("tiny_subround"),
                                     nonoise=nonoise)
    assert correct
