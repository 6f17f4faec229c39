"""Empirical noise vs the analytical model (ref: analyze_err.py flow).

Runs the tiny Spiral config end-to-end, extracts signed pre-modswitch
error samples, and checks the measured variance sits at or below the
closed-form bound (the model is an upper bound by construction).
Also covers ternary secrets.
"""
import math

import jax
import numpy as np
import pytest

import dataclasses

from spiral_tpu.params import preset
from spiral_tpu.core.poly import PolyMat
from spiral_tpu.paramgen.analyze_err import (error_samples,
                                             extrapolate_p_err,
                                             log2_variance)
from spiral_tpu.paramgen.noise import noise_variance
from spiral_tpu.pir import SpiralClient, SpiralServer
from spiral_tpu.server.db import encode_db, random_db


def _run_collect_errors(params, seed=0):
    rng = np.random.default_rng(seed)
    client = SpiralClient(params, seed=seed)
    pub = client.setup()
    pts = random_db(params, rng)
    server = SpiralServer(params, encode_db(pts, params), pub)
    idx = int(rng.integers(0, params.total_n))
    query = client.query(idx)
    final = server.final_ciphertext(query)
    final_host = PolyMat(np.asarray(final), ntt=False).to_host_int()
    S_centered = np.concatenate(
        [client.keys.Sp_centered,
         np.eye(params.n0, dtype=np.int64)[:, :, None] *
         np.array([1] + [0] * (params.poly_len - 1))], axis=1)
    errs = error_samples(final_host, S_centered, pts[idx], params)
    return errs


def test_empirical_noise_below_model():
    params = preset("tiny")
    errs = _run_collect_errors(params)
    measured = log2_variance(errs)
    model = math.log2(noise_variance(params))
    # the analytical bound must dominate the measurement
    assert measured < model, (measured, model)
    # and the extrapolated failure rate must be tiny at this scale
    assert extrapolate_p_err(errs, params) < -30


def test_ternary_secrets_roundtrip():
    params = dataclasses.replace(preset("tiny"), ternary=True)
    rng = np.random.default_rng(7)
    client = SpiralClient(params, seed=7)
    pub = client.setup()
    pts = random_db(params, rng)
    server = SpiralServer(params, encode_db(pts, params), pub)
    idx = 5
    resp, _ = server.process_query(client.query(idx))
    out = client.decode(resp)
    assert np.array_equal(out, pts[idx].astype(object))
