"""Worker process for tests/test_multihost.py: one "host" of a
multi-controller CPU run (4 virtual devices per process).

Usage: python multihost_worker.py <port> <num_processes> <process_id>
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import numpy as np
import jax

# the env var alone is not enough under out-of-tree PJRT plugins (they
# register regardless); pin the platform through the config like
# tests/conftest.py does
jax.config.update("jax_platforms", "cpu")

from spiral_tpu.dist import multihost as mh

mh.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()

from spiral_tpu.params import Params
from spiral_tpu.pir import SpiralClient
from spiral_tpu.server.db import random_db

p = Params(nu_1=2, nu_2=3, p_db=256, t_gsw=8, t_conv=4,
           t_exp=8, t_exp_right=8)
# The full plaintext array stands in for each host's storage shard; the
# provider below reads ONLY the records host_record_indices selects, so
# the ingest path never encodes rows it does not own.
rng = np.random.default_rng(0)
pts = random_db(p, rng)

client = SpiralClient(p, seed=1)
pub = client.setup()
server = mh.ingest_and_serve(lambda idx: pts[idx], p, pub)

for target in (0, 11, p.total_n - 1):
    query = client.query(target)
    resp, _ = server.process_query(query)
    out = client.decode(resp)
    assert np.array_equal(out, pts[target].astype(object)), target

print("MULTIHOST_OK", flush=True)
