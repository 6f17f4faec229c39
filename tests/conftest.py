import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# Tests run on the CPU backend with 8 virtual devices so sharding paths are
# exercised without a pod (SURVEY.md section 4 note on multi-host testing).
jax.config.update("jax_platforms", "cpu")
