"""Test config: force a virtual 8-device CPU mesh before jax imports.

This is the JAX-native analogue of testing multi-node without a cluster
(SURVEY.md §4): all sharding/collective tests run on 8 virtual CPU devices.

Note on the axon scrub below: the container's sitecustomize registers the
`axon` TPU-tunnel PJRT plugin in every interpreter, and its backend handshake
blocks jax's (CPU!) backend init for ~2.5 minutes per process. Tests never use
the TPU, so we drop that backend factory before first use; bench.py and
__graft_entry__.py keep the TPU path untouched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

# numerical-parity tests compare against float64/float32 torch oracles;
# this XLA CPU build otherwise uses a low-precision matmul path.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: the env vars alone don't activate it on this
# jax build — set the config explicitly. Caching every entry keeps repeat
# suite runs nearly compile-free (the suite compiles ~2k programs; one
# observed XLA-CPU compiler segfault happened only after ~1h of continuous
# compilation in a single process, which the cache also avoids).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
