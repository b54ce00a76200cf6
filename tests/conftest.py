"""Test config: run everything on an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes a backend, so this lives at the
top of conftest (pytest imports it before any test module).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may point at the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Env vars alone are not enough if jax got imported before conftest (pytest
# plugins) — force via config too, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is compile-dominated (~40 min
# cold); cached re-runs skip most of it.  Scoped to the repo so it ships
# nowhere and `git clean` removes it.  Host-keyed subdir: XLA:CPU AOT
# artifacts are ISA-specific and fail (feature mismatch / SIGILL) when a
# cache compiled on a different machine is reused.
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from talkshow_tpu.utils import host_cache_dir  # noqa: E402

_cache_dir = host_cache_dir(os.path.join(os.path.dirname(__file__),
                                         ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
