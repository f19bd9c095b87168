"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharded code paths (mesh/shard_map) are exercised in CI without TPU hardware
(SURVEY.md section 4, "TPU-build implication"). Note: the environment may
import jax at interpreter startup (sitecustomize), so env vars are too late --
``jax.config.update`` is the reliable switch.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the unrolled limb kernels are compile-heavy,
# and identical across test processes
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zktpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults on large compiles late in a long-lived process
    (observed repeatedly ~60 tests in, each run crashing on the next big
    not-yet-disk-cached program). Dropping the in-process executable caches
    between modules keeps the live-executable footprint bounded; the
    persistent disk cache makes reloads cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: scale-tier tests (deselect with -m 'not slow')"
    )
