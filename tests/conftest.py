"""Test harness config: force CPU with 8 virtual devices before jax imports.

This is the TPU-native analog of the reference's (nonexistent) multi-GPU
testing: sharding/pjit paths are exercised on a fake 8-device mesh
(--xla_force_host_platform_device_count), per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: jit-heavy tests recompile across pytest runs
# otherwise (single-core CPU here makes XLA compiles the dominant cost).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env vars above can be too late for it; backends are lazy though, so forcing
# the platform through jax.config still works here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8
