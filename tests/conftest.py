"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes its backends, so this sits at conftest import
time.  Multi-chip sharding tests use the 8-device virtual CPU mesh; the driver
separately validates `__graft_entry__.dryrun_multichip` the same way.
"""

import os

# The session env pins JAX_PLATFORMS to the TPU platform; tests always run on
# the virtual-device CPU backend, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8-thread collectives on a 1-core host starve under load; the default
# rendezvous watchdog then ABORTS the process.  Give it an hour.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# jax may already have been imported (and captured JAX_PLATFORMS) by a plugin
# before this conftest ran; updating the config works as long as no backend
# has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# jax 0.9 runs f32 convs/matmuls at reduced precision by default even on CPU
# (~1e-3 abs error); tests need exact f32 numerics.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: repeated test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/rick_tpu_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
