"""Test configuration: run the suite on a virtual 8-device CPU mesh.

CPU tests are the first-principles ground truth (differential vs brute
force); TPU correctness then follows from XLA portability, mirroring the
reference's strategy (ref /root/reference/test/gputests.jl:1-2).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The TPU-tunnel sitecustomize imports jax at interpreter startup, so env
# vars alone are too late; force the CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles hundreds of distinct
# (N, start_level, capacity) programs; caching makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
