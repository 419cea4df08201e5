"""Test harness: force an 8-device CPU platform so data-parallel / mesh
logic is exercised without TPU hardware (the standard JAX spoofing recipe,
SURVEY.md §4).

NOTE: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (the TPU tunnel); merely setting env vars is too late.
We force the config override BEFORE any backend initializes — otherwise
every test process pays a ~70-300s TPU-tunnel handshake.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# pin the tail-calibration clip ratio: the 'auto' grid re-calibrates and
# re-applies the tail 5x — minutes per test in interpret-mode Pallas;
# clip selection itself is covered by test_fused_conv's explicit test
os.environ.setdefault("VCGU_TAIL_CLIP", "1.0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: CPU test compiles are the dominant cost; cache
# them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/vcgu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
