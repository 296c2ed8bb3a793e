"""Test configuration: force a virtual 8-device CPU platform before JAX import.

Sharded sampling/finetune paths are exercised on a CPU mesh
(``--xla_force_host_platform_device_count=8``); the real TPU chip is only used
by bench.py, never by the unit tests.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: this host has a single CPU core, so repeated
# XLA compiles dominate test time without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon sitecustomize force-updates jax.config.jax_platforms to the real
# TPU tunnel regardless of JAX_PLATFORMS; override it back AFTER import so
# unit tests run on the virtual 8-device CPU platform, never the chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
