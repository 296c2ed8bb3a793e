"""Test configuration: force a virtual 8-device CPU platform before JAX import.

Sharded sampling/finetune paths are exercised on a CPU mesh
(``--xla_force_host_platform_device_count=8``); the real TPU chip is only used
by bench.py, never by the unit tests.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
