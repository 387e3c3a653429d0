"""Test harness: pin JAX to the CPU backend with 8 virtual devices so tests
are hermetic/fast and sharding tests run without TPU hardware (SURVEY.md §4).

Note: this environment's 'axon' TPU plugin registers itself regardless of
JAX_PLATFORMS, so we pin via jax_default_device instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("SDTPU_INTERPRET_PALLAS", "1")  # pallas interpret mode on CPU

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
