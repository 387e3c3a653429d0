"""Test harness: force JAX onto CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("SDTPU_INTERPRET_PALLAS", "1")  # pallas interpret mode on CPU
