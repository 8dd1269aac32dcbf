"""Test harness config: CPU backend with 8 virtual devices.

Sharding paths are validated on fake CPU devices
(xla_force_host_platform_device_count), Pallas kernels in interpret mode
— the standard "multi-chip without a pod" mechanism (SURVEY.md §4.3).
Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("ASP_INTERPRET_PALLAS", "1")

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin that overrides the
# env var (e.g. a tunneled TPU); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
# x64 on: lets the f64 paths be tested tightly; f32 paths cast explicitly.
jax.config.update("jax_enable_x64", True)
