"""Test environment: run on CPU with 8 virtual devices.

The reference test suite requires a CUDA GPU and skips otherwise
(/root/reference/tests/test_render.py:18-22). Ours runs anywhere: pure-JAX
oracles on CPU, and the multi-chip sharding logic on an XLA-faked 8-device
host (SURVEY.md section 4, multi-node testing plan).

Note: this machine's TPU plugin force-selects itself via config (overriding
the JAX_PLATFORMS env var), so we both set the env vars *and* override the
config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
