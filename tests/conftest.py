"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware, matching the driver's
multi-chip dry-run environment.

NOTE: on this machine the axon TPU plugin registers itself via sitecustomize
and ignores the JAX_PLATFORMS env var — jax.config.update is the only switch
that actually works (otherwise every eager op pays a ~72 ms tunnel round
trip and the suite takes hours)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
