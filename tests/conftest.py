"""Test configuration: CPU backend with a virtual 8-device mesh + f64.

Mirrors the SURVEY.md §4 plan: the oracle chain runs in f64 on CPU;
multi-device sharding tests use ``xla_force_host_platform_device_count``
so collective-gated termination is exercised without TPU pod hardware.

NOTE: this image force-registers the remote 'axon' TPU platform via
sitecustomize (it even overrides JAX_PLATFORMS=cpu), so the platform must
be pinned through jax.config *after* import — otherwise every test
compile becomes a remote-TPU RPC.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on local CPU devices"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
