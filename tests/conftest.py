"""Test harness configuration.

Forces the JAX CPU backend with 8 virtual devices (the standard fake-backend
trick for multi-chip sharding tests, SURVEY.md §4) and enables x64 so tests
can compare against float64 oracles. The container's sitecustomize force-
registers the axon TPU plugin and overrides jax_platforms at interpreter
start; re-pinning to cpu here keeps the (single, exclusively-claimed) real
chip out of unit tests entirely.
"""

import os

# NOTE: the container sitecustomize force-registers the tunnel TPU plugin
# and presets JAX_PLATFORMS=axon, but the jax_platforms config.update below
# still wins (verified: default_backend() == 'cpu' under the ambient env),
# so a bare `pytest tests/` never claims the exclusive chip. The
# PALLAS_AXON_POOL_IPS= prefix in CLAUDE.md additionally skips the plugin's
# registration noise; only the ENV-VAR form of JAX_PLATFORMS=cpu is
# overridden by the sitecustomize.

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
