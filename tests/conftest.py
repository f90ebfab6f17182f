"""Test harness configuration.

Forces the JAX CPU backend with 8 virtual devices (the standard fake-backend
trick for multi-chip sharding tests, SURVEY.md §4) and enables x64 so tests
can compare against float64 oracles. The container's sitecustomize force-
registers the axon TPU plugin and overrides jax_platforms at interpreter
start; re-pinning to cpu here keeps the (single, exclusively-claimed) real
chip out of unit tests entirely.
"""

import os

if os.environ.get("JAX_PLATFORMS") == "axon" and \
        os.environ.get("PALLAS_AXON_POOL_IPS"):
    # the container's sitecustomize force-registers the tunnel TPU plugin
    # at interpreter start and overrides jax_platforms; the config.update
    # below cannot undo that, and a test run claiming the single exclusive
    # chip can leave it locked for minutes if killed. Fail fast instead.
    raise RuntimeError(
        "run tests with the TPU plugin disabled: "
        "PALLAS_AXON_POOL_IPS= python -m pytest tests/ (see CLAUDE.md)")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
