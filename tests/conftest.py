"""Test env bootstrap: run JAX on a virtual 8-device CPU mesh.

This environment force-registers a TPU backend from sitecustomize (env
JAX_PLATFORMS=axon), so plain env-var overrides in conftest are too late.
Instead, select the CPU platform through jax.config before any computation
runs, and request 8 virtual host devices for sharding tests (SURVEY.md §4:
"No real cluster needed").

Set RVT_TEST_PLATFORM=tpu to run the suite against the real chip instead.
"""
import os

_platform = os.environ.get("RVT_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
