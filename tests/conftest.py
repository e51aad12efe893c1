"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so sharding tests work
without TPU hardware.  The axon TPU plugin (when present) force-selects the
TPU platform via its sitecustomize hook, overriding ``JAX_PLATFORMS``; a
``jax.config.update`` here wins because it runs after that hook and before
any backend is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
