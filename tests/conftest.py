"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The container's sitecustomize registers the axon TPU plugin and overrides
``jax_platforms`` at interpreter start, so setting JAX_PLATFORMS is not
enough — we re-override the config before any backend is initialized.  Tests
then run everywhere on 8 virtual host devices, which exercises the
multi-device sharding paths (SURVEY.md §4 item 5).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
