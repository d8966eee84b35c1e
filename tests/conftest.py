"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must never require real TPU hardware; multi-chip sharding is validated on
``--xla_force_host_platform_device_count=8`` virtual CPU devices.  The
environment pre-registers an 'axon' TPU platform via sitecustomize, so the
platform must be forced back to cpu through jax.config (env vars alone are not
enough once the plugin is registered).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
