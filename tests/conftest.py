"""Test configuration: force an 8-device virtual CPU mesh so multi-chip sharding logic
is exercised without TPU hardware (SURVEY.md §4 'implication for the rebuild').

NOTE: this environment preloads an 'axon' TPU PJRT plugin via sitecustomize and pins
JAX_PLATFORMS=axon; a plain env-var override is ineffective.  jax.config.update after
import is the reliable way to select the CPU backend here.  XLA_FLAGS must still be set
before the CPU client is instantiated (it is lazy, so doing it here is early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
