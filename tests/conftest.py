"""Test configuration: CPU backend, 8 virtual devices, float64.

Correctness tests run on CPU in double precision (matching the reference's R
float64 semantics); TPU-specific behavior is covered by bench.py / the driver.

This environment injects a sitecustomize that imports jax and registers an
'axon' TPU backend plugin in every Python process.  Importing jax does NOT
initialize a backend (that happens lazily at first device use), so selecting
the CPU platform via jax.config here — before any test touches a device — is
reliable; XLA_FLAGS is likewise read at backend initialization time.
Re-exec'ing is NOT safe here: pytest's fd-level capture is active while
conftest runs, so an exec'd child would inherit a captured stdout and all
output would vanish.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
