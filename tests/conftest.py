"""Test configuration: CPU backend, 8 virtual devices, float64.

Correctness tests run on CPU in double precision (matching the reference's R
float64 semantics); TPU-specific behavior is covered by bench.py / the driver.

IMPORTANT: this environment injects a sitecustomize that registers the 'axon'
TPU backend into every Python process (and forces JAX_PLATFORMS=axon), so we
must disable it *before* the interpreter imports site modules.  pytest is
normally launched from a shell where these env vars are already exported by
tests/pytest.ini / tox-style wrappers; as a fallback we re-exec.
"""

import os
import sys

_WANT = {
    "PALLAS_AXON_POOL_IPS": "",        # prevents axon sitecustomize registration
    "JAX_PLATFORMS": "cpu",
    "JAX_ENABLE_X64": "1",
}


def _needs_reexec():
    if "jax" in sys.modules:
        return False  # too late; trust the current config
    return any(os.environ.get(k) != v for k, v in _WANT.items())


if _needs_reexec():
    os.environ.update(_WANT)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
