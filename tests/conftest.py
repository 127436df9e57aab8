"""Test config: force a virtual 8-device CPU platform before JAX loads.

Multi-chip behavior (DP mesh, psum grads, sharded eval) is validated on a
host-platform mesh, as real multi-chip hardware isn't present in CI.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments register an accelerator PJRT plugin from
# sitecustomize and force it over the env var; pin the platform through
# the config API, which wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
