"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile
checks; unit/integration tests must be hermetic, so we force the CPU
backend with 8 virtual devices.

NOTE: this environment's sitecustomize imports jax at interpreter start
(the axon TPU plugin), so setting os.environ here is too late for jax's
config defaults — we must update jax.config directly (backends are not
initialized yet, so this still takes effect)."""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# sitecustomize imports jax before this file runs, so the
# JAX_COMPILATION_CACHE_DIR env var was read too late — set it directly
# (without this, every pytest run recompiles everything from scratch).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", jax.devices()

sys.path.insert(0, _REPO)
