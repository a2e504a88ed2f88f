"""Test configuration: force a CPU JAX backend with 8 virtual devices so
sharding tests exercise real multi-device meshes everywhere.

NOTE: in the TPU-tunnel environment a sitecustomize imports jax and pins
`jax_platforms` to the axon TPU at interpreter startup; plain env vars are
too late. We override the config and clear any initialized backends before
any test touches jax - otherwise the whole suite silently runs over the
single-chip tunnel (hours instead of minutes, and 1-device meshes).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge
    xla_bridge._clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated (tiny shapes,
# big programs - sharded grad steps take minutes to build on CPU); caching
# makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()
