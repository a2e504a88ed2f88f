"""Force a CPU jax backend with N virtual devices, even where a
sitecustomize pins the platform to the TPU tunnel at interpreter startup
(plain env vars are too late there - same trick as tests/conftest.py).

Import and call force_cpu() BEFORE any other jax use:

    from benchmarks.forcecpu import force_cpu
    force_cpu(8)
"""
import os


def force_cpu(n_devices: int = 8):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
    except Exception:
        pass
    assert jax.default_backend() == "cpu", jax.default_backend()
    return jax
