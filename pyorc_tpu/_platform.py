"""JAX platform selection override.

The runtime environment may pin a TPU backend via sitecustomize (registering
the plugin and setting ``jax_platforms`` directly), which env vars alone
cannot override. Setting ``PYORC_TPU_PLATFORM=cpu`` (or ``tpu``/``axon``)
forces the platform before any backend initialization. Import this module
before the first ``import jax`` in compute paths.
"""

import os

_applied = False


def apply_platform_override():
    global _applied
    if _applied:
        return
    _applied = True
    platform = os.environ.get("PYORC_TPU_PLATFORM")
    if platform:
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
        if platform == "cpu":
            n = os.environ.get("PYORC_TPU_CPU_DEVICES")
            if n:
                try:
                    jax.config.update("jax_num_cpu_devices", int(n))
                except Exception:
                    pass


apply_platform_override()
