"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against
XLA's host-platform device virtualization.
"""

import os

# force CPU regardless of shell env: the container's sitecustomize registers
# the "axon" TPU backend at interpreter start and sets jax_platforms, so env
# vars alone are not enough — override the live jax config before any backend
# initialization. Tests need the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# any exception-driven kernel fallback (fused Pallas kernel fails, ladder
# downgrades to a slower variant) is a hard FAILURE under pytest: tests must
# exercise the kernel they claim to, never a silent downgrade. Geometry-based
# routing (non-square windows -> XLA) is intended behavior and stays allowed.
os.environ["PYORC_TPU_STRICT_KERNELS"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference"
NGWERERE = os.path.join(REF, "examples", "ngwerere")
GEUL = os.path.join(REF, "examples", "geul")
CALIB = os.path.join(REF, "examples", "camera_calib")


@pytest.fixture(scope="session")
def ngwerere_cam_config_json():
    import json

    with open(os.path.join(NGWERERE, "ngwerere.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def ngwerere_piv_ref():
    """Reference PIV output dataset (golden values from the CPU reference)."""
    from pyorc_tpu import open_dataset

    return open_dataset(os.path.join(NGWERERE, "ngwerere_piv.nc"))


@pytest.fixture(scope="session")
def ngwerere_masked_ref():
    from pyorc_tpu import open_dataset

    return open_dataset(os.path.join(NGWERERE, "ngwerere_masked.nc"))


@pytest.fixture(scope="session")
def geul_video_path():
    return os.path.join(GEUL, "dk_control.mp4")


@pytest.fixture(scope="session")
def geul_cam_config_json():
    import json

    with open(os.path.join(GEUL, "dk_cam_config.json")) as fh:
        return json.load(fh)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
