"""Device compute kernels: PIV FFT correlation, orthorectification, frame filters."""

from .. import _platform  # noqa: F401  (applies PYORC_TPU_PLATFORM override before jax init)
from . import piv, windows

__all__ = ["piv", "windows"]
