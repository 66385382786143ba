"""Device compute kernels: PIV FFT correlation, orthorectification, frame filters."""

from . import piv, windows

__all__ = ["piv", "windows"]
