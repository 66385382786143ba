"""Multi-device execution: mesh construction and sharded PIV.

The reference is a single-node CPU code base (dask threads + numba, reference
``pyorc/velocimetry/ffpiv.py:140``); its parallelism axis — independent frame
pairs — maps directly onto a 1-D JAX device mesh. Ensemble correlation
averaging is a single ``psum`` over the pair axis (the only cross-device
collective the pipeline needs, riding ICI).
"""

from . import distributed
from .piv import make_mesh, piv_ensemble_sharded, piv_multipass_sharded, piv_pairs_sharded, piv_pairs_sharded_2d

__all__ = [
    "make_mesh",
    "piv_pairs_sharded",
    "piv_ensemble_sharded",
    "piv_multipass_sharded",
    "piv_pairs_sharded_2d",
    "distributed",
]
