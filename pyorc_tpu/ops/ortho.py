"""Orthorectification: per-frame projective remap as a static-gather XLA kernel.

Replaces the reference's per-frame numpy scatter + numba group-mean
(reference ``pyorc/project.py:19-53,123-161``): the index maps (world grid <->
image pixels, computed once per video/water level by
``CameraConfig.map_idx_img_ortho`` / ``map_mean_idx_img_ortho``) become static
gather/segment-sum indices, so the whole batch of frames is remapped in one
fused device op — no data-dependent control flow, no host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["OrthoMaps", "build_ortho_maps", "project_batch"]


class OrthoMaps(NamedTuple):
    """Static index maps for one (camera_config, water level) pair."""

    idx_img: np.ndarray  # [n_nn] flat source-image indices (nearest-neighbour)
    ortho_pos: np.ndarray  # [n_nn] flat target-grid indices for the NN scatter
    gather_idx: np.ndarray  # [rows*cols] inverse map: source index per target
    # cell (uncovered cells clamp to 0 and are zeroed by covered_mask)
    covered_mask: np.ndarray  # [rows*cols] float32 1.0 where a source exists
    src_idx: Optional[np.ndarray]  # [n_mean] flat source indices for group-mean
    uidx: Optional[np.ndarray]  # [n_groups] target indices receiving means
    norm_idx: Optional[np.ndarray]  # [n_mean] group id per src sample
    shape_in: Tuple[int, int]  # (H, W) of camera frames
    shape_out: Tuple[int, int]  # (rows, cols) of ortho grid


def build_ortho_maps(camera_config, x, y, z, reducer: str = "mean") -> OrthoMaps:
    """Precompute index maps on the host (once per video / water level)."""
    idx_img, idx_ortho = camera_config.map_idx_img_ortho(x, y, z)
    ortho_pos = np.where(idx_ortho)[0]
    if reducer == "mean":
        src_idx, uidx, norm_idx = camera_config.map_mean_idx_img_ortho(x, y, z)
    else:
        src_idx = uidx = norm_idx = None
    # invert the NN scatter into a gather (each target cell is written at most
    # once): TPU scatters serialize, gathers stream — this is the difference
    # between ~77 and ~6 ms per 4K frame
    gather_idx = np.zeros(len(x) * len(y), np.int32)
    gather_idx[np.asarray(ortho_pos)] = np.asarray(idx_img)
    covered_mask = np.zeros(len(x) * len(y), np.float32)
    covered_mask[np.asarray(ortho_pos)] = 1.0
    return OrthoMaps(
        idx_img=np.asarray(idx_img, dtype=np.int32),
        ortho_pos=np.asarray(ortho_pos, dtype=np.int32),
        gather_idx=gather_idx,
        covered_mask=covered_mask,
        src_idx=None if src_idx is None else np.asarray(src_idx, dtype=np.int32),
        uidx=None if uidx is None else np.asarray(uidx, dtype=np.int32),
        norm_idx=None if norm_idx is None else np.asarray(norm_idx, dtype=np.int32),
        shape_in=(camera_config.height, camera_config.width),
        shape_out=(len(y), len(x)),
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def _project_batch_jit(flat_frames, maps_arrays, n_groups, shape_out):
    gather_idx, covered_mask, src_idx, norm_idx, uidx = maps_arrays
    ny, nx = shape_out
    t = flat_frames.shape[0]
    # gather in the SOURCE dtype (uint8 frames stream 4x less than f32),
    # cast after, and zero uncovered cells with the static mask (clamped
    # indices; a pad-cell concat would copy the whole frame batch)
    out = jnp.take(flat_frames, gather_idx, axis=1).astype(jnp.float32)
    out = out * covered_mask[None, :]
    if src_idx is not None:
        samples = flat_frames[:, src_idx].astype(jnp.float32)  # [T, n_mean]
        sums = jax.ops.segment_sum(samples.T, norm_idx, num_segments=n_groups).T  # [T, n_groups]
        counts = jax.ops.segment_sum(jnp.ones_like(norm_idx, dtype=jnp.float32), norm_idx, num_segments=n_groups)
        means = sums / counts[None, :]
        out = out.at[:, uidx].set(means)
    return out.reshape(t, ny, nx)


def project_batch(frames, maps: OrthoMaps):
    """Orthorectify a batch of frames [T, H, W] -> [T, rows, cols] (float32)."""
    frames = jnp.asarray(frames)
    if frames.dtype not in (jnp.uint8.dtype, jnp.float32.dtype):
        frames = frames.astype(jnp.float32)
    flat = frames.reshape(frames.shape[0], -1)
    maps_arrays = (
        jnp.asarray(maps.gather_idx),
        jnp.asarray(maps.covered_mask),
        None if maps.src_idx is None else jnp.asarray(maps.src_idx),
        None if maps.norm_idx is None else jnp.asarray(maps.norm_idx),
        None if maps.uidx is None else jnp.asarray(maps.uidx),
    )
    n_groups = 0 if maps.uidx is None else int(len(maps.uidx))
    return _project_batch_jit(flat, maps_arrays, n_groups, maps.shape_out)
