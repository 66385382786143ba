"""Space-Time Image Velocimetry (STIV) — measuring flow without PIV windows.

STIV is a beyond-reference capability: pyOpenRiverCam lists it as a
wished-for feature (reference ``README.md:22``) but does not implement it.
pyorc_tpu ships a batched XLA implementation (:mod:`pyorc_tpu.ops.stiv`):
pixels are sampled along flow-aligned search lines, stacked over time into
space-time images, and the dominant streak angle — from a closed-form
structure-tensor eigen-analysis — gives the streamwise velocity per line.
STIV shines where PIV struggles: thin strong glare streaks, low frame rates,
or when you only need a handful of profile lines instead of a full field.

This example renders a synthetic river whose surface texture advects at a
KNOWN velocity, then recovers it three ways:

1. ``Frames.get_stiv`` with one velocity per search line,
2. the windowed profile mode (velocity as a function of position along
   each line),
3. the recipe/service route used by ``pyorc-tpu velocimetry`` — the same
   ``stiv:`` section you would put in a YAML recipe:

   .. code-block:: yaml

      stiv:
        write: True
        left_bank:
          shapefile: cross_section.geojson   # line in CRS coordinates
          length: 2.0        # metres of search line per sample point
          distance: 1.0      # spacing of line centres along the section
          min_coherence: 0.4 # drop low-texture lines
        # or explicit centres in projected-local metres:
        mid_channel:
          centers: [[3.2, 1.4], [3.2, 2.0]]
          angle: 0.0         # flow direction, radians from +x toward +y
          length: 2.0

Run:  python examples/07_stiv_velocimetry.py
"""

import json

import numpy as np

RES = 0.02  # m/px of the projected grid
FPS = 25.0
V_TRUE = 0.5  # m/s, toward +x


def synthetic_projected_frames():
    """A projected frames DataArray whose texture advects at V_TRUE m/s."""
    from scipy.ndimage import gaussian_filter, map_coordinates

    from pyorc_tpu import ndx

    rng = np.random.default_rng(7)
    h, w, t_len = 128, 256, 40
    base = gaussian_filter(rng.normal(size=(h, w * 2)), 2.0)
    yy, xg = np.mgrid[0:h, 0:w].astype(float)
    vpx = V_TRUE / RES / FPS  # px/frame
    frames = np.stack(
        [map_coordinates(base, [yy, xg - vpx * t + w / 2], order=1, mode="wrap") for t in range(t_len)]
    ).astype(np.float32)

    x = (np.arange(w) + 0.5) * RES
    y = ((np.arange(h) + 0.5) * RES)[::-1]
    xs, ys = np.meshgrid(x, y)
    cc = {"height": h, "width": w, "resolution": RES, "window_size": 32}
    return ndx.DataArray(
        frames,
        dims=("time", "y", "x"),
        coords={"time": np.arange(t_len) / FPS, "y": y, "x": x,
                "xs": (("y", "x"), xs), "ys": (("y", "x"), ys)},
        attrs={"camera_config": json.dumps(cc), "camera_shape": str([h, w])},
        name="frames",
    )


def main():
    da = synthetic_projected_frames()
    w_m = float(da["x"].values[-1] + RES / 2)
    h_m = float(da["y"].values[0] + RES / 2)

    # 1. one velocity per search line, lines spread across the "river"
    centers = np.array([[w_m / 2, h_m * f] for f in (0.3, 0.5, 0.7)])
    ds = da.frames.get_stiv(centers, angle=0.0, length=3.0, min_coherence=0.4)
    v = np.asarray(ds["v"].values)
    coh = np.asarray(ds["coherence"].values)
    print(f"true velocity        : {V_TRUE:.3f} m/s")
    print(f"STIV per-line        : {np.round(v, 3)} m/s  (coherence {np.round(coh, 2)})")
    assert np.all(np.abs(v - V_TRUE) < 0.05 * V_TRUE), "STIV missed the synthetic truth"

    # 2. profile mode: velocity along each line, averaged over 16-sample boxes
    prof = da.frames.get_stiv(centers[:1], angle=0.0, length=4.0, window=16)
    vp = np.asarray(prof["v"].values)
    print(f"STIV profile         : {vp.shape[1]} points, spread {np.nanstd(vp):.4f} m/s")
    assert np.nanstd(vp) < 0.1 * V_TRUE

    # 3. the service/recipe route (what `pyorc-tpu velocimetry` runs):
    #    explicit centres variant of the YAML above
    from pyorc_tpu.service.velocimetry import VelocityFlowProcessor

    stage = VelocityFlowProcessor.stiv  # the recipe section lands here
    print(f"recipe `stiv:` section handled by {stage.__qualname__}")
    print("STIV example OK")


if __name__ == "__main__":
    main()
