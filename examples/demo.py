"""Self-contained end-to-end demo: synthetic river video -> discharge.

The reference ships example videos (ngwerere, geul) that are not
redistributable here, so this demo GENERATES one: a particle-textured
"river" advecting at a known speed, H.264-encoded with the native encoder,
georeferenced with a nadir camera, and pushed through the full pipeline —
decode, normalization, orthorectification, PIV, masking, transect sampling,
discharge — both through the Python API and the recipe-driven service.

Run:  python examples/demo.py [output_dir]
"""

import json
import os
import sys

import numpy as np

H_IMG, W_IMG = 480, 640
FPS = 6.25
RES = 0.01  # m/px at the water plane
DX_PIX, DY_PIX = 2.0, -1.0  # image-space advection per frame
N_FRAMES = 16


def make_video(fn: str) -> None:
    from scipy.ndimage import gaussian_filter

    from pyorc_tpu.io.native_decoder import NativeVideoWriter

    rng = np.random.default_rng(7)
    img = np.zeros((H_IMG, W_IMG))
    n_particles = 9000
    xs = rng.uniform(0, W_IMG - 1, n_particles)
    ys = rng.uniform(0, H_IMG - 1, n_particles)
    np.add.at(img, (ys.astype(int), xs.astype(int)), rng.uniform(0.5, 1.0, n_particles))
    img = gaussian_filter(img, 1.2, mode="wrap")
    img = img / img.max() * 220 + 20
    fy = np.fft.fftfreq(H_IMG)[:, None]
    fx = np.fft.fftfreq(W_IMG)[None, :]
    F = np.fft.fft2(img)
    with NativeVideoWriter(fn, W_IMG, H_IMG, fps=FPS, channels=1, crf=14) as wr:
        for i in range(N_FRAMES):
            shift = np.exp(-2j * np.pi * (fy * DY_PIX * i + fx * DX_PIX * i))
            frame = np.real(np.fft.ifft2(F * shift))
            wr.write(np.clip(frame, 0, 255).astype(np.uint8))


def make_camera_config():
    import pyorc_tpu

    f = 1000.0
    src = [[60, 60], [580, 60], [580, 420], [60, 420]]
    dst = [[RES * c, RES * (H_IMG - r)] for c, r in src]
    cc = pyorc_tpu.CameraConfig(
        height=H_IMG,
        width=W_IMG,
        resolution=RES,
        window_size=32,
        gcps={"src": src, "dst": dst, "h_ref": 0.0, "z_0": 0.0},
        camera_matrix=[[f, 0.0, W_IMG / 2], [0.0, f, H_IMG / 2], [0.0, 0.0, 1.0]],
        dist_coeffs=[[0.0]] * 5,
        stabilize=None,
    )
    cc.set_bbox_from_corners([[100, 100], [540, 100], [540, 380], [100, 380]])
    return cc


def main(out_dir: str = "demo_out") -> None:
    import pyorc_tpu

    os.makedirs(out_dir, exist_ok=True)
    video_fn = os.path.join(out_dir, "demo.mp4")
    cam_fn = os.path.join(out_dir, "camera_config.json")
    print("rendering synthetic river video...")
    make_video(video_fn)
    cc = make_camera_config()
    cc.to_file(cam_fn)

    print("running the API pipeline...")
    video = pyorc_tpu.Video(video_fn, camera_config=cc, start_frame=0, end_frame=N_FRAMES - 2, h_a=0.0)
    da = video.get_frames().frames.normalize(samples=4)
    proj = da.frames.project()
    piv = proj.frames.get_piv(window_size=32)
    masked = piv.velocimetry.mask([piv.velocimetry.mask.corr(), piv.velocimetry.mask.count()])

    # transect across the flow with a parabolic bed
    coords = np.asarray(cc.bbox.exterior.coords)
    p_left = (coords[0] + coords[1]) / 2
    p_right = (coords[2] + coords[3]) / 2
    n = 15
    xs = np.linspace(p_left[0], p_right[0], n)
    ys = np.linspace(p_left[1], p_right[1], n)
    t = np.linspace(-1, 1, n)
    zs = -0.05 - 0.3 * (1 - t**2)
    tr = masked.velocimetry.get_transect(xs, ys, zs, wdw=1)
    tr = tr.transect.get_q(fill_method="interpolate")
    tr.transect.get_river_flow()
    Q = tr["river_flow"].values
    v_expected = float(np.hypot(DX_PIX, DY_PIX) * RES * FPS)
    v_measured = float(np.nanmedian(np.hypot(masked["v_x"].values, masked["v_y"].values)))
    print(f"surface speed: measured {v_measured:.3f} m/s (true {v_expected:.3f} m/s)")
    print(f"discharge quantiles [m3/s]: {np.round(Q, 3)}")
    masked.to_netcdf(os.path.join(out_dir, "piv_masked.nc"))
    tr.to_netcdf(os.path.join(out_dir, "transect.nc"))

    print("running the recipe-driven service (CLI equivalent)...")
    feats = [
        {"type": "Feature", "properties": {}, "geometry": {"type": "Point", "coordinates": [float(a), float(b), float(c)]}}
        for a, b, c in zip(xs, ys, zs)
    ]
    cross_fn = os.path.join(out_dir, "cross.geojson")
    with open(cross_fn, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh)
    recipe = {
        "video": {"start_frame": 0, "end_frame": N_FRAMES - 2, "h_a": 0.0},
        "frames": {"normalize": {"samples": 4}},
        "velocimetry": {"get_piv": {"window_size": 32}, "write": True},
        "mask": {"write": True, "mask_group1": {"corr": None}},
        "transect": {
            "write": True,
            "transect_1": {
                "shapefile": cross_fn,
                "get_transect": {"wdw": 1},
                "get_q": {"fill_method": "interpolate"},
                "get_river_flow": None,
            },
        },
    }
    from pyorc_tpu.cli import cli_utils
    from pyorc_tpu.service import velocity_flow

    recipe = cli_utils.validate_recipe(recipe)
    camconfig = cli_utils.parse_camconfig(None, None, cam_fn)
    velocity_flow(
        recipe=recipe, videofile=video_fn, cameraconfig=camconfig, prefix="",
        output=os.path.join(out_dir, "service"), h_a=0.0,
    )
    print(f"done — outputs in {out_dir}/ (piv_masked.nc, transect.nc, service/)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
