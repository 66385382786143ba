"""Camera configuration from a single video + GCPs.

Mirrors the reference tutorial ``01_Camera_Configuration_single_video.ipynb``:
build a :class:`pyorc_tpu.CameraConfig` for a real field video (the Geul
river clip shipped with the reference) from ground-control points, intrinsic
calibration values and an area of interest, write it to JSON, and render the
camera/geographic overview images.

Run:  python examples/01_camera_configuration.py [output_dir]
"""

import json
import os
import sys

REF = "/root/reference/examples/geul"


def main(out_dir: str) -> None:
    from pyorc_tpu import load_camera_config, service

    os.makedirs(out_dir, exist_ok=True)
    # GCPs + intrinsics from the reference's shipped config (in a field
    # campaign these come from survey measurements and the CLI selectors)
    with open(os.path.join(REF, "dk_cam_config.json")) as fh:
        ref_cfg = json.load(fh)

    cam_file = os.path.join(out_dir, "geul_cam_config.json")
    service.camera_config(
        video_file=os.path.join(REF, "dk_control.mp4"),
        cam_config_file=cam_file,
        gcps=ref_cfg["gcps"],
        crs=ref_cfg["crs"],
        resolution=ref_cfg["resolution"],
        window_size=ref_cfg["window_size"],
        camera_matrix=ref_cfg["camera_matrix"],
        dist_coeffs=ref_cfg["dist_coeffs"],
        bbox=ref_cfg["bbox"],
        lens_position=ref_cfg.get("lens_position"),
    )

    cc = load_camera_config(cam_file)
    print(f"wrote {cam_file}")
    print(f"  focal length: {cc.camera_matrix[0][0]:.1f} px")
    crs_name = str(cc.crs).split('"')[1] if '"' in str(cc.crs) else cc.crs
    print(f"  gcps: {len(cc.gcps['src'])}, crs: {crs_name}")
    print(f"  bbox area: {cc.bbox.area:.1f} m^2, resolution: {cc.resolution} m/px")
    for suffix in ("_geo.jpg", "_cam.jpg"):
        fn = cam_file.replace(".json", suffix)
        assert os.path.isfile(fn), fn
        print(f"  overview: {fn}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pyorc_tpu_example01")
