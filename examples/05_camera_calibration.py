"""Lens calibration from a chessboard video.

Mirrors the reference tutorial ``05_Camera_calibration.ipynb``: detect
chessboard corners over staggered sample frames of a calibration video,
solve the pinhole + Brown-Conrady model (Zhang's method, in-tree — no
OpenCV in the math path), and store camera matrix + distortion coefficients
on a CameraConfig.

Run:  python examples/05_camera_calibration.py [output_dir] [max_imgs]
"""

import os
import sys

CALIB_VIDEO = "/root/reference/examples/camera_calib/camera_calib_720p.mkv"


def main(out_dir: str, max_imgs: int = 12) -> None:
    import numpy as np

    from pyorc_tpu import CameraConfig

    os.makedirs(out_dir, exist_ok=True)
    cc = CameraConfig(height=720, width=1280)
    cc.set_lens_calibration(
        CALIB_VIDEO, chessboard_size=(9, 6), max_imgs=max_imgs, plot=False, progress_bar=True
    )
    k = np.asarray(cc.camera_matrix)
    d = np.asarray(cc.dist_coeffs).ravel()
    print(f"camera matrix: fx={k[0, 0]:.1f} fy={k[1, 1]:.1f} cx={k[0, 2]:.1f} cy={k[1, 2]:.1f}")
    print(f"distortion (k1, k2, ...): {[round(float(x), 4) for x in d[:4]]}")

    out_json = os.path.join(out_dir, "calibrated_cam.json")
    cc.to_file(out_json)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/pyorc_tpu_example05",
        int(sys.argv[2]) if len(sys.argv) > 2 else 12,
    )
