"""CameraConfig parity tests against the reference's golden fixture values
(reference tests/test_cameraconfig.py + tests/conftest.py)."""

import json
import os

import numpy as np
import pytest

import pyorc_tpu
from pyorc_tpu.geom import calibrate as calib
from pyorc_tpu.geom import shapes

GCPS_SRC = [[1421, 1001], [1251, 460], [421, 432], [470, 607]]
GCPS_DST = [
    [642735.8076, 8304292.1190],
    [642737.5823, 8304295.593],
    [642732.7864, 8304298.4250],
    [642732.6705, 8304296.8580],
]
LENS_POSITION = [642732.6705, 8304289.010, 1188.5]
CAMERA_MATRIX = [[1550.0, 0.0, 960.0], [0.0, 1550.0, 540.0], [0.0, 0.0, 1.0]]
DIST_COEFFS = [[0.0], [0.0], [0.0], [0.0]]
CORNERS = [[500, 800], [400, 600], [1200, 550], [1350, 650]]

# golden values from reference tests
BBOX_GOLDEN = (
    "POLYGON ((642730.233168765 8304293.351276383, 642731.5013330225 8304302.039208209, "
    "642739.2789120832 8304300.903926767, 642738.0107478257 8304292.215994941, "
    "642730.233168765 8304293.351276383))"
)
BBOX_6GCPS_GOLDEN = (
    "POLYGON ((192103.06271249574 313152.336519752, 192096.59215064772 313165.9688317118, "
    "192104.64144816675 313169.78942190844, 192111.11201001477 313156.1571099486, "
    "192103.06271249574 313152.336519752))"
)
BBOX_LENGTH_WIDTH_GOLDEN = (
    "POLYGON ((192107.83288965575 313141.63836730976, 192098.26477193346 313161.19585627265, "
    "192106.68147560649 313165.31356339395, 192116.24959332877 313145.75607443106, "
    "192107.83288965575 313141.63836730976))"
)


@pytest.fixture
def gcps():
    return dict(src=[list(p) for p in GCPS_SRC], dst=[list(p) for p in GCPS_DST], z_0=1182.2, h_ref=0.0)


@pytest.fixture
def cam_config(gcps):
    return pyorc_tpu.CameraConfig(
        height=1080,
        width=1920,
        gcps=gcps,
        lens_position=list(LENS_POSITION),
        dist_coeffs=[list(r) for r in DIST_COEFFS],
        camera_matrix=[list(r) for r in CAMERA_MATRIX],
        corners=[list(c) for c in CORNERS],
        window_size=25,
        resolution=0.01,
        crs=32735,
    )


@pytest.fixture
def cam_config_6gcps(geul_cam_config_json):
    from pyorc_tpu.api.cameraconfig import get_camera_config

    return get_camera_config(json.dumps(geul_cam_config_json))


def test_gcps_mean(cam_config):
    assert np.allclose(cam_config.gcps_mean, np.array([642734.7117, 8304295.74875, 1182.2]))


def test_bbox_from_corners_golden(cam_config):
    golden = shapes.loads(BBOX_GOLDEN)
    assert np.allclose(cam_config.bbox.bounds, golden.bounds, atol=1e-6)


def test_bbox_from_corners_6gcps_golden(cam_config_6gcps):
    cam_config_6gcps.set_bbox_from_corners([[390, 440], [1060, 160], [1800, 270], [1500, 880]])
    golden = shapes.loads(BBOX_6GCPS_GOLDEN)
    assert np.allclose(cam_config_6gcps.bbox.bounds, golden.bounds, atol=1e-5)


def test_bbox_from_width_length_golden(cam_config_6gcps):
    cam_config_6gcps.set_bbox_from_width_length([[250, 450], [1500, 1050], [1060, 160]])
    golden = shapes.loads(BBOX_LENGTH_WIDTH_GOLDEN)
    assert np.allclose(cam_config_6gcps.bbox.bounds, golden.bounds, atol=1e-5)


def test_shape_golden(cam_config):
    assert cam_config.shape == (475, 371)


def test_transform_golden(cam_config):
    assert np.allclose(
        tuple(cam_config.transform),
        (
            -0.001107604584241635,
            0.009938471315296278,
            642732.3625957984,
            0.009938471315296278,
            0.001107604584241631,
            8304293.51724592,
        ),
    )


def test_get_depth(cam_config):
    z = np.array([1182.2, 1182.0, 1181.9])
    depth = cam_config.get_depth(z, h_a=0.0)
    assert np.allclose(depth, [0.0, 0.2, 0.3])


def test_h_z_conversions(cam_config):
    assert np.isclose(cam_config.h_to_z(0.0), 1182.2)
    assert np.isclose(cam_config.z_to_h(1182.2), 0.0)
    assert np.isclose(cam_config.get_z_a(0.5), 1182.7)
    assert np.isclose(cam_config.get_z_a(None), 1182.2)


def test_get_M_golden(cam_config):
    M = cam_config.get_M(h_a=0.0, to_bbox_grid=True)
    M_expected = np.array(
        [
            [-4.62466994e-01, -7.62938375e-01, 8.75609302e02],
            [6.48451357e-01, -6.15534992e-01, -2.04821521e02],
            [-1.21275313e-04, 6.33985726e-04, 1.00000000e00],
        ]
    )
    assert np.allclose(M, M_expected, rtol=1e-4)
    M2 = cam_config.get_M(h_a=0.0, to_bbox_grid=False)
    M2_expected = np.array(
        [
            [6.95684503e-03, -5.27244231e-03, -3.00544137e00],
            [-3.87798711e-03, -8.26420874e-03, 8.47535569e00],
            [-1.21275338e-04, 6.33985524e-04, 1.00000000e00],
        ]
    )
    assert np.allclose(M2, M2_expected, rtol=1e-4)


def test_estimate_lens_position_golden(cam_config):
    lens_pos = cam_config.estimate_lens_position()
    assert np.allclose(lens_pos, [6.42731099e05, 8.30429131e06, 1.18996749e03])


def test_unproject_points_roundtrip(cam_config, cam_config_6gcps):
    for cc in (cam_config, cam_config_6gcps):
        dst = cc.gcps_dest
        src_est = cc.project_points(dst)
        zs = [pt[-1] for pt in dst]
        dst_est = cc.unproject_points(src_est, zs)
        assert np.allclose(dst, dst_est)


def test_rotate(cam_config_6gcps):
    new_config, error = cam_config_6gcps.rotate([[0, 0], [100, 0], [0, 100]], [[1, 0], [101, 0.5], [1.0, 100.5]])
    assert isinstance(new_config, pyorc_tpu.CameraConfig)
    assert len(error) == 3
    assert np.allclose(error, 0, atol=0.005)


def test_rotate_translate_bbox(cam_config_6gcps):
    bbox_rotated = cam_config_6gcps.rotate_translate_bbox(angle=0.25 * np.pi, xoff=10, yoff=10).bbox
    assert np.isclose(bbox_rotated.area, cam_config_6gcps.bbox.area)
    bbox_growth = cam_config_6gcps.rotate_translate_bbox(x_add=None, y_add=2).bbox
    assert bbox_growth.area > cam_config_6gcps.bbox.area


def test_set_gcps(cam_config, gcps):
    cam_config.set_gcps(**gcps)
    assert cam_config.gcps == gcps


def test_lens_position_crs_roundtrip(cam_config):
    from pyorc_tpu.api.cameraconfig import xyz_transform

    cam_config.set_lens_position(*LENS_POSITION)
    assert cam_config.lens_position == list(LENS_POSITION)
    x, y, z = LENS_POSITION
    x2, y2 = xyz_transform([[x, y]], cam_config.crs, 4326)[0]
    cam_config.set_lens_position(x2, y2, z, crs=4326)
    assert np.allclose(cam_config.lens_position, LENS_POSITION)


def test_load_reference_jsons(ngwerere_cam_config_json, geul_cam_config_json):
    """Both example configs load unchanged, with working pose."""
    from pyorc_tpu.api.cameraconfig import get_camera_config

    for d in (ngwerere_cam_config_json, geul_cam_config_json):
        cc = get_camera_config(json.dumps(d))
        rvec, tvec = np.array(cc.rvec), np.array(cc.tvec)
        assert rvec.shape[0] == 3 or rvec.size == 3
        # reprojecting gcps must land close to src (few px: GCP measurement error)
        src_est = cc.project_points(cc.gcps_dest)
        err = np.linalg.norm(src_est - np.array(cc.gcps["src"], dtype=np.float64), axis=1)
        assert np.median(err) < 20


def test_to_file_roundtrip(tmp_path, cam_config):
    fn = os.path.join(tmp_path, "cam_config.json")
    cam_config.to_file(fn)
    cam_config2 = pyorc_tpu.load_camera_config(fn)
    d1 = cam_config.to_dict()
    d2 = cam_config2.to_dict()
    assert d1["gcps"] == d2["gcps"]
    assert d1["camera_matrix"] == d2["camera_matrix"]
    assert np.allclose(cam_config.bbox.bounds, cam_config2.bbox.bounds)


def test_optimize_intrinsic_4gcps(gcps):
    """4 GCPs: only focal length fitted, distortion zeroed."""
    cm, dc, err = calib.optimize_intrinsic(
        gcps["src"],
        np.c_[gcps["dst"], np.ones(4) * gcps["z_0"]],
        1080,
        1920,
        lens_position=LENS_POSITION,
    )
    assert np.asarray(dc).ravel().tolist() == [0.0] * 5
    f = np.asarray(cm)[0, 0]
    assert 0.25 * 1920 < f < 2 * 1920
    assert err < 1.0  # reprojection error in m should be small


def test_nadir_two_points():
    cc = pyorc_tpu.CameraConfig(
        height=1080,
        width=1920,
        gcps=dict(src=[[200.0, 200.0], [1700.0, 900.0]], dst=[[2.0, 10.0], [12.0, 4.0]], z_0=100.0),
        resolution=0.05,
        window_size=10,
    )
    assert cc.is_nadir
    assert len(cc.gcps["src"]) == 4
    assert len(cc.gcps["dst"]) == 4


def test_map_idx_img_ortho(cam_config):
    rows, cols = cam_config.shape
    # build x, y axis arrays like Frames.project does
    x = np.arange(cols) * 0  # only lengths matter
    x = np.arange(cols)
    y = np.arange(rows)
    idx_img, idx_ortho = cam_config.map_idx_img_ortho(x, y, z=1182.2)
    assert idx_ortho.shape == (rows * cols,)
    assert idx_ortho.sum() > 0
    assert idx_img.max() < 1080 * 1920
    assert (idx_img >= 0).all()
    assert idx_img.shape[0] == idx_ortho.sum()


def test_map_mean_idx_img_ortho(cam_config):
    rows, cols = cam_config.shape
    x = np.arange(cols)
    y = np.arange(rows)
    src_idx, uidx, norm_idx = cam_config.map_mean_idx_img_ortho(x, y, z=1182.2)
    assert len(src_idx) == len(norm_idx)
    assert len(uidx) == norm_idx.max() + 1
    assert (uidx < rows * cols).all()
    assert (src_idx < 1080 * 1920).all()


def test_cameraconfig_plot_methods(cam_config_6gcps):
    import matplotlib

    matplotlib.use("Agg")
    cc = cam_config_6gcps
    assert cc.plot() is not None
    ax = cc.plot(mode="camera")
    assert len(ax.lines) > 0
    ax3d = cc.plot(mode="3d")
    assert ax3d.name == "3d"
    assert len(cc.plot_3d_pose(length=1.0)) == 3
    assert cc.plot_bbox(mode="camera") is not None
    import matplotlib.pyplot as plt

    plt.close("all")
