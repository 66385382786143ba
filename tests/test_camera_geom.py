"""Geometry core tests — validated against OpenCV as an independent oracle."""

import cv2
import numpy as np
import pytest

from pyorc_tpu.geom import camera as cam

K = np.array([[1552.16, 0.0, 960.0], [0.0, 1552.16, 540.0], [0.0, 0.0, 1.0]])
DIST5 = np.array([-0.25, 0.08, 0.001, -0.0005, 0.02])


@pytest.fixture
def pose(rng):
    rvec = np.array([0.3, -0.2, 0.1])
    tvec = np.array([1.0, -2.0, 10.0])
    return rvec, tvec


def test_rodrigues_roundtrip(rng):
    for _ in range(20):
        rvec = rng.normal(size=3)
        R = cam.rodrigues(rvec)
        R_cv, _ = cv2.Rodrigues(rvec)
        assert np.allclose(R, R_cv, atol=1e-10)
        back = cam.rodrigues_inv(R)
        assert np.allclose(back, rvec.ravel(), atol=1e-8)


def test_project_points_vs_cv2(rng, pose):
    rvec, tvec = pose
    pts = rng.uniform(-3, 3, size=(50, 3)) + np.array([0, 0, 0.0])
    ours = cam.project_points(pts, rvec, tvec, K, DIST5)
    ref, _ = cv2.projectPoints(pts, rvec, tvec, K, DIST5)
    assert np.allclose(ours, ref[:, 0], atol=1e-6)


def test_project_points_no_dist(rng, pose):
    rvec, tvec = pose
    pts = rng.uniform(-3, 3, size=(20, 3))
    ours = cam.project_points(pts, rvec, tvec, K, None)
    ref, _ = cv2.projectPoints(pts, rvec, tvec, K, np.zeros(5))
    assert np.allclose(ours, ref[:, 0], atol=1e-6)


def test_undistort_points_vs_cv2(rng):
    pts = rng.uniform([100, 100], [1800, 1000], size=(40, 2))
    ours = cam.undistort_points(pts, K, DIST5, P="same")
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, DIST5, P=K)[:, 0]
    # cv2 runs only 5 fixed-point iterations; ours runs 40 (more converged),
    # so agreement is limited by cv2's truncation (~2e-3 px at frame corners)
    assert np.allclose(ours, ref, atol=5e-3)
    # normalized output
    ours_n = cam.undistort_points(pts, K, DIST5, P=None)
    ref_n = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, DIST5)[:, 0]
    assert np.allclose(ours_n, ref_n, atol=5e-6)


def test_distort_undistort_roundtrip(rng):
    pts = rng.uniform([300, 300], [1600, 800], size=(30, 2))
    und = cam.undistort_points(pts, K, DIST5)
    back = cam.distort_points(und, K, DIST5)
    assert np.allclose(back, pts, atol=1e-6)


def test_perspective_transform_vs_cv2(rng):
    src = np.float64([[0, 0], [1920, 0], [1920, 1080], [0, 1080]])
    dst = src * 0.01 + rng.normal(scale=1.0, size=(4, 2))
    M = cam.get_perspective_transform(src, dst)
    M_cv = cv2.getPerspectiveTransform(np.float32(src), np.float32(dst))
    assert np.allclose(M / M[2, 2], M_cv / M_cv[2, 2], atol=1e-4)
    pts = rng.uniform(0, 1000, size=(10, 2))
    ours = cam.perspective_transform(pts, M)
    ref = cv2.perspectiveTransform(pts[None], M)[0]
    assert np.allclose(ours, ref, atol=1e-6)


def test_p3p_recovers_exact_pose(rng, pose):
    """P3P on 4 coplanar points: matches cv2.solvePnP(SOLVEPNP_P3P)."""
    rvec, tvec = pose
    obj = np.array([[0.0, 0, 0], [4, 0.5, 0], [4.2, 6, 0], [-0.5, 5, 0]])
    img = cam.project_points(obj, rvec, tvec, K, None)
    ok, rv, tv = cam.solve_pnp(obj, img, K, np.zeros(5))
    assert ok
    assert np.allclose(rv.ravel(), rvec, atol=1e-6)
    assert np.allclose(tv.ravel(), tvec, atol=1e-5)
    # cross-check against cv2 P3P selection behaviour
    ok_cv, rv_cv, tv_cv = cv2.solvePnP(obj, img, K, np.zeros(5), flags=cv2.SOLVEPNP_P3P)
    assert np.allclose(rv.ravel(), rv_cv.ravel(), atol=1e-5)
    assert np.allclose(tv.ravel(), tv_cv.ravel(), atol=1e-4)


def test_p3p_noisy_matches_cv2(rng, pose):
    """With noise, P3P fits pts 1-3 exactly and picks by the 4th — match cv2."""
    rvec, tvec = pose
    obj = np.array([[0.0, 0, 0], [4, 0.5, 0], [4.2, 6, 0], [-0.5, 5, 0]])
    img = cam.project_points(obj, rvec, tvec, K, None) + rng.normal(scale=1.5, size=(4, 2))
    ok, rv, tv = cam.solve_pnp(obj, img, K, np.zeros(5))
    ok_cv, rv_cv, tv_cv = cv2.solvePnP(obj, img, K, np.zeros(5), flags=cv2.SOLVEPNP_P3P)
    assert ok and ok_cv
    assert np.allclose(rv.ravel(), rv_cv.ravel(), atol=1e-4)
    assert np.allclose(tv.ravel(), tv_cv.ravel(), atol=1e-3)


def test_pnp_iterative_6points(rng, pose):
    rvec, tvec = pose
    obj = rng.uniform(-4, 4, size=(8, 3))
    obj[:, 2] = rng.uniform(-1, 1, size=8)
    img = cam.project_points(obj, rvec, tvec, K, DIST5)
    ok, rv, tv = cam.solve_pnp(obj, img, K, DIST5)
    assert ok
    assert np.allclose(rv.ravel(), rvec, atol=1e-6)
    assert np.allclose(tv.ravel(), tvec, atol=1e-5)


def test_pnp_iterative_noisy_matches_cv2(rng, pose):
    rvec, tvec = pose
    obj = rng.uniform(-4, 4, size=(10, 3))
    obj[:, 2] = rng.uniform(-1, 1, size=10)
    img = cam.project_points(obj, rvec, tvec, K, None) + rng.normal(scale=0.8, size=(10, 2))
    ok, rv, tv = cam.solve_pnp(obj, img, K, np.zeros(5))
    ok_cv, rv_cv, tv_cv = cv2.solvePnP(obj, img, K, np.zeros(5), flags=cv2.SOLVEPNP_ITERATIVE)
    # both should converge to the same LM optimum
    assert np.allclose(rv.ravel(), rv_cv.ravel(), atol=1e-4)
    assert np.allclose(tv.ravel(), tv_cv.ravel(), atol=1e-3)


def test_homography_from_pose_vs_manual(pose):
    rvec, tvec = pose
    # points on plane z=1.5 project through homography same as full projection
    M = cam.homography_from_pose(rvec, tvec, K, z=1.5, reverse=True)
    pts_plane = np.array([[0.0, 0], [3, 1], [-2, 4]])
    via_h = cam.perspective_transform(pts_plane, M)
    via_proj = cam.project_points(np.column_stack([pts_plane, np.full(3, 1.5)]), rvec, tvec, K, None)
    assert np.allclose(via_h, via_proj, atol=1e-8)
    # reverse: image -> plane
    Minv = cam.homography_from_pose(rvec, tvec, K, z=1.5, reverse=False)
    back = cam.perspective_transform(via_h, Minv)
    assert np.allclose(back, pts_plane, atol=1e-8)


def test_unproject_to_plane_roundtrip(pose):
    rvec, tvec = pose
    world = np.array([[0.0, 0, 0.7], [3, 1, 0.7], [-2, 4, 0.7], [1, 2, 0.7]])
    img = cam.project_points(world, rvec, tvec, K, DIST5)
    back = cam.unproject_to_plane(img, 0.7, rvec, tvec, K, DIST5)
    assert np.allclose(back, world, atol=1e-6)
    # per-point z
    world2 = world.copy()
    world2[:, 2] = [0.2, 0.5, 0.9, 1.4]
    img2 = cam.project_points(world2, rvec, tvec, K, DIST5)
    back2 = cam.unproject_to_plane(img2, world2[:, 2], rvec, tvec, K, DIST5)
    assert np.allclose(back2, world2, atol=1e-6)


def test_estimate_affine_partial(rng):
    theta = 0.3
    s = 1.2
    A = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([5.0, -3.0])
    src = rng.uniform(-10, 10, size=(20, 2))
    dst = src @ A.T + t
    M = cam.estimate_affine_partial_2d(src, dst)
    assert np.allclose(M[:, :2], A, atol=1e-10)
    assert np.allclose(M[:, 2], t, atol=1e-9)
    M_cv = cv2.estimateAffinePartial2D(np.float64(src), np.float64(dst))[0]
    assert np.allclose(M, M_cv, atol=1e-6)


def test_estimate_affine_full_with_outliers(rng):
    A = np.array([[1.1, 0.2], [-0.1, 0.95]])
    t = np.array([2.0, 7.0])
    src = rng.uniform(-10, 10, size=(40, 2))
    dst = src @ A.T + t
    dst[::10] += 50  # outliers
    M, inl = cam.estimate_affine_2d(src, dst)
    assert np.allclose(M[:, :2], A, atol=1e-8)
    assert np.allclose(M[:, 2], t, atol=1e-7)
    assert inl.sum() == 36


def test_camera_position(pose):
    rvec, tvec = pose
    c = cam.camera_position(rvec, tvec)
    # projecting the camera centre: should sit at depth ~0
    R = cam.rodrigues(rvec)
    assert np.allclose(R @ c + tvec, 0, atol=1e-10)


def test_zhang_calibration(rng):
    """Synthetic chessboard calibration recovers intrinsics."""
    K_true = np.array([[900.0, 0, 640], [0, 900.0, 360], [0, 0, 1]])
    dist_true = np.array([-0.2, 0.05, 0.0, 0.0, 0.0])
    objp = np.zeros((9 * 6, 3))
    objp[:, :2] = np.mgrid[0:9, 0:6].T.reshape(-1, 2)
    obj_list, img_list = [], []
    for i in range(8):
        rvec = np.array([0.1, -0.15, 0.05]) * (i + 1) + rng.normal(scale=0.1, size=3)
        tvec = np.array([-4.0, -2.5, 14.0 + i])
        img = cam.project_points(objp, rvec, tvec, K_true, dist_true)
        if not ((img > 0).all() and (img[:, 0] < 1280).all() and (img[:, 1] < 720).all()):
            continue
        obj_list.append(objp)
        img_list.append(img + rng.normal(scale=0.1, size=img.shape))
    assert len(obj_list) >= 5
    rms, Kc, dist, rvecs, tvecs = cam.calibrate_camera_zhang(obj_list, img_list, (1280, 720))
    assert rms < 0.3
    assert np.allclose(Kc[0, 0], 900, atol=5)
    assert np.allclose(Kc[0, 2], 640, atol=5)
    # the distortion coefficients themselves are degenerate here (board covers
    # only the frame centre) — require agreement with cv2's optimum instead
    ret_cv, K_cv, d_cv, _, _ = cv2.calibrateCamera(
        [o.astype(np.float32).reshape(-1, 1, 3) for o in obj_list],
        [i.astype(np.float32).reshape(-1, 1, 2) for i in img_list],
        (1280, 720),
        None,
        None,
    )
    assert np.allclose(Kc[0, 0], K_cv[0, 0], atol=2.0)
    assert np.allclose(dist.ravel()[:2], d_cv.ravel()[:2], atol=0.01)
    assert rms <= ret_cv * 1.2


def test_calibrate_camera_from_video():
    """The chessboard-video wrapper end-to-end on the real calibration clip
    (regression: some cv2 builds return detected corners as (N, 2) instead of
    (N, 1, 2); the point lists must normalize before reaching the solver)."""
    from pyorc_tpu.io.calibration import calibrate_camera

    K, dist = calibrate_camera(
        "/root/reference/examples/camera_calib/camera_calib_720p.mkv",
        chessboard_size=(9, 6),
        max_imgs=6,
        progress_bar=False,
    )
    K = np.asarray(K)
    # 720p action-cam optics: focal ~900 px, principal point near centre
    assert 700 < K[0, 0] < 1200
    assert abs(K[0, 2] - 640) < 100 and abs(K[1, 2] - 360) < 100
    assert np.all(np.abs(np.asarray(dist).ravel()) < 1.0)
