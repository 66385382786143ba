"""End-to-end benchmark: decode -> orthorectify -> ensemble PIV -> discharge.

Measures the BASELINE.md headline workload — a 1-minute 4K@30fps river video
through the full pipeline — on ONE chip, with the decode/compute overlap
reported (the lazy frame chain runs decode + filters + orthorectification in
the prefetch thread while the PIV kernel occupies the device). The v5e-8
figure is an EXTRAPOLATION (PIV pair-sharding is embarrassingly parallel; see
pyorc_tpu/parallel) and is labeled as such.

Environment caveats the numbers carry: this dev container exposes ONE cpu
core (4K H.264 decode is ~4 fps/core; production hosts bring 32-96 cores and
the GOP-parallel reader scales with them — thread sweep measured by
bench_decode.py -> DECODE_SCALING.json) and reaches the TPU through a
tunnel that costs ~100 ms + limited bandwidth per transfer (production hosts
sit on PCIe). The chip-bound PIV rate itself is measured separately by
bench.py with on-device data.

The clip is synthesized once (particle texture advected at a known speed,
H.264 via the native libx264 writer) and cached under /tmp. Run with
``--seconds 10`` for a quick pass; default is the full 60 s workload.

Prints ONE JSON line.
"""

import argparse
import json
import os
import time

import numpy as np

W_IMG, H_IMG = 3840, 2160
FPS = 30.0
RES = 0.01  # m/px at the water plane
DX_PIX, DY_PIX = 1.8, -0.9  # px/frame advection -> |v| ~ 0.6 m/s


def synth_clip(path: str, n_frames: int) -> float:
    """Render + H.264-encode the advecting particle clip; returns seconds."""
    from scipy.ndimage import gaussian_filter

    from pyorc_tpu.io.native_decoder import NativeVideoWriter

    rng = np.random.default_rng(11)
    pad_x = int(abs(DX_PIX) * n_frames + 2)
    pad_y = int(abs(DY_PIX) * n_frames + 2)
    big_h, big_w = H_IMG + pad_y, W_IMG + pad_x
    n_particles = int(big_h * big_w * 0.006)
    img = np.zeros((big_h, big_w), np.float32)
    xs = rng.uniform(0, big_w - 1, n_particles)
    ys = rng.uniform(0, big_h - 1, n_particles)
    np.add.at(img, (ys.astype(int), xs.astype(int)), rng.uniform(0.5, 1.0, n_particles))
    img = gaussian_filter(img, 1.2)
    img = np.clip(img / img.max() * 235 + 15, 0, 255)

    t0 = time.perf_counter()
    with NativeVideoWriter(path, W_IMG, H_IMG, fps=FPS, channels=1, crf=20) as wr:
        for i in range(n_frames):
            # slide a window over the big texture with bilinear subpixel
            ox = DX_PIX * i if DX_PIX >= 0 else pad_x - 1 + DX_PIX * i
            oy = DY_PIX * i if DY_PIX >= 0 else pad_y - 1 + DY_PIX * i
            ix, iy = int(ox), int(oy)
            fx, fy = ox - ix, oy - iy
            w00 = (1 - fy) * (1 - fx)
            w01 = (1 - fy) * fx
            w10 = fy * (1 - fx)
            w11 = fy * fx
            sl = img[iy : iy + H_IMG + 1, ix : ix + W_IMG + 1]
            frame = (
                w00 * sl[:-1, :-1] + w01 * sl[:-1, 1:] + w10 * sl[1:, :-1] + w11 * sl[1:, 1:]
            )
            wr.write(frame.astype(np.uint8))
    return time.perf_counter() - t0


def nadir_config():
    import pyorc_tpu

    f = 6000.0
    src = [[200, 200], [3640, 200], [3640, 1960], [200, 1960]]
    dst = [[RES * c, RES * (H_IMG - r)] for c, r in src]
    cc = pyorc_tpu.CameraConfig(
        height=H_IMG,
        width=W_IMG,
        resolution=RES,
        window_size=64,
        gcps={"src": src, "dst": dst, "h_ref": 0.0, "z_0": 0.0},
        camera_matrix=[[f, 0.0, W_IMG / 2], [0.0, f, H_IMG / 2], [0.0, 0.0, 1.0]],
        dist_coeffs=[[0.0]] * 5,
        stabilize=None,
    )
    cc.set_bbox_from_corners([[300, 300], [3540, 300], [3540, 1860], [300, 1860]])
    return cc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    import pyorc_tpu

    n_frames = int(args.seconds * FPS)
    clip = f"/tmp/pyorc_tpu_e2e_{int(args.seconds)}s_4k.mp4"
    t_render = 0.0
    if args.no_cache or not os.path.isfile(clip):
        # write-then-rename so an interrupted render never leaves a truncated
        # clip behind for the cache check
        tmp = clip + ".tmp.mp4"
        t_render = synth_clip(tmp, n_frames)
        os.replace(tmp, clip)

    cc = nadir_config()
    cc.window_size = args.window

    stages = {}
    t0 = time.perf_counter()
    video = pyorc_tpu.Video(clip, camera_config=cc, start_frame=0, end_frame=n_frames - 1, h_a=0.0)
    stages["video_open"] = time.perf_counter() - t0

    # decode-only throughput on a probe slice (for the overlap accounting).
    # The probe's wall time is reported separately and NOT counted in the
    # pipeline total: it is measurement overhead (the lazy chain re-decodes
    # these frames as part of its own timed stage).
    t0 = time.perf_counter()
    probe_n = min(64, n_frames)
    _ = np.asarray(video.get_frames().data[:probe_n])
    probe_s = time.perf_counter() - t0
    decode_fps = probe_n / probe_s

    t0 = time.perf_counter()
    da = video.get_frames()
    da = da.frames.normalize(samples=8)
    proj = da.frames.project()
    stages["lazy_chain_setup"] = time.perf_counter() - t0  # incl. sampled-mean decode

    # per-frame upload footprint after the host-side bbox crop (probe the
    # chain's first op; it returns (cropped, stats) when the crop engaged)
    probe = proj.data._ops[0](np.zeros((1, H_IMG, W_IMG), np.uint8))
    upl_shape = (probe[0] if isinstance(probe, tuple) else probe).shape[1:]
    upload_gb = n_frames * int(np.prod(upl_shape)) / 1e9

    t0 = time.perf_counter()
    piv = proj.frames.get_piv(window_size=args.window, ensemble_corr=True)
    stages["decode_ortho_piv"] = time.perf_counter() - t0

    # discharge over a synthetic parabolic cross-section spanning the bbox
    t0 = time.perf_counter()
    coords = np.asarray(cc.bbox.exterior.coords)
    p_left = (coords[0] + coords[1]) / 2
    p_right = (coords[2] + coords[3]) / 2
    n = 31
    xs = np.linspace(p_left[0], p_right[0], n)
    ys = np.linspace(p_left[1], p_right[1], n)
    t = np.linspace(-1, 1, n)
    zs = -0.05 - 0.4 * (1 - t**2)
    tr = piv.velocimetry.get_transect(xs, ys, zs, wdw=1)
    tr = tr.transect.get_q(fill_method="interpolate")
    tr.transect.get_river_flow()
    q_med = float(np.nanmedian(tr["river_flow"].values))
    stages["transect_discharge"] = time.perf_counter() - t0

    total = sum(stages.values())
    n_pairs = n_frames - 1
    pairs_per_sec = n_pairs / stages["decode_ortho_piv"]
    decode_limit = n_frames / decode_fps
    # extrapolation: pair-parallel PIV splits the device-bound part 8 ways;
    # decode stays host-bound unless hosts scale too (stated, not measured)
    chip_bound = max(stages["decode_ortho_piv"] - decode_limit, 0.0)
    est_v5e8 = (
        stages["video_open"]
        + stages["lazy_chain_setup"]
        + max(decode_limit, chip_bound / 8)
        + stages["transect_discharge"]
    )

    print(
        json.dumps(
            {
                "metric": f"e2e_4k_{int(args.seconds)}s_single_chip_seconds",
                "value": round(total, 2),
                "unit": "s",
                "vs_baseline": round(5.0 / total, 4),  # BASELINE: <5 s on v5e-8
                "stages_s": {k: round(v, 2) for k, v in stages.items()},
                "decode_fps": round(decode_fps, 1),
                "probe_decode_s_excluded": round(probe_s, 2),
                "pairs_per_sec_e2e": round(pairs_per_sec, 1),
                "river_flow_m3s_median": round(q_med, 3),
                "clip_render_s": round(t_render, 1),
                "est_v5e8_seconds_extrapolated": round(est_v5e8, 2),
                "n_frames": n_frames,
                "host_cores": os.cpu_count(),
                "upload_gb": round(upload_gb, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
