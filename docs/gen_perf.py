"""Regenerate ARCHITECTURE.md's measured-performance block from the newest
committed ``BENCH_FULL_r*.json``.

The builder shipped stale perf numbers in ARCHITECTURE §8 two rounds running
(round-3 and round-4 VERDICTs); this makes the section mechanical the same
way ``gen_api.py`` keeps the API reference honest. Everything between the
BEGIN/END markers is machine-written — edit the narrative around it, never
the block. ``tests/test_docs.py::test_architecture_perf_block_is_current``
fails when the block disagrees with the newest artifact.

Usage: python docs/gen_perf.py
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARCH = os.path.join(REPO, "ARCHITECTURE.md")
BEGIN = "<!-- BEGIN GENERATED perf-block (python docs/gen_perf.py) -->"
END = "<!-- END GENERATED perf-block -->"

# static per-config facts (window grid at 50% overlap on 1088x1920) — these
# are geometry, not measurements, so they live here rather than the artifact
_GRIDS = {"16px": "135×239 (32k)", "26px": "82×146 (12k)", "32px": "67×119 (8k)", "64px": "33×59 (1.9k)"}


def newest_artifact():
    """(path, round_number) of the newest BENCH_FULL_r*.json."""
    paths = glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json"))
    if not paths:
        raise FileNotFoundError("no BENCH_FULL_r*.json artifact committed")
    def rnd(p):
        m = re.search(r"BENCH_FULL_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    best = max(paths, key=rnd)
    return best, rnd(best)


def render(bench: dict, name: str) -> str:
    lines = [
        BEGIN,
        f"Source artifact: `{name}` (one tunneled v5e chip, 64-pair batches,",
        "1080p = 1088×1920, 50% overlap; fp32 TFLOP/s counts USEFUL matmul-DFT",
        "FLOPs only — 36·w³ per window, excluding pack redundancy).",
        "",
        f"Headline {bench['metric']}: **{bench['value']} pairs/s**"
        f" ({bench['fp32_tflops']} useful fp32 TFLOP/s;"
        f" vs_baseline {bench['vs_baseline']} over the round-2 anchor of 754.34).",
        "",
        "Per-pair fused path:",
        "",
        "| window | grid (windows) | fused pairs/s | fused fp32 TFLOP/s |",
        "|---|---|---|---|",
    ]
    for key, cfg in bench["configs"].items():
        px = key.split("_")[0]
        lines.append(f"| {px} | {_GRIDS.get(px, '—')} | **{cfg['pairs_per_sec']}** | {cfg['fp32_tflops']} |")
    hl = f"| 64px | {_GRIDS['64px']} | **{bench['value']}** | {bench['fp32_tflops']} |"
    lines.append(hl)
    lines += [
        "",
        "Ensemble path (long-video production configuration, corr accumulated",
        "in VMEM; `route` is the kernel that actually ran — recorded by the",
        "strict-mode bench run, so a silent fallback cannot hide here):",
        "",
        "| window | ensemble pairs/s | route |",
        "|---|---|---|",
    ]
    for key, cfg in bench["ensemble"].items():
        px = key.split("_")[0]
        lines.append(f"| {px} | **{cfg['pairs_per_sec']}** | {cfg.get('route', '?')} |")
    lines += [
        "",
        "Fused-vs-XLA displacement parity (px, on-chip; `cond_max` is the",
        "contract — see below):",
        "",
        "| window | q95 | max | frac>0.5px | cond_max |",
        "|---|---|---|---|---|",
    ]
    for px, p in bench["parity_px"].items():
        lines.append(
            f"| {px} | {p['q95']} | {p['max']} | {p['frac_gt_0.5px']} | {p['cond_max']} |"
        )
    chain = bench.get("chain_4k_pairs_per_sec")
    if chain is not None:
        lines += [
            "",
            f"Measured 4K chain (normalize → orthorectify → ensemble-PIV 64 px):"
            f" **{chain} pairs/s/chip** → the 1799-pair BASELINE 1-minute"
            f" workload is {1799 / chain:.1f} s of chip time on ONE chip.",
        ]
    lines.append(END)
    return "\n".join(lines)


E2E_BEGIN = "<!-- BEGIN GENERATED e2e-block (python docs/gen_perf.py) -->"
E2E_END = "<!-- END GENERATED e2e-block -->"


def render_e2e(e: dict) -> str:
    """One paragraph from E2E_60S.json (the committed full-60s run)."""
    st = e["stages_s"]
    decode_floor = e["n_frames"] / e["decode_fps"]
    full_gb = e["n_frames"] * 3840 * 2160 / 1e9
    upl = e.get("upload_gb", full_gb)
    upl_txt = (
        f"~{upl:.0f} GB of tunneled frame uploads"
        + (f" (bbox-cropped from {full_gb:.0f} GB)" if upl < 0.95 * full_gb else "")
    )
    return "\n".join([
        E2E_BEGIN,
        f"`E2E_60S.json` (measured at HEAD): **{e['value']} s** single-chip wall"
        f" in this container for the {e['n_frames']}-frame 4K workload"
        f" (stages: video_open {st['video_open']} s, lazy chain setup"
        f" {st['lazy_chain_setup']} s, decode+ortho+PIV {st['decode_ortho_piv']} s,"
        f" transect+discharge {st['transect_discharge']} s). The pipeline stage is"
        f" bounded below by {decode_floor:.0f} s of single-core"
        f" {e['decode_fps']} fps H.264 decode and dominated by {upl_txt};"
        f" the labeled extrapolation"
        f" ({e['est_v5e8_seconds_extrapolated']} s on a v5e-8 with this host) is"
        f" decode-limited, i.e. entirely a host-CPU artifact of the"
        f" {e['host_cores']}-core container.",
        E2E_END,
    ])


def generate() -> str:
    """The full ARCHITECTURE.md text with fresh perf + e2e blocks."""
    path, _ = newest_artifact()
    with open(path) as f:
        bench = json.load(f)
    block = render(bench, os.path.basename(path))
    with open(ARCH) as f:
        text = f.read()
    i, j = text.index(BEGIN), text.index(END) + len(END)
    text = text[:i] + block + text[j:]
    e2e_path = os.path.join(REPO, "E2E_60S.json")
    if os.path.isfile(e2e_path) and E2E_BEGIN in text:
        with open(e2e_path) as f:
            e2e = json.load(f)
        i, j = text.index(E2E_BEGIN), text.index(E2E_END) + len(E2E_END)
        text = text[:i] + render_e2e(e2e) + text[j:]
    return text


if __name__ == "__main__":
    out = generate()
    with open(ARCH, "w") as f:
        f.write(out)
    print(f"rewrote {ARCH} perf block from {newest_artifact()[0]}")
