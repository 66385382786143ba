"""The generated API reference must stay in sync with the code.

`docs/api-reference.md` is produced by `docs/gen_api.py` (introspection over
the public surface, incl. recipe-name annotations). Regenerate and compare:
a signature or docstring change without `python docs/gen_api.py` fails here.
"""

import importlib.util
import os

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def _load_gen():
    spec = importlib.util.spec_from_file_location("gen_api", os.path.join(DOCS, "gen_api.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_reference_is_current():
    gen = _load_gen()
    fresh = gen.generate()
    with open(os.path.join(DOCS, "api-reference.md")) as f:
        committed = f.read()
    assert fresh == committed, (
        "docs/api-reference.md is stale — run `python docs/gen_api.py` and commit the result"
    )


def test_api_reference_covers_accessors():
    """Every public accessor method appears, with its recipe annotation."""
    with open(os.path.join(DOCS, "api-reference.md")) as f:
        text = f.read()
    # one spot check per accessor family + the recipe dispatch notation
    for needle in [
        "`normalize`", "`project`", "`get_piv`", "`get_stiv`",  # frames
        "recipe: `frames: {get_piv: ...}`",
        "`get_transect`", "recipe: `velocimetry: {get_transect: ...}`",
        "`window_replace`", "recipe: `mask: {<group>: {window_replace: ...}}`",
        "`get_river_flow`", "recipe: `transect: {<name>: {get_river_flow: ...}}`",
        "`detect_water_level_s2n`",  # cross-section
        "`to_ugrid`",  # writers
    ]:
        assert needle in text, f"API reference is missing {needle}"


def test_architecture_perf_block_is_current():
    """ARCHITECTURE §8's measured numbers are machine-written from the newest
    committed BENCH_FULL_r*.json (rounds 3 and 4 both shipped stale, mutually
    contradictory perf narratives — this makes that structurally impossible).
    Regenerate and compare: a new artifact without `python docs/gen_perf.py`
    fails here."""
    spec = importlib.util.spec_from_file_location(
        "gen_perf", os.path.join(DOCS, "gen_perf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = mod.generate()
    with open(os.path.join(DOCS, "..", "ARCHITECTURE.md")) as f:
        committed = f.read()
    assert fresh == committed, (
        "ARCHITECTURE.md perf block is stale — run `python docs/gen_perf.py` "
        "and commit the result"
    )


def test_architecture_perf_block_reflects_artifact_values():
    """Spot-check: the generated block quotes the artifact's numbers."""
    import glob
    import json
    import re

    root = os.path.join(DOCS, "..")
    paths = glob.glob(os.path.join(root, "BENCH_FULL_r*.json"))
    newest = max(paths, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    with open(newest) as f:
        bench = json.load(f)
    with open(os.path.join(root, "ARCHITECTURE.md")) as f:
        arch = f.read()
    block = arch.split("BEGIN GENERATED perf-block")[1].split("END GENERATED")[0]
    assert os.path.basename(newest) in block
    assert str(bench["value"]) in block
    for cfg in bench["ensemble"].values():
        assert str(cfg["pairs_per_sec"]) in block
        assert cfg["route"] in block
