"""The tutorial examples must stay runnable (they are user-facing docs).

Only the fast ones run here: 03/04 consume the reference's shipped netCDF
outputs, 06 renders its own synthetic scene. 01/02/05 decode real video
(minutes on the single-core CI host) and are exercised manually.
"""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(script, *argv):
    old = sys.argv
    sys.argv = [script, *argv]
    try:
        runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")
    finally:
        sys.argv = old


def test_example_03_plotting_and_masking(tmp_path):
    _run("03_plotting_and_masking.py", str(tmp_path))
    assert (tmp_path / "ngwerere_masked.nc").is_file()
    assert (tmp_path / "velocity_camera_quiver.png").stat().st_size > 10_000


def test_example_04_cross_section_discharge(tmp_path):
    _run("04_cross_section_discharge.py", str(tmp_path))
    assert (tmp_path / "ngwerere_transect.nc").is_file()


@pytest.mark.filterwarnings("ignore::UserWarning")
def test_example_06_water_level():
    _run("06_water_level_optical.py")


def test_example_07_stiv(capsys):
    _run("07_stiv_velocimetry.py")
    assert "STIV example OK" in capsys.readouterr().out
