"""Recipe-driven end-to-end pipeline: video -> velocities -> discharge -> plots.

Parity port of the reference's service layer (reference
``pyorc/service/velocimetry.py:28-884``): fixed stage order
(video -> [optical water level] -> frames -> velocimetry -> mask -> transect
-> plot), incremental re-run hash cache (recipe subsection YAML + SHA-256 of
in/out files persisted under ``<output>/.pyorc/``), and a subprocess runner
for embedding.
"""

from __future__ import annotations

import copy
import functools
import json
import logging
import os.path
import shutil
import subprocess
import sys
from typing import Dict, Optional

import click
import numpy as np
import yaml

from .. import const, ndx
from ..api import CameraConfig, CrossSection, Video
from ..cli import cli_utils

__all__ = ["velocity_flow", "velocity_flow_subprocess", "VelocityFlowProcessor", "get_water_level"]

logger = logging.getLogger(__name__)

ALLOWED_COLOR_METHODS_WATER_LEVEL = ["grayscale", "hue", "sat", "val"]


def _check_file_integrity(ref, func_name, inputs, outputs, path_out):
    """True if any input/output file is missing or its hash changed. Reference :28-49."""
    for i in inputs + outputs:
        fn = getattr(ref, i)
        fn_hash = os.path.join(path_out, f"{os.path.basename(getattr(ref, i))}.hash")
        if not os.path.isfile(fn):
            return True
        if not os.path.isfile(fn_hash):
            return True
        hash256 = cli_utils.get_file_hash(fn)
        with open(fn_hash, "r") as f:
            hash256_ancient = f.read()
        if hash256.hexdigest() != hash256_ancient:
            ref.logger.debug(f"File integrity of {fn} has changed, requiring rerun of {func_name}")
            return True
    return False


def _compare_configs(func_name, fn_ancient_recipe, recipe, relevant_configs, logger=logger):
    """True if the relevant recipe subsections changed. Reference :52-67."""
    recipe_part = {c: recipe[c] for c in relevant_configs if c in recipe}
    with open(fn_ancient_recipe, "r") as f:
        cfg_ancient = f.read()
    cfg = yaml.dump(recipe_part, default_flow_style=False, sort_keys=False)
    if cfg != cfg_ancient:
        logger.debug(f'Configuration of "{func_name}" has changed, requiring rerun')
        return True
    return False


def get_water_level(
    video: Video,
    cross_section: CrossSection,
    n_start: int = 0,
    n_end: int = 1,
    method: str = "grayscale",
    s2n_thres: float = 3.0,
    frames_options: Optional[Dict] = None,
    water_level_options: Optional[Dict] = None,
    logger: logging.Logger = logger,
):
    """Optical water level: try preprocessing option sets until s2n is high enough.

    Reference :70-119.
    """
    water_level_options = {} if water_level_options is None else water_level_options
    frames_options = {} if frames_options is None else frames_options
    if not isinstance(frames_options, list):
        frames_options = [frames_options]
    for frames_options_ in frames_options:
        method_ = frames_options_.pop("method", method)
        s2n_thres_ = frames_options_.pop("s2n_thres", s2n_thres)
        if method_ not in ALLOWED_COLOR_METHODS_WATER_LEVEL:
            raise ValueError(
                f"Method {method_} not supported for water level detection, choose one "
                f"of {ALLOWED_COLOR_METHODS_WATER_LEVEL}"
            )
        da_frames = video.get_frames(method=method_).isel(time=slice(n_start, n_end))
        logger.debug(f"Applying preprocessing methods {frames_options_}")
        da_frames = apply_methods(da_frames, "frames", logger=logger, skip_args=["to_video"], **frames_options_)
        if "time" in da_frames.dims:
            da_mean = da_frames.mean(dim="time")
        else:
            da_mean = da_frames
        img = np.uint8(da_mean.values)
        h_a, s2n = cross_section.detect_water_level_s2n(img, **water_level_options)
        if s2n > s2n_thres_:
            logger.debug(
                f"Found significant water level at h: {h_a:.3f} m with signal-to-noise: {s2n:.3f} > {s2n_thres_:.3f}"
            )
            return h_a
        logger.debug(f"Found water level at h: {h_a:.3f} m with too low signal-to-noise: {s2n:.3f} < {s2n_thres_:.3f}")
    return None


def vmin_vmax_to_norm(opts):
    """vmin/vmax kwargs -> matplotlib Normalize. Reference :122-143."""
    if "vmin" in opts or "vmax" in opts:
        from matplotlib.colors import Normalize

        vmin = opts.pop("vmin", None)
        vmax = opts.pop("vmax", None)
        opts["norm"] = Normalize(vmin=vmin, vmax=vmax)
    return opts


def apply_methods(obj, subclass, logger=logger, skip_args=None, **kwargs):
    """Generic recipe dispatch: section keys -> accessor method calls. Reference :146-159."""
    if skip_args is None:
        skip_args = []
    for m, _kwargs in kwargs.items():
        if m not in skip_args:
            cls = getattr(obj, subclass)
            if not hasattr(cls, m):
                raise ValueError(f'Method "{m}" for {subclass} does not exist, please check your recipe')
            logger.debug(f"Applying {m} on {subclass} with parameters {_kwargs}")
            meth = getattr(cls, m)
            obj = meth(**(_kwargs or {}))
    return obj


def get_masks(obj, **mask_methods):
    """Build the mask list for one mask group. Reference :162-170."""
    masks = []
    for m, _kwargs in mask_methods.items():
        if _kwargs is None:
            _kwargs = {}
        meth = getattr(obj.velocimetry.mask, m)
        masks.append(meth(**_kwargs))
    return masks


def run_func_hash_io(attrs=None, inputs=None, configs=None, outputs=None, write_path=".pyorc", check=False):
    """Skip a pipeline stage when recipe subsection + file hashes are unchanged.

    Reference :173-280.
    """
    attrs = [] if attrs is None else attrs
    inputs = [] if inputs is None else inputs
    configs = [] if configs is None else configs
    outputs = [] if outputs is None else outputs

    def decorator_func(processor_func):
        @functools.wraps(processor_func)
        def wrapper_func(ref, *args, **kwargs):
            func_name = processor_func.__name__
            path_out = os.path.join(ref.output, write_path)
            os.makedirs(path_out, exist_ok=True)
            run = True
            if check and ref.update:
                fn_recipe = os.path.join(path_out, f"{ref.prefix}{func_name}.yml")
                if not os.path.isfile(fn_recipe):
                    run = True
                else:
                    run = _compare_configs(
                        func_name, fn_ancient_recipe=fn_recipe, recipe=ref.recipe,
                        relevant_configs=configs, logger=ref.logger,
                    )
                if not run:
                    run = _check_file_integrity(ref, func_name, inputs, outputs, path_out)
            if run:
                ref.logger.info(f"Running {func_name}")
                processor_func(ref, *args, **kwargs)
                fn_recipe = os.path.join(path_out, f"{ref.prefix}{func_name}.yml")
                recipe_part = {c: ref.recipe[c] for c in configs if c in ref.recipe}
                with open(fn_recipe, "w") as f:
                    yaml.dump(recipe_part, f, default_flow_style=False, sort_keys=False)
                for i in inputs + outputs:
                    fn_hash = os.path.join(path_out, f"{os.path.basename(getattr(ref, i))}.hash")
                    hash256 = cli_utils.get_file_hash(getattr(ref, i))
                    with open(fn_hash, "w") as f:
                        f.write(hash256.hexdigest())
            else:
                ref.logger.info(
                    f'Configuration, dependencies, input and output files for section "{func_name}" have not '
                    f"changed since last run, skipping..."
                )
                for attr, output in zip(attrs, outputs):
                    if attr is not None:
                        fn = getattr(ref, output)
                        ref.logger.info(f'Results for "{func_name}" already available, reading from {os.path.abspath(fn)}')
                        setattr(ref, attr, ndx.open_dataset(fn))

        return wrapper_func

    return decorator_func


class VelocityFlowProcessor:
    """Recipe-driven processor: video in, velocities/discharge/plots out."""

    def __init__(
        self,
        recipe: Dict,
        videofile: str,
        cameraconfig: Dict,
        prefix: str,
        output: str,
        h_a: Optional[float] = None,
        cross: Optional[str] = None,
        cross_wl: Optional[str] = None,
        update: bool = False,
        concurrency: bool = True,
        fn_piv: str = "piv.nc",
        fn_piv_mask: str = "piv_mask.nc",
        fn_transect_template: str = "transect_{:s}.nc",
        logger: logging.Logger = logging,
    ):
        logger.debug("Initializing Velocity Flow Processor")
        cross_section_wl = None
        camera_config = CameraConfig(**_parse_camconfig_dict(cameraconfig))
        if h_a is not None:
            if abs(h_a - camera_config.gcps["h_ref"]) > const.WATER_LEVEL_MAX_DIFF:
                logger.warning(
                    f"Water level is very different from reference "
                    f"({h_a - camera_config.gcps['h_ref']} m); check units/datum."
                )
        if h_a is None and recipe["video"].get("h_a") is None and cross is None and cross_wl is None:
            raise click.UsageError(
                "No actual water level found and none in recipe. Provide a water level or a cross "
                "section with `--cross_wl` to estimate the level optically."
            )
        if h_a is not None:
            recipe["video"]["h_a"] = h_a
            logger.info(f"Water level provided as argument: h = {h_a} m.")
        elif cross_wl is not None:
            logger.info("Cross section for water level detection provided; level will be estimated optically.")
            coords, crs = cli_utils.read_shape(fn=cross_wl)
            if crs is not None and getattr(camera_config, "crs", None) is not None:
                from ..api.cameraconfig import xyz_transform
                from ..geom import crs as crs_mod

                coords = xyz_transform(coords, crs, crs_mod.CRS.from_user_input(camera_config.crs))
            cross_section_wl = CrossSection(camera_config=camera_config, cross_section=coords)
            if "water_level" not in recipe:
                recipe["water_level"] = {}
        elif recipe["video"].get("h_a") is not None:
            logger.info(f"Water level provided in recipe: h = {recipe['video']['h_a']} m.")
        else:
            logger.error(
                "No water level provided on CLI and no cross section provided. Use the same value as h_ref "
                f"in your camera config: --h_a {camera_config.gcps['h_ref']}"
            )
            raise click.Abort()
        self.proj_method = "numpy"
        self.update = update
        self.recipe = recipe
        self.output = output
        self.concurrency = concurrency
        self.prefix = prefix
        self.cross_section_wl = cross_section_wl
        self.cross_section_fn = cross
        self.fn_piv = os.path.join(self.output, prefix + fn_piv)
        self.fn_piv_mask = os.path.join(self.output, prefix + fn_piv_mask) if "mask" in recipe else self.fn_piv
        self.fn_transect_template = (
            os.path.join(self.output, prefix + fn_transect_template).format if "transect" in recipe else None
        )
        if self.fn_transect_template is not None:
            self.fn_transects = [self.fn_transect_template(t) for t in recipe["transect"] if t != "write"]
        self.fn_video = videofile
        self.cam_config = camera_config
        self.logger = logger
        self.logger.info("Velocity Flow Processor initialized")

    def _timed(self, name, fn, *args, **kwargs):
        """Run one stage with per-stage wall-clock logging (SURVEY §5: the
        reference has only tqdm bars; the TPU build logs stage timings)."""
        import time as _time

        t0 = _time.perf_counter()
        out = fn(*args, **kwargs)
        self.logger.info(f"Stage '{name}' completed in {_time.perf_counter() - t0:.2f} s")
        return out

    def process(self):
        """Run all stages in the fixed order. Reference :447-496."""
        self.logger.info("Starting velocimetry processing pipeline")
        self._timed("video", self.video, **self.recipe["video"])
        if self.cross_section_wl is not None:
            self._timed("water_level", self.water_level, **self.recipe.get("water_level", {}))
        self._timed("frames", self.frames, **self.recipe["frames"])
        self._timed("velocimetry", self.velocimetry, **self.recipe["velocimetry"])
        if "mask" in self.recipe:
            if self.recipe.get("velocimetry", {}).get("get_piv", {}).get("ensemble_corr", False):
                self.logger.warning(
                    "Masks on an ensemble-correlation velocimetry: time-dependent masks have no effect."
                )
            self._timed("mask", self.mask, **self.recipe["mask"])
        else:
            self.velocimetry_mask_obj = self.velocimetry_obj
        if "transect" in self.recipe:
            if self.cross_section_fn is not None:
                self.recipe["transect"].setdefault("transect_1", {})
                self.recipe["transect"]["transect_1"]["shapefile"] = self.cross_section_fn
            self._timed("transect", self.transect, **self.recipe["transect"])
        if "plot" in self.recipe:
            self._timed("plot", self.plot, **self.recipe["plot"])
        self.logger.info("Velocimetry processing pipeline completed :-)")

    def video(self, **kwargs):
        try:
            self.logger.debug(f"Reading video {self.fn_video} from file")
            self.video_obj = Video(self.fn_video, camera_config=self.cam_config, **kwargs)
            self.logger.info(f"Video successfully read from {self.fn_video}")
        except Exception as e:
            self.logger.error(f"Could not read video from {self.fn_video}. Error: {e}")
            raise Exception(f"Could not read video from {self.fn_video}. Error: {e}")

    def water_level(self, **kwargs):
        try:
            self.logger.debug("Estimating water level optically.")
            h_a = get_water_level(self.video_obj, cross_section=self.cross_section_wl, logger=self.logger, **kwargs)
            if h_a is None:
                self.logger.error("Water level could not be estimated from video. Set a level with --h_a.")
                raise click.Abort()
            self.logger.info("Water level estimated optically h = {:1.3f} m. in local datum.".format(h_a))
            self.video_obj.h_a = float(h_a)
        except Exception as e:
            self.logger.error(f"Could not estimate water level from video. Error: {e}")
            raise Exception(f"Could not estimate water level from video. Error: {e}")

    def frames(self, **kwargs):
        try:
            self.logger.debug("Retrieving frames from video.")
            self.da_frames = self.video_obj.get_frames()
            self.logger.debug(f"Retrieved {len(self.da_frames)} frames from video.")
            if "project" not in kwargs:
                kwargs["project"] = {}
            self.da_frames = apply_methods(
                self.da_frames, "frames", logger=self.logger, skip_args=["to_video", "to_geotiff"], **kwargs
            )
            if "to_video" in kwargs:
                kwargs_video = kwargs["to_video"] or {}
                kwargs_video.setdefault("fn", os.path.join(self.output, self.prefix + "processed_frames.mp4"))
                self.logger.info(f"Writing video of processed frames to {kwargs_video['fn']}")
                self.da_frames.frames.to_video(**kwargs_video)
            if "to_geotiff" in kwargs:
                kwargs_geotiff = kwargs["to_geotiff"] or {}
                kwargs_geotiff.setdefault("frame", 0)
                kwargs_geotiff.setdefault(
                    "fn", os.path.join(self.output, self.prefix + "frame_{:04d}.tif".format(kwargs_geotiff["frame"]))
                )
                self.logger.info(f"Writing geotiff of frame {kwargs_geotiff['frame']} to {kwargs_geotiff['fn']}")
                self.da_frames.frames.to_geotiff(**kwargs_geotiff)
            self.logger.info("Frames retrieved and preprocessed.")
        except Exception as e:
            self.logger.error(f"Could not extract frames from video. Error: {e}")
            raise Exception(f"Could not extract frames from video. Error: {e}")

    @run_func_hash_io(
        attrs=["velocimetry_obj"],
        check=True,
        inputs=["fn_video"],
        configs=["video", "frames", "velocimetry"],
        outputs=["fn_piv"],
    )
    def velocimetry(self, method="get_piv", write=False, write_ugrid=False, fill_na=None, **kwargs):
        self.logger.debug(f"Performing velocimetry with {method}.")
        try:
            if len(kwargs) > 1:
                raise OverflowError(f"Too many arguments under velocimetry, only one allowed, {len(kwargs)} given.")
            kwargs[method] = kwargs.get(method, {}) if len(kwargs) == 0 else kwargs[method]
            self.velocimetry_obj = apply_methods(self.da_frames, "frames", logger=self.logger, **kwargs)
            m = list(kwargs.keys())[0]
            self.logger.info(f"Velocimetry derived with method {m} with parameters {kwargs[m]}")
            if write:
                self.velocimetry_obj.to_netcdf(self.fn_piv)
                self.logger.info(f"Velocimetry written to {self.fn_piv}")
                self.velocimetry_obj = ndx.open_dataset(self.fn_piv)
            if write_ugrid:
                fn_piv_ugrid = self.fn_piv.replace(".nc", "_ugrid.nc")
                self.velocimetry_obj.velocimetry.to_ugrid(fill_na=fill_na).to_netcdf(fn_piv_ugrid)
                self.logger.info(f"Velocimetry ugrid written to {fn_piv_ugrid}")
            self.logger.info("Velocimetry successfully derived.")
        except Exception as e:
            self.logger.error(f"Could not derive velocimetry from frames. Error: {e}")
            raise Exception(f"Could not derive velocimetry from frames. Error: {e}")

    @run_func_hash_io(
        attrs=["velocimetry_mask_obj"],
        check=True,
        inputs=["fn_piv"],
        configs=["video", "frames", "velocimetry", "mask"],
        outputs=["fn_piv_mask"],
    )
    def mask(self, write=False, write_ugrid=False, fill_na=None, **kwargs):
        try:
            self.logger.debug("Applying masks to velocimetry.")
            self.velocimetry_mask_obj = copy.deepcopy(self.velocimetry_obj)
            for mask_name, mask_grp in kwargs.items():
                self.logger.debug(f'Applying "{mask_name}" with parameters {mask_grp}')
                masks = get_masks(self.velocimetry_mask_obj, **(mask_grp or {}))
                self.velocimetry_mask_obj.velocimetry.mask(masks, inplace=True)
            self.logger.info("Velocimetry masks applied")
            self.velocimetry_mask_obj.velocimetry.set_encoding()
            if write:
                self.velocimetry_mask_obj.to_netcdf(self.fn_piv_mask)
                self.logger.info(f"Velocimetry masked written to {self.fn_piv_mask}")
            if write_ugrid:
                fn_piv_mask_ugrid = self.fn_piv_mask.replace(".nc", "_ugrid.nc")
                self.velocimetry_mask_obj.velocimetry.to_ugrid(fill_na=fill_na).to_netcdf(fn_piv_mask_ugrid)
                self.logger.info(f"Velocimetry masked ugrid written to {fn_piv_mask_ugrid}")
        except Exception as e:
            self.logger.error(f"Could not apply masks to velocimetry. Error: {e}")
            raise Exception(f"Could not apply masks to velocimetry. Error: {e}")

    @run_func_hash_io(check=False, configs=["transect"], inputs=["fn_piv_mask"])
    def transect(self, write=False, **kwargs):
        try:
            self.logger.debug("Deriving transects from velocimetry.")
            self.transects = {}
            _kwargs = copy.deepcopy(kwargs)
            for transect_name, transect_grp in _kwargs.items():
                self.logger.debug(f'Processing transect "{transect_name}"')
                if not ("shapefile" in transect_grp or "geojson" in transect_grp):
                    raise click.UsageError(
                        f'Transect "{transect_name}" does not have a "shapefile" or "geojson" entry.'
                    )
                if "geojson" in transect_grp:
                    coords, crs = cli_utils.read_shape(geojson=transect_grp["geojson"])
                else:
                    coords, crs = cli_utils.read_shape(fn=transect_grp["shapefile"])
                if len(coords[0]) == 2:
                    raise click.UsageError(
                        f"Transect {transect_name} only contains x, y, but no z-coordinates."
                    )
                x, y, z = zip(*coords)
                transect_grp["get_transect"] = transect_grp.get("get_transect") or {}
                self.transects[transect_name] = self.velocimetry_mask_obj.velocimetry.get_transect(
                    x=x, y=y, z=z, crs=crs, **transect_grp["get_transect"]
                )
                if "get_q" in transect_grp:
                    transect_grp["get_q"] = transect_grp.get("get_q") or {}
                    self.transects[transect_name] = self.transects[transect_name].transect.get_q(
                        **transect_grp["get_q"]
                    )
                if "get_river_flow" in transect_grp:
                    if "get_q" not in transect_grp:
                        raise click.UsageError(
                            f'"get_river_flow" found in {transect_name} but no "get_q" found (required).'
                        )
                    transect_grp["get_river_flow"] = transect_grp.get("get_river_flow") or {}
                    self.transects[transect_name].transect.get_river_flow(**transect_grp["get_river_flow"])
                if write:
                    fn_transect = os.path.abspath(self.fn_transect_template(transect_name))
                    self.transects[transect_name].to_netcdf(fn_transect)
                    self.logger.info(f'Transect "{transect_name}" written to {fn_transect}')
            self.logger.info("Transects derived.")
        except Exception as e:
            self.logger.error(f"Could not derive transects from velocimetry. Error: {e}")
            raise Exception(f"Could not derive transects from velocimetry. Error: {e}")

    @run_func_hash_io(
        check=False, configs=["video", "frames", "velocimetry", "transect", "plot"], inputs=["fn_video", "fn_piv_mask"]
    )
    def plot(self, **plot_recipes):
        try:
            self.logger.debug("Plotting velocimetry.")
            _plot_recipes = copy.deepcopy(plot_recipes)
            for name, plot_params in _plot_recipes.items():
                if not isinstance(plot_params, dict):
                    continue
                self.logger.debug(f'Processing plot "{name}"')
                fn_jpg = os.path.join(self.output, self.prefix + name + ".jpg")
                mode = plot_params.get("mode", "local")
                ax = None
                if "frames" in plot_params:
                    n = plot_params.get("frame_number", 0)
                    opts = plot_params["frames"] or {}
                    f = self.video_obj.get_frames(method="rgb")
                    if mode != "camera":
                        f = f.isel(time=slice(n, n + 1)).frames.project(method=self.proj_method).isel(time=0)
                    else:
                        f = f.isel(time=n)
                    ax = f.frames.plot(ax=ax, mode=mode, **opts)
                if "velocimetry" in plot_params:
                    opts = vmin_vmax_to_norm(plot_params["velocimetry"] or {})
                    reducer = plot_params.get("reducer", "mean")
                    reducer_params = plot_params.get("reducer_params", {})
                    velocimetry_reduced = getattr(self.velocimetry_mask_obj, reducer)(dim="time", **reducer_params)
                    velocimetry_reduced.attrs = dict(self.velocimetry_mask_obj.attrs)
                    ax = velocimetry_reduced.velocimetry.plot(ax=ax, mode=mode, **opts)
                if "transect" in plot_params:
                    for transect_name, opts in plot_params["transect"].items():
                        opts = vmin_vmax_to_norm(opts or {})
                        fn_transect = self.fn_transect_template(transect_name)
                        ds_trans = ndx.open_dataset(fn_transect)
                        quantile = opts.pop("quantile", 2)
                        ds_trans_q = ds_trans.isel(quantile=quantile)
                        ds_trans_q.attrs = dict(ds_trans.attrs)
                        ax = ds_trans_q.transect.plot(ax=ax, mode=mode, **opts)
                write_pars = plot_params.get("write_pars", {})
                self.logger.debug(f'Writing plot "{name}" to {fn_jpg}')
                ax.figure.savefig(fn_jpg, **write_pars)
                self.logger.info(f'Plot "{name}" written to {fn_jpg}')
            self.logger.info("Plot procedure done.")
        except Exception as e:
            self.logger.error(f"Could not plot velocimetry. Error: {e}")
            raise Exception(f"Could not plot velocimetry. Error: {e}")


def _parse_camconfig_dict(cameraconfig: Dict) -> Dict:
    """Camera config dict possibly holding stringified values (to_dict_str output)."""
    out = {}
    for k, v in cameraconfig.items():
        if isinstance(v, str) and k in (
            "height", "width", "resolution", "window_size", "is_nadir",
            "lens_position", "gcps", "rvec", "tvec", "dist_coeffs", "camera_matrix", "stabilize", "rotation",
        ):
            try:
                out[k] = json.loads(v)
            except json.JSONDecodeError:
                try:
                    import ast

                    out[k] = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    out[k] = v
        else:
            out[k] = v
    return out


def velocity_flow(**kwargs):
    """Execute the entire velocimetry processor. Reference :787-794."""
    processor = VelocityFlowProcessor(**kwargs)
    processor.process()
    del processor


def velocity_flow_subprocess(
    videofile,
    recipe: dict,
    cameraconfig: dict,
    output: str,
    prefix: Optional[str] = None,
    h_a: Optional[float] = None,
    cross: Optional[dict] = None,
    cross_wl: Optional[dict] = None,
    update: bool = False,
    concurrency: bool = True,
    logger: logging.Logger = logging,
):
    """Serialize inputs to temp files and run `pyorc-tpu velocimetry` in a subprocess.

    Reference :796-884 (used for embedding in other applications, e.g. NodeORC).
    """
    logger.info(f"Launching separate pyorc-tpu instance for videofile {videofile}")
    os.makedirs(output, exist_ok=True)
    fn_recipe = os.path.join(output, "recipe.yml")
    fn_cam_config = os.path.join(output, "camera_config.json")
    with open(fn_recipe, "w") as f:
        yaml.dump(recipe, f, default_flow_style=False, sort_keys=False)
    CameraConfig(**_parse_camconfig_dict(cameraconfig)).to_file(fn_cam_config)
    if shutil.which("pyorc-tpu"):
        launcher = ["pyorc-tpu"]
    else:
        # entry point not installed (e.g. running from a source checkout)
        launcher = [sys.executable, "-m", "pyorc_tpu.cli.main"]
    cmd = launcher + ["velocimetry", "-V", videofile, "-c", fn_cam_config, "-r", fn_recipe]
    if h_a is not None:
        cmd += ["-h", str(h_a)]
    if cross is not None:
        cross_fn = os.path.join(output, "cross.geojson")
        with open(cross_fn, "w") as f:
            json.dump(cross, f, indent=4)
        cmd += ["--cross", cross_fn]
    if h_a is None and cross_wl is not None:
        cross_wl_fn = os.path.join(output, "cross_wl.geojson")
        with open(cross_wl_fn, "w") as f:
            json.dump(cross_wl, f, indent=4)
        cmd += ["--cross_wl", cross_wl_fn]
    if not concurrency:
        cmd.append("--lowmem")
    if update:
        cmd.append("-u")
    if prefix:
        cmd += ["-p", prefix]
    cmd = cmd + ["-u", "-vvv", output]
    return subprocess.run(cmd, cwd=os.path.dirname(output) or ".", capture_output=True, text=True)
