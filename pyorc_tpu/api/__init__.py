"""Public object/accessor API: Video, CameraConfig, CrossSection + ndx accessors."""

from .cameraconfig import CameraConfig, get_camera_config, load_camera_config

__all__ = ["CameraConfig", "get_camera_config", "load_camera_config"]
