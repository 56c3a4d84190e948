"""Interactive browser viewer (reference utils/vis_utils.py GUI, web-native)."""

from gazenerf_tpu.viewer.server import ViewerApp, lookat_camera, serve

__all__ = ["ViewerApp", "lookat_camera", "serve"]
