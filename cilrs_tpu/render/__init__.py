"""On-device camera rendering: raycast rasterizer + procedural weather.

Replaces CARLA's UE4 RGB camera sensor (reference model/autonomous_drive.py:848-866:
800x600 FOV-100 camera at body offset x=2.0, z=1.4) with an analytic per-pixel
raycaster over the world state — ground-plane texture fetch, oriented-box vehicle
hits, pedestrian cylinders, traffic-light discs — entirely data-parallel, so the
whole camera is a fused XLA program `vmap`-able over thousands of envs.
"""

from cilrs_tpu.render.raster import render_frame, CAMERA  # noqa: F401
