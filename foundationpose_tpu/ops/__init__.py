from .. import jax_config  # noqa: F401
from .depth_filters import erode_depth, bilateral_filter_depth
from .warp import warp_perspective, warp_perspective_batch, warp_crop
from .rasterizer import render_mesh, RenderOutput
