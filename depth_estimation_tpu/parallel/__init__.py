"""Mesh + spatial tiling."""
from .mesh import make_mesh, data_sharding, replicated  # noqa: F401
from .tiling import halo_exchange_rows, tiled_apply, tiled_filter_hwc  # noqa: F401
from .stereo_tiled import crf_stereo_infer_tiled  # noqa: F401
