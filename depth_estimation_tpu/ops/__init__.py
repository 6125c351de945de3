"""Compute primitives. Key symbols re-exported for ergonomic imports."""
from .boxfilter import box_filter, box_filter2d, gaussian_blur, gaussian_blur_box  # noqa: F401
from .costvolume import cost_volume, disparity_badness, disparity_estimate, expected_disparity  # noqa: F401
from .dense_gaussian import dense_gaussian_adjacency, dense_gaussian_filter  # noqa: F401
from .detection import iou_matrix, nms, roi_align, roi_pool_max  # noqa: F401
from .guided_filter import fast_guided_filter, guided_adjacency, guided_filter  # noqa: F401
from .lsh import lsh_gaussian_filter  # noqa: F401
from .permutohedral import (  # noqa: F401
    apply_plan,
    build_plan,
    lattice_adjacency,
    lattice_filter,
    lattice_filter_batched,
    lattice_filter_planned,
)
from .spectral import spectral_embedding, spectral_segment  # noqa: F401
