from .geometry import (
    affine_grid_2d,
    invert_affine_2x3,
    l2_normalize_channels,
    local_to_global_grid,
)
from .sampling import (
    resize_bilinear_align_corners,
    grid_sample_bilinear,
    resample_correlation_map,
)
from .nms import nms_keep_mask, nms_topk
