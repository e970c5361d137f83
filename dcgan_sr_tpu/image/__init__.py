from .ops import (  # noqa: F401
    box_downsample2,
    convolve_full,
    crop,
    crop_hflip_at,
    gaussian_window,
    hflip,
    normalize_pm1,
    random_crop_hflip,
    resize_bilinear,
    rgb2gray,
    to_display,
)
from .patches import (  # noqa: F401
    extract_grid_patches,
    extract_overlap_patches,
    reassemble_grid_patches,
    stitch_overlap_naive,
)
