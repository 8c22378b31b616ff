from .resize import (  # noqa: F401
    avg_pool2d,
    max_pool2d,
    resize_any_shape,
    resize_bilinear,
    resize_bilinear_nhwc,
    resize_nearest,
    resize_nearest_nhwc,
)
from .morphology import compute_unknown, dilate_ellipse, dilate_ellipse_random, ellipse_kernel  # noqa: F401
