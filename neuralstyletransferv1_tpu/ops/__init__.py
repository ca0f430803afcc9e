"""Low-level TPU-native kernels (pure JAX/XLA; Pallas where profitable).

All image tensors are NHWC float unless stated otherwise — NHWC is the layout
XLA:TPU tiles best (C maps to lanes).
"""

from .pad import reflect_pad_2d
from .conv import conv2d, conv_transpose2d_torch
from .norm import instance_norm, frn, tlu
from .resize import resize_nearest, resize_bilinear, upsample_nearest
from .blur import gaussian_blur, gaussian_kernel_1d
from .warp import bilinear_sample, warp_flow, rotate_image
from .color import rgb_to_gray, rgb_to_lab_u8, lab_u8_to_rgb
from .morphology import max_pool_dilate, grey_dilate, grey_erode

__all__ = [
    "reflect_pad_2d",
    "conv2d",
    "conv_transpose2d_torch",
    "instance_norm",
    "frn",
    "tlu",
    "resize_nearest",
    "resize_bilinear",
    "upsample_nearest",
    "gaussian_blur",
    "gaussian_kernel_1d",
    "bilinear_sample",
    "warp_flow",
    "rotate_image",
    "rgb_to_gray",
    "rgb_to_lab_u8",
    "lab_u8_to_rgb",
    "max_pool_dilate",
    "grey_dilate",
    "grey_erode",
]
