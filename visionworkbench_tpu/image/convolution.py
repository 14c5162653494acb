"""2D and separable convolution (ref ``src/vw/Image/Convolution.h:51-335``).

The reference's ``ConvolutionView`` correlates with a 180-degree-rotated kernel
— i.e. performs *true convolution* — with the kernel origin defaulting to the
center (``Convolution.h:105-170``). Here the same math is one XLA
``conv_general_dilated`` over an edge-extended input; XLA lowers it onto the
MXU and fuses the pad.

Conventions: images are (H, W) or (H, W, C); 2D kernels are (Kh, Kw) indexed
[row, col]; 1D kernels are applied along x (cols) or y (rows). Output has the
same spatial shape as the input (the reference keeps ``cols() x rows()`` too).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.image.edge import edge_extend


def _default_origin(n: int) -> int:
    # VW's default kernel origin after rotation is cols/2 (Convolution.h:127);
    # in true-convolution terms that is (n-1) - n//2.
    return (n - 1) - n // 2


def _to_nchw(image):
    """(H, W) -> (1, 1, H, W); (H, W, C) -> (C, 1, H, W). Returns (arr, restore)."""
    if image.ndim == 2:
        arr = image[None, None]
        def restore(out):
            return out[0, 0]
    elif image.ndim == 3:
        arr = jnp.moveaxis(image, -1, 0)[:, None]
        def restore(out):
            return jnp.moveaxis(out[:, 0], 0, -1)
    else:
        raise ArgumentErr(f"convolution expects (H, W[, C]) image, got shape {image.shape}")
    return arr, restore


# Tap-count threshold below which 'valid' correlation runs as a weighted sum
# of shifted slices on the VPU instead of conv_general_dilated. XLA lowers
# single-channel spatial convs onto the MXU with heavy relayout costs (the
# 1024^2 pyramid's four 5-tap blurs profiled at ~11 ms EACH through
# conv_general_dilated vs <1 ms as fused shifted adds), and slice-based
# stencils additionally let a following [::2, ::2] subsample fuse through.
_STENCIL_MAX_TAPS = 49


def _correlate_valid_stencil(image, kernel2d):
    """'valid' correlation as an unrolled shifted-slice weighted sum — the
    TPU-fast path for small kernels (pure VPU elementwise, fully fusable)."""
    kh, kw = kernel2d.shape
    oh = image.shape[0] - kh + 1
    ow = image.shape[1] - kw + 1
    out = None
    for i in range(kh):
        for j in range(kw):
            sl = lax.slice(image, (i, j) + (0,) * (image.ndim - 2),
                           (i + oh, j + ow) + image.shape[2:])
            term = kernel2d[i, j] * sl
            out = term if out is None else out + term
    return out


def _correlate_valid(image, kernel2d):
    """'valid' cross-correlation of (H, W[, C]) image with (Kh, Kw) kernel."""
    kernel2d = jnp.asarray(kernel2d)
    if kernel2d.shape[0] * kernel2d.shape[1] <= _STENCIL_MAX_TAPS:
        return _correlate_valid_stencil(image, kernel2d.astype(image.dtype))
    arr, restore = _to_nchw(image)
    k = jnp.asarray(kernel2d, arr.dtype)[None, None]
    out = lax.conv_general_dilated(
        arr, k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # fp32 parity with the reference requires full-precision multiplies —
        # TPU convs otherwise default to bf16 inputs on the MXU.
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32 if arr.dtype == jnp.float32 else None,
    )
    return restore(out)


def convolution_filter(src, kernel2d, cx: Optional[int] = None, cy: Optional[int] = None,
                       edge: str = "constant", edge_value: float = 0.0):
    """True 2D convolution with kernel origin (cx, cy) (ref ``convolution_filter``,
    ``Filter.h:113-142``; default edge mode is ConstantEdgeExtension = replicate).

    ``out(y, x) = sum_{n,m} kernel(n, m) * src(y + cy - n, x + cx - m)``
    """
    src = jnp.asarray(src)
    kernel2d = jnp.asarray(kernel2d, jnp.float32)
    kh, kw = kernel2d.shape
    if cx is None:
        cx = _default_origin(kw)
    if cy is None:
        cy = _default_origin(kh)
    # Correlating with the flipped kernel over rows [y+cy-kh+1, y+cy] requires
    # (kh-1-cy) rows above and cy rows below (and likewise in x).
    padded = edge_extend(src, x_pad=(kw - 1 - cx, cx), y_pad=(kh - 1 - cy, cy),
                         mode=edge, value=edge_value)
    flipped = kernel2d[::-1, ::-1]
    return _correlate_valid(padded, flipped)


def separable_convolution_filter(src, x_kernel: Sequence[float], y_kernel: Sequence[float],
                                 cx: Optional[int] = None, cy: Optional[int] = None,
                                 edge: str = "constant", edge_value: float = 0.0):
    """Separable true convolution: 1D kernel along x then along y
    (ref ``SeparableConvolutionView``, ``Convolution.h:184-335``).

    Either kernel may be empty/None, meaning identity along that axis (the
    reference skips zero-length kernels the same way).
    """
    src = jnp.asarray(src)
    xk = None if x_kernel is None else jnp.asarray(x_kernel, jnp.float32).reshape(-1)
    yk = None if y_kernel is None else jnp.asarray(y_kernel, jnp.float32).reshape(-1)
    out = src
    if xk is not None and xk.size > 0:
        ox = _default_origin(int(xk.size)) if cx is None else cx
        padded = edge_extend(out, x_pad=(int(xk.size) - 1 - ox, ox), y_pad=0,
                             mode=edge, value=edge_value)
        out = _correlate_valid(padded, xk[::-1][None, :])
    if yk is not None and yk.size > 0:
        oy = _default_origin(int(yk.size)) if cy is None else cy
        padded = edge_extend(out, x_pad=0, y_pad=(int(yk.size) - 1 - oy, oy),
                             mode=edge, value=edge_value)
        out = _correlate_valid(padded, yk[::-1][:, None])
    return out


def correlate_2d(src, kernel2d, edge: str = "constant", edge_value: float = 0.0):
    """Centered cross-correlation (no kernel flip) — convenience for symmetric
    kernels and for matching-style ops (ref ``correlate_2d_at_point``,
    ``Convolution.h:69-91``)."""
    src = jnp.asarray(src)
    kernel2d = jnp.asarray(kernel2d, jnp.float32)
    kh, kw = kernel2d.shape
    padded = edge_extend(src, x_pad=(kw // 2, kw - 1 - kw // 2),
                         y_pad=(kh // 2, kh - 1 - kh // 2), mode=edge, value=edge_value)
    return _correlate_valid(padded, kernel2d)
