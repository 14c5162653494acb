"""Edge-extension policies (ref ``src/vw/Image/EdgeExtension.h:73-187``).

In the reference, edge extension is a lazy wrapper view that serves out-of-
bounds pixels according to a policy. Here it is an eager ``pad`` with the
matching semantics — XLA fuses the pad into consumers, so nothing is lost.

Mode names follow the reference:

* ``zero``        — outside pixels are 0 (``ZeroEdgeExtension``)
* ``constant``    — replicate the nearest edge pixel (``ConstantEdgeExtension``
                    — note: VW "constant" means *constant continuation*, i.e.
                    numpy's "edge", not a constant fill value)
* ``value``       — a caller-provided fill value (``ValueEdgeExtension``)
* ``periodic``    — wrap around (``PeriodicEdgeExtension``)
* ``cylindrical`` — periodic in x, replicate in y (``CylindricalEdgeExtension``)
* ``reflect``     — mirror about the edge pixel, edge not repeated
                    (``ReflectEdgeExtension``)
* ``linear``      — linear extrapolation from the last two pixels
                    (``LinearEdgeExtension``)
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr

EDGE_MODES = ("zero", "constant", "value", "periodic", "cylindrical", "reflect", "linear")


def _spatial_pad_width(image, x_pad: Tuple[int, int], y_pad: Tuple[int, int]):
    pad = [(int(y_pad[0]), int(y_pad[1])), (int(x_pad[0]), int(x_pad[1]))]
    pad += [(0, 0)] * (image.ndim - 2)
    return pad


def _linear_extrapolate_1d(image, axis: int, before: int, after: int):
    """Linear extrapolation pad along one axis (ref ``LinearEdgeExtension``)."""
    n = image.shape[axis]
    if n < 2:
        return jnp.pad(image, [(before, after) if a == axis else (0, 0)
                               for a in range(image.ndim)], mode="edge")
    first = jnp.take(image, jnp.array([0]), axis=axis)
    second = jnp.take(image, jnp.array([1]), axis=axis)
    last = jnp.take(image, jnp.array([n - 1]), axis=axis)
    penult = jnp.take(image, jnp.array([n - 2]), axis=axis)
    parts = []
    if before > 0:
        ks = jnp.arange(before, 0, -1, dtype=image.dtype)
        shape = [1] * image.ndim
        shape[axis] = before
        ks = ks.reshape(shape)
        parts.append(first + ks * (first - second))
    parts.append(image)
    if after > 0:
        ks = jnp.arange(1, after + 1, dtype=image.dtype)
        shape = [1] * image.ndim
        shape[axis] = after
        ks = ks.reshape(shape)
        parts.append(last + ks * (last - penult))
    return jnp.concatenate(parts, axis=axis)


def edge_extend(image,
                x_pad: Union[int, Tuple[int, int]] = 0,
                y_pad: Union[int, Tuple[int, int]] = 0,
                mode: str = "constant",
                value: float = 0.0):
    """Pad ``image`` (H, W[, C]) by ``y_pad`` rows / ``x_pad`` cols per side.

    ``x_pad``/``y_pad`` may be an int (symmetric) or a (before, after) pair.
    """
    if isinstance(x_pad, int):
        x_pad = (x_pad, x_pad)
    if isinstance(y_pad, int):
        y_pad = (y_pad, y_pad)
    if mode not in EDGE_MODES:
        raise ArgumentErr(f"Unknown edge extension mode: {mode!r}; one of {EDGE_MODES}")
    if max(x_pad) == 0 and max(y_pad) == 0:
        return image

    pad = _spatial_pad_width(image, x_pad, y_pad)
    if mode == "zero":
        return jnp.pad(image, pad, mode="constant", constant_values=0)
    if mode == "value":
        return jnp.pad(image, pad, mode="constant", constant_values=value)
    if mode == "constant":
        return jnp.pad(image, pad, mode="edge")
    if mode == "periodic":
        return jnp.pad(image, pad, mode="wrap")
    if mode == "reflect":
        return jnp.pad(image, pad, mode="reflect")
    if mode == "cylindrical":
        out = jnp.pad(image, _spatial_pad_width(image, x_pad, (0, 0)), mode="wrap")
        return jnp.pad(out, _spatial_pad_width(out, (0, 0), y_pad), mode="edge")
    # linear
    out = _linear_extrapolate_1d(image, 1, x_pad[0], x_pad[1])
    return _linear_extrapolate_1d(out, 0, y_pad[0], y_pad[1])


def crop_extended(image, x0: int, y0: int, width: int, height: int,
                  mode: str = "constant", value: float = 0.0):
    """Crop a (possibly out-of-bounds) region, serving outside pixels from the
    edge-extension policy — the reference's ``crop(edge_extend(img, ...), bbox)``
    idiom (``EdgeExtension.h:141-168``). (x0, y0) may be negative."""
    h, w = image.shape[0], image.shape[1]
    x_before = max(0, -x0)
    y_before = max(0, -y0)
    x_after = max(0, x0 + width - w)
    y_after = max(0, y0 + height - h)
    padded = edge_extend(image, x_pad=(x_before, x_after), y_pad=(y_before, y_after),
                         mode=mode, value=value)
    ys = y0 + y_before
    xs = x0 + x_before
    return padded[ys:ys + height, xs:xs + width]


def crop_to_interior(image, x_pad: int, y_pad: int):
    """Inverse of a symmetric :func:`edge_extend`."""
    h, w = image.shape[0], image.shape[1]
    return image[y_pad:h - y_pad if y_pad else h, x_pad:w - x_pad if x_pad else w]
