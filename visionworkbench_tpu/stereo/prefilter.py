"""Stereo prefilters (ref ``src/vw/Stereo/PreFilter.h:41-100``,
``PrefilterEnum.h:24-28``): per-level image conditioning before correlation.

* ``none``    — identity (``NullOperation``)
* ``meansub`` — image minus its Gaussian blur (``SubtractedMean``)
* ``log``     — 3x3 Laplacian of a Gaussian blur (``LaplacianOfGaussian``)
"""

from __future__ import annotations

import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.image.filters import gaussian_filter, laplacian_filter

PREFILTER_NONE = "none"
PREFILTER_MEANSUB = "meansub"
PREFILTER_LOG = "log"
PREFILTER_MODES = (PREFILTER_NONE, PREFILTER_MEANSUB, PREFILTER_LOG)


def prefilter_image(image, mode: str = PREFILTER_NONE, width: float = 1.4):
    """Apply the selected prefilter (ref ``prefilter_image``, PreFilter.h:78-100)."""
    if mode == PREFILTER_NONE:
        return jnp.asarray(image)
    if mode == PREFILTER_LOG:
        return laplacian_filter(gaussian_filter(image, width))
    if mode == PREFILTER_MEANSUB:
        image = jnp.asarray(image)
        return image - gaussian_filter(image, width)
    raise ArgumentErr(f"Unknown prefilter mode {mode!r}; one of {PREFILTER_MODES}")
