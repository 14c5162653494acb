"""Interest point containers (ref ``src/vw/InterestPoint/InterestPoint.h``).

The reference holds ragged ``InterestPointList``s; TPU-natively points live in
fixed-capacity struct-of-arrays with a validity mask (ragged outputs become
top-k buffers + valid counts). Host conversion helpers produce plain NumPy
record views for IO and matching bookkeeping.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class InterestPoints(NamedTuple):
    """Fixed-capacity interest point set; invalid slots have valid=False."""
    x: jax.Array            # (K,) float32 — column
    y: jax.Array            # (K,) float32 — row
    scale: jax.Array        # (K,) float32
    orientation: jax.Array  # (K,) float32 radians
    interest: jax.Array     # (K,) float32 response
    valid: jax.Array        # (K,) bool
    descriptor: Optional[jax.Array] = None  # (K, D) float32 or None

    @property
    def capacity(self) -> int:
        return int(self.x.shape[0])

    def count(self) -> int:
        return int(np.asarray(self.valid).sum())

    def to_numpy(self):
        """Compact to host arrays (valid points only, interest-sorted)."""
        valid = np.asarray(self.valid)
        idx = np.nonzero(valid)[0]
        order = np.argsort(-np.asarray(self.interest)[idx], kind="stable")
        idx = idx[order]
        out = {
            "x": np.asarray(self.x)[idx],
            "y": np.asarray(self.y)[idx],
            "scale": np.asarray(self.scale)[idx],
            "orientation": np.asarray(self.orientation)[idx],
            "interest": np.asarray(self.interest)[idx],
        }
        if self.descriptor is not None:
            out["descriptor"] = np.asarray(self.descriptor)[idx]
        return out


def from_numpy(d) -> InterestPoints:
    n = len(d["x"])
    return InterestPoints(
        x=jnp.asarray(d["x"], jnp.float32),
        y=jnp.asarray(d["y"], jnp.float32),
        scale=jnp.asarray(d.get("scale", np.ones(n)), jnp.float32),
        orientation=jnp.asarray(d.get("orientation", np.zeros(n)), jnp.float32),
        interest=jnp.asarray(d.get("interest", np.zeros(n)), jnp.float32),
        valid=jnp.ones((n,), bool),
        descriptor=(jnp.asarray(d["descriptor"], jnp.float32)
                    if "descriptor" in d else None),
    )


def scale_to_plane_index(base: int, scales: int, scale: float) -> int:
    """Plane index in an octave most closely matching ``scale``
    (ref ``ImageOctave::scale_to_plane_index``, ImageOctave.h:87-94)."""
    import math
    return int(scales * (math.log(scale) - math.log(float(base)))
               / math.log(2.0) + 0.00001)


class ImageOctaveHistory(list):
    """Container for the intermediate scale-space images produced while
    iterating octaves — kept for descriptor generation after detection
    (ref ``ImageOctaveHistory``, ImageOctaveHistory.h:40-76). A list of
    octaves, each a list of per-plane images (scales + 2 planes: one
    below, one above)."""

    def __init__(self):
        super().__init__()
        self._num_scales = 0

    def octaves(self) -> int:
        return len(self)

    def scales(self) -> int:
        """Scales per octave (two less than the plane count)."""
        return self._num_scales

    def add_octave(self, octave) -> None:
        self.append(list(octave))
        self._num_scales = len(octave) - 2

    def image_at_scale(self, scale: float):
        """Image most closely matching ``scale``
        (ref ``image_at_scale``, ImageOctaveHistory.h:64-75)."""
        import math
        from visionworkbench_tpu.core.exceptions import ArgumentErr
        octave = int(math.log(scale) / math.log(2.0))
        if octave == self.octaves():
            octave = self.octaves() - 1
        if not 0 <= octave < self.octaves():
            raise ArgumentErr(
                "ImageOctaveHistory.image_at_scale: no image matching scale")
        plane = scale_to_plane_index(1 << octave, self._num_scales, scale)
        if not 0 <= plane < self.scales() + 2:
            raise ArgumentErr(
                "ImageOctaveHistory.image_at_scale: no image matching scale")
        return self[octave][plane]
