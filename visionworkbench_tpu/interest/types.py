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
