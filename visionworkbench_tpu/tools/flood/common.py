"""Shared flood-detection helpers (ref ``src/vw/tools/flood_common.h``).

Output class codes, band-index math, and the WorldView earth–sun distance
formula. The scalar helpers of the reference become jnp-broadcastable
functions so whole band stacks run through them at once.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Output classification codes (flood_common.h:40-42).
FLOOD_DETECT_WATER = 255
FLOOD_DETECT_LAND = 1
FLOOD_DETECT_NODATA = 0


def compute_index(a, b):
    """Normalized difference index (a-b)/(a+b); 100 where the denominator is
    zero (flood_common.h ``compute_index`` divide-by-zero guard)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    denom = a + b
    return jnp.where(denom == 0, jnp.float32(100.0),
                     (a - b) / jnp.where(denom == 0, 1.0, denom))


def clamp01(value):
    return jnp.clip(jnp.asarray(value, jnp.float32), 0.0, 1.0)


def rescale_to_01(value, lo, hi):
    """Linear rescale of [lo, hi] onto [0, 1]; NOT clamped (the reference's
    ``rescale_to_01`` leaves out-of-range values outside [0,1], and callers
    rely on that inside min() chains)."""
    return (jnp.asarray(value, jnp.float32) - lo) / (hi - lo)


def find_string_in_list(strings, substring):
    """First string containing ``substring`` or '' (flood_common.h)."""
    for s in strings:
        if substring in s:
            return s
    return ""


def parse_metadata_line(line: str) -> float:
    """Extract the numeric value after '=' (flood_common.h)."""
    return float(line.split("=", 1)[1].strip().rstrip(";"))


def compute_earth_sun_distance(year: int, month: int, day: int, hour: int,
                               minute: int, second: float) -> float:
    """Earth–sun distance in AU at a given UTC time (flood_common.h:103-121,
    from "Radiometric Use of WorldView-2 Imagery"). Note the reference
    evaluates cos() on *degrees* values g and 2g — replicated verbatim for
    parity (the constants were calibrated with that convention)."""
    ut = hour + minute / 60.0 + second / 3600.0
    if month in (1, 2):
        year -= 1
        month += 12
    a = int(year / 100.0)
    b = 2 - a + a // 4
    julian_day = (math.floor(365.25 * (year + 4716))
                  + math.floor(30.6001 * (month + 1))
                  + day + ut / 24.0 + b - 1524.5)
    d = julian_day - 2451545.0
    g = 357.529 + 0.98560028 * d
    return 1.00014 - 0.01671 * math.cos(g) - 0.00014 * math.cos(2 * g)
