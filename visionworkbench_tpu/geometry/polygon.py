"""Polygon sets and clipping (ref ``src/vw/Geometry/dPoly.cc`` /
``cutPoly.cc`` / ``geomUtils.cc``): double-precision multi-ring polygons with
area, winding, point-in-polygon (vectorized), and Sutherland-Hodgman clipping
to boxes."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2


class Polygon:
    """One or more rings, each an (N, 2) float64 array (ref ``dPoly``)."""

    def __init__(self, rings: Optional[Sequence] = None):
        self.rings: List[np.ndarray] = []
        for r in (rings or []):
            self.append_ring(r)

    def append_ring(self, points) -> None:
        pts = np.asarray(points, np.float64).reshape(-1, 2)
        if len(pts) < 3:
            raise ArgumentErr("Polygon ring needs >= 3 points")
        self.rings.append(pts)

    def num_rings(self) -> int:
        return len(self.rings)

    def bbox(self) -> BBox2:
        box = BBox2.empty()
        for r in self.rings:
            box.grow(BBox2.from_bounds(r[:, 0].min(), r[:, 1].min(),
                                       r[:, 0].max(), r[:, 1].max()))
        return box

    def area(self) -> float:
        """Signed shoelace area summed over rings (holes = opposite winding)."""
        total = 0.0
        for r in self.rings:
            x, y = r[:, 0], r[:, 1]
            total += 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        return total

    def contains(self, x, y) -> np.ndarray:
        """Vectorized even-odd point-in-polygon over all rings."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        inside = np.zeros(np.broadcast(x, y).shape, bool)
        for r in self.rings:
            x1, y1 = r[:, 0], r[:, 1]
            x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
            for i in range(len(r)):
                cond = ((y1[i] > y) != (y2[i] > y))
                xin = (x2[i] - x1[i]) * (y - y1[i]) / (y2[i] - y1[i] + 1e-300) + x1[i]
                inside ^= cond & (x < xin)
        return inside

    def clip_to_box(self, box: BBox2) -> "Polygon":
        """Sutherland-Hodgman clip of each ring (ref ``cutPoly``)."""
        out = Polygon()
        for r in self.rings:
            ring = r
            for edge in ("l", "r", "b", "t"):
                if len(ring) < 3:
                    break
                ring = _clip_edge(ring, edge, box)
            if len(ring) >= 3:
                out.rings.append(np.asarray(ring))
        return out

    def translate(self, dx: float, dy: float) -> "Polygon":
        return Polygon([r + [dx, dy] for r in self.rings])


def _inside(p, edge, box):
    if edge == "l":
        return p[0] >= box.min_x
    if edge == "r":
        return p[0] <= box.max_x
    if edge == "b":
        return p[1] >= box.min_y
    return p[1] <= box.max_y


def _intersect(p1, p2, edge, box):
    x1, y1 = p1
    x2, y2 = p2
    if edge in ("l", "r"):
        xe = box.min_x if edge == "l" else box.max_x
        t = (xe - x1) / (x2 - x1)
        return (xe, y1 + t * (y2 - y1))
    ye = box.min_y if edge == "b" else box.max_y
    t = (ye - y1) / (y2 - y1)
    return (x1 + t * (x2 - x1), ye)


def _clip_edge(ring, edge, box):
    out = []
    n = len(ring)
    for i in range(n):
        cur = tuple(ring[i])
        prev = tuple(ring[i - 1])
        cin = _inside(cur, edge, box)
        pin = _inside(prev, edge, box)
        if cin:
            if not pin:
                out.append(_intersect(prev, cur, edge, box))
            out.append(cur)
        elif pin:
            out.append(_intersect(prev, cur, edge, box))
    return np.asarray(out, np.float64).reshape(-1, 2)


def read_poly_file(path: str) -> Polygon:
    """Simple x y per line, rings separated by NEXT (ref ``dPoly`` text IO)."""
    poly = Polygon()
    ring: List[Tuple[float, float]] = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line or line.upper().startswith("NEXT"):
                if len(ring) >= 3:
                    poly.append_ring(ring)
                ring = []
                continue
            parts = line.split()
            if len(parts) >= 2:
                ring.append((float(parts[0]), float(parts[1])))
    if len(ring) >= 3:
        poly.append_ring(ring)
    return poly


def write_poly_file(path: str, poly: Polygon) -> None:
    with open(path, "w") as f:
        for i, r in enumerate(poly.rings):
            for x, y in r:
                f.write(f"{x} {y}\n")
            if i + 1 < len(poly.rings):
                f.write("NEXT\n")


def read_point_list(path: str) -> np.ndarray:
    """Whitespace-separated point list file -> (N, D) array
    (ref ``PointListIO.h``)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if line:
                rows.append([float(v) for v in line.split()])
    return np.asarray(rows, np.float64)


def write_point_list(path: str, points) -> None:
    with open(path, "w") as f:
        for row in np.asarray(points, np.float64):
            f.write(" ".join(repr(float(v)) for v in row) + "\n")
