"""Reference-parity oracle for SGM/MGM: a slow, literal NumPy transliteration
of the reference's ``SemiGlobalMatcher`` (``src/vw/Stereo/SGM.h/.cc``,
``SGMAssist.h``), used ONLY as a test oracle (companion to ``vw_oracle.py``).

Transliterated components (each function cites its source):

* ``populate_disp_bound_image``  — SGM.cc:241-499 (left-mask ZERO_SEARCH_AREA,
  right-mask valid row/column ranges + offset intersection, prev-disparity
  SCALE_UP=2 seeding with the >=10-range edge-distrust rule, global clamping)
  plus ``constrain_disp_bound_image`` at conservation level 0
  (SGM.cc:502-671: 10-px neighborhood bbox growth + expand(2) for
  full-search pixels; memory-limit escalation is NOT modeled — tests size
  inputs to fit).
* census cost fill               — SGM.cc:39-75, 1740-1871 (census images at
  half-kernel offsets, hamming distances over per-pixel bound rectangles,
  dy-major packing); census comparison sets come from ``vw_oracle``'s
  transliteration of ``Image/CensusTransform.h``.
* ``evaluate_path``              — SGM.cc:806-933 (full-prior buffer filled
  with BAD = 255 + p2 for absent candidates, INTEGER ``p2 /= gradient``
  division, clamped-repetition adjacent-disparity lookup, min-prior
  subtraction; uint16 arithmetic modeled in int64 — the reference never
  overflows 16 bits for census costs, asserted here).
* SGM 8-path accumulation        — SGM.cc:2462-2612 /
  ``PixelPassTask`` SGMAssist.h:691-832: per-direction line recurrences
  (first pixel of each line = local cost), all eight direction sums added.
* MGM 8-task accumulation        — ``SmoothPathAccumTask``
  SGMAssist.h:835-1239 (``accum_mgm_multithread``, SGM.cc:2619-2700): each
  direction averages TWO prior-neighbor evaluations with INTEGER /2, both
  sharing ONE pixel_diff whose direction sign follows the reference exactly
  (e.g. task_L diffs against the RIGHT neighbor — ``get_path_pixel_diff``
  at dir (-1,0), SGMAssist.h:932 with SGM.cc:2715-2721), with the
  reference's exact per-task guard conditions (e.g. task_B resets the
  whole col==0 column to local cost).
* ``select_best_disparity``      — SGM.cc:1159-1284 (multiple-minimum
  smoothing: up to 6 iterations of 3-tap box filters, horizontal then
  vertical on the 6th, round-half-away rounding, dropped out-of-rectangle
  taps; the smoothed values REPLACE the accumulation vector, which the
  subpixel step then reads).
* ``create_disparity_view``      — SGM.cc:1286-1408.
* ``create_disparity_view_subpixel`` — SGM.cc:1445-1614 (ParabolaFit2d with
  the erf squash + 0.5-norm clamp, SGMAssist.h:36-141; the 1D ratio fits
  linear/poly4/cosine/lc_blend SGM.cc:1410-1436; ``two_value_subpixel`` at
  range bounds SGM.cc:1438-1442; bound-collapsed indices x_left=0 etc.).
* ``semi_global_matching_func``  — SGM.cc:2387-2448 (output-region math from
  kernel size + max disparity).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from tests.oracle.vw_oracle import census_comparisons

ZERO_SEARCH_AREA = (0, 0, -1, -1)

# Default penalties (SGM.cc:104-160)
_P1_TABLE = {("census", 3): 3, ("census", 5): 15, ("census", 7): 30,
             ("census", 9): 20,
             ("ternary_census", 3): 12, ("ternary_census", 5): 30,
             ("ternary_census", 7): 40, ("ternary_census", 9): 40}
_P2_TABLE = {("census", 3): 70, ("census", 5): 750, ("census", 7): 1500,
             ("census", 9): 1000,
             ("ternary_census", 3): 600, ("ternary_census", 5): 1500,
             ("ternary_census", 7): 2000, ("ternary_census", 9): 2000}


def linear_fit(x):        # SGM.cc:1411
    return x / 2.0


def poly4_fit(x):         # SGM.cc:1417
    return (x * x * x * x + x) / 4.0


def cos_fit(x):           # SGM.cc:1424
    return 1.0 - math.cos(x * math.pi / 3.0)


def lc_blend_fit(x):      # SGM.cc:1431
    factor = 1.195 - math.cos(x * (math.pi / 2.3))
    return cos_fit(x) * factor + linear_fit(x) * (1.0 - factor)


class ParabolaFit2d:
    """SGMAssist.h:36-141."""

    PINV = np.array([
        [1/6, -1/3, 1/6, 1/6, -1/3, 1/6, 1/6, -1/3, 1/6],
        [1/6, 1/6, 1/6, -1/3, -1/3, -1/3, 1/6, 1/6, 1/6],
        [1/4, 0.0, -1/4, 0.0, 0.0, 0.0, -1/4, 0.0, 1/4],
        [-1/6, 0.0, 1/6, -1/6, 0.0, 1/6, -1/6, 0.0, 1/6],
        [-1/6, -1/6, -1/6, 0.0, 0.0, 0.0, 1/6, 1/6, 1/6],
        [-1/9, 2/9, -1/9, 2/9, 5/9, 2/9, -1/9, 2/9, -1/9],
    ], dtype=np.float32)  # stored as Matrix<float,6,9> (SGMAssist.h:139)

    def find_peak(self, z: np.ndarray) -> Tuple[bool, float, float]:
        vals = (self.PINV.astype(np.float64) @ np.asarray(z, np.float64))
        denom = 4.0 * vals[0] * vals[1] - vals[2] * vals[2]
        if abs(denom) < 0.01:
            return False, 0.0, 0.0
        # offset goes through a Vector2f (float32) before the erf (line 116)
        dx = np.float32((vals[2] * vals[4] - 2.0 * vals[1] * vals[3]) / denom)
        dy = np.float32((vals[2] * vals[3] - 2.0 * vals[0] * vals[4]) / denom)
        dx = math.erf(float(dx) / (0.34574 * math.sqrt(2.0))) / 2.0
        dy = math.erf(float(dy) / (0.38944 * math.sqrt(2.0))) / 2.0
        n = math.hypot(dx, dy)
        if n >= 0.5:
            scale = n / 0.5
            dx /= scale
            dy /= scale
        return True, dx, dy


def census_image(img_u8: np.ndarray, window: int, ternary: bool,
                 thresh: int) -> np.ndarray:
    """(H-2hk, W-2hk, nbits) boolean comparison planes, entry (r, c) centered
    at (r+hk, c+hk) — the census images of SGM.cc:1740-1871 kept unpacked
    (hamming distance = count of differing planes, identical to popcounting
    the packed codes)."""
    hk = (window - 1) // 2
    comps = census_comparisons(img_u8.astype(np.int64), window, ternary,
                               thresh)
    return comps[hk:img_u8.shape[0] - hk, hk:img_u8.shape[1] - hk]


class SGMOracle:
    """Loop-faithful ``SemiGlobalMatcher`` (SGM.h:75-352)."""

    def __init__(self, cost_type: str = "census", use_mgm: bool = False,
                 min_disp_x: int = 0, min_disp_y: int = 0,
                 max_disp_x: int = 0, max_disp_y: int = 0,
                 kernel_size: int = 5, subpixel: str = "lc_blend",
                 search_buffer: Tuple[int, int] = (2, 2),
                 p1: int = 0, p2: int = 0,
                 ternary_census_threshold: int = 5):
        assert cost_type in ("census", "ternary_census")
        self.cost_type = cost_type
        self.use_mgm = use_mgm
        self.min_disp_x, self.min_disp_y = min_disp_x, min_disp_y
        self.max_disp_x, self.max_disp_y = max_disp_x, max_disp_y
        self.kernel_size = kernel_size
        self.subpixel = subpixel
        self.search_buffer = search_buffer
        self.ternary_census_threshold = ternary_census_threshold
        self.num_disp_x = max_disp_x - min_disp_x + 1
        self.num_disp_y = max_disp_y - min_disp_y + 1
        self.num_disp = self.num_disp_x * self.num_disp_y
        key = (cost_type, kernel_size)
        self.p1 = int(p1) if p1 > 0 else _P1_TABLE[key]
        self.p2 = int(p2) if p2 > 0 else _P2_TABLE[key]
        self.bad_accum_val = 255 + self.p2   # get_bad_accum_val, SGM.h:240

    # ---- indexing helpers (SGM.cc:2723-2745) -----------------------------

    def xy_to_disp(self, dx: int, dy: int) -> int:
        return (dy - self.min_disp_y) * self.num_disp_x + (dx - self.min_disp_x)

    def disp_index_to_xy(self, min_index: int, col: int, row: int):
        b = self.disp_bound[row][col]
        d_width = b[2] - b[0] + 1
        dy = min_index // d_width
        dx = min_index - dy * d_width + b[0]
        dy += b[1]
        return dx, dy

    def get_num_disparities(self, col: int, row: int) -> int:
        b = self.disp_bound[row][col]
        return (b[2] - b[0] + 1) * (b[3] - b[1] + 1)

    # ---- adjacency lookup (SGM.cc:755-799) -------------------------------

    def populate_adjacent_disp_lookup_table(self):
        lut = np.zeros((self.num_disp, 8), np.int64)
        d = 0
        for dy in range(self.min_disp_y, self.max_disp_y + 1):
            y_less = dy - 1 if dy - 1 >= self.min_disp_y else dy
            y_more = dy + 1 if dy + 1 <= self.max_disp_y else dy
            ylo = y_less - self.min_disp_y
            yo = dy - self.min_disp_y
            ymo = y_more - self.min_disp_y
            for dx in range(self.min_disp_x, self.max_disp_x + 1):
                x_less = dx - 1 if dx - 1 >= self.min_disp_x else dx
                x_more = dx + 1 if dx + 1 <= self.max_disp_x else dx
                xlo = x_less - self.min_disp_x
                xo = dx - self.min_disp_x
                xmo = x_more - self.min_disp_x
                nx = self.num_disp_x
                lut[d] = [ylo * nx + xo, yo * nx + xlo, yo * nx + xmo,
                          ymo * nx + xo, ylo * nx + xlo, ylo * nx + xmo,
                          ymo * nx + xlo, ymo * nx + xmo]
                d += 1
        self.adjacent_lut = lut

    # ---- search-bound seeding (SGM.cc:231-499) ---------------------------

    def populate_disp_bound_image(self, left_mask, right_mask, prev_disparity):
        rows, cols = self.num_output_rows, self.num_output_cols
        self.disp_bound = [[(self.min_disp_x, self.min_disp_y,
                             self.max_disp_x, self.max_disp_y)
                            for _ in range(cols)] for _ in range(rows)]
        SCALE_UP = 2
        check_x_edge = (self.max_disp_x - self.min_disp_x + 1) >= 10
        check_y_edge = (self.max_disp_y - self.min_disp_y + 1) >= 10
        full_search = np.zeros((rows, cols), np.uint8)

        min_valid_right_row = 0
        max_valid_right_row = 0
        if right_mask is not None:
            min_valid_right_row = right_mask.shape[0] - 1
            for c in range(cols):
                for i in range(right_mask.shape[0] - 1, 0, -1):
                    if right_mask[i, c] > 0:
                        max_valid_right_row = max(max_valid_right_row, i)
                        break
                for i in range(right_mask.shape[0]):
                    if right_mask[i, c] > 0:
                        min_valid_right_row = min(min_valid_right_row, i)
                        break

        for r in range(rows):
            r_in = r // SCALE_UP
            min_valid_right_column, max_valid_right_column = -1, -2
            if right_mask is not None:
                for i in range(right_mask.shape[1] - 1, 0, -1):
                    if right_mask[r, i] > 0:
                        max_valid_right_column = i
                        break
                if max_valid_right_column > 0:
                    for i in range(right_mask.shape[1]):
                        if right_mask[r, i] > 0:
                            min_valid_right_column = i
                            break
            for c in range(cols):
                if left_mask is not None and left_mask[r, c] == 0:
                    self.disp_bound[r][c] = ZERO_SEARCH_AREA
                    continue
                good_disparity = False
                c_in = c // SCALE_UP
                dxs = dys = 0
                if prev_disparity is not None:
                    pd, pv = prev_disparity
                    if c_in < pd.shape[1] and r_in < pd.shape[0]:
                        dxs = int(pd[r_in, c_in, 0]) * SCALE_UP
                        dys = int(pd[r_in, c_in, 1]) * SCALE_UP
                        on_edge = (
                            (check_x_edge and (dxs <= self.min_disp_x or
                                               dxs >= self.max_disp_x)) or
                            (check_y_edge and (dys <= self.min_disp_y or
                                               dys >= self.max_disp_y)))
                        good_disparity = bool(pv[r_in, c_in]) and not on_edge
                if good_disparity:
                    b = [dxs - self.search_buffer[0],
                         dys - self.search_buffer[1],
                         dxs + self.search_buffer[0],
                         dys + self.search_buffer[1]]
                    b[0] = max(b[0], self.min_disp_x)
                    b[1] = max(b[1], self.min_disp_y)
                    b[2] = min(b[2], self.max_disp_x)
                    b[3] = min(b[3], self.max_disp_y)
                else:
                    b = [self.min_disp_x, self.min_disp_y,
                         self.max_disp_x, self.max_disp_y]
                    full_search[r, c] = 255
                if right_mask is not None:
                    # BBox2i intersection of valid mask region offsets with
                    # the bounds (SGM.cc:430-455). VW BBox.grow/crop keep
                    # min/max; empty iff min > max on either axis.
                    vmin_x = min_valid_right_column - c
                    vmax_x = max_valid_right_column - c
                    vmin_y = min_valid_right_row - r
                    vmax_y = max_valid_right_row - r
                    nb = [max(vmin_x, b[0]), max(vmin_y, b[1]),
                          min(vmax_x, b[2]), min(vmax_y, b[3])]
                    if nb[0] > nb[2] or nb[1] > nb[3]:
                        self.disp_bound[r][c] = ZERO_SEARCH_AREA
                        full_search[r, c] = 0
                        continue
                    b = nb
                self.disp_bound[r][c] = tuple(b)

        # constrain_disp_bound_image at conservation level 0 (SGM.cc:502-643)
        if prev_disparity is not None:
            NEARBY = 10
            EXPAND = 2
            new_bounds = {}
            for r in range(rows):
                rlo, rhi = max(r - NEARBY, 0), min(r + NEARBY, rows - 1)
                for c in range(cols):
                    if not full_search[r, c]:
                        continue
                    clo, chi = max(c - NEARBY, 0), min(c + NEARBY, cols - 1)
                    found = None
                    for rs in range(rlo, rhi + 1):
                        for cs in range(clo, chi + 1):
                            if full_search[rs, cs]:
                                continue
                            v = self.disp_bound[rs][cs]
                            if v == ZERO_SEARCH_AREA:
                                continue
                            if found is None:
                                found = [v[0], v[1], v[2], v[3]]
                            else:
                                found[0] = min(found[0], v[0])
                                found[1] = min(found[1], v[1])
                                found[2] = max(found[2], v[2])
                                found[3] = max(found[3], v[3])
                    if found is None:
                        continue  # conserve level 0: keep full range
                    found = [found[0] - EXPAND, found[1] - EXPAND,
                             found[2] + EXPAND, found[3] + EXPAND]
                    found[0] = max(found[0], self.min_disp_x)
                    found[1] = max(found[1], self.min_disp_y)
                    found[2] = min(found[2], self.max_disp_x)
                    found[3] = min(found[3], self.max_disp_y)
                    new_bounds[(r, c)] = tuple(found)
            for (r, c), b in new_bounds.items():
                self.disp_bound[r][c] = b

    # ---- census cost fill (SGM.cc:39-75, compute_disparity_costs) --------

    def compute_disparity_costs(self, left, right):
        hk = (self.kernel_size - 1) // 2
        ternary = self.cost_type == "ternary_census"
        lc = census_image(left, self.kernel_size, ternary,
                          self.ternary_census_threshold)
        rc = census_image(right, self.kernel_size, ternary,
                          self.ternary_census_threshold)
        self.cost = [[None] * self.num_output_cols
                     for _ in range(self.num_output_rows)]
        for r in range(self.min_row, self.max_row + 1):
            orow = r - self.min_row
            brow = r - hk
            for c in range(self.min_col, self.max_col + 1):
                ocol = c - self.min_col
                bcol = c - hk
                b = self.disp_bound[orow][ocol]
                vals = []
                for dy in range(b[1], b[3] + 1):
                    for dx in range(b[0], b[2] + 1):
                        vals.append(int(np.sum(
                            lc[brow, bcol] != rc[brow + dy, bcol + dx])))
                self.cost[orow][ocol] = np.asarray(vals, np.int64)

    # ---- evaluate_path (SGM.cc:806-933) ----------------------------------

    def evaluate_path(self, col, row, col_p, row_p, prior, local, pdiff):
        p2_mod = self.p2
        if pdiff > 0:
            p2_mod = self.p2 // pdiff      # INTEGER division (uint16 /=)
        if p2_mod < self.p1:
            p2_mod = self.p1
        b = self.disp_bound[row][col]
        bp = self.disp_bound[row_p][col_p]
        BAD = self.bad_accum_val
        full = np.full(self.num_disp, BAD, np.int64)
        min_prior = BAD
        d = 0
        for dy in range(bp[1], bp[3] + 1):
            fi = self.xy_to_disp(bp[0], dy)
            for dx in range(bp[0], bp[2] + 1):
                if prior[d] < min_prior:
                    min_prior = int(prior[d])
                full[fi] = prior[d]
                fi += 1
                d += 1
        min_prev = min_prior + p2_mod
        n_out = self.get_num_disparities(col, row)
        out = np.empty(n_out, np.int64)
        packed = 0
        for dy in range(b[1], b[3] + 1):
            fd = self.xy_to_disp(b[0], dy)
            for dx in range(b[0], b[2] + 1):
                lowest = int(full[fd])
                adj = int(np.min(full[self.adjacent_lut[fd]])) + self.p1
                lowest = min(lowest, adj, min_prev)
                out[packed] = local[packed] + lowest - min_prior
                packed += 1
                fd += 1
        assert np.all(out < 65536), "uint16 accumulation overflow"
        return out

    def _pixel_diff(self, col, row, dir_x, dir_y) -> int:
        """get_path_pixel_diff (SGM.cc:2714-2721)."""
        a = int(self.left_image[row + self.min_row, col + self.min_col])
        bb = int(self.left_image[(row - dir_y) + self.min_row,
                                 (col - dir_x) + self.min_col])
        return abs(a - bb)

    # ---- SGM accumulation: 8 direction line recurrences ------------------

    def accum_sgm(self):
        """Equivalent of accum_sgm_multithread / PixelPassTask
        (SGM.cc:2462-2612, SGMAssist.h:691-832): per direction, each line's
        first pixel takes the local cost; subsequent pixels evaluate_path
        from the predecessor along the line with pixel_diff =
        |img(p) - img(pred)|; the eight per-direction sums add into one
        accumulation buffer (integer addition — order-free)."""
        rows, cols = self.num_output_rows, self.num_output_cols
        self.accum = [[np.zeros(self.get_num_disparities(c, r), np.int64)
                       for c in range(cols)] for r in range(rows)]
        directions = [(0, 1), (0, -1), (1, 0), (-1, 0),
                      (1, 1), (-1, 1), (1, -1), (-1, -1)]
        for (dx, dy) in directions:
            acc_dir = [[None] * cols for _ in range(rows)]
            rws = range(rows) if dy >= 0 else range(rows - 1, -1, -1)
            cls = range(cols) if dx >= 0 else range(cols - 1, -1, -1)
            for r in rws:
                for c in cls:
                    pr, pc = r - dy, c - dx
                    local = self.cost[r][c]
                    if 0 <= pr < rows and 0 <= pc < cols:
                        pd = self._pixel_diff(c, r, dx, dy)
                        acc_dir[r][c] = self.evaluate_path(
                            c, r, pc, pr, acc_dir[pr][pc], local, pd)
                    else:
                        acc_dir[r][c] = local.astype(np.int64).copy()
                    self.accum[r][c] = self.accum[r][c] + acc_dir[r][c]

    # ---- MGM accumulation: 8 SmoothPathAccumTask equivalents -------------

    # (pd_dir, prior1, prior2, guard) per task — SGMAssist.h:911-1237.
    # guard(row, col, last_row, last_col) -> True means evaluate; else local.
    _MGM_TASKS = [
        # task_L: rows TL->BR
        ((-1, 0), (-1, 0), (0, -1),
         lambda r, c, lr, lc: r > 0 and c > 0, "rowsF"),
        # task_TL
        ((-1, -1), (-1, -1), (1, -1),
         lambda r, c, lr, lc: r > 0 and 0 < c < lc, "rowsF"),
        # task_R: rows BR->TL
        ((1, 0), (1, 0), (0, 1),
         lambda r, c, lr, lc: r < lr and c < lc, "rowsR"),
        # task_BR
        ((1, 1), (1, 1), (-1, 1),
         lambda r, c, lr, lc: r < lr and 0 < c < lc, "rowsR"),
        # task_B: cols BL->TR (col asc, row desc)
        ((0, 1), (0, 1), (-1, 0),
         lambda r, c, lr, lc: r < lr and c > 0, "colsF"),
        # task_BL
        ((-1, 1), (-1, 1), (-1, -1),
         lambda r, c, lr, lc: 0 < r < lr and c > 0, "colsF"),
        # task_T: cols TR->BL (col desc, row asc)
        ((0, -1), (0, -1), (1, 0),
         lambda r, c, lr, lc: r > 0 and c < lc, "colsR"),
        # task_TR
        ((1, -1), (1, -1), (1, 1),
         lambda r, c, lr, lc: 0 < r < lr and c < lc, "colsR"),
    ]

    def accum_mgm(self):
        rows, cols = self.num_output_rows, self.num_output_cols
        lr, lc = rows - 1, cols - 1
        self.accum = [[np.zeros(self.get_num_disparities(c, r), np.int64)
                       for c in range(cols)] for r in range(rows)]
        for (pd_dir, n1, n2, guard, order) in self._MGM_TASKS:
            acc_dir = [[None] * cols for _ in range(rows)]
            if order == "rowsF":
                it = ((r, c) for r in range(rows) for c in range(cols))
            elif order == "rowsR":
                it = ((r, c) for r in range(rows - 1, -1, -1)
                      for c in range(cols - 1, -1, -1))
            elif order == "colsF":
                it = ((r, c) for c in range(cols)
                      for r in range(rows - 1, -1, -1))
            else:
                it = ((r, c) for c in range(cols - 1, -1, -1)
                      for r in range(rows))
            for (r, c) in it:
                if self.get_num_disparities(c, r) == 0:
                    acc_dir[r][c] = np.zeros(0, np.int64)
                    continue
                local = self.cost[r][c]
                if guard(r, c, lr, lc):
                    pd = self._pixel_diff(c, r, pd_dir[0], pd_dir[1])
                    a = self.evaluate_path(c, r, c + n1[0], r + n1[1],
                                           acc_dir[r + n1[1]][c + n1[0]],
                                           local, pd)
                    bb = self.evaluate_path(c, r, c + n2[0], r + n2[1],
                                            acc_dir[r + n2[1]][c + n2[0]],
                                            local, pd)
                    out = (a + bb) // 2    # INTEGER average (uint16 /2)
                else:
                    out = local.astype(np.int64).copy()
                acc_dir[r][c] = out
                self.accum[r][c] = self.accum[r][c] + out

    # ---- disparity view (SGM.cc:1159-1408) -------------------------------

    def select_best_disparity(self, accum_vec, bounds):
        """Returns (min_index, final_vec) — the reference mutates accum_vec
        in place so the subpixel step reads the smoothed values."""
        height = bounds[3] - bounds[1] + 1
        width = bounds[2] - bounds[0] + 1
        vec = accum_vec.astype(np.float64)
        min_index = int(np.argmin(vec))
        min_count = int(np.sum(vec == vec.min()))
        MAX_ITERATIONS, VERT_ITERATION = 6, 5
        iter_count = 0
        cur = accum_vec.astype(np.int64)
        while min_count > 1:
            nxt = np.empty_like(cur)
            index = 0
            for row in range(height):
                for col in range(width):
                    lo, hi = -1, 1
                    if iter_count < VERT_ITERATION:
                        if col - 1 < 0:
                            lo = 0
                        if col + 1 >= width:
                            hi = 0
                        taps = [cur[index + k] for k in range(lo, hi + 1)]
                    else:
                        if row - 1 < 0:
                            lo = 0
                        if row + 1 >= height:
                            hi = 0
                        taps = [cur[index + k * width]
                                for k in range(lo, hi + 1)]
                    result = sum(float(t) / 3.0 for t in taps)
                    wt = len(taps) / 3.0
                    # C round(): half away from zero; values are >= 0 here
                    nxt[index] = int(math.floor(result / wt + 0.5))
                    index += 1
            cur = nxt
            mn = cur.min()
            min_index = int(np.argmin(cur))
            min_count = int(np.sum(cur == mn))
            iter_count += 1
            if iter_count >= MAX_ITERATIONS:
                break
        return min_index, cur

    def create_disparity_view(self):
        rows, cols = self.num_output_rows, self.num_output_cols
        disp = np.zeros((rows, cols, 2), np.int32)
        valid = np.zeros((rows, cols), bool)
        for j in range(rows):
            for i in range(cols):
                if self.get_num_disparities(i, j) == 0:
                    continue
                b = self.disp_bound[j][i]
                min_index, final_vec = self.select_best_disparity(
                    self.accum[j][i], b)
                self.accum[j][i] = final_vec   # smoothing leaks to subpixel
                dx, dy = self.disp_index_to_xy(min_index, i, j)
                disp[j, i] = (dx, dy)
                valid[j, i] = True
        return disp, valid

    def compute_subpixel_offset(self, prev, center, nxt, left_bound,
                                right_bound):
        """SGM.cc:1445-1479."""
        ld = float(prev - center)
        rd = float(nxt - center)
        if rd == 0 and ld == 0:
            return 0.0
        if left_bound:
            return 0.5 * (float(center) / float(nxt))
        if right_bound:
            return -0.5 * (float(center) / float(prev))
        x = rd / ld
        mult = -1.0
        if ld < rd:
            x = ld / rd
            mult = 1.0
        if self.subpixel == "poly4":
            value = poly4_fit(x)
        elif self.subpixel == "cosine":
            value = cos_fit(x)
        elif self.subpixel == "lc_blend":
            value = lc_blend_fit(x)
        else:
            value = linear_fit(x)
        return (value - 0.5) * mult

    def create_disparity_view_subpixel(self, int_disp, int_valid):
        rows, cols = self.num_output_rows, self.num_output_cols
        disp = np.zeros((rows, cols, 2), np.float32)
        valid = np.zeros((rows, cols), bool)
        fitter = ParabolaFit2d()
        for j in range(rows):
            for i in range(cols):
                b = self.disp_bound[j][i]
                width = b[2] - b[0] + 1
                if not int_valid[j, i]:
                    continue
                dx, dy = int(int_disp[j, i, 0]), int(int_disp[j, i, 1])
                valid[j, i] = True
                if self.subpixel == "none":
                    disp[j, i] = (dx, dy)
                    continue
                min_index = (dy - b[1]) * width + (dx - b[0])
                x_left, x_right = -1, 1
                y_up, y_down = -width, width
                top_b = bot_b = left_b = right_b = False
                if dx == b[0]:
                    x_left = 0
                    left_b = True
                if dx == b[2]:
                    x_right = 0
                    right_b = True
                if dy == b[1]:
                    y_up = 0
                    top_b = True
                if dy == b[3]:
                    y_down = 0
                    bot_b = True
                av = self.accum[j][i]
                if self.subpixel == "parabola":
                    ok, ddx, ddy = fitter.find_peak(np.array([
                        av[min_index + x_left + y_up], av[min_index + y_up],
                        av[min_index + x_right + y_up],
                        av[min_index + x_left], av[min_index],
                        av[min_index + x_right],
                        av[min_index + x_left + y_down],
                        av[min_index + y_down],
                        av[min_index + x_right + y_down]], np.float64))
                    if ok:
                        disp[j, i] = (dx + ddx, dy + ddy)
                    else:
                        disp[j, i] = (dx, dy)
                else:
                    ddx = self.compute_subpixel_offset(
                        av[min_index + x_left], av[min_index],
                        av[min_index + x_right], left_b, right_b)
                    ddy = self.compute_subpixel_offset(
                        av[min_index + y_up], av[min_index],
                        av[min_index + y_down], top_b, bot_b)
                    disp[j, i] = (dx + ddx, dy + ddy)
        return disp, valid

    # ---- top-level (SGM.cc:2387-2448) ------------------------------------

    def semi_global_matching_func(self, left, right, left_mask=None,
                                  right_mask=None, prev_disparity=None):
        left = np.asarray(left, np.uint8)
        right = np.asarray(right, np.uint8)
        self.left_image = left.astype(np.int64)
        hk = (self.kernel_size - 1) // 2
        self.min_row = hk - self.min_disp_y
        self.min_col = hk - self.min_disp_x
        self.max_row = min(left.shape[0] - 1 - hk,
                           right.shape[0] - 1 - (hk + self.max_disp_y))
        self.max_col = min(left.shape[1] - 1 - hk,
                           right.shape[1] - 1 - (hk + self.max_disp_x))
        self.min_row = max(self.min_row, 0)
        self.min_col = max(self.min_col, 0)
        self.max_row = min(self.max_row, left.shape[0] - 1)
        self.max_col = min(self.max_col, left.shape[1] - 1)
        self.num_output_cols = self.max_col - self.min_col + 1
        self.num_output_rows = self.max_row - self.min_row + 1

        self.populate_adjacent_disp_lookup_table()
        self.populate_disp_bound_image(left_mask, right_mask, prev_disparity)
        self.compute_disparity_costs(left, right)
        if self.use_mgm:
            self.accum_mgm()
        else:
            self.accum_sgm()
        return self.create_disparity_view()


def calc_disparity_sgm(cost_type, left_f, right_f, search_volume,
                       kernel_size, use_mgm=False, subpixel="lc_blend",
                       search_buffer=(2, 2), left_mask=None, right_mask=None,
                       prev_disparity=None, p1=0, p2=0,
                       ternary_census_threshold=5):
    """Wrapper mirroring the ROI-level entry (SGM.cc:167-229): [0,1] float
    inputs are u8-converted (round-half-to-even like VW's channel cast),
    search is [0, search_volume] INCLUSIVE of the passed max. Returns
    (int_disp, valid, subpixel_disp, subpixel_valid, oracle)."""
    left_u8 = np.clip(np.rint(np.asarray(left_f) * 255.0), 0, 255)
    right_u8 = np.clip(np.rint(np.asarray(right_f) * 255.0), 0, 255)
    o = SGMOracle(cost_type, use_mgm, 0, 0, int(search_volume[0]),
                  int(search_volume[1]), int(kernel_size), subpixel,
                  search_buffer, p1, p2, ternary_census_threshold)
    d, v = o.semi_global_matching_func(left_u8, right_u8, left_mask,
                                       right_mask, prev_disparity)
    sd, sv = o.create_disparity_view_subpixel(d, v)
    return d, v, sd, sv, o
