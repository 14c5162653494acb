"""Sentinel-1 SAR water detection — the Martinis algorithm (ref
``src/vw/tools/radar.h``; Martinis, Kersten, Twele, "A fully automated
TerraSAR-X based flood service", ISPRS 2015).

Stages, each a vectorized jnp pass over the whole image (the reference's
tile views become reshape-reductions; its per-bin threshold search becomes
a vmapped evaluation of every candidate split at once):

1. preprocess: DN → dB, 3×3 median despeckle, rescale [0,35] dB → [0,400]
2. tile statistics: per tile, mean + sample-stddev of the four sub-tile
   means (sub-tiles with <95% valid pixels are dropped)
3. tile selection: keep high-stddev (95th percentile), below-global-mean
   tiles; cap at 5 ranked by stddev, skipping tiles brighter than the
   initially-kept set's mean
4. per-tile Kittler–Illingworth histogram split → global threshold =
   mean of tile thresholds (retry with half tiles if stddev > 10)
5. fuzzy refinement: Z(radar), S(blob size), optionally Z(DEM height) and
   Z(slope); defuzz = mean (0 if any member is 0)
6. hysteresis fill: seed at 0.6·sens, grow through 0.45·sens.

Note on stage 6: the reference calls ``two_threshold_fill(defuzzed,
TILE_EXPAND, 0.6·s, 0.45·s, ...)`` whose signature is (low, high) — seeds
at >0.45 growing through >0.6, which degenerates to a plain >0.45
threshold. The intent per the in-tree comment ("flood fill from pixels
above the high threshold through pixels above the low threshold") is seed
0.6 / grow 0.45, which is what this implementation does.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionworkbench_tpu.image.morphology import blob_sizes, two_threshold_fill
from visionworkbench_tpu.image.window_ops import median_filter
from .common import FLOOD_DETECT_WATER, FLOOD_DETECT_LAND, FLOOD_DETECT_NODATA

# Preprocessing range constants (radar.h:240-246).
GLOBAL_MIN_DB = 0.0
GLOBAL_MAX_DB = 35.0
PROC_MIN = 0.0
PROC_MAX = 400.0

MAX_NUM_TILES = 5                     # radar.h:560, from the paper
TILE_STDDEV_PERCENTILE_CUTOFF = 0.95  # radar.h:519
MIN_PERCENT_VALID = 0.95              # radar.h:351
MAX_THRESHOLD_STDDEV = 10.0           # radar.h:640
MIN_BLOB_SIZE_METERS = 1000.0         # radar.h:778
MAX_BLOB_SIZE_METERS = 5000.0         # radar.h:779


def fuzzy_membership_z(v, a: float, b: float):
    """Z-shaped fuzzy membership: 1 below a, 0 above b (radar.h:63-79)."""
    v = jnp.asarray(v, jnp.float32)
    c = (a + b) / 2.0
    dba = max(b - a, 1e-12)
    mid_lo = 1.0 - 2.0 * ((v - a) / dba) ** 2
    mid_hi = 2.0 * ((v - b) / dba) ** 2
    return jnp.where(v <= a, 1.0,
                     jnp.where(v < c, mid_lo, jnp.where(v < b, mid_hi, 0.0)))


def fuzzy_membership_s(v, a: float, b: float):
    """S-shaped fuzzy membership: 0 below a, 1 above b (radar.h:84-100)."""
    v = jnp.asarray(v, jnp.float32)
    c = (a + b) / 2.0
    dba = max(b - a, 1e-12)
    mid_lo = 2.0 * ((v - a) / dba) ** 2
    mid_hi = 1.0 - 2.0 * ((v - b) / dba) ** 2
    return jnp.where(v < a, 0.0,
                     jnp.where(v < c, mid_lo, jnp.where(v >= b, 1.0, mid_hi)))


def kittler_illingworth_jt(hist, min_val: float, max_val: float):
    """J(T) for every candidate split bin at once (radar.h:110-156). ``hist``
    is a normalized (num_bins,) histogram; returns (num_bins,) scores with
    the reference's FAIL_VAL where a class is empty/degenerate. Host-side
    NumPy float64 — a 255-bin histogram needs the precision, not the TPU."""
    hist = np.asarray(hist, np.float64)
    num_bins = hist.shape[0]
    fail = 999999.0
    bin_width = (max_val - min_val) / num_bins
    bin_values = min_val + bin_width * (np.arange(num_bins,
                                                  dtype=np.float64) + 0.5)
    w = hist * bin_values
    w2 = hist * bin_values * bin_values
    # Prefix sums give class-1 = bins [0, T) and class-2 = bins [T, n) for
    # every split T simultaneously.
    cp = np.cumsum(hist)
    cw = np.cumsum(w)
    cw2 = np.cumsum(w2)
    # The reference evaluates splits at bin = 1..n-1 (class 1 = bins < bin).
    p1 = cp[:-1]
    p2 = cp[-1] - p1
    m1 = cw[:-1] / np.where(p1 == 0, 1.0, p1)
    m2 = (cw[-1] - cw[:-1]) / np.where(p2 == 0, 1.0, p2)
    var1 = cw2[:-1] / np.where(p1 == 0, 1.0, p1) - m1 * m1
    var2 = ((cw2[-1] - cw2[:-1]) / np.where(p2 == 0, 1.0, p2)) - m2 * m2
    sigma1 = np.sqrt(np.maximum(var1, 0.0))
    sigma2 = np.sqrt(np.maximum(var2, 0.0))
    j = (1.0 + 2.0 * (p1 * np.log(np.where(sigma1 <= 0, 1.0, sigma1))
                      + p2 * np.log(np.where(sigma2 <= 0, 1.0, sigma2)))
         - 2.0 * (p1 * np.log(np.where(p1 == 0, 1.0, p1))
                  + p2 * np.log(np.where(p2 == 0, 1.0, p2))))
    bad = (p1 <= 0) | (p2 <= 0) | (sigma1 <= 0) | (sigma2 <= 0)
    return np.where(bad, fail, j)


def split_histogram_kittler_illingworth(hist, min_val: float,
                                        max_val: float) -> float:
    """Optimal threshold by the Kittler/Illingworth criterion
    (radar.h:159-199)."""
    hist = np.asarray(hist, np.float64)
    num_bins = hist.shape[0]
    total = hist.sum()
    if total <= 0:
        return min_val
    scores = np.asarray(kittler_illingworth_jt(hist / total, min_val,
                                               max_val))
    min_index = int(np.argmin(scores))  # score i ↔ reference bin i+1
    bin_width = (max_val - min_val) / num_bins
    # Reference: threshold below the winning bin value (bin - 0.5).
    return min_val + bin_width * (float(min_index + 1) - 0.5)


def sentinel1_dn_to_db(dn, valid=None):
    """DN → decibels (radar.h:209-224)."""
    dn = jnp.asarray(dn, jnp.float32)
    if valid is None:
        valid = jnp.ones(dn.shape, jnp.bool_)
    valid = jnp.asarray(valid) & (dn > 0)
    db = 10.0 * jnp.log10(jnp.where(dn > 0, dn, 1.0))
    return db, valid


@jax.jit
def preprocess_sentinel1(dn, valid):
    """Despeckle + rescale to [0, 400] (radar.h:227-270)."""
    db, valid = sentinel1_dn_to_db(dn, valid)
    smooth = median_filter(jnp.where(valid, db, 0.0), 3)
    scale = (PROC_MAX - PROC_MIN) / (GLOBAL_MAX_DB - GLOBAL_MIN_DB)
    proc = (smooth - GLOBAL_MIN_DB) * scale + PROC_MIN
    return proc, valid


def generate_tile_means(image, valid, tile_size: int):
    """Per-tile mean and sample-stddev of the four sub-tile means
    (radar.h:273-404 ``ImageTileMeansView``). Returns (th, tw) arrays
    ``means``, ``stddevs``, ``tvalid``."""
    image = jnp.asarray(image, jnp.float32)
    valid = jnp.asarray(valid)
    h, w = image.shape
    th, tw = h // tile_size, w // tile_size
    hs = tile_size // 2
    img = image[:th * tile_size, :tw * tile_size]
    val = valid[:th * tile_size, :tw * tile_size].astype(jnp.float32)
    # Reshape to (th, 2, hs, tw, 2, hs): sub-tile grid of half-tiles.
    img6 = img.reshape(th, 2, hs, tw, 2, hs)
    val6 = val.reshape(th, 2, hs, tw, 2, hs)
    sub_count = val6.sum(axis=(2, 5))                  # (th, 2, tw, 2)
    sub_sum = (img6 * val6).sum(axis=(2, 5))
    sub_mean = sub_sum / jnp.maximum(sub_count, 1.0)
    sub_used = (sub_count / float(hs * hs)) >= MIN_PERCENT_VALID
    n = sub_used.sum(axis=(1, 3)).astype(jnp.float32)  # (th, tw)
    used_f = sub_used.astype(jnp.float32)
    mean_of_means = ((sub_mean * used_f).sum(axis=(1, 3))
                     / jnp.maximum(n, 1.0))
    diff = (sub_mean - mean_of_means[:, None, :, None]) * used_f
    ss = (diff * diff).sum(axis=(1, 3))
    stddev = jnp.sqrt(ss / jnp.maximum(n - 1.0, 1.0))
    stddev = jnp.where(n > 1, stddev, 0.0)
    tvalid = (n > 0) & (mean_of_means > 0)
    return mean_of_means, stddev, tvalid


def select_best_tiles(means, stddevs, tvalid, debug: bool = False):
    """Pick the ≤5 low-mean high-variance tiles used for thresholding
    (radar.h:496-605). Returns a list of (row, col) tile indices."""
    means = np.asarray(means, np.float64)
    stddevs = np.asarray(stddevs, np.float64)
    tvalid = np.asarray(tvalid)
    if not tvalid.any():
        return []
    global_mean = means[tvalid].mean()
    sd = stddevs[tvalid]
    sd_min, sd_max = float(sd.min()), float(sd.max())
    num_bins = 255
    hist, _ = np.histogram(sd, bins=num_bins, range=(sd_min, sd_max))
    # get_histogram_percentile: first bin where the CDF reaches the cutoff.
    cdf = np.cumsum(hist) / max(hist.sum(), 1)
    bin_idx = int(np.searchsorted(cdf, TILE_STDDEV_PERCENTILE_CUTOFF))
    bin_width = (sd_max - sd_min) / num_bins
    cutoff = sd_min + bin_width * bin_idx

    keep = tvalid & (stddevs > cutoff) & (means < global_mean)
    rows, cols = np.nonzero(keep)
    if len(rows) == 0:
        return []
    kept_means = means[rows, cols]
    kept_stds = stddevs[rows, cols]
    if len(rows) <= MAX_NUM_TILES:
        return list(zip(rows.tolist(), cols.tolist()))

    # Rank by stddev descending; skip tiles brighter than the initial kept
    # set's mean (radar.h:573-597).
    mean_of_selected = kept_means.mean()
    order = np.argsort(-kept_stds)
    out = []
    for idx in order:
        if kept_means[idx] > mean_of_selected:
            continue
        out.append((int(rows[idx]), int(cols[idx])))
        if len(out) >= MAX_NUM_TILES:
            break
    return out


def compute_global_threshold(image, valid, kept_tiles, tile_size: int,
                             debug: bool = False):
    """Mean of per-tile Kittler–Illingworth thresholds; None if the tile
    thresholds disagree too much (radar.h:609-658)."""
    image = np.asarray(image, np.float32)
    valid = np.asarray(valid)
    num_bins = 255
    thresholds = []
    for (tr, tc) in kept_tiles:
        sl = (slice(tr * tile_size, (tr + 1) * tile_size),
              slice(tc * tile_size, (tc + 1) * tile_size))
        vals = image[sl][valid[sl]]
        hist, _ = np.histogram(vals, bins=num_bins,
                               range=(PROC_MIN, PROC_MAX))
        thresholds.append(split_histogram_kittler_illingworth(
            hist, PROC_MIN, PROC_MAX))
    thresholds = np.asarray(thresholds)
    mean_t = float(thresholds.mean())
    if len(thresholds) > 1:
        std_t = float(thresholds.std(ddof=1))
    else:
        std_t = 0.0
    if debug:
        print(f"Mean of tile thresholds: {mean_t}")
        print(f"STD  of tile thresholds: {std_t}")
    if std_t > MAX_THRESHOLD_STDDEV:
        return None
    return mean_t


@dataclasses.dataclass
class SarMartinisResult:
    classes: np.ndarray          # uint8 FLOOD_DETECT_* codes
    threshold: float             # global threshold (preprocessed units)
    raw_water: np.ndarray        # bool initial threshold result
    defuzzed: np.ndarray         # float fuzzy score


def sar_martinis(dn, valid=None, meters_per_pixel: float = 10.0,
                 dem: Optional[np.ndarray] = None, tile_size: int = 512,
                 sensitivity: float = 1.0,
                 debug: bool = False) -> SarMartinisResult:
    """Full Martinis water detection on a Sentinel-1 DN image
    (radar.h:665-975 ``sar_martinis``). ``dem``, if given, must already be
    resampled onto the image grid (the reference geo-transforms it; use
    :func:`visionworkbench_tpu.cartography.geotransform.reproject` for
    that step)."""
    dn = jnp.asarray(dn, jnp.float32)
    if valid is None:
        valid = dn > 0
    proc, pvalid = preprocess_sentinel1(dn, jnp.asarray(valid))

    # Auto-threshold with one half-tile-size retry (radar.h:713-757).
    threshold = None
    ts = tile_size
    for _ in range(2):
        means, stddevs, tvalid = generate_tile_means(proc, pvalid, ts)
        kept = select_best_tiles(means, stddevs, tvalid, debug)
        if kept:
            threshold = compute_global_threshold(proc, pvalid, kept, ts,
                                                 debug)
        if threshold is not None:
            break
        ts //= 2
    if threshold is None:
        raise ValueError(
            "Unable to compute a good water threshold for this image")

    # Initial classification: dark pixels are water (radar.h:763-773).
    raw_water = (proc <= threshold) & pvalid

    # Fuzzy refinement inputs.
    min_blob = max(int(MIN_BLOB_SIZE_METERS / meters_per_pixel), 1)
    max_blob = max(int(MAX_BLOB_SIZE_METERS / meters_per_pixel), min_blob + 1)
    sizes = blob_sizes(raw_water, max_blob)

    mean_raw_water = float(jnp.where(raw_water, proc, 0.0).sum()
                           / jnp.maximum(raw_water.sum(), 1))

    radar_fuzz = fuzzy_membership_z(proc, mean_raw_water, threshold)
    blob_fuzz = fuzzy_membership_s(sizes.astype(jnp.float32),
                                   float(min_blob), float(max_blob))

    if dem is None:
        # Defuzz two members: 0 if either is 0, else their mean
        # (radar.h:432-444, 860-868).
        any_zero = (radar_fuzz == 0) | (blob_fuzz == 0)
        defuzzed = jnp.where(any_zero, 0.0, (radar_fuzz + blob_fuzz) / 2.0)
    else:
        dem = jnp.asarray(dem, jnp.float32)
        wsel = raw_water
        n = jnp.maximum(wsel.sum(), 1)
        mean_h = jnp.where(wsel, dem, 0.0).sum() / n
        var_h = jnp.where(wsel, (dem - mean_h) ** 2, 0.0).sum() / jnp.maximum(
            n - 1, 1)
        std_h = jnp.sqrt(var_h)
        # The paper's odd-looking max height (radar.h:920); floor the band
        # at 1 m so a perfectly flat water-surface DEM doesn't degenerate.
        high_h = max(float(mean_h + std_h * (std_h + 3.5)),
                     float(mean_h) + 1.0)
        height_fuzz = fuzzy_membership_z(dem, float(mean_h), high_h)
        # Slope in degrees from DEM gradients at unit spacing
        # (radar.h:925-929: acos of the surface normal's z component).
        dzdx = (jnp.pad(dem, ((0, 0), (0, 1)), mode="edge")[:, 1:] - dem)
        dzdy = (jnp.pad(dem, ((0, 1), (0, 0)), mode="edge")[1:, :] - dem)
        slope_deg = jnp.rad2deg(jnp.arctan(jnp.hypot(dzdx, dzdy)))
        slope_fuzz = fuzzy_membership_z(slope_deg, 0.0, 15.0)
        any_zero = ((radar_fuzz == 0) | (blob_fuzz == 0)
                    | (height_fuzz == 0) | (slope_fuzz == 0))
        defuzzed = jnp.where(
            any_zero, 0.0,
            (radar_fuzz + height_fuzz + slope_fuzz + blob_fuzz) / 4.0)

    # Hysteresis fill: seed 0.6·s, grow 0.45·s (radar.h:953-955; see module
    # docstring re: the reference's argument order).
    final = two_threshold_fill(defuzzed, 0.45 * sensitivity,
                               0.6 * sensitivity, FLOOD_DETECT_LAND,
                               FLOOD_DETECT_WATER)
    classes = jnp.where(pvalid, final, jnp.uint8(FLOOD_DETECT_NODATA))
    return SarMartinisResult(classes=np.asarray(classes),
                             threshold=float(threshold),
                             raw_water=np.asarray(raw_water),
                             defuzzed=np.asarray(defuzzed))
