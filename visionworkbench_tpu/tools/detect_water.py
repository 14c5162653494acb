"""Water detection CLI (ref ``src/vw/tools/detect_water.cc`` modes
sentinel1/landsat/worldview with ``radar.h``, ``landsat.h``,
``multispectral.h``, ``flood_common.h``).

* landsat / worldview — NDWI band-ratio thresholding (``landsat.h``'s
  spectral index approach; WorldView band indices per ``multispectral.h``)
* sentinel1 — SAR backscatter: despeckle (median), global threshold from a
  2-mode Gaussian split of the histogram (``radar.h``'s Kittler-style
  split), blob cleanup
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# Default band indices (0-based) per instrument (ref landsat.h /
# multispectral.h band tables).
LANDSAT8 = {"green": 2, "nir": 4}
WORLDVIEW = {"green": 2, "nir": 6}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vw-detect-water",
                                description="Classify water pixels")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--mode", choices=["landsat", "worldview", "sentinel1"],
                   default="landsat")
    p.add_argument("--threshold", type=float, default=None,
                   help="NDWI threshold (spectral modes; default 0.0) or "
                        "backscatter threshold (sentinel1; default automatic)")
    p.add_argument("--green-band", type=int, default=None)
    p.add_argument("--nir-band", type=int, default=None)
    p.add_argument("--min-blob-area", type=int, default=8)
    p.add_argument("--nodata-value", type=float, default=None)
    return p


def detect_water_spectral(image: np.ndarray, green: int, nir: int,
                          threshold: float = 0.0):
    """NDWI = (G - NIR) / (G + NIR) > threshold."""
    g = image[..., green].astype(np.float64)
    n = image[..., nir].astype(np.float64)
    ndwi = (g - n) / np.maximum(g + n, 1e-9)
    return ndwi > threshold, ndwi


def detect_water_sar(backscatter: np.ndarray, threshold=None):
    """Low-backscatter classification with an automatic bimodal split."""
    import jax.numpy as jnp
    from visionworkbench_tpu.image.window_ops import median_filter
    from visionworkbench_tpu.math.statistics import gaussian_clustering
    smooth = np.asarray(median_filter(jnp.asarray(backscatter, jnp.float32), 3))
    if threshold is None:
        clusters = gaussian_clustering(smooth[np.isfinite(smooth)], 2)
        (w0, m0, v0), (w1, m1, v1) = clusters
        # Decision point between the two modes (equal-likelihood crossing
        # approximated by the sigma-weighted midpoint).
        s0, s1 = np.sqrt(v0), np.sqrt(v1)
        threshold = (m0 * s1 + m1 * s0) / (s0 + s1)
    return smooth < threshold, float(threshold)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from visionworkbench_tpu.fileio import read_tiff, write_tiff, TiffInfo
    from visionworkbench_tpu.image.morphology import remove_small_blobs
    from visionworkbench_tpu.cartography import georeference_from_tiff_info

    arr, info = read_tiff(args.input)
    georef = georeference_from_tiff_info(info)
    nodata = args.nodata_value if args.nodata_value is not None else info.nodata

    if args.mode in ("landsat", "worldview"):
        bands = LANDSAT8 if args.mode == "landsat" else WORLDVIEW
        green = args.green_band if args.green_band is not None else bands["green"]
        nir = args.nir_band if args.nir_band is not None else bands["nir"]
        if arr.ndim != 3 or arr.shape[2] <= max(green, nir):
            print(f"error: {args.mode} mode needs a multiband image with "
                  f"bands {green} and {nir}", file=sys.stderr)
            return 1
        thr = 0.0 if args.threshold is None else args.threshold
        water, _ = detect_water_spectral(arr, green, nir, thr)
        if nodata is not None:
            water &= arr[..., green] != nodata
    else:
        band = arr if arr.ndim == 2 else arr[..., 0]
        water, thr = detect_water_sar(band, args.threshold)
        print(f"sentinel1 backscatter threshold: {thr:.4f}")
        if nodata is not None:
            water &= band != nodata

    if args.min_blob_area > 1:
        water = np.asarray(remove_small_blobs(jnp.asarray(water),
                                              args.min_blob_area))
    out_path = args.output or (args.input.rsplit(".", 1)[0] + "_water.tif")
    write_tiff(out_path, water.astype(np.uint8) * 255, georef=georef)
    frac = water.mean()
    print(f"Wrote {out_path}: {100.0 * frac:.2f}% water")
    return 0


if __name__ == "__main__":
    sys.exit(main())
