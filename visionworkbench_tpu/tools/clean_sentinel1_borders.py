"""Trim noisy SAR swath borders (ref ``src/vw/tools/clean_sentinel1_borders.cc``):
invalidate border-connected low-backscatter pixels and write the cleaned
image with a nodata value."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vw-clean-sentinel1-borders",
                                description="Remove noisy Sentinel-1 borders")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--border-threshold", type=float, default=0.02,
                   help="pixels below this are border noise candidates")
    p.add_argument("--nodata-value", type=float, default=0.0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from visionworkbench_tpu.fileio import read_tiff, write_tiff
    from visionworkbench_tpu.cartography import georeference_from_tiff_info
    from visionworkbench_tpu.image.masks import edge_mask

    arr, info = read_tiff(args.input)
    band = arr if arr.ndim == 2 else arr[..., 0]
    # Border-connected low-value region: binarize "signal" pixels, then keep
    # only the region reachable from the interior (edge_mask semantics).
    signal = (band > args.border_threshold).astype(np.float32) * band
    mi = edge_mask(jnp.asarray(signal, jnp.float32), 0.0)
    cleaned = np.where(np.asarray(mi.valid), band, args.nodata_value)
    out_path = args.output or (args.input.rsplit(".", 1)[0] + "_clean.tif")
    write_tiff(out_path, cleaned.astype(band.dtype),
               georef=georeference_from_tiff_info(info),
               nodata=args.nodata_value)
    kept = float(np.asarray(mi.valid).mean())
    print(f"Wrote {out_path}: kept {100.0 * kept:.1f}% of pixels")
    return 0


if __name__ == "__main__":
    sys.exit(main())
