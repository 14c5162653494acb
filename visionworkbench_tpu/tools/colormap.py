"""DEM colorization CLI (ref ``src/vw/tools/colormap.cc``)."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vw-colormap",
                                description="Color relief from a DEM")
    p.add_argument("input")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--min", dest="lo", type=float, default=None)
    p.add_argument("--max", dest="hi", type=float, default=None)
    p.add_argument("--colormap-style", choices=["binary-red-blue", "jet"],
                   default="binary-red-blue")
    p.add_argument("--nodata-value", type=float, default=None)
    p.add_argument("--shaded-relief-file", default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from visionworkbench_tpu.cartography import colormap
    from visionworkbench_tpu.fileio import read_image, read_tiff, write_image

    dem, info = read_tiff(args.input) if args.input.lower().endswith(
        (".tif", ".tiff")) else (read_image(args.input, np.float32), None)
    nodata = args.nodata_value
    if nodata is None and info is not None:
        nodata = info.nodata
    shade = None
    if args.shaded_relief_file:
        shade = read_image(args.shaded_relief_file, np.float32)
        if shade.ndim == 3:
            shade = shade.mean(axis=2)
    rgb = colormap(jnp.asarray(dem, jnp.float32), args.lo, args.hi,
                   args.colormap_style, nodata,
                   None if shade is None else jnp.asarray(shade))
    out_path = args.output or (args.input.rsplit(".", 1)[0] + "_CMAP.png")
    write_image(out_path, np.asarray(rgb))
    print(f"Wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
