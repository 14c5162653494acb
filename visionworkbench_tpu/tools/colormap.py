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
    p.add_argument("--colormap-style", default="binary-red-blue",
                   help="binary-red-blue / jet / black-body / viridis / "
                        "kindlmann / cubehelix / plasma / inferno / rainbow "
                        "/ turbo, or a colormap text file (intensity r g b "
                        "per line) — the reference's full set "
                        "(tools/colormap.cc:206-210)")
    p.add_argument("--nodata-value", type=float, default=None)
    p.add_argument("--shaded-relief-file", "-s", default=None)
    p.add_argument("--moon", action="store_true",
                   help="set min/max to [-8499, 10208] m (lunar elevations)")
    p.add_argument("--mars", action="store_true",
                   help="set min/max to [-8208, 21249] m (Mars elevations)")
    p.add_argument("--hillshade", action="store_true",
                   help="hillshade the DEM first and modulate the colors "
                        "(equivalent to --shaded-relief-file with a "
                        "freshly computed shade)")
    p.add_argument("-a", "--azimuth", type=float, default=300.0,
                   help="light azimuth for --hillshade (degrees)")
    p.add_argument("-e", "--elevation", type=float, default=20.0,
                   help="light elevation for --hillshade (degrees)")
    p.add_argument("--legend", action="store_true",
                   help="also write the colormap legend as legend.png")
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
    lo, hi = args.lo, args.hi
    if args.moon:
        lo, hi = -8499.0, 10208.0     # tools/colormap.cc --moon
    if args.mars:
        lo, hi = -8208.0, 21249.0     # tools/colormap.cc --mars
    shade = None
    if args.shaded_relief_file:
        shade = read_image(args.shaded_relief_file, np.float32)
        if shade.ndim == 3:
            shade = shade.mean(axis=2)
    elif args.hillshade:
        from visionworkbench_tpu.cartography import hillshade as _hs
        shade = np.asarray(_hs(jnp.asarray(dem, jnp.float32),
                               args.azimuth, args.elevation))
    rgb = colormap(jnp.asarray(dem, jnp.float32), lo, hi,
                   args.colormap_style, nodata,
                   None if shade is None else jnp.asarray(shade))
    out_path = args.output or (args.input.rsplit(".", 1)[0] + "_CMAP.png")
    write_image(out_path, np.asarray(rgb))
    print(f"Wrote {out_path}")
    if args.legend:
        # vertical ramp rendered through the same LUT (colormap.cc:187-198)
        ramp = np.linspace(1.0, 0.0, 256, dtype=np.float32)[:, None]
        ramp = np.repeat(ramp, 32, axis=1)
        leg = colormap(jnp.asarray(ramp), 0.0, 1.0, args.colormap_style)
        write_image("legend.png", np.asarray(leg))
        print("Wrote legend.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
