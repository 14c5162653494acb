"""Georeference info dump (ref ``src/vw/tools/georef_query.cc``)."""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vw-georef-query",
                                description="Print georeference info")
    p.add_argument("images", nargs="+")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from visionworkbench_tpu.cartography import georeference_from_tiff_info
    from visionworkbench_tpu.fileio import TiffInfo
    from visionworkbench_tpu.math.bbox import BBox2i

    for path in args.images:
        info = TiffInfo(path)
        print(f"{path}: {info.width}x{info.height}, {info.bands} band(s), "
              f"{info.dtype}")
        if info.nodata is not None:
            print(f"  nodata: {info.nodata}")
        g = georeference_from_tiff_info(info)
        if g is None:
            print("  no georeference")
            continue
        print(f"  projection: {g.projection.name}")
        print(f"  datum: {g.datum.name} (a={g.datum.a}, b={g.datum.b})")
        print(f"  transform: {g.transform[0].tolist()} {g.transform[1].tolist()}")
        print(f"  proj4: {g.proj4_str()}")
        box = g.pixel_to_lonlat_bbox(BBox2i(0, 0, info.width, info.height))
        print(f"  lonlat bbox: ({box.min_x:.6f}, {box.min_y:.6f}) -> "
              f"({box.max_x:.6f}, {box.max_y:.6f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
