"""EXIF dump CLI (ref ``src/vw/tools/print_exif.cc``)."""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vw-print-exif",
                                description="Print EXIF metadata")
    p.add_argument("images", nargs="+")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from visionworkbench_tpu.camera import ExifView

    for path in args.images:
        print(f"== {path}")
        try:
            exif = ExifView(path)
        except Exception as e:
            print(f"  error: {e}")
            continue
        if not exif.tags:
            print("  (no EXIF data)")
            continue
        for name, value in sorted(exif.items(), key=lambda kv: str(kv[0])):
            print(f"  {name}: {value}")
        lum = exif.get_average_luminance()
        if lum is not None:
            print(f"  [derived] average luminance: {lum:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
