"""Interest point detection CLI (ref ``src/vw/tools/ipfind.cc:61-229``)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vw-ipfind",
        description="Detect and describe interest points; writes <image>.vwip")
    p.add_argument("images", nargs="+")
    p.add_argument("--interest-operator",
                   choices=["sift", "dog", "harris", "log", "obalog"],
                   default="sift",
                   help="sift/dog = DoG scale-space + oriented descriptors "
                        "(the reference ipfind's default capability)")
    p.add_argument("--descriptor-generator",
                   choices=["patch", "sgrad", "sgrad2"], default="sgrad")
    p.add_argument("--max-points", type=int, default=1000)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--single-scale", action="store_true",
                   help="disable scale-space detection")
    p.add_argument("--output-dir", default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from visionworkbench_tpu.fileio import read_image
    from visionworkbench_tpu.image.algorithms import normalize
    from visionworkbench_tpu.interest import (
        assign_orientations, describe, detect_points, detect_points_scaled,
        write_binary_ip_file,
    )

    for path in args.images:
        img = read_image(path, np.float32)
        if img.ndim == 3:
            img = img.mean(axis=2)
        im = normalize(jnp.asarray(img))
        if args.interest_operator in ("sift", "dog"):
            # DoG scale-space + scale-aware orientations + oriented
            # scale-normalized descriptors (ref ipfind's OpenCV SIFT default,
            # ipfind.cc:61-229, rebuilt TPU-native).
            from visionworkbench_tpu.interest import (
                assign_orientations_scaled, detect_points_dog,
            )
            pts = detect_points_dog(im, args.threshold or 0.015,
                                    max_points=args.max_points)
            pts = assign_orientations_scaled(im, pts)
            pts = describe(im, pts, args.descriptor_generator)
        else:
            if args.interest_operator == "obalog":
                from visionworkbench_tpu.interest.detector import (
                    detect_points_obalog,
                )
                pts = detect_points_obalog(im, args.threshold or 1e-4,
                                           max_points=args.max_points)
            elif args.single_scale:
                pts = detect_points(im, args.interest_operator, args.threshold,
                                    max_points=args.max_points)
            else:
                pts = detect_points_scaled(im, args.interest_operator,
                                           args.threshold,
                                           max_points=args.max_points)
            pts = assign_orientations(im, pts)
            pts = describe(im, pts, args.descriptor_generator)
        out_dir = args.output_dir or os.path.dirname(path) or "."
        out = os.path.join(out_dir,
                           os.path.splitext(os.path.basename(path))[0] + ".vwip")
        d = pts.to_numpy()
        write_binary_ip_file(out, d)
        print(f"{path}: {len(d['x'])} interest points -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
