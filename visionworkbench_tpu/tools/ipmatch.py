"""Interest point matching CLI (ref ``src/vw/tools/ipmatch.cc``): FLANN-style
ratio-test matching (exact brute-force on TPU) + RANSAC geometric filtering,
optional debug image."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vw-ipmatch",
        description="Match .vwip files between image pairs; writes .match")
    p.add_argument("images", nargs=2, help="two images (with <image>.vwip present)")
    p.add_argument("--output-prefix", default="")
    p.add_argument("--matcher-threshold", type=float, default=0.6,
                   help="Lowe ratio")
    p.add_argument("--ransac-constraint",
                   choices=["similarity", "homography", "fundamental", "none"],
                   default="similarity")
    p.add_argument("--inlier-threshold", type=float, default=10.0)
    p.add_argument("--ransac-iterations", type=int, default=100)
    p.add_argument("--debug-image", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from visionworkbench_tpu.interest import (
        from_numpy, match_points, matched_coordinates, read_binary_ip_file,
        write_binary_match_file, match_filename,
    )
    from visionworkbench_tpu.math.ransac import ransac

    im1, im2 = args.images
    vwip1 = os.path.splitext(im1)[0] + ".vwip"
    vwip2 = os.path.splitext(im2)[0] + ".vwip"
    d1 = read_binary_ip_file(vwip1)
    d2 = read_binary_ip_file(vwip2)
    p1 = from_numpy(d1)
    p2 = from_numpy(d2)
    m = match_points(p1, p2, ratio=args.matcher_threshold)
    c1, c2 = matched_coordinates(p1, p2, m)
    # many-to-one matches pruned keep-last, like the reference
    # (ipmatch.cc:380 -> remove_duplicates)
    from visionworkbench_tpu.interest.matcher import remove_duplicates
    c1, c2 = remove_duplicates(c1, c2)
    print(f"Found {len(c1)} putative matches")
    if args.ransac_constraint != "none" and len(c1) >= 4:
        model = ("similarity" if args.ransac_constraint in ("similarity",
                                                            "fundamental")
                 else args.ransac_constraint)
        try:
            _, inliers = ransac(c1, c2, model, args.inlier_threshold,
                                args.ransac_iterations)
            c1, c2 = c1[inliers], c2[inliers]
            print(f"RANSAC kept {len(c1)} matches")
        except Exception as e:
            print(f"RANSAC failed ({e}); keeping raw matches")
    out = match_filename(args.output_prefix, im1, im2)
    write_binary_match_file(
        out,
        {"x": c1[:, 0], "y": c1[:, 1]},
        {"x": c2[:, 0], "y": c2[:, 1]})
    print(f"Wrote {out}")

    if args.debug_image:
        from visionworkbench_tpu.fileio import read_image, write_image
        a = read_image(im1, np.float32)
        b = read_image(im2, np.float32)
        if a.ndim == 3:
            a = a.mean(axis=2)
        if b.ndim == 3:
            b = b.mean(axis=2)
        h = max(a.shape[0], b.shape[0])
        canvas = np.zeros((h, a.shape[1] + b.shape[1], 3), np.float32)
        for k in range(3):
            canvas[:a.shape[0], :a.shape[1], k] = a
            canvas[:b.shape[0], a.shape[1]:, k] = b
        for (x1, y1), (x2, y2) in zip(c1, c2):
            n = 50
            xs = np.linspace(x1, x2 + a.shape[1], n).astype(int)
            ys = np.linspace(y1, y2, n).astype(int)
            ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < canvas.shape[1])
            canvas[ys[ok], xs[ok]] = [1.0, 0.0, 0.0]
        debug_path = out.replace(".match", "_debug.png")
        write_image(debug_path, canvas)
        print(f"Wrote {debug_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
