"""Stereo correlation CLI (ref ``src/vw/tools/correlate.cc:56-290``).

Full pipeline: read a rectified pair, optional match-file RANSAC homography
pre-alignment of the right image, pyramid correlation (SAD/SSD/NCC/census),
optional L<->R consistency check + parabola subpixel, tiled GeoTIFF output
(dx, dy bands + validity as nodata).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vw-correlate",
        description="Dense stereo correlation on a rectified image pair")
    p.add_argument("left")
    p.add_argument("right")
    p.add_argument("-o", "--output-prefix", default="disparity")
    p.add_argument("--xoffset", type=int, default=0,
                   help="horizontal search offset (search region min x)")
    p.add_argument("--yoffset", type=int, default=0)
    p.add_argument("--xrange", type=int, default=64,
                   help="horizontal search size")
    p.add_argument("--yrange", type=int, default=8)
    p.add_argument("--kernel", type=int, nargs=2, default=(21, 21),
                   metavar=("W", "H"))
    p.add_argument("--cost-mode", choices=["abs", "sq", "ncc", "census",
                                           "ternary_census"], default="abs")
    p.add_argument("--prefilter", choices=["none", "meansub", "log"],
                   default="log")
    p.add_argument("--prefilter-width", type=float, default=1.4)
    p.add_argument("--max-pyramid-levels", type=int, default=5)
    p.add_argument("--consistency-threshold", type=float, default=-1.0,
                   help=">= 0 enables the left<->right check")
    p.add_argument("--subpixel",
                   choices=["none", "parabola", "affine", "em"],
                   default="none",
                   help="subpixel mode: parabola (9-point quadratic), "
                        "affine (weighted affine GN), em (Bayes-EM affine "
                        "mixture — the reference's quality mode)")
    p.add_argument("--blob-filter-area", type=int, default=0)
    p.add_argument("--match-file", default=None,
                   help="pre-align right image with a RANSAC homography fit "
                        "to this .match file")
    p.add_argument("--tile-size", type=int, default=64,
                   help="refinement tile size (search offsets granularity)")
    p.add_argument("--corr-timeout", type=float, default=0.0,
                   help="time budget in seconds (ref corr-timeout): degrades "
                        "the per-level search volume instead of failing; "
                        "0 disables")
    p.add_argument("--use-sgm", action="store_true",
                   help="semi-global matching instead of block matching")
    p.add_argument("--use-mgm", action="store_true",
                   help="MGM smooth variant (implies census costs)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from visionworkbench_tpu.core import Timer
    from visionworkbench_tpu.fileio import read_image, write_tiff
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo import pyramid_correlate

    left = read_image(args.left, np.float32)
    right = read_image(args.right, np.float32)
    if left.ndim == 3:
        left = left.mean(axis=2)
    if right.ndim == 3:
        right = right.mean(axis=2)

    # nodata -> validity masks (ref correlate.cc mask handling)
    left_mask = right_mask = None
    from visionworkbench_tpu.fileio import TiffInfo
    for path, img, attr in ((args.left, left, "l"), (args.right, right, "r")):
        if path.lower().endswith((".tif", ".tiff")):
            try:
                nd = TiffInfo(path).nodata
            except Exception:
                nd = None
            if nd is not None:
                mask = img != nd
                if attr == "l":
                    left_mask = mask
                else:
                    right_mask = mask

    if args.match_file:
        from visionworkbench_tpu.interest import read_binary_match_file
        from visionworkbench_tpu.math.ransac import ransac
        from visionworkbench_tpu.math.transform2d import HomographyTransform
        from visionworkbench_tpu.image.transform import transform
        d1, d2 = read_binary_match_file(args.match_file)
        p1 = np.stack([d1["x"], d1["y"]], -1)
        p2 = np.stack([d2["x"], d2["y"]], -1)
        t, inliers = ransac(p2, p1, "homography", 10.0, 100)
        print(f"Pre-alignment homography from {len(inliers)} inliers")
        right = np.asarray(transform(jnp.asarray(right),
                                     HomographyTransform(t.matrix).inverse(),
                                     (left.shape[0], left.shape[1])))

    search = BBox2i(args.xoffset, args.yoffset, args.xrange, args.yrange)
    # SGM/MGM run inside the pyramid correlator, like the reference's
    # stereo_algorithm switch (tools/correlate.cc:207-223, CorrelationView.h:45).
    algo = "mgm" if args.use_mgm else ("sgm" if args.use_sgm else "bm")
    with Timer("correlation time"):
        dm = pyramid_correlate(
            jnp.asarray(left), jnp.asarray(right), search,
            kernel_size=tuple(args.kernel), cost_type=args.cost_mode,
            left_mask=left_mask, right_mask=right_mask,
            prefilter_mode=args.prefilter, prefilter_width=args.prefilter_width,
            consistency_threshold=args.consistency_threshold,
            max_pyramid_levels=args.max_pyramid_levels,
            tile_size=args.tile_size, subpixel=args.subpixel,
            blob_filter_area=args.blob_filter_area,
            stereo_algorithm=algo, corr_timeout=args.corr_timeout)
        disp = np.asarray(dm.disparity)
        valid = np.asarray(dm.valid)

    out = np.concatenate([disp.astype(np.float32),
                          valid[..., None].astype(np.float32)], axis=-1)
    out_path = args.output_prefix + ".tif"
    write_tiff(out_path, out, tile_size=256)
    n_valid = int(valid.sum())
    print(f"Wrote {out_path}: {disp.shape[1]}x{disp.shape[0]}, "
          f"{n_valid} valid px ({100.0 * n_valid / valid.size:.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
