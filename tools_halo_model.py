"""Analytic halo-bytes vs compute-bytes model for the distributed
hierarchical correlator (stand-in for unmeasurable multi-host scaling on this
1-chip host; see docs/distributed.md and BASELINE.json's >= 85% north star).

The communication of `hierarchical_sharded_correlate` is deterministic: per
pyramid level each device band exchanges a fixed number of halo rows
(kernel + level-search + filter context) over ICI, while its compute traffic
is dominated by the cost-volume box-sum passes. This script prints the
per-level table for a production config; run:

    python tools_halo_model.py [height] [n_devices]
"""

import sys


def model(h=4096, w=4096, n=8, kernel=21, search=(64, 8), refine=11,
          fhk=5, levels=4, bytes_px=4.0, volume_passes=3.0):
    half_k = kernel // 2
    rows = []
    tot_halo = 0.0
    tot_comp = 0.0
    for lvl in range(levels, -1, -1):
        sc = 1 << lvl
        h_l, w_l = h // sc, w // sc
        band = h_l // n
        s_h_l = max(search[1] // sc, 1)
        s_w_l = max(search[0] // sc, 1)
        n_disp = (s_w_l * s_h_l if lvl == levels
                  else min(refine, s_w_l) * min(refine, s_h_l))
        # halo rows per device per level: kernel support + vertical search +
        # speckle-filter context + pyramid blur context, both directions,
        # for left+right images and masks (~3 planes worth).
        halo_rows = 2 * (half_k + s_h_l + fhk + 2)
        halo_bytes = halo_rows * w_l * bytes_px * 3
        # compute traffic: the chunked sweep reads/writes the band's cost
        # volume ~volume_passes times (cost eval + box-sum passes + reduce).
        comp_bytes = band * w_l * n_disp * bytes_px * volume_passes
        tot_halo += halo_bytes
        tot_comp += comp_bytes
        rows.append((lvl, band, n_disp, halo_rows, halo_bytes / 1e6,
                     comp_bytes / 1e9, halo_bytes / comp_bytes))
    return rows, tot_halo, tot_comp


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rows, th, tc = model(h=h, w=h, n=n)
    print(f"config: {h}x{h} frame, {n} devices, kernel 21, search 64x8, "
          f"refine 11, filter 5")
    print(f"{'lvl':>3} {'band':>6} {'ndisp':>6} {'halo_rows':>9} "
          f"{'halo_MB':>8} {'comp_GB':>8} {'ratio':>9}")
    for (lvl, band, nd, hr, hb, cb, r) in rows:
        print(f"{lvl:>3} {band:>6} {nd:>6} {hr:>9} {hb:>8.3f} {cb:>8.3f} "
              f"{r:>9.5f}")
    ratio = th / tc
    # ICI is ~10x slower than HBM per byte; even so the efficiency bound is
    # 1 / (1 + 10*ratio).
    print(f"total halo/compute byte ratio: {ratio:.5f}")
    print(f"efficiency bound (ICI 10x slower than HBM): "
          f"{1.0 / (1.0 + 10.0 * ratio) * 100:.2f}%")


if __name__ == "__main__":
    main()
