"""CLI tool integration tests (model: ``src/test/image2qtree_test.py`` — the
reference's only end-to-end tool test; here every tool gets one)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.fileio import read_tiff, write_tiff, write_image
from visionworkbench_tpu.cartography import make_geographic_georef
from visionworkbench_tpu.tools.correlate import main as correlate_main
from visionworkbench_tpu.tools.ipfind import main as ipfind_main
from visionworkbench_tpu.tools.ipmatch import main as ipmatch_main
from visionworkbench_tpu.tools.hillshade import main as hillshade_main
from visionworkbench_tpu.tools.colormap import main as colormap_main
from visionworkbench_tpu.tools.image2qtree import main as image2qtree_main
from visionworkbench_tpu.tools.undistort_image import main as undistort_main
from visionworkbench_tpu.tools.georef_query import main as georef_query_main
from visionworkbench_tpu.tools.convert_pinhole_model import main as convert_main


@pytest.fixture
def stereo_pair(tmp_path, rng):
    h, w, dx = 80, 100, 5
    ys, xs = np.mgrid[0:h, 0:w + dx].astype(np.float32)
    tex = (np.sin(xs * 0.4) * np.cos(ys * 0.3)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:, :w]
    right = np.array(rng.random((h, w)), np.float32)
    right[:, dx:] = tex[:, dx:w]
    right = np.roll(tex[:, :w], dx, axis=1)  # right[x] = left[x - dx] -> d=-5?
    # Use exact construction: right[:, x] = left[:, x - dx]; match left(p)=right(p+d)
    # left[c] = right[c + dx] -> d = +dx
    right = np.zeros((h, w), np.float32)
    right[:] = rng.random((h, w))
    right[:, dx:] = left[:, :w - dx]
    lp, rp = str(tmp_path / "left.tif"), str(tmp_path / "right.tif")
    write_tiff(lp, left)
    write_tiff(rp, right)
    return lp, rp, dx


def test_correlate_tool(stereo_pair, tmp_path, capsys):
    lp, rp, dx = stereo_pair
    out_prefix = str(tmp_path / "disp")
    rc = correlate_main([lp, rp, "-o", out_prefix, "--xrange", "10",
                         "--yrange", "2", "--yoffset", "-1",
                         "--kernel", "7", "7", "--max-pyramid-levels", "1",
                         "--tile-size", "16", "--prefilter", "none"])
    assert rc == 0
    disp, _ = read_tiff(out_prefix + ".tif")
    assert disp.shape == (80, 100, 3)
    valid = disp[..., 2] > 0.5
    core = np.s_[10:-10, 12:-10]
    correct = (disp[..., 0][core][valid[core]] == dx)
    assert correct.mean() > 0.85


def test_ipfind_ipmatch_tools(tmp_path, rng, capsys):
    from scipy.ndimage import gaussian_filter as blur
    base = blur(rng.random((110, 130)), 1.5).astype(np.float32)
    a = base[:90, :110]
    b = base[4:94, 6:116]
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    write_image(pa, a)
    write_image(pb, b)
    assert ipfind_main([pa, pb, "--max-points", "200",
                        "--interest-operator", "harris", "--single-scale",
                        "--threshold", "1e-8"]) == 0
    assert os.path.exists(str(tmp_path / "a.vwip"))
    os.chdir(tmp_path)
    assert ipmatch_main([pa, pb, "--matcher-threshold", "0.8",
                         "--ransac-constraint", "similarity",
                         "--inlier-threshold", "3.0", "--debug-image"]) == 0
    out = capsys.readouterr().out
    assert "RANSAC kept" in out
    assert os.path.exists(str(tmp_path / "a__b.match"))
    assert os.path.exists(str(tmp_path / "a__b_debug.png"))


def test_hillshade_colormap_tools(tmp_path, capsys):
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    dem = (100 * np.exp(-((xs - 32) ** 2 + (ys - 32) ** 2) / 300)).astype(np.float32)
    g = make_geographic_georef(-120.0, 40.0, 0.001)
    dem_path = str(tmp_path / "dem.tif")
    write_tiff(dem_path, dem, georef=g)
    sh_path = str(tmp_path / "shade.tif")
    assert hillshade_main([dem_path, "-o", sh_path]) == 0
    shade, _ = read_tiff(sh_path)
    assert shade.shape == (64, 64)
    assert 0 <= shade.min() and shade.max() <= 1
    cm_path = str(tmp_path / "cmap.png")
    assert colormap_main([dem_path, "-o", cm_path,
                          "--shaded-relief-file", sh_path]) == 0
    assert os.path.getsize(cm_path) > 500


def test_image2qtree_tool(tmp_path, rng, capsys):
    g1 = make_geographic_georef(-120.0, 40.0, 0.001)
    g2 = make_geographic_georef(-119.95, 40.0, 0.001)
    img1 = (0.5 + 0.5 * rng.random((64, 80))).astype(np.float32)
    img2 = (0.5 + 0.5 * rng.random((64, 80))).astype(np.float32)
    p1, p2 = str(tmp_path / "a_geo.tif"), str(tmp_path / "b_geo.tif")
    write_tiff(p1, img1, georef=g1)
    write_tiff(p2, img2, georef=g2)
    name = str(tmp_path / "qt")
    assert image2qtree_main([p1, p2, "-o", name, "--tile-size", "64",
                             "--blend", "draft"]) == 0
    assert os.path.exists(name + ".kml")
    out = capsys.readouterr().out
    assert "tiles under" in out


def test_undistort_and_convert_tools(tmp_path, rng, capsys):
    from visionworkbench_tpu.camera import (
        PinholeModel, TsaiLensDistortion, read_pinhole_model,
        write_pinhole_model,
    )
    cam = PinholeModel((0, 0, 0), np.eye(3), (300, 300), (40, 32),
                       TsaiLensDistortion(k1=-0.15))
    cam_path = str(tmp_path / "cam.tsai")
    write_pinhole_model(cam_path, cam)
    img_path = str(tmp_path / "img.tif")
    write_tiff(img_path, rng.random((64, 80)).astype(np.float32))
    out_path = str(tmp_path / "und.tif")
    assert undistort_main([img_path, cam_path, "-o", out_path]) == 0
    und, _ = read_tiff(out_path)
    assert und.shape == (64, 80)
    out_tsai = str(tmp_path / "converted.tsai")
    assert convert_main([img_path, cam_path, "-o", out_tsai,
                         "--sample-spacing", "10"]) == 0
    back = read_pinhole_model(out_tsai)
    assert back.distortion.params[0] == pytest.approx(-0.15, abs=0.01)


def test_georef_query_tool(tmp_path, capsys):
    g = make_geographic_georef(-120.0, 40.0, 0.001)
    path = str(tmp_path / "g.tif")
    write_tiff(path, np.zeros((32, 32), np.float32), georef=g, nodata=-1.0)
    assert georef_query_main([path]) == 0
    out = capsys.readouterr().out
    assert "32x32" in out and "nodata: -1.0" in out and "lonlat bbox" in out


def test_detect_water_tool(tmp_path, rng, capsys):
    from visionworkbench_tpu.fileio import read_tiff, write_tiff
    from visionworkbench_tpu.tools.detect_water import main

    img = np.zeros((48, 48, 5), np.float32)
    img[..., 2] = 0.2   # green band (landsat index 2)
    img[..., 4] = 0.4   # nir band (landsat index 4): land
    img[8:28, 8:28, 2] = 0.5
    img[8:28, 8:28, 4] = 0.1                           # water block
    path = str(tmp_path / "scene.tif")
    write_tiff(path, img)
    out = str(tmp_path / "water.tif")
    assert main([path, "-o", out, "--mode", "landsat",
                 "--min-blob-area", "4"]) == 0
    water, _ = read_tiff(out)
    assert water[16, 16] == 255
    assert water[2, 2] == 1      # FLOOD_DETECT_LAND (flood_common.h)
    assert "% water" in capsys.readouterr().out

    # sentinel1 fixed-threshold fallback on a bimodal backscatter band
    sar = (1000.0 + 100.0 * rng.random((48, 48))).astype(np.float32)
    sar[10:30, 10:30] = 30.0
    spath = str(tmp_path / "sar.tif")
    write_tiff(spath, sar)
    sout = str(tmp_path / "sar_water.tif")
    assert main([spath, "-o", sout, "--mode", "sentinel1",
                 "--threshold", "500"]) == 0
    wsar, _ = read_tiff(sout)
    assert wsar[20, 20] == 255 and wsar[2, 2] == 1

    # sentinel1 automatic (Martinis) path: needs realistic DN magnitudes
    # and a tile size that fits the image.
    sar2 = (1000.0 + 150.0 * rng.standard_normal((64, 64))).clip(
        200.0).astype(np.float32)
    sar2[24:40, :] = 30.0 + 5.0 * rng.random((16, 64))
    spath2 = str(tmp_path / "sar2.tif")
    write_tiff(spath2, sar2)
    sout2 = str(tmp_path / "sar2_water.tif")
    assert main([spath2, "-o", sout2, "--mode", "sentinel1",
                 "--tile-size", "16"]) == 0
    wsar2, _ = read_tiff(sout2)
    assert wsar2[32, 32] == 255 and wsar2[4, 32] == 1


def test_clean_sentinel1_borders_tool(tmp_path, capsys):
    from visionworkbench_tpu.fileio import read_tiff, write_tiff
    from visionworkbench_tpu.tools.clean_sentinel1_borders import main

    img = 0.5 * np.ones((40, 40), np.float32)
    img[:, :6] = 0.001          # low-backscatter border strip
    path = str(tmp_path / "grd.tif")
    write_tiff(path, img)
    out = str(tmp_path / "clean.tif")
    assert main([path, "-o", out]) == 0
    cleaned, info = read_tiff(out)
    assert cleaned[20, 2] == 0.0          # border blanked to nodata
    assert cleaned[20, 20] == pytest.approx(0.5)


def test_print_exif_tool(tmp_path, capsys):
    from PIL import Image
    from visionworkbench_tpu.tools.print_exif import main

    path = str(tmp_path / "p.jpg")
    im = Image.new("L", (8, 8), 100)
    exif = Image.Exif()
    exif[271] = "MakeX"
    im.save(path, exif=exif)
    assert main([path]) == 0
    out = capsys.readouterr().out
    assert "MakeX" in out


def test_correlate_tool_sgm(stereo_pair, tmp_path, capsys):
    lp, rp, dx = stereo_pair
    out_prefix = str(tmp_path / "disp_sgm")
    rc = correlate_main([lp, rp, "-o", out_prefix, "--xrange", "10",
                        "--yrange", "1", "--kernel", "5", "5",
                        "--use-sgm", "--cost-mode", "census"])
    assert rc == 0
    disp, _ = read_tiff(out_prefix + ".tif")
    valid = disp[..., 2] > 0.5
    core = np.s_[10:-10, 12:-12]
    correct = np.abs(disp[..., 0][core][valid[core]] - dx) <= 1.0
    assert correct.mean() > 0.8


def test_image2qtree_projection_corner_cases(tmp_path, rng, capsys):
    """Deeper e2e mirror of the reference's only tool-level integration test
    (``src/test/image2qtree_test.py`` + geotif-generate.cc): synthetic
    georeferenced inputs in DIFFERENT projections (geographic + UTM via
    GeoTIFF ProjectedCSType keys), run the real CLI with multiband blending,
    verify the tile tree structure, tile readability, and the KML
    super-overlay references."""
    import glob
    from visionworkbench_tpu.cartography import GeoReference
    from visionworkbench_tpu.cartography.projection import UTMProjection
    from visionworkbench_tpu.cartography.datum import well_known_datum

    # input 1: geographic frame
    g_geo = make_geographic_georef(-120.0, 40.0, 0.001)
    yy, xx = np.mgrid[0:80, 0:96].astype(np.float32)
    img1 = (0.4 + 0.3 * np.sin(xx * 0.2) * np.cos(yy * 0.15)
            + 0.1 * rng.random((80, 96))).astype(np.float32)
    p1 = str(tmp_path / "geo.tif")
    write_tiff(p1, img1, georef=g_geo)

    # input 2: UTM zone 11N frame over an overlapping area. Build its affine
    # transform from the projected coordinates of a nearby lonlat anchor.
    datum = well_known_datum("WGS84")
    utm = UTMProjection(datum, 11, True)
    ex, ny = (float(v) for v in utm.forward(-119.96, 39.995))
    gsd = 90.0  # meters/px ~ 0.001 deg
    t = np.array([[gsd, 0.0, ex], [0.0, -gsd, ny], [0.0, 0.0, 1.0]])
    g_utm = GeoReference(datum, utm, t)
    img2 = (0.6 + 0.2 * np.cos(xx * 0.12) + 0.1 * rng.random((80, 96))
            ).astype(np.float32)
    p2 = str(tmp_path / "utm.tif")
    write_tiff(p2, img2, georef=g_utm)

    # round-trip sanity: the UTM georef must survive the GeoTIFF keys
    from visionworkbench_tpu.cartography import georeference_from_tiff_info
    from visionworkbench_tpu.fileio import TiffInfo
    back = georeference_from_tiff_info(TiffInfo(p2))
    assert isinstance(back.projection, UTMProjection)
    assert back.projection.zone == 11

    name = str(tmp_path / "qt2")
    assert image2qtree_main([p1, p2, "-o", name, "--tile-size", "32",
                             "--blend", "multiband", "-m", "kml"]) == 0
    out = capsys.readouterr().out
    assert "tiles under" in out

    # tile tree: nested level/x/y structure, all tiles readable and sane
    tiles = sorted(glob.glob(os.path.join(name, "*", "*", "*.png")))
    assert len(tiles) >= 5
    levels = sorted({int(t.split(os.sep)[-3]) for t in tiles})
    assert levels[0] == 0 and len(levels) >= 2, f"levels {levels}"
    from visionworkbench_tpu.fileio import read_image
    vals = []
    for tp in tiles:
        arr = np.asarray(read_image(tp, np.float32))
        assert arr.shape[0] <= 32 and arr.shape[1] <= 32
        vals.append(np.nanmean(arr))
    assert np.nanmax(vals) > 0.1  # real content made it through the blend

    # KML super-overlay references existing tiles
    kml = name + ".kml"
    assert os.path.exists(kml)
    text = open(kml).read()
    assert "<kml" in text and "href" in text
    import re
    refs = re.findall(r"<href>([^<]+)</href>", text)
    assert refs
    base = os.path.dirname(name) or "."
    for r in refs[:10]:
        assert os.path.exists(os.path.join(base, r)), r


def test_text_match_file_roundtrip_and_conversions(tmp_path):
    """Round-5 flag audit: text match IO + ipmatch conversion modes
    (ref MatcherIO.cc:378-500, ipmatch.cc --binary-to-txt/--txt-to-binary)."""
    import numpy as np
    from visionworkbench_tpu.interest import (
        read_binary_match_file, read_text_match_file,
        write_binary_match_file, write_text_match_file,
    )
    a = {"x": np.array([1.5, 2.25]), "y": np.array([3.0, 4.125]),
         "scale": np.array([1.0, 2.0])}
    b = {"x": np.array([5.5, 6.75]), "y": np.array([7.0, 8.5]),
         "scale": np.array([1.0, 1.5])}
    txt = str(tmp_path / "m.txt")
    write_text_match_file(txt, a, b)
    a2, b2 = read_text_match_file(txt)
    np.testing.assert_allclose(a2["x"], a["x"])
    np.testing.assert_allclose(b2["scale"], b["scale"])
    # CLI conversions
    from visionworkbench_tpu.tools import ipmatch
    binf = str(tmp_path / "m.match")
    assert ipmatch.main(["--txt-to-binary", txt, binf]) == 0
    a3, b3 = read_binary_match_file(binf)
    np.testing.assert_allclose(a3["x"], a["x"])
    txt2 = str(tmp_path / "m2.txt")
    assert ipmatch.main(["--binary-to-txt", binf, txt2]) == 0
    a4, _ = read_text_match_file(txt2)
    np.testing.assert_allclose(a4["y"], a["y"])
    # merge (binary): two files with one duplicate pair
    binf2 = str(tmp_path / "n.match")
    write_binary_match_file(binf2, {"x": np.array([1.5, 9.0]),
                                    "y": np.array([3.0, 9.0])},
                            {"x": np.array([5.5, 9.0]),
                             "y": np.array([7.0, 9.0])})
    merged = str(tmp_path / "merged.match")
    assert ipmatch.main(["--merge-match-files", binf, binf2, merged]) == 0
    am, _ = read_binary_match_file(merged)
    assert len(am["x"]) == 3    # 2 + 2 with 1 duplicate


def test_colormap_styles_and_legend(tmp_path):
    """All reference colormap styles render; file-based LUTs load; the
    colormap CLI --moon/--hillshade/--legend paths run."""
    import numpy as np
    import jax.numpy as jnp
    from visionworkbench_tpu.cartography.colormap import _LUTS, colormap
    vals = jnp.asarray(np.linspace(0, 1, 64).reshape(8, 8), jnp.float32)
    for style in ("binary-red-blue", "jet", "black-body", "viridis",
                  "kindlmann", "cubehelix", "plasma", "inferno", "rainbow",
                  "turbo"):
        rgb = np.asarray(colormap(vals, 0.0, 1.0, style))
        assert rgb.shape == (8, 8, 3) and rgb.min() >= 0 and rgb.max() <= 1
        assert style in _LUTS
    lut_file = str(tmp_path / "c.lut")
    with open(lut_file, "w") as f:
        f.write("0 255 0 0\n50% 0 255 0\n1.0 0 0 255\n")
    rgb = np.asarray(colormap(vals, 0.0, 1.0, lut_file))
    assert rgb[0, 0, 0] > 0.9 and rgb[-1, -1, 2] > 0.9
    # CLI with moon preset + hillshade + legend
    from visionworkbench_tpu.fileio import write_tiff
    from visionworkbench_tpu.tools import colormap as cm_tool
    dem = (np.random.default_rng(0).random((16, 16)) * 1000).astype(np.float32)
    src = str(tmp_path / "dem.tif")
    write_tiff(src, dem)
    out = str(tmp_path / "cm.png")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert cm_tool.main([src, "-o", out, "--moon", "--hillshade",
                             "--legend", "--colormap-style", "turbo"]) == 0
        assert os.path.exists(out) and os.path.exists("legend.png")
    finally:
        os.chdir(cwd)


def test_georef_query_modes(tmp_path, capsys):
    import numpy as np
    from visionworkbench_tpu.cartography.georeference import GeoReference
    from visionworkbench_tpu.fileio import write_tiff
    from visionworkbench_tpu.tools import georef_query
    g = GeoReference.from_epsg(32612,
                               transform=np.array([[30.0, 0, 4e5],
                                                   [0, -30.0, 5e6],
                                                   [0, 0, 1]]))
    src = str(tmp_path / "g.tif")
    write_tiff(src, np.zeros((8, 8), np.float32), georef=g)
    assert georef_query.main([src, "--row", "0", "--col", "0",
                              "--output-format", "1"]) == 0
    out = capsys.readouterr().out
    assert "x = 400015.0" in out and "y = 4999985.0" in out
    assert georef_query.main([src, "--print-bounds"]) == 0
    out = capsys.readouterr().out
    assert "Min longitude" in out
