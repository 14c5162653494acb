"""Flood-detection suite tests (ref ``src/vw/tools/flood_common.h``,
``landsat.h``, ``radar.h``, ``multispectral.h``, ``modis_*.h``; the
reference ships no unit tests for these tools, so coverage here is
behavioral: metadata parsing, TOA math, each detection rule, and the full
Martinis SAR pipeline on synthetic imagery)."""

import numpy as np
import pytest

from visionworkbench_tpu.tools.flood import (
    FLOOD_DETECT_WATER, FLOOD_DETECT_LAND, FLOOD_DETECT_NODATA,
    compute_index, rescale_to_01, compute_earth_sun_distance,
    landsat, radar, multispectral, modis)
from visionworkbench_tpu.image.morphology import (blob_sizes,
                                                  two_threshold_fill)


# ---------------------------------------------------------------- common

def test_compute_index():
    out = np.asarray(compute_index(np.float32([3.0, 0.0, 1.0]),
                                   np.float32([1.0, 0.0, 1.0])))
    np.testing.assert_allclose(out, [0.5, 100.0, 0.0])


def test_rescale_to_01_not_clamped():
    out = np.asarray(rescale_to_01(np.float32([0.0, 5.0, 10.0, 20.0]),
                                   5.0, 10.0))
    np.testing.assert_allclose(out, [-1.0, 0.0, 1.0, 3.0])


def test_earth_sun_distance_range():
    # Whatever the (deliberately replicated) degree/radian quirk does, the
    # output must stay inside the physical annual range.
    for (y, m, d) in [(2016, 1, 3), (2016, 7, 4), (2023, 10, 23)]:
        dist = compute_earth_sun_distance(y, m, d, 17, 46, 54.8)
        assert 0.983 <= dist <= 1.017


# ---------------------------------------------------------------- landsat

MTL = """GROUP = L1_METADATA_FILE
  SUN_ELEVATION = 45.0
  RADIANCE_MULT_BAND_10 = 3.342e-04
  RADIANCE_ADD_BAND_10 = 0.10000
  K1_CONSTANT_BAND_10 = 774.8853
  K2_CONSTANT_BAND_10 = 1321.0789
  K1_CONSTANT_BAND_11 = 480.8883
  K2_CONSTANT_BAND_11 = 1201.1442
""" + "\n".join(
    f"  REFLECTANCE_MULT_BAND_{i} = 2.0e-05\n"
    f"  REFLECTANCE_ADD_BAND_{i} = -0.1" for i in range(1, 12))


def test_parse_landsat_metadata():
    md = landsat.parse_landsat_metadata(MTL, landsat_type=8)
    assert md.sun_elevation_degrees == 45.0
    sin_el = np.sin(np.deg2rad(45.0))
    np.testing.assert_allclose(md.toa_mult, 2.0e-05 / sin_el, rtol=1e-6)
    np.testing.assert_allclose(md.toa_add, -0.1 / sin_el, rtol=1e-6)
    # Thermal band (working channel TEMP) maps to source band 10.
    np.testing.assert_allclose(md.rad_mult[landsat.TEMP], 3.342e-04,
                               rtol=1e-6)
    np.testing.assert_allclose(md.k_constants,
                               [774.8853, 480.8883, 1321.0789, 1201.1442])


def test_landsat_band_mapping():
    # LS8: working BLUE comes from source band 2 (index 1).
    assert landsat.get_output_channel(1, 8) == landsat.BLUE
    assert landsat.get_output_channel(9, 8) == landsat.TEMP
    assert landsat.get_output_channel(0, 8) == -1  # coastal unused
    assert landsat.get_output_channel(0, 5) == landsat.BLUE


def test_landsat_water_threshold():
    assert landsat.compute_water_threshold(62.0) == pytest.approx(0.05)
    assert landsat.compute_water_threshold(8.0) == pytest.approx(0.6)


def _landsat_dn(toa_targets, md):
    """Invert the TOA transform to get DNs producing given reflectances."""
    dn = (np.asarray(toa_targets, np.float32) - md.toa_add) / md.toa_mult
    return dn


def test_landsat_detect_water():
    md = landsat.parse_landsat_metadata(MTL, landsat_type=8)
    h, w = 4, 4
    # Water-like TOA: dark in NIR/SWIR, moderate green, above-freezing.
    water_toa = np.array([0.06, 0.09, 0.05, 0.02, 0.01, 0.0, 0.01],
                         np.float32)
    land_toa = np.array([0.08, 0.10, 0.12, 0.30, 0.25, 0.0, 0.20],
                        np.float32)
    stack = np.empty((h, w, 7), np.float32)
    stack[:, :2] = _landsat_dn(water_toa, md)
    stack[:, 2:] = _landsat_dn(land_toa, md)
    # Thermal channel carries DN for the radiance->temperature path; pick a
    # DN giving ~290 K: L = K1/(exp(K2/T)-1), DN = (L-add)/mult.
    lum = 774.8853 / (np.exp(1321.0789 / 290.0) - 1.0)
    stack[..., landsat.TEMP] = (lum - 0.1) / 3.342e-04
    valid = np.ones((h, w), bool)
    valid[0, 0] = False
    classes = np.asarray(landsat.detect_water(stack, md, valid))
    assert classes[0, 0] == FLOOD_DETECT_NODATA
    assert (classes[1:, :2] == FLOOD_DETECT_WATER).all()
    assert (classes[:, 2:] == FLOOD_DETECT_LAND).all()


def test_landsat_toa_temperature():
    md = landsat.parse_landsat_metadata(MTL, landsat_type=8)
    lum = 774.8853 / (np.exp(1321.0789 / 300.0) - 1.0)
    dn = (lum - 0.1) / 3.342e-04
    stack = np.full((2, 2, 7), 100.0, np.float32)
    stack[..., landsat.TEMP] = dn
    toa = np.asarray(landsat.convert_to_toa(stack, md))
    np.testing.assert_allclose(toa[..., landsat.TEMP], 300.0, rtol=1e-4)


# ------------------------------------------------------------ worldview

IMD = "\n".join(
    [f"BEGIN_GROUP = BAND_{g}\n"
     f"  absCalFactor = {0.01 + 0.001 * i};\n"
     f"  effectiveBandwidth = {0.05 + 0.001 * i};\n"
     "END_GROUP = BAND_X"
     for i, g in enumerate(["C", "B", "G", "Y", "R", "RE", "N", "N2"])]
    + ["  meanSunEl = 35.0;",
       "  firstLineTime = 2016-10-23T17:46:54.796950Z;"])


def test_parse_worldview_metadata():
    md = multispectral.parse_worldview23_metadata(IMD)
    assert md.mean_sun_elevation == 35.0
    np.testing.assert_allclose(md.abs_cal_factor[0], 0.01)
    np.testing.assert_allclose(md.effective_bandwidth[7], 0.057)
    assert 0.983 <= md.earth_sun_distance <= 1.017


def test_parse_worldview_metadata_missing():
    with pytest.raises(ValueError):
        multispectral.parse_worldview23_metadata("meanSunEl = 35.0;")


def test_worldview_detect_water():
    md = multispectral.parse_worldview23_metadata(IMD)
    h, w = 4, 6
    stack = np.full((h, w, 8), 500.0, np.float32)
    # Water: NDVI high (RED >> NIR2) and NDWI2 high (COASTAL >> NIR2).
    stack[:, :3, multispectral.RED] = 2000.0
    stack[:, :3, multispectral.COASTAL] = 2000.0
    stack[:, :3, multispectral.NIR2] = 100.0
    stack[:, :3, multispectral.NIR1] = 100.0
    # Land: NIR-bright vegetation (NDVI negative under the RED-NIR2 order).
    stack[:, 3:, multispectral.NIR2] = 3000.0
    classes = np.asarray(multispectral.detect_water_worldview23(stack, md))
    assert (classes[:, :3] == FLOOD_DETECT_WATER).all()
    assert (classes[:, 3:] == FLOOD_DETECT_LAND).all()


def test_spot_detect_water():
    stack = np.full((4, 4, 4), 100.0, np.float32)
    stack[:2, :, multispectral.SPOT_BLUE] = 500.0
    stack[:2, :, multispectral.SPOT_NIR] = 50.0
    valid = np.ones((4, 4), bool)
    valid[3, 3] = False
    classes = np.asarray(multispectral.detect_water_spot67(stack, valid))
    assert (classes[:2] == FLOOD_DETECT_WATER).all()
    assert classes[3, 3] == FLOOD_DETECT_NODATA
    assert classes[2, 0] == FLOOD_DETECT_LAND


# ---------------------------------------------------------------- modis

def _modis_stack():
    stack = np.full((4, 4, 7), 1000.0, np.float32)
    stack[..., modis.B1] = 500.0
    stack[..., modis.B3] = 300.0
    # Left half: water-like (b2 dark, b6 dark => EVI small, LSWI >= EVI).
    stack[:, :2, modis.B2] = 300.0
    stack[:, :2, modis.B6] = 100.0
    # Right half: vegetation (b2 bright).
    stack[:, 2:, modis.B2] = 4000.0
    return stack


def test_modis_products_shape():
    prod = np.asarray(modis.form_modis_products(_modis_stack()))
    assert prod.shape == (4, 4, modis.NUM_MODIS_PRODUCTS)
    ndvi = prod[..., modis.NDVI]
    assert (ndvi[:, 2:] > 0.5).all() and (ndvi[:, :2] < 0).all()


def test_modis_methods():
    stack = _modis_stack()
    evi = np.asarray(modis.detect_water(stack, "evi"))
    assert evi[:, :2].all() and not evi[:, 2:].any()
    diff = np.asarray(modis.detect_water(stack, "diff", threshold=0.0))
    assert diff[:, :2].all() and not diff[:, 2:].any()
    dart = np.asarray(modis.detect_water(stack, "dartmouth", threshold=0.5))
    assert dart[:, :2].all() and not dart[:, 2:].any()
    with pytest.raises(ValueError):
        modis.detect_water(stack, "fai")  # threshold required


# ------------------------------------------------------------ morphology

def test_blob_sizes():
    mask = np.zeros((8, 8), bool)
    mask[0, :3] = True          # blob of 3
    mask[4:6, 4:6] = True       # blob of 4
    sizes = np.asarray(blob_sizes(mask, size_limit=3))
    assert (sizes[0, :3] == 3).all()
    assert (sizes[4:6, 4:6] == 3).all()  # capped at limit
    assert sizes[2, 2] == 0


def test_two_threshold_fill():
    img = np.array([[0.5, 0.5, 0.9, 0.5, 0.1, 0.5],
                    [0.1, 0.1, 0.1, 0.1, 0.1, 0.5]], np.float32)
    out = np.asarray(two_threshold_fill(img, 0.4, 0.8))
    # Component containing the 0.9 seed fills through >0.4 neighbors...
    assert (out[0, :4] == 1).all()
    # ...but the 0.4-connected component with no seed stays 0.
    assert (out[:, 5] == 0).all() and out[1, 0] == 0


# ----------------------------------------------------------------- radar

def test_fuzzy_memberships():
    z = np.asarray(radar.fuzzy_membership_z(
        np.float32([0.0, 5.0, 7.5, 10.0, 15.0]), 5.0, 10.0))
    np.testing.assert_allclose(z, [1.0, 1.0, 0.5, 0.0, 0.0])
    s = np.asarray(radar.fuzzy_membership_s(
        np.float32([0.0, 5.0, 7.5, 10.0, 15.0]), 5.0, 10.0))
    np.testing.assert_allclose(s, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_kittler_illingworth_bimodal():
    rng = np.random.default_rng(0)
    vals = np.concatenate([rng.normal(60, 8, 4000),
                           rng.normal(250, 15, 6000)])
    hist, _ = np.histogram(vals, bins=255, range=(0.0, 400.0))
    thr = radar.split_histogram_kittler_illingworth(hist, 0.0, 400.0)
    # KI resolves ties across the empty inter-mode gap to its leading edge,
    # so the split sits just past the low mode (60 + ~3σ), well below 250.
    assert 80.0 < thr < 220.0


def test_tile_means():
    img = np.zeros((64, 64), np.float32)
    img[:, :32] = 10.0
    img[:, 32:] = 30.0
    valid = np.ones((64, 64), bool)
    means, stddevs, tvalid = radar.generate_tile_means(img, valid, 32)
    means = np.asarray(means)
    assert means.shape == (2, 2)
    np.testing.assert_allclose(means, [[10.0, 30.0], [10.0, 30.0]])
    assert np.asarray(tvalid).all()
    assert (np.asarray(stddevs) == 0).all()


def test_sar_martinis_synthetic():
    """Synthetic SAR scene: bright land with a dark river; the automatic
    threshold should recover the river."""
    rng = np.random.default_rng(42)
    h, w = 256, 256
    # Land backscatter ~ DN 1000 (30 dB), water ~ DN 30 (14.8 dB).
    dn = rng.normal(1000.0, 150.0, (h, w)).clip(200.0)
    water_mask = np.zeros((h, w), bool)
    water_mask[96:160, :] = True  # wide horizontal river
    dn[water_mask] = rng.normal(30.0, 5.0, water_mask.sum()).clip(5.0)
    result = radar.sar_martinis(dn.astype(np.float32),
                                meters_per_pixel=10.0, tile_size=64)
    classes = result.classes
    core = classes[100:156, 4:-4]
    assert (core == FLOOD_DETECT_WATER).mean() > 0.95
    land = classes[:90, 4:-4]
    assert (land == FLOOD_DETECT_LAND).mean() > 0.95


def test_sar_martinis_with_dem():
    rng = np.random.default_rng(3)
    h, w = 256, 256
    dn = rng.normal(1000.0, 150.0, (h, w)).clip(200.0)
    dn[96:160, :] = rng.normal(30.0, 5.0, (64, w)).clip(5.0)
    # Flat DEM at water height; steep hills away from the river.
    dem = np.zeros((h, w), np.float32)
    dem[:64, :] = np.linspace(200.0, 0.0, 64)[:, None]
    result = radar.sar_martinis(dn.astype(np.float32), dem=dem,
                                meters_per_pixel=10.0, tile_size=64)
    core = result.classes[100:156, 4:-4]
    assert (core == FLOOD_DETECT_WATER).mean() > 0.9


def test_sar_martinis_flat_scene_no_water():
    """A flat bright scene has no bimodal split; the pipeline either refuses
    to produce a threshold or the fuzzy blob-size member suppresses the
    noise speckle — either way, (almost) nothing is classified water."""
    rng = np.random.default_rng(1)
    dn = rng.normal(1000.0, 5.0, (128, 128)).clip(1.0).astype(np.float32)
    try:
        result = radar.sar_martinis(dn, tile_size=32)
    except ValueError:
        return
    assert (result.classes == FLOOD_DETECT_WATER).mean() < 0.05


# ------------------------------------------------------------ driver tools

def test_sentinel1_flood_detect_tool(tmp_path):
    from visionworkbench_tpu.fileio import read_tiff, write_tiff
    from visionworkbench_tpu.tools.sentinel1_flood_detect import main

    rng = np.random.default_rng(7)
    sar = rng.normal(1000.0, 150.0, (64, 64)).clip(200.0).astype(np.float32)
    sar[24:40, :] = (30.0 + 5.0 * rng.random((16, 64))).astype(np.float32)
    path = str(tmp_path / "grd.tif")
    write_tiff(path, sar)
    out = str(tmp_path / "flood.tif")
    assert main([path, out, "--tile-size", "16", "--skip-warp",
                 "--border-threshold", "1.0"]) == 0
    classes, _ = read_tiff(out)
    assert classes[32, 32] == FLOOD_DETECT_WATER
    assert classes[4, 32] == FLOOD_DETECT_LAND
    # Intermediate reuse: running again hits the cached _clean.tif.
    assert main([path, out, "--tile-size", "16", "--skip-warp",
                 "--border-threshold", "1.0"]) == 0


def test_extract_modis_tool(tmp_path):
    from visionworkbench_tpu.fileio import read_tiff, write_tiff
    from visionworkbench_tpu.tools.extract_modis import main

    # b1/b2 at 32x32 (250m), the rest at 16x16 (500m); plus a duplicate
    # low-res b1 that pruning must drop and an undesired QC band.
    for i in range(7):
        size = 32 if i < 2 else 16
        img = np.full((size, size), 100.0 * (i + 1), np.float32)
        write_tiff(str(tmp_path / f"MOD09_sur_refl_b0{i+1}_1.tif"), img)
    write_tiff(str(tmp_path / "dup_sur_refl_b01_1_lowres.tif"),
               np.zeros((16, 16), np.float32))
    write_tiff(str(tmp_path / "MOD09_QC_500m_1.tif"),
               np.zeros((16, 16), np.float32))
    inputs = sorted(str(p) for p in tmp_path.iterdir())
    prefix = str(tmp_path / "out_")
    assert main(inputs + ["--prefix", prefix]) == 0
    stack, _ = read_tiff(prefix + "modis_stack.tif")
    assert stack.shape == (32, 32, 7)
    np.testing.assert_allclose(stack[..., 0], 100.0)   # high-res copy won
    np.testing.assert_allclose(stack[8, 8, 6], 700.0)  # upsampled band


def test_extract_modis_missing_band(tmp_path, capsys):
    from visionworkbench_tpu.fileio import write_tiff
    from visionworkbench_tpu.tools.extract_modis import main
    write_tiff(str(tmp_path / "sur_refl_b01_1.tif"),
               np.zeros((8, 8), np.float32))
    assert main([str(tmp_path / "sur_refl_b01_1.tif")]) == 1
    assert "missing MODIS channels" in capsys.readouterr().err
