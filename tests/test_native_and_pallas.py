"""Native C++ runtime + Pallas kernel tests.

The Pallas cost-volume kernel runs in interpreter mode on CPU (bit-identical
semantics to the compiled TPU path); the native runtime is exercised through
its ctypes bindings and the block-writer fast path.
"""

import os
import random

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.ops.cost_volume import pallas_best_of_search
from visionworkbench_tpu.stereo.correlation import _best_of_search

native = pytest.importorskip("visionworkbench_tpu.native")
needs_native = pytest.mark.skipif(not native.available(),
                                  reason="g++ runtime unavailable")


@pytest.mark.parametrize("cost", ["abs", "sq"])
def test_pallas_matches_scan(rng, cost):
    h, w, sx, sy, k = 34, 38, 5, 3, 7
    left = jnp.asarray(rng.random((h, w)), dtype=jnp.float32)
    right = jnp.asarray(rng.random((h + sy - 1, w + sx - 1)), dtype=jnp.float32)
    d1, v1, b1 = pallas_best_of_search(left, right, sx, sy, k, k, cost,
                                       tile=16, interpret=True)
    d2, v2, b2 = _best_of_search(left, right, sx, sy, k, k, cost)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)


@needs_native
def test_native_writer_out_of_order_roundtrip(tmp_path):
    from visionworkbench_tpu.fileio import read_tiff
    from visionworkbench_tpu.native import NativeTileWriter
    h, w, ts = 100, 130, 32
    full = np.arange(h * w, dtype=np.float32).reshape(h, w)
    path = str(tmp_path / "native.tif")
    wr = NativeTileWriter(path, h, w, 1, np.float32, ts)
    tiles = [(tx, ty) for ty in range(wr.nty) for tx in range(wr.ntx)]
    random.Random(0).shuffle(tiles)
    for tx, ty in tiles:
        wr.write_tile(tx, ty, full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts])
    wr.close()
    back, info = read_tiff(path)
    assert info.tiled
    np.testing.assert_array_equal(back, full)


@needs_native
def test_native_writer_multiband(tmp_path):
    from visionworkbench_tpu.fileio import read_tiff
    from visionworkbench_tpu.native import NativeTileWriter
    h, w, ts = 40, 50, 16
    full = np.random.default_rng(0).random((h, w, 3)).astype(np.float32)
    path = str(tmp_path / "rgb.tif")
    with NativeTileWriter(path, h, w, 3, np.float32, ts) as wr:
        for ty in range(wr.nty):
            for tx in range(wr.ntx):
                wr.write_tile(tx, ty,
                              full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts])
    back, _ = read_tiff(path)
    np.testing.assert_array_equal(back, full)


@needs_native
def test_native_lru_cache():
    from visionworkbench_tpu.native import NativeLruCache
    c = NativeLruCache(1000)
    c.put("a", b"x" * 400)
    c.put("b", b"y" * 400)
    assert c.get("a") == b"x" * 400          # touch a -> b becomes LRU
    c.put("c", b"z" * 400)                   # evicts b
    assert c.get("b") is None
    assert c.get("a") is not None and c.get("c") is not None
    s = c.stats()
    assert s["evictions"] == 1 and s["used"] <= 1000


@needs_native
def test_block_write_native_fast_path(tmp_path):
    from visionworkbench_tpu.fileio import block_write_image, read_tiff
    h, w = 96, 96
    full = np.random.default_rng(1).random((h, w)).astype(np.float32)

    def tile_fn(bbox):
        return full[bbox.slices()]

    path = str(tmp_path / "fast.tif")
    block_write_image(path, h, w, 1, np.float32, tile_fn, tile_size=32,
                      num_threads=4)
    back, _ = read_tiff(path)
    np.testing.assert_array_equal(back, full)


def test_pallas_tiled_search_matches_xla(rng):
    import jax.numpy as jnp
    from visionworkbench_tpu.ops.cost_volume import pallas_tiled_search
    from visionworkbench_tpu.stereo.pyramid_correlation import _tiled_search
    tile, s_x, s_y, kw, kh = 16, 5, 3, 7, 7
    nty, ntx = 2, 3
    base = jnp.asarray(rng.random((nty * tile + kh - 1 + 8,
                                   ntx * tile + kw - 1 + 8)), jnp.float32)
    match = jnp.asarray(rng.random((nty * tile + kh + s_y + 16,
                                    ntx * tile + kw + s_x + 130)), jnp.float32)
    offsets = jnp.asarray(rng.integers(0, 3, (nty, ntx, 2)), jnp.int32)
    d1, v1 = pallas_tiled_search(base, match, offsets, tile, s_x, s_y, kw, kh,
                                 "abs", interpret=True)
    d2, v2 = _tiled_search(base, match, offsets, tile, s_x, s_y, kw, kh,
                           "abs", 5)
    import numpy as np
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
