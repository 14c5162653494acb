"""Thread pool / memory resource / PDS tests (ref ``TestThreadPool.cxx``,
``TestMemoryImageResource.cxx``, PDS driver tests)."""

import numpy as np
import pytest

from visionworkbench_tpu.core.threadpool import (
    CountingSemaphore, FifoWorkQueue, OrderedWorkQueue, ThreadQueue,
)
from visionworkbench_tpu.fileio.memory import (
    decode_image, encode_image, parse_pds_label, read_pds, write_pds,
)


def test_fifo_work_queue_runs_all():
    results = []
    import threading
    lock = threading.Lock()
    q = FifoWorkQueue(4)
    for i in range(20):
        def task(i=i):
            with lock:
                results.append(i)
        q.add_task(task)
    q.join_all()
    assert sorted(results) == list(range(20))


def test_fifo_work_queue_propagates_errors():
    q = FifoWorkQueue(2)
    q.add_task(lambda: (_ for _ in ()).throw(RuntimeError("task boom")))
    with pytest.raises(RuntimeError, match="task boom"):
        q.join_all()


def test_ordered_work_queue_in_order():
    consumed = []
    q = OrderedWorkQueue(lambda idx, val: consumed.append((idx, val)),
                         num_threads=4)
    import random
    order = list(range(16))
    random.Random(0).shuffle(order)
    for idx in order:
        q.add_task(idx, lambda idx=idx: idx * 10)
    q.join_all()
    assert consumed == [(i, i * 10) for i in range(16)]


def test_thread_queue_and_semaphore():
    tq = ThreadQueue()
    tq.push(1)
    ok, v = tq.try_pop()
    assert ok and v == 1
    ok, _ = tq.try_pop()
    assert not ok
    sem = CountingSemaphore(2)
    with sem:
        with sem:
            pass


def test_memory_encode_decode(rng):
    arr = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    data = encode_image(arr, "png")
    assert data[:4] == b"\x89PNG"
    back = decode_image(data)
    np.testing.assert_array_equal(back, arr)
    f = decode_image(data, np.float32)
    assert f.max() <= 1.0


def test_pds_roundtrip(tmp_path, rng):
    arr = (rng.random((30, 40)) * 60000).astype(np.uint16)
    path = str(tmp_path / "img.IMG")
    write_pds(path, arr, {"TARGET_NAME": "MARS"})
    back, label = read_pds(path)
    np.testing.assert_array_equal(back, arr)
    assert label["TARGET_NAME"] == "MARS"
    assert label["SAMPLE_TYPE"] == "MSB_UNSIGNED_INTEGER"


def test_pds_float(tmp_path, rng):
    arr = rng.random((10, 12)).astype(np.float32)
    path = str(tmp_path / "f.IMG")
    write_pds(path, arr)
    back, _ = read_pds(path)
    np.testing.assert_allclose(back, arr)


def test_parse_pds_label():
    label = parse_pds_label('LINES = 10\r\n^IMAGE = 2\r\nNAME = "X" /* c */')
    assert label["LINES"] == "10"
    assert label["IMAGE"] == "2"
    assert label["NAME"] == "X"


def test_sparse_view():
    from visionworkbench_tpu.image.sparse import SparseView
    from visionworkbench_tpu.math.bbox import BBox2i
    sv = SparseView(20, 30, background=-1.0)
    sv.insert(np.ones((4, 5), np.float32) * 7, 10, 5)
    assert sv(0, 0) == -1.0
    assert sv(12, 6) == 7.0
    out = sv.rasterize(BBox2i(8, 4, 10, 6))
    assert out.shape == (6, 10)
    assert out[1, 2] == 7.0 and out[0, 0] == -1.0


def test_clean_sentinel1_borders_tool(tmp_path, rng):
    from visionworkbench_tpu.fileio import read_tiff, write_tiff
    from visionworkbench_tpu.tools.clean_sentinel1_borders import main
    img = np.zeros((60, 80), np.float32)
    img[10:50, 15:65] = 0.4 + 0.1 * rng.random((40, 50)).astype(np.float32)
    # noisy border speckle
    img[:5, :] = 0.005
    path = str(tmp_path / "sar.tif")
    write_tiff(path, img)
    out = str(tmp_path / "clean.tif")
    assert main([path, "-o", out]) == 0
    cleaned, info = read_tiff(out)
    assert info.nodata == 0.0
    assert (cleaned[:5, :] == 0).all()
    assert cleaned[30, 40] == img[30, 40]


def test_camera_solve_generic():
    import jax.numpy as jnp
    from visionworkbench_tpu.camera import PinholeModel
    from visionworkbench_tpu.camera.solve import solve_point_to_pixel
    cam = PinholeModel((0, 0, 0), np.eye(3), (400, 400), (100, 80))
    pts = np.array([[0.2, -0.1, 5.0], [0.5, 0.3, 8.0]], np.float32)
    expected = np.asarray(cam.point_to_pixel(jnp.asarray(pts)))
    got = np.asarray(solve_point_to_pixel(cam, jnp.asarray(pts),
                                          initial_pixel=(100.0, 80.0)))
    np.testing.assert_allclose(got, expected, atol=0.05)


def test_disk_image_manager(tmp_path, rng):
    from visionworkbench_tpu.fileio import write_tiff
    from visionworkbench_tpu.fileio.manager import DiskImageManager
    paths = []
    for i in range(5):
        p = str(tmp_path / f"im{i}.tif")
        write_tiff(p, rng.random((8, 8)).astype(np.float32))
        paths.append(p)
    mgr = DiskImageManager(max_open=3)
    for p in paths:
        v = mgr.get(p)
        assert v.shape == (8, 8)
    assert len(mgr) == 3
    assert mgr.evictions == 2
    # re-get keeps pool bounded and serves data
    v = mgr.get(paths[0])
    assert v.read().shape == (8, 8)


def test_chipper():
    from visionworkbench_tpu.cartography.chipper import chip_bounds, chip_points
    rng2 = np.random.default_rng(0)
    pts = rng2.random((1000, 2)) * 100
    chips = chip_points(pts, capacity=100)
    assert sum(len(c) for c in chips) == 1000
    assert all(len(c) <= 100 for c in chips)
    assert len(set(np.concatenate(chips).tolist())) == 1000
    bounds = chip_bounds(pts, chips)
    assert len(bounds) == len(chips)


def test_cmdutils(tmp_path):
    """CmdUtils parity (CmdUtils.cc:20-90): output capture, sibling-program
    resolution with .libs stripping, PATH fallback."""
    import os
    import pytest
    from visionworkbench_tpu.core.cmdutils import (
        exec_cmd, find_executable_in_path, program_path,
    )
    from visionworkbench_tpu.core.exceptions import NotFoundErr

    assert exec_cmd("echo hello").strip() == "hello"
    assert find_executable_in_path("sh").endswith("sh")
    with pytest.raises(NotFoundErr):
        find_executable_in_path("definitely-not-a-program-xyz")
    # sibling resolution: prog next to the "current executable"
    prog = tmp_path / "helper"
    prog.write_text("#!/bin/sh\n")
    assert program_path("helper", str(tmp_path / "main")) == str(prog)
    # .libs stripping (libtool layout)
    libs = tmp_path / ".libs"
    libs.mkdir()
    assert program_path("helper", str(libs / "main")) == str(prog)
    # PATH fallback
    assert program_path("sh", str(tmp_path / "main")).endswith("sh")
