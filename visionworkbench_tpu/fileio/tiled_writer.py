"""Multi-threaded ordered tile writer
(ref ``ThreadedBlockWriter``, ``src/vw/Image/ImageIO.h:116-267``: N rasterize
threads -> OrderedWorkQueue(1) writer, ``CountingSemaphore`` capping in-flight
tiles at ``write_pool_size``).

Here: a thread pool evaluates tile functions (typically dispatching jitted
device work and pulling results host-side), a bounded semaphore provides the
same backpressure, and a single writer thread commits tiles in raster order
to a :class:`~visionworkbench_tpu.fileio.tiff.TiffTileWriter`.
"""

from __future__ import annotations

import heapq
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional

import numpy as np

from visionworkbench_tpu.core.settings import vw_settings
from visionworkbench_tpu.core.progress import ProgressCallback, dummy_progress
from visionworkbench_tpu.math.bbox import BBox2i, subdivide_bbox
from visionworkbench_tpu.fileio.tiff import TiffTileWriter


def resume_completed_tiles(path: str, tile_size: int):
    """Tile indices already present in a partially-written tiled TIFF — the
    checkpoint/resume mechanism (SURVEY.md section 5: every output is a tiled
    file written incrementally; resume = skip tiles already on disk). Returns
    a set of (tx, ty) or an empty set if the file is absent/unreadable."""
    import os
    from visionworkbench_tpu.fileio.tiff import TiffInfo, T_TILE_OFFSETS
    if not os.path.exists(path):
        return set()
    try:
        info = TiffInfo(path)
    except Exception:
        return set()
    if not info.tiled or info.tile_size[0] != tile_size:
        return set()
    offsets = info._get(T_TILE_OFFSETS, [])
    ntx = -(-info.width // tile_size)
    done = set()
    for i, off in enumerate(offsets):
        if off:
            done.add((i % ntx, i // ntx))
    return done


def block_write_image(path: str, height: int, width: int, bands: int, dtype,
                      tile_fn: Callable[[BBox2i], np.ndarray],
                      tile_size: Optional[int] = None,
                      num_threads: Optional[int] = None,
                      georef=None, nodata: Optional[float] = None,
                      progress: Optional[ProgressCallback] = None) -> None:
    """Rasterize ``tile_fn(bbox) -> (h, w[, C]) array`` over a tile grid with
    worker threads and write tiles in order with bounded memory
    (ref ``block_write_image``, ImageIO.h:150-267, and the GDAL variant
    ``block_write_gdal_image``, Cartography/GeoReferenceUtils.h:163)."""
    settings = vw_settings()
    ts = tile_size or settings.default_tile_size
    ts = max(16, (ts // 16) * 16)
    workers = num_threads or settings.default_num_threads
    window = max(settings.write_pool_size, 1)
    progress = progress or dummy_progress()

    tiles = subdivide_bbox(BBox2i(0, 0, width, height), ts, ts)

    # Fast path: the native C++ ordered writer (GIL-free IO + in-order commit
    # with its own bounded window). Geo tags need the Python codec.
    if georef is None and nodata is None:
        try:
            from visionworkbench_tpu.native import NativeTileWriter, available
        except Exception:
            available = lambda: False  # noqa: E731
        if available():
            nwriter = NativeTileWriter(path, height, width, bands, dtype, ts,
                                       window)
            error_n: list = []

            def compute_native(i):
                bbox = tiles[i]
                try:
                    tile = np.asarray(tile_fn(bbox)).astype(dtype, copy=False)
                    nwriter.write_tile(bbox.min_x // ts, bbox.min_y // ts, tile)
                    progress.report_progress((i + 1) / len(tiles))
                except BaseException as e:
                    error_n.append(e)

            with ThreadPoolExecutor(max_workers=workers) as pool:
                futures = [pool.submit(compute_native, i)
                           for i in range(len(tiles))]
                for f in futures:
                    f.result()
            if error_n:
                # Surface the tile function's error, not the writer's
                # incomplete-submission complaint.
                try:
                    nwriter.close()
                except Exception:
                    pass
                raise error_n[0]
            nwriter.close()
            progress.report_finished()
            return
    writer = TiffTileWriter(path, height, width, bands, dtype, tile_size=ts,
                            georef=georef, nodata=nodata)
    in_flight = threading.Semaphore(window)
    done_heap = []
    heap_lock = threading.Condition()
    next_to_write = [0]
    error: list = []

    def write_loop():
        written = 0
        total = len(tiles)
        while written < total:
            with heap_lock:
                while not done_heap or done_heap[0][0] != next_to_write[0]:
                    if error:
                        return
                    heap_lock.wait(timeout=0.5)
                idx, tile = heapq.heappop(done_heap)
            bbox = tiles[idx]
            writer.write_tile(bbox.min_x // ts, bbox.min_y // ts, tile)
            in_flight.release()
            next_to_write[0] += 1
            written += 1
            progress.report_progress(written / total)

    def compute(i):
        if error:
            in_flight.release()
            return
        try:
            tile = np.asarray(tile_fn(tiles[i]))
            with heap_lock:
                heapq.heappush(done_heap, (i, tile))
                heap_lock.notify_all()
        except BaseException as e:  # propagate to caller
            with heap_lock:
                error.append(e)
                heap_lock.notify_all()
            in_flight.release()

    writer_thread = threading.Thread(target=write_loop)
    writer_thread.start()
    try:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for i in range(len(tiles)):
                in_flight.acquire()
                if error:
                    break
                pool.submit(compute, i)
    finally:
        writer_thread.join()
        writer.close()
    if error:
        raise error[0]
    progress.report_finished()
