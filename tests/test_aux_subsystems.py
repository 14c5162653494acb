"""Auxiliary subsystem tests (SURVEY.md section 5): rate counters, cost-model
search budgeting, tile-granular resume."""

import numpy as np
import pytest

from visionworkbench_tpu.core.profiling import RateCounter, materialize
from visionworkbench_tpu.fileio.tiled_writer import (
    block_write_image, resume_completed_tiles,
)
from visionworkbench_tpu.fileio import read_tiff
from visionworkbench_tpu.stereo import cost_model


def test_rate_counter():
    rc = RateCounter()
    with rc.stage("correlate", 2_000_000):
        pass
    assert rc.rate("correlate") > 0
    assert "correlate" in rc.report()


def test_materialize():
    import jax.numpy as jnp
    out = materialize({"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2))]})
    assert isinstance(out["a"], np.ndarray)
    assert isinstance(out["b"][0], np.ndarray)


def test_cost_model_budgeting(monkeypatch):
    monkeypatch.setattr(cost_model, "_seconds_per_op", 1e-8)
    # 1 Mp x 64x8 volume = 5.1 s predicted; budget 1 s must shrink it
    sx, sy = cost_model.budget_search_volume(1_000_000, (64, 8), 1.0)
    assert sx < 64 or sy < 8
    assert cost_model.estimate_search_time(1_000_000, (sx, sy)) <= 1.0
    # disabled timeout leaves it alone
    assert cost_model.budget_search_volume(10 ** 9, (64, 8), 0) == (64, 8)
    # never below 1x1
    assert cost_model.budget_search_volume(10 ** 12, (64, 8), 1e-9) == (1, 1)


def test_resume_completed_tiles(tmp_path):
    h, w, ts = 64, 96, 32
    full = np.arange(h * w, dtype=np.float32).reshape(h, w)
    path = str(tmp_path / "out.tif")

    def tile_fn(bbox):
        return full[bbox.slices()]

    assert resume_completed_tiles(path, ts) == set()
    block_write_image(path, h, w, 1, np.float32, tile_fn, tile_size=ts)
    done = resume_completed_tiles(path, ts)
    assert done == {(tx, ty) for ty in range(2) for tx in range(3)}
    # wrong tile size -> no resume
    assert resume_completed_tiles(path, 16) == set()
    back, _ = read_tiff(path)
    np.testing.assert_array_equal(back, full)
