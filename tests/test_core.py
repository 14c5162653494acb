"""Core runtime tests (model: ``src/vw/Core/tests/TestCache.cxx``,
``TestSettings.cxx``, ``TestLog.cxx``)."""

import threading

import pytest

from visionworkbench_tpu.core import (
    ArgumentErr, Cache, ProgressCallback, Settings, Stopwatch, SubProgressCallback,
    Timer, VWError, vw_throw,
)
from visionworkbench_tpu.core.settings import _parse_rc


def test_exception_hierarchy():
    with pytest.raises(VWError):
        vw_throw(ArgumentErr, "bad ", "arg ", 42)
    with pytest.raises(ArgumentErr, match="bad arg 42"):
        vw_throw(ArgumentErr, "bad ", "arg ", 42)
    assert issubclass(ArgumentErr, ValueError)


def test_settings_defaults_and_rc(tmp_path):
    s = Settings()
    assert s.default_tile_size == 256
    assert s.write_pool_size == 21
    assert s.system_cache_size == 768 * 1024 * 1024
    rc = tmp_path / "vwtpurc"
    rc.write_text("# comment\n[general]\ndefault_tile_size = 512\ntmp_directory = /tmp/x\nbogus_key = 7\n")
    _parse_rc(s, str(rc))
    assert s.default_tile_size == 512
    assert s.tmp_directory == "/tmp/x"


class _Counting:
    def __init__(self):
        self.calls = 0

    def make(self, key):
        def gen():
            self.calls += 1
            import numpy as np
            return np.zeros(1024, np.uint8)  # 1 KB entries
        return gen


def test_cache_hit_miss_evict_regenerate():
    c = Cache(max_size_bytes=4 * 1024)  # room for 4 entries
    gens = _Counting()
    handles = [c.insert(gens.make(i), key=i) for i in range(8)]
    for h in handles:
        h.value()
    assert gens.calls == 8
    assert c.size <= 4 * 1024
    # Recently used entries are resident; oldest were evicted.
    assert handles[7].valid()
    assert not handles[0].valid()
    # Re-fetch of evicted entry regenerates.
    handles[0].value()
    assert gens.calls == 9
    # Fetch of resident entry does not.
    handles[0].value()
    assert gens.calls == 9


def test_cache_thread_safety():
    c = Cache(max_size_bytes=1024 * 1024)
    gens = _Counting()
    h = c.insert(gens.make(0), key="shared")
    results = []

    def worker():
        results.append(h.value().sum())

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert gens.calls == 1  # generation lock prevents duplicate work
    assert len(results) == 8


def test_stopwatch_and_timer(capsys):
    sw = Stopwatch()
    sw.start()
    sw.stop()
    assert sw.elapsed_seconds >= 0.0
    with Timer("op") as t:
        pass
    assert t.elapsed >= 0.0
    assert "op:" in capsys.readouterr().out


def test_progress_callback_and_abort():
    pc = ProgressCallback()
    sub = SubProgressCallback(pc, 0.5, 1.0)
    sub.report_progress(0.5)
    assert pc.progress() == pytest.approx(0.75)
    pc.request_abort()
    assert sub.abort_requested()
