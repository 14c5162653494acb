"""Runtime substrate: settings, logging, exceptions, timers, progress, cache.

TPU-native replacement for ``src/vw/Core/`` — threads/mutexes/work-queues from
the reference are superseded by the JAX runtime plus host-side orchestration in
:mod:`visionworkbench_tpu.parallel` and :mod:`visionworkbench_tpu.fileio`.
"""

from visionworkbench_tpu.core.exceptions import (
    AbortedErr, ArgumentErr, InputErr, IOErr, LogicErr, MathErr, NoImplErr,
    NotFoundErr, NullPtrErr, TypeErr, VWError, vw_throw,
)
from visionworkbench_tpu.core.settings import Settings, reload_config, vw_settings
from visionworkbench_tpu.core.log import vw_out, vw_log_rules, set_console_level
from visionworkbench_tpu.core.stopwatch import Stopwatch, StopwatchSet, Timer, stopwatch_set
from visionworkbench_tpu.core.progress import (
    ProgressCallback, SubProgressCallback, TerminalProgressCallback, dummy_progress,
)
from visionworkbench_tpu.core.cache import Cache, CacheHandle, vw_system_cache
from visionworkbench_tpu.core.profiling import RateCounter, materialize, trace
from visionworkbench_tpu.core.cmdutils import (
    exec_cmd, find_executable_in_path, program_path,
)

__all__ = [
    "AbortedErr", "ArgumentErr", "InputErr", "IOErr", "LogicErr", "MathErr",
    "NoImplErr", "NotFoundErr", "NullPtrErr", "TypeErr", "VWError", "vw_throw",
    "Settings", "reload_config", "vw_settings",
    "vw_out", "vw_log_rules", "set_console_level",
    "Stopwatch", "StopwatchSet", "Timer", "stopwatch_set",
    "ProgressCallback", "SubProgressCallback", "TerminalProgressCallback", "dummy_progress",
    "Cache", "CacheHandle", "vw_system_cache",
]
