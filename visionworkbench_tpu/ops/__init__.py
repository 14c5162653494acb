"""Hot-path kernels: XLA formulations plus Pallas TPU implementations of the
reference's performance-critical native loops (SURVEY.md section 2.13)."""

from visionworkbench_tpu.ops.box_filter import (
    box_filter_same, box_sum_same, box_sum_valid, box_sum_valid_int,
)
