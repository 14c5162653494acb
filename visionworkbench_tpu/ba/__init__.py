"""Bundle adjustment support — TPU-native replacement for
``src/vw/BundleAdjustment/`` (the solver itself lives downstream in the
reference too — Ames Stereo Pipeline; SURVEY.md section 2.11)."""

from visionworkbench_tpu.ba.control_network import (
    ControlMeasure, ControlNetwork, ControlPoint, build_control_network,
)
