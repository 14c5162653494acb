"""CLI tools — TPU-native replacement for ``src/vw/tools/``.

Each module exposes ``main(argv)`` and is installed as a ``vw-*`` console
script (see pyproject.toml). Run as ``python -m visionworkbench_tpu.tools.<name>``.
"""
