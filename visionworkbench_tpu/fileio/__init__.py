"""Storage — TPU-native replacement for ``src/vw/FileIO/``: in-tree
TIFF/GeoTIFF codec, PIL-backed formats, lazy tile-cached readers, and the
multi-threaded ordered tile writer."""

from visionworkbench_tpu.fileio.image_io import image_size, read_image, write_image
from visionworkbench_tpu.fileio.tiff import (
    TiffInfo, TiffTileWriter, read_tiff, read_tiff_region, write_tiff,
)
from visionworkbench_tpu.fileio.disk_image import DiskCacheImageView, DiskImageView
from visionworkbench_tpu.fileio.tiled_writer import block_write_image
from visionworkbench_tpu.fileio.memory import (
    decode_image, encode_image, parse_pds_label, read_pds, write_pds,
)
from visionworkbench_tpu.fileio.raw import (
    RawFormat, RawImageResource, open_spot5, read_raw, write_raw,
)
