"""visionworkbench_tpu — a TPU-native image-processing and stereo-correlation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NASA's Vision
Workbench (reference: ``visionworkbench/visionworkbench``). The reference's lazy
C++ view-tree algebra (``src/vw/Image/ImageViewBase.h:57-122``) is replaced by
traced JAX functions over ``jnp`` arrays — XLA fusion plays the role of view
fusion; its multi-threaded tiled execution engine
(``src/vw/Image/BlockProcessor.h:52-176``) is replaced by sharded tile grids
under ``shard_map`` over a device mesh with halo exchange collectives.

Array conventions
-----------------
* Images are ``jnp.ndarray`` of shape ``(H, W)`` or ``(H, W, C)``, row-major.
  Indexing is ``img[row, col]`` (NumPy order); the reference uses
  ``view(col, row)`` accessors — callers translate at the API boundary.
* Default compute dtype is ``float32`` (the north-star requires fp32 allclose
  against the reference).
* Validity is carried as an explicit boolean mask alongside data (the
  reference wraps pixels in ``PixelMask<T>``, ``src/vw/Image/PixelMask.h``);
  see :mod:`visionworkbench_tpu.image.masks`.
* Disparity maps are ``(H, W, 2)`` with channels ``(dx, dy)`` plus a bool
  valid mask, mirroring ``PixelMask<Vector2i>`` maps in the reference.

Subpackages
-----------
core         runtime substrate: settings, logging, exceptions, timers, cache
math         bbox, 2D transforms, optimizers, RANSAC, quaternions, statistics
image        the array substrate: edge extension, interpolation, filters,
             convolution, census, masks, algorithms, statistics, warping
ops          Pallas TPU kernels for the hot paths (box sums, cost volumes, ...)
stereo       prefilters, correlation, pyramid correlator, subpixel, SGM,
             disparity utilities, triangulation
interest     interest-point detection, description, matching
camera       camera models (pinhole + distortion, CAHV family, optical bar)
cartography  datums, projections, georeferences, geotransforms, hillshade
mosaic       grassfire/Laplacian multiband compositing, quadtrees, pyramids
geometry     polygons, spatial trees
ba           bundle-adjustment control networks
fileio       image IO (PNG/TIFF/GeoTIFF), tiled writers, disk pyramids
parallel     device meshes, tile sharding + halo exchange, disparity sharding
tools        CLI entry points (correlate, ipfind, ipmatch, hillshade, ...)
"""

from visionworkbench_tpu.version import __version__

__all__ = ["__version__"]
