"""Cartography — TPU-native replacement for ``src/vw/Cartography/`` (PROJ/GDAL
replaced by in-tree jnp projections + the GeoTIFF codec)."""

from visionworkbench_tpu.cartography.datum import Datum, well_known_datum
from visionworkbench_tpu.cartography.projection import (
    EquirectangularProjection, GnomonicProjection,
    LambertAzimuthalProjection, LambertConformalProjection, MercatorProjection,
    OrthographicProjection, PROJECTIONS, Projection, SinusoidalProjection,
    StereographicProjection, TransverseMercatorProjection, UTMProjection,
)
from visionworkbench_tpu.cartography.georeference import (
    GeoReference, PIXEL_AS_AREA, PIXEL_AS_POINT, georeference_from_pds_label,
    georeference_from_tiff_info, make_geographic_georef,
)
from visionworkbench_tpu.cartography.geotransform import GeoTransform, reproject_image
from visionworkbench_tpu.cartography.hillshade import hillshade
from visionworkbench_tpu.cartography.colormap import colormap
from visionworkbench_tpu.cartography.camera_bbox import (
    camera_bbox, camera_pixel_to_datum_lonlat, camera_pixel_to_dem_xyz,
    intersect_datum,
)
from visionworkbench_tpu.cartography.point_image import (
    cartesian_to_geodetic, dem_to_geodetic, dem_to_point_image,
    geodetic_to_cartesian, point_image_to_dem,
)
from visionworkbench_tpu.cartography.map2cam import (
    Datum2CamTrans, Map2CamTrans, orthoproject,
)
from visionworkbench_tpu.cartography.bathymetry import (
    BathyStereoModel, snell_refraction,
)
from visionworkbench_tpu.cartography.shapefile import (
    read_shapefile, write_shapefile,
)
from visionworkbench_tpu.cartography.camera_fit import (
    fit_camera_to_datum, fit_optical_bar, fit_pinhole,
)
