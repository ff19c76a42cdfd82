"""Function layer: WKB kernel, WKT, CRS, hilbert, quadkey, spark columns."""

from geoparquet_io_spark.functions import wkb, wkt, crs, hilbert, quadkey  # noqa: F401
from geoparquet_io_spark.functions.geom import (  # noqa: F401
    st_point,
    st_box,
    st_geomfromtext,
    st_try_geomfromtext,
    st_astext,
    st_x,
    st_y,
    st_envelope_struct,
    st_centroid_xy,
    st_geometrytype,
    st_intersects,
    st_intersects_wkt,
    st_distance,
    st_transform,
    st_hilbert,
    bbox_struct,
    bbox_intersects,
)
