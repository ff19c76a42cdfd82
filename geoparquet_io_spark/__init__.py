"""geoparquet_io_spark — a PySpark-native analytics engine with the
capabilities of geoparquet/geoparquet-io (reference: /root/reference).

The reference is a DuckDB+PyArrow GeoParquet toolkit (see its
``geoparquet_io/api/table.py``).  This package re-expresses the same
operator surface Spark-first:

- ``GeoTable``      — fluent, lazy wrapper over a DataFrame + geo metadata
                      (reference: geoparquet_io/api/table.py:377-404)
- ``read``/``read_partition``/``write`` — GeoParquet IO incl. footer ``geo``
                      key-value metadata (reference: core/common.py:995-1660)
- ``functions``     — pure-numpy WKB kernel + native-expression spatial fns
- ``operators``     — extract / add-columns / sorts / joins / stats /
                      partition / dedup / similarity / text
"""

from geoparquet_io_spark.session import get_spark
from geoparquet_io_spark.geotable import GeoTable
from geoparquet_io_spark.sources.geoparquet import read, read_partition


def read_any(spark, path: str, **kw):
    """Read ANY supported vector container by extension: GeoParquet
    (file or dataset dir), GeoPackage, Shapefile, FlatGeobuf, GeoJSON,
    GeoJSONSeq, CSV/TSV — the one-call equivalent of the reference's
    format sniffing convert entry point (core/convert.py:995-1132)."""
    low = path.lower()
    if low.endswith((".csv", ".tsv", ".txt")):
        from geoparquet_io_spark.sources.csv_geo import read_csv

        return read_csv(spark, path, **kw)
    if low.endswith((".geojsonl", ".ndjson", ".geojsons")):
        from geoparquet_io_spark.sources.geojson import read_geojsonl

        return read_geojsonl(spark, path, **kw)
    if low.endswith((".geojson", ".json")):
        from geoparquet_io_spark.sources.geojson import read_geojson

        return read_geojson(spark, path, **kw)
    if low.endswith((".gpkg", ".shp", ".fgb")):
        from geoparquet_io_spark.sources.gdal_formats import read_gdal

        return read_gdal(spark, path, **kw)
    return read(spark, path, **kw)

__version__ = "0.1.0"

__all__ = ["GeoTable", "read", "read_any", "read_partition", "get_spark", "__version__"]
