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

__version__ = "0.1.0"

__all__ = ["GeoTable", "read", "read_partition", "get_spark", "__version__"]
