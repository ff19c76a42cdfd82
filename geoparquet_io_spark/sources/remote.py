"""Remote extraction sources.

arcgis  -> REST pagination with server-side pushdown
           (reference: core/arcgis.py:335-712).  The fetch itself is
           injectable so tests run without network; page ranges are
           distributed with mapInPandas — each executor task pulls its own
           offset windows in parallel (the scalable form of the
           reference's sequential resultOffset loop).
bigquery-> import-try gate for the spark-bigquery-connector
           (reference: core/extract_bigquery.py:343).
upload  -> object-store note: with Hadoop s3a/gs/abfs connectors the
           distributed writer works on remote URIs unchanged
           (reference: core/upload.py — obstore multipart).
"""

from __future__ import annotations

import json
import math
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


FetchPage = Callable[[int, int], list[dict]]
# (offset, count) -> list of {attr: value, "__x": lon, "__y": lat} records


def _arcgis_query(url: str, params: dict) -> dict:
    """One /query GET.  ArcGIS reports failures as HTTP-200 JSON with an
    ``error`` member (code 499 = token required, 498 = invalid token) —
    surface those as exceptions like the reference does
    (core/arcgis.py:422-470)."""
    from urllib.parse import urlencode
    from urllib.request import urlopen

    with urlopen(f"{url}/query?{urlencode(params)}") as resp:
        doc = json.load(resp)
    if "error" in doc:
        err = doc["error"]
        raise RuntimeError(
            f"ArcGIS error {err.get('code')}: {err.get('message')} "
            f"{err.get('details') or ''}".strip())
    return doc


def _base_params(where: str, out_fields: str, bbox=None,
                 token: str | None = None) -> dict:
    params = {
        "f": "json",
        "where": where or "1=1",
        "outFields": out_fields or "*",
        "returnGeometry": "true",
        "outSR": 4326,
    }
    if bbox is not None:
        params.update({
            "geometry": json.dumps({
                "xmin": bbox[0], "ymin": bbox[1],
                "xmax": bbox[2], "ymax": bbox[3],
                "spatialReference": {"wkid": 4326},
            }),
            "geometryType": "esriGeometryEnvelope",
            "spatialRel": "esriSpatialRelIntersects",
        })
    if token:
        params["token"] = token
    return params


def arcgis_count(url: str, where: str = "1=1", bbox=None,
                 token: str | None = None) -> int:
    """Driver-side returnCountOnly probe (reference: core/arcgis.py:335-375)."""
    params = _base_params(where, "", bbox, token)
    params["returnCountOnly"] = "true"
    params.pop("outFields")
    return int(_arcgis_query(url, params)["count"])


def _arcgis_layer_info(url: str, token: str | None = None) -> dict:
    """Layer metadata (f=json on the layer ROOT — not /query); {} when
    the server doesn't answer it (pre-10.x servers).

    r9 review follow-up: this previously went through _arcgis_query,
    which always appends '/query' — so it silently fetched a FEATURES
    page instead of layer metadata, objectIdField/supportsPagination
    were never seen, and both the pagination gate and the orderByFields
    stability invariant were dead in practice."""
    from urllib.parse import urlencode
    from urllib.request import urlopen

    try:
        params: dict = {"f": "json"}
        if token:
            params["token"] = token
        with urlopen(f"{url}?{urlencode(params)}") as resp:
            doc = json.load(resp)
        return {} if "error" in doc else doc
    except Exception:
        return {}


def _default_arcgis_fetcher(url: str, where: str, out_fields: str,
                            bbox=None, token: str | None = None,
                            order_by: str | None = None) -> FetchPage:
    """Real HTTP fetcher (urllib).

    A service's ``maxRecordCount`` can be SMALLER than our distributed
    page window; each window therefore loops internally, honoring
    ``exceededTransferLimit`` exactly like the reference's sequential
    resultOffset walk (core/arcgis.py:422-560) — but per-window, so
    windows still parallelize across executors with no lost gap between
    the server cap and the window size."""

    def fetch(offset: int, count: int) -> list[dict]:
        out: list[dict] = []
        cur = offset
        while len(out) < count:
            params = _base_params(where, out_fields, bbox, token)
            if order_by:
                # resultOffset windows are only stable under an explicit
                # total order — without it concurrent windows may
                # overlap or skip features (server sort is unspecified)
                params["orderByFields"] = order_by
            params["resultOffset"] = cur
            params["resultRecordCount"] = count - len(out)
            doc = _arcgis_query(url, params)
            feats = doc.get("features", [])
            for feat in feats:
                rec = dict(feat.get("attributes") or {})
                geom = feat.get("geometry") or {}
                rec["__x"] = geom.get("x")
                rec["__y"] = geom.get("y")
                out.append(rec)
            cur += len(feats)
            if not feats or not doc.get("exceededTransferLimit"):
                break
        return out[:count]

    return fetch


def extract_arcgis(
    spark: SparkSession,
    url: str,
    where: str = "1=1",
    out_fields: str = "*",
    bbox=None,
    token: str | None = None,
    page_size: int = 1000,
    attr_schema: T.StructType | None = None,
    geometry_column: str = "geometry",
):
    """Live ArcGIS FeatureService layer -> GeoTable: count probe +
    distributed offset-window fetch (reference flow:
    core/arcgis.py:335-712 — here the windows run on executors).

    ``attr_schema`` defaults to inference from a driver-side sample page
    (long for ints, double for floats, string otherwise)."""
    info = _arcgis_layer_info(url, token)
    adv = info.get("advancedQueryCapabilities") or {}
    pag = adv.get("supportsPagination", info.get("supportsPagination"))
    if pag is False:
        raise ValueError(
            f"FeatureService layer {url!r} does not support resultOffset "
            "pagination — distributed offset windows would duplicate or "
            "miss rows; extract sequentially instead")
    oid = info.get("objectIdField") or info.get("objectIdFieldName")
    if not oid:
        # the fetcher's stability invariant: resultOffset windows are
        # only correct under an explicit total order.  Proceeding
        # without one silently risks duplicated/missing rows across
        # parallel windows — the same failure the
        # supportsPagination=False gate above refuses loudly.
        raise ValueError(
            f"FeatureService layer {url!r} did not report an "
            "objectIdField (layer-info call failed or field absent) — "
            "distributed offset windows need an explicit total order; "
            "pass the id field via out_fields and retry, or extract "
            "sequentially")
    fetch = _default_arcgis_fetcher(url, where, out_fields, bbox, token,
                                    order_by=oid)
    total = arcgis_count(url, where, bbox, token)
    if attr_schema is None:
        # MERGED inference over the sample (geojson's helper): keeping
        # the FIRST value per key typed nullable numerics as string
        # whenever the first sampled row held a None
        from geoparquet_io_spark.sources.geojson import (
            _infer_property_schema,
        )

        sample = fetch(0, 10)
        rows = [{k: v for k, v in rec.items() if k not in ("__x", "__y")}
                for rec in sample]
        attr_schema, _ = _infer_property_schema(rows, skip=set())
    return arcgis_to_geotable(spark, total, attr_schema, fetch,
                              page_size=page_size,
                              geometry_column=geometry_column)


def arcgis_to_geotable(
    spark: SparkSession,
    total_count: int,
    attr_schema: T.StructType,
    fetch_page: FetchPage,
    page_size: int = 1000,
    geometry_column: str = "geometry",
):
    """Paginated feature service -> GeoTable.

    ``total_count`` comes from the service's returnCountOnly probe (driver
    side, like the reference's layer-info call, core/arcgis.py:335-375).
    Offset windows are sharded across executors; where/bbox/field pushdown
    already happened inside ``fetch_page``'s request parameters.
    """
    from geoparquet_io_spark.functions.geom import _bulk_point_encode
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    import numpy as np

    n_pages = max(1, math.ceil(total_count / page_size))
    pages = spark.range(n_pages).toDF("page")
    attr_names = [f.name for f in attr_schema.fields]
    out_schema = T.StructType(
        list(attr_schema.fields) + [T.StructField(geometry_column, T.BinaryType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for page in pdf["page"]:
                recs = fetch_page(int(page) * page_size, page_size)
                if not recs:
                    continue
                out = pd.DataFrame.from_records(recs)
                for c in attr_names:
                    if c not in out.columns:
                        out[c] = None
                xs = out.pop("__x").to_numpy(dtype="f8", na_value=np.nan) \
                    if "__x" in out.columns else np.full(len(out), np.nan)
                ys = out.pop("__y").to_numpy(dtype="f8", na_value=np.nan) \
                    if "__y" in out.columns else np.full(len(out), np.nan)
                out[geometry_column] = _bulk_point_encode(xs, ys, np.isnan(xs) | np.isnan(ys))
                yield out[attr_names + [geometry_column]]

    df = pages.mapInPandas(run, schema=out_schema)
    geo = GeoMeta(primary_column=geometry_column,
                  columns={geometry_column: GeoColumnMeta(
                      geometry_types=["Point"], crs="EPSG:4326")})
    return GeoTable(df, geo)


def normalize_bigquery_table(table: str, project: str | None = None) -> str:
    """Validate + normalize a BigQuery table id to ``project.dataset.table``
    (reference behavior: core/extract_bigquery.py:33-135 — project ids
    are 6-30 chars of lowercase/digits/hyphens starting with a letter;
    dataset/table parts are word characters; a 2-part id needs an
    explicit ``project``)."""
    import re

    parts = table.split(".")
    if len(parts) == 2:
        if not project:
            raise ValueError(
                f"table id {table!r} has no project part; pass project=")
        parts = [project] + parts
    if len(parts) != 3:
        raise ValueError(
            f"expected dataset.table or project.dataset.table, got {table!r}")
    proj, dataset, tbl = parts
    if not re.fullmatch(r"[a-z][a-z0-9-]{4,28}[a-z0-9]", proj):
        raise ValueError(f"invalid BigQuery project id {proj!r}")
    for name, part in (("dataset", dataset), ("table", tbl)):
        if not re.fullmatch(r"\w+", part):
            raise ValueError(f"invalid BigQuery {name} name {part!r}")
    return f"{proj}.{dataset}.{tbl}"


def read_bigquery(spark: SparkSession, table: str, where: str | None = None,
                  columns: list[str] | None = None,
                  exclude_columns: list[str] | None = None,
                  project: str | None = None,
                  geography_column: str | None = None,
                  geometry_column: str = "geometry"):
    """BigQuery extraction via the spark-bigquery-connector — requires the
    connector jar on the cluster (not in this container).
    Reference: bigquery_scan with filter pushdown + ST_AsWKB geography
    conversion + include/exclude column lists,
    core/extract_bigquery.py:343-620.

    ``geography_column``: a BigQuery GEOGRAPHY column (surfaced as WKT
    by the connector) — converted to a WKB geometry column and the
    result returned as a GeoTable (CRS84, like BigQuery geography).
    Otherwise a plain DataFrame is returned."""
    table = normalize_bigquery_table(table, project)
    if columns and exclude_columns:
        raise ValueError("columns and exclude_columns are exclusive")
    try:
        reader = spark.read.format("bigquery").option("table", table)
        if where:
            reader = reader.option("filter", where)
        df = reader.load()
    except Exception as e:  # pragma: no cover - no connector here
        # only a MISSING data source means "jar not installed"; a bad
        # filter / missing table / auth failure on a cluster that HAS
        # the connector must surface its real message, not a jar hint
        msg = str(e)
        if ("DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
                or "ClassNotFoundException" in msg):
            raise NotImplementedError(
                "spark-bigquery-connector not available in this "
                "environment; on a cluster add the connector jar "
                "(--packages com.google.cloud.spark:"
                "spark-bigquery-with-dependencies)"
            ) from e
        raise
    if columns:
        df = df.select(*columns)
    elif exclude_columns:
        df = df.drop(*exclude_columns)
    if geography_column:
        from pyspark.sql import functions as F

        from geoparquet_io_spark.functions.geom import st_geomfromtext
        from geoparquet_io_spark.geotable import GeoTable
        from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta

        df = df.withColumn(geometry_column,
                           st_geomfromtext(F.col(geography_column)))
        if geography_column != geometry_column:
            df = df.drop(geography_column)
        return GeoTable(df, GeoMeta(
            primary_column=geometry_column,
            columns={geometry_column: GeoColumnMeta()}))
    return df


REMOTE_SCHEMES = ("s3a://", "s3://", "gs://", "abfs://", "abfss://", "wasbs://")


def is_remote_path(path: str) -> bool:
    return path.startswith(REMOTE_SCHEMES)


def normalize_remote_path(path: str) -> str:
    """s3:// -> s3a:// (the Hadoop connector scheme); others pass through.
    With the connectors on the classpath, every reader/writer in this
    package works on remote URIs unchanged — upload is not a separate step
    (vs the reference's obstore multipart upload, core/upload.py:268-430)."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


# ---------------------------------------------------------------------------
# whole-file localization (single-file formats: .gpkg / .shp / .fgb)
# ---------------------------------------------------------------------------
# Parquet-family readers stream remote URIs through the Hadoop
# connectors, but the single-file vector formats need a *local* file on
# every node (SQLite opens by path; .shp/.fgb decoders seek byte
# ranges).  SparkContext.addFile is the idiomatic mechanism: the driver
# fetches the URL once, executors pull it from the driver's file server
# on first use, and SparkFiles.get resolves the per-node copy.  The
# reference instead downloads to a temp path single-node
# (core/convert.py remote-source handling); addFile gives the same
# semantics but cluster-wide.

FETCHABLE_SCHEMES = ("http://", "https://", "ftp://") + REMOTE_SCHEMES


def is_fetchable_url(path: str) -> bool:
    return path.startswith(FETCHABLE_SCHEMES)


def _remote_exists(spark: SparkSession, url: str) -> bool:
    """Existence probe BEFORE SparkContext.addFile — addFile registers
    the path in the session's dependency list before fetching, so a
    missing file would otherwise fail every subsequent task in the
    session, not just this read."""
    if url.startswith(("http://", "https://", "ftp://")):
        import urllib.error
        import urllib.request

        try:
            req = urllib.request.Request(url, method="HEAD")
            with urllib.request.urlopen(req, timeout=30):
                return True
        except urllib.error.HTTPError as e:
            if e.code in (403, 404, 410):
                return False
            # servers without HEAD: fall through to a ranged GET
        except OSError:
            return False
        try:
            req = urllib.request.Request(
                url, headers={"Range": "bytes=0-0"})
            with urllib.request.urlopen(req, timeout=30):
                return True
        except OSError:
            return False
    # Hadoop-FS schemes: ask the connector
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(url)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def localize_file(spark: SparkSession, path: str,
                  optional: bool = False) -> tuple[str | None, str | None]:
    """Ship ``path`` (http/https/ftp or Hadoop-FS URL) to the session.

    Returns ``(driver_local_path, basename)``; the basename is what
    executor tasks pass to :func:`task_local_path`.  With
    ``optional=True`` a missing file (404 sidecar, say) returns
    ``(None, None)`` instead of raising.  Files sharing a basename
    collide in Spark's file registry — fetch each distinct dataset from
    a distinctly-named file.
    """
    import posixpath
    from urllib.parse import urlparse

    from pyspark import SparkFiles

    url = normalize_remote_path(path)
    name = posixpath.basename(urlparse(url).path)
    if not name:
        raise ValueError(f"cannot derive a file name from {path!r}")
    if not _remote_exists(spark, url):
        if optional:
            return None, None
        raise IOError(f"cannot fetch {path!r}: not found")
    try:
        spark.sparkContext.addFile(url)
    except Exception as exc:
        if optional:
            return None, None
        raise IOError(f"cannot fetch {path!r}: {exc}") from None
    return SparkFiles.get(name), name


def task_local_path(path: str, name: str | None) -> str:
    """Executor-side path resolution for a possibly-localized file:
    plain local reads keep their path (``name is None``); localized
    reads resolve the per-node copy at task run time."""
    if name is None:
        return path
    from pyspark import SparkFiles

    return SparkFiles.get(name)
