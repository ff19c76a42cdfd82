"""GeoPackage IO on stdlib ``sqlite3`` — no GDAL required.

The reference converts GeoPackage via DuckDB's GDAL bridge
(core/convert.py:995-1132 ST_Read; core/format_writers.py:99-243 COPY
FORMAT GDAL), single-node either way.  A GeoPackage is just a SQLite
database following a public OGC table layout (gpkg_contents /
gpkg_geometry_columns / gpkg_spatial_ref_sys + one table per feature
layer, geometry as a "GP"-headed blob wrapping standard WKB), and
Python ships sqlite3 — so this engine reads and writes the format
natively.

Scale shape: the READ is distributed — rowid ranges fan out via
``mapInPandas`` and every task opens the file read-only (SQLite
supports unlimited concurrent readers), so a multi-GB GeoPackage scans
with full cluster parallelism instead of the reference's single-thread
GDAL cursor.  The WRITE is inherently single-file/driver-side (SQLite
has one writer), identical in shape to the reference's COPY.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Iterator

GPKG_APPLICATION_ID = 0x47504B47        # 'GPKG'
GPKG_USER_VERSION = 10300               # GeoPackage 1.3.0

# minimal required srs rows per OGC 12-128r17 table gpkg_spatial_ref_sys
_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]'
)


# ---------------------------------------------------------------------------
# GP geometry blob (GeoPackage binary header around plain WKB)
# ---------------------------------------------------------------------------

def strip_gp_header(blob: bytes) -> bytes | None:
    """GeoPackage geometry blob -> the WKB it wraps (None for NULL/empty).

    A non-NULL blob WITHOUT the GP magic raises: some tools emit plain
    WKB into geometry columns, and silently reading every such row as a
    NULL geometry makes the whole layer's data vanish with no error —
    the same loud-failure stance as the extended-binary check below."""
    if blob is None:
        return None
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError(
            "not a GeoPackage geometry blob (no GP header): corrupt "
            "file, or a nonconforming layer storing plain WKB")
    flags = blob[3]
    if flags & 0x20:
        # ExtendedGeoPackageBinary: extension-defined payload follows the
        # envelope — handing it to the WKB parser would misparse it or
        # fail with an opaque executor-side error
        raise ValueError(
            "ExtendedGeoPackageBinary geometry blobs are not supported")
    if flags & 0x10:                    # empty-geometry flag
        return None
    env_indicator = (flags >> 1) & 0x07
    env_doubles = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(env_indicator)
    if env_doubles is None:
        raise ValueError(f"invalid GeoPackage envelope indicator {env_indicator}")
    return bytes(blob[8 + env_doubles * 8:])


def wrap_gp_header(wkb: bytes, srs_id: int,
                   envelope: tuple | None = None) -> bytes:
    """Plain WKB -> GeoPackage blob with little-endian header + XY
    envelope.  ``envelope``: pass a precomputed (xmin, ymin, xmax, ymax)
    to avoid a second full geometry parse when the caller already has
    it (write_gpkg computes it for layer bounds anyway)."""
    from geoparquet_io_spark.functions import wkb as W

    xmin, ymin, xmax, ymax = envelope or W.envelope(wkb)
    if any(v != v for v in (xmin, ymin, xmax, ymax)):
        # empty geometry (POINT EMPTY encodes NaN,NaN): the spec's empty
        # flag (bit 4) with envelope indicator 0 — writing a NaN
        # envelope is invalid and poisons reader-side extents
        head = b"GP\x00" + bytes([0x11])   # version 0, LE + empty flag
        head += struct.pack("<i", srs_id)
        return head + wkb
    head = b"GP\x00" + bytes([0x03])    # version 0, LE + envelope [minx..]
    head += struct.pack("<i", srs_id)
    head += struct.pack("<4d", xmin, xmax, ymin, ymax)   # spec order
    return head + wkb


# ---------------------------------------------------------------------------
# Read
# ---------------------------------------------------------------------------

def list_layers(path: str) -> list[dict]:
    """Feature layers declared in gpkg_contents (+ their geometry info)."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, g.column_name, g.geometry_type_name, "
            "g.srs_id FROM gpkg_contents c JOIN gpkg_geometry_columns g "
            "ON g.table_name = c.table_name WHERE c.data_type = 'features'"
        ).fetchall()
    finally:
        con.close()
    return [{"layer": r[0], "geometry_column": r[1],
             "geometry_type": r[2], "srs_id": r[3]} for r in rows]


def _sqlite_to_spark_type(decl: str):
    from pyspark.sql import types as T

    d = (decl or "").upper()
    if d.startswith(("INT", "MEDIUMINT", "TINYINT", "SMALLINT", "BIGINT")):
        return T.LongType()
    if d.startswith("BOOL"):
        return T.BooleanType()
    if d.startswith(("REAL", "DOUBLE", "FLOAT", "NUMERIC", "DECIMAL")):
        return T.DoubleType()
    if d.startswith("BLOB") or d.startswith("GEOMETRY") or d in (
            "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
            "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
        return T.BinaryType()
    return T.StringType()               # TEXT, DATE, DATETIME, unknown


def read_gpkg(spark, path: str, layer: str | None = None,
              tasks: int | None = None):
    """GeoPackage layer -> GeoTable with a distributed rowid-range scan.

    Planning (layer lookup, schema, rowid bounds) is driver-side
    metadata; the row payloads are read on EXECUTORS — each task opens
    the SQLite file read-only for its ``rowid`` slice, strips the GP
    header to plain WKB, and yields an Arrow batch.  ``tasks`` defaults
    to the session's shuffle parallelism capped by row count.
    """
    import pandas as pd

    from pyspark.sql import types as T

    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.remote import (
        is_fetchable_url, localize_file, task_local_path,
    )

    fetch_name = None
    if is_fetchable_url(path):
        path, fetch_name = localize_file(spark, path)

    layers = list_layers(path)
    if not layers:
        raise ValueError(f"no feature layers in {path!r}")
    if layer is None:
        if len(layers) > 1:
            raise ValueError(
                f"GeoPackage has several layers "
                f"({[l['layer'] for l in layers]}); pass layer=")
        meta = layers[0]
    else:
        by_name = {l["layer"]: l for l in layers}
        if layer not in by_name:
            raise KeyError(f"layer {layer!r} not in {sorted(by_name)}")
        meta = by_name[layer]
    lname, gcol, srs_id = meta["layer"], meta["geometry_column"], meta["srs_id"]

    con = sqlite3.connect(path)
    try:
        cols = con.execute(f'PRAGMA table_info("{lname}")').fetchall()
        lo, hi, n = con.execute(
            f'SELECT MIN(_rowid_), MAX(_rowid_), COUNT(*) FROM "{lname}"'
        ).fetchone()
        srs_org, srs_code = (con.execute(
            "SELECT organization, organization_coordsys_id FROM "
            "gpkg_spatial_ref_sys WHERE srs_id = ?", (srs_id,)).fetchone()
            or (None, None))
        declared_type = meta["geometry_type"]
    finally:
        con.close()

    names = [c[1] for c in cols]
    fields = [T.StructField(c[1], T.BinaryType() if c[1] == gcol
                            else _sqlite_to_spark_type(c[2])) for c in cols]
    schema = T.StructType(fields)
    if n == 0:
        df = spark.createDataFrame([], schema)
    else:
        n_tasks = tasks or min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            max(1, n // 1000) or 1)
        step = (hi - lo + n_tasks) // n_tasks
        ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1))
                  for i in range(n_tasks) if lo + i * step <= hi]
        rdf = spark.createDataFrame(ranges, ["lo", "hi"]) \
            .repartition(len(ranges))
        cast = {f.name: ("f8" if isinstance(f.dataType, T.DoubleType)
                         else "Int64" if isinstance(f.dataType, T.LongType)
                         # sqlite hands BOOLEAN back as 0/1 ints (+None):
                         # without the nullable-boolean cast the Arrow
                         # conversion dies on the int/bool mix
                         else "boolean" if isinstance(f.dataType,
                                                      T.BooleanType)
                         else None) for f in fields}

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            db = task_local_path(path, fetch_name)
            for pdf in batches:
                for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                    c = sqlite3.connect(f"file:{db}?mode=ro", uri=True)
                    try:
                        rows = c.execute(
                            f'SELECT * FROM "{lname}" WHERE _rowid_ '
                            f"BETWEEN ? AND ?", (int(lo_), int(hi_))
                        ).fetchall()
                    finally:
                        c.close()
                    out = pd.DataFrame(rows, columns=names)
                    if not out.empty:
                        out[gcol] = [strip_gp_header(b)
                                     for b in out[gcol]]
                        for col, dt in cast.items():
                            if dt and col != gcol:
                                out[col] = out[col].astype(dt)
                    yield out

        df = rdf.mapInPandas(scan, schema=schema)

    crs = None
    if srs_org and str(srs_org).upper() == "EPSG" and srs_code not in (
            None, 0, 4326):
        crs = f"EPSG:{srs_code}"
    gmeta = GeoColumnMeta(
        crs=crs,
        geometry_types=[_gpkg_to_geoparquet_type(declared_type)]
        if _gpkg_to_geoparquet_type(declared_type) else [])
    return GeoTable(df, GeoMeta(primary_column=gcol, columns={gcol: gmeta}))


def _gpkg_to_geoparquet_type(name: str | None) -> str | None:
    if not name or name.upper() == "GEOMETRY":
        return None
    t = {"POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
         "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
         "MULTIPOLYGON": "MultiPolygon",
         "GEOMETRYCOLLECTION": "GeometryCollection"}
    return t.get(name.upper())


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def _spark_to_sqlite_type(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "INTEGER"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "REAL"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    return "TEXT"


def write_gpkg(gt, path: str, layer: str | None = None,
               append: bool = False) -> None:
    """GeoTable -> a valid GeoPackage file (driver-side, single writer —
    the same single-file shape as the reference's COPY FORMAT GDAL).
    Geometry lands as GP-headed WKB blobs; contents/geometry_columns/
    spatial_ref_sys rows follow OGC 12-128r17.

    ``append=True`` adds ``layer`` as an ADDITIONAL feature layer to an
    existing GeoPackage (the container is multi-layer by design);
    the layer name must not already exist."""
    if gt.geometry_column is None:
        raise ValueError(
            "write_gpkg requires a geometry column; this table has none"
        )
    from pyspark.sql import types as T

    from geoparquet_io_spark.functions import wkb as W

    layer = layer or os.path.splitext(os.path.basename(path))[0]
    gcol = gt.geometry_column
    df = gt.df
    nested = [f.name for f in df.schema.fields
              if f.dataType.simpleString().startswith(
                  ("struct", "array", "map")) and f.name != gcol]
    if nested:
        import warnings

        warnings.warn(f"dropping nested columns unsupported by "
                      f"GeoPackage: {nested}")
        df = df.drop(*nested)

    crs = gt.crs
    srs_id = 4326
    if isinstance(crs, str) and crs.upper().startswith("EPSG:"):
        srs_id = int(crs.split(":")[1])
    elif isinstance(crs, dict):
        cid = crs.get("id", {})
        if cid.get("authority", "").upper() == "EPSG":
            srs_id = int(cid.get("code", 4326))

    rows = df.collect()
    if os.path.exists(path) and not append:
        os.remove(path)
    fresh = not os.path.exists(path)
    con = sqlite3.connect(path)
    try:
        if fresh:
            con.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
            con.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
            con.execute(
                "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
                "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
                "organization_coordsys_id INTEGER NOT NULL, definition TEXT "
                "NOT NULL, description TEXT)")
            con.executemany(
                "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
                [("Undefined Cartesian SRS", -1, "NONE", -1, "undefined"),
                 ("Undefined geographic SRS", 0, "NONE", 0, "undefined"),
                 ("WGS 84", 4326, "EPSG", 4326, _WGS84_WKT)])
            con.execute(
                "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY "
                "KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, "
                "description TEXT DEFAULT '', last_change DATETIME NOT NULL "
                "DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, "
                "min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)")
            con.execute(
                "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
                "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
                "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT "
                "NULL, PRIMARY KEY (table_name, column_name))")
        else:
            exists = con.execute(
                "SELECT 1 FROM gpkg_contents WHERE table_name = ?",
                (layer,)).fetchone()
            if exists:
                raise ValueError(
                    f"layer {layer!r} already exists in {path!r}")
        if srs_id not in (-1, 0, 4326) and not con.execute(
                "SELECT 1 FROM gpkg_spatial_ref_sys WHERE srs_id = ?",
                (srs_id,)).fetchone():
            from geoparquet_io_spark.functions.crs_wkt import wkt_for_epsg

            con.execute(
                "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id,
                 wkt_for_epsg(srs_id) or "undefined"))

        # an existing integer `fid` column becomes the primary key (GDAL's
        # round-trip convention); otherwise fid autoincrements
        has_fid = any(
            f.name == "fid" and isinstance(
                f.dataType, (T.ByteType, T.ShortType, T.IntegerType,
                             T.LongType))
            for f in df.schema.fields)
        # only drop 'fid' from the attribute list when it actually IS the
        # integer primary key — a string/double fid column must survive
        # as a regular attribute, not silently vanish
        attr_fields = [f for f in df.schema.fields
                       if f.name != gcol and not (f.name == "fid" and has_fid)]
        # a NON-integer 'fid' column stays a regular attribute (dropping
        # it silently lost data); the required integer PK then takes the
        # name 'ogc_fid' to avoid the collision
        pk = "fid" if (has_fid
                       or all(f.name != "fid" for f in attr_fields)) \
            else "ogc_fid"
        ddl_cols = ", ".join(
            f'"{f.name}" {_spark_to_sqlite_type(f.dataType)}'
            for f in attr_fields)
        con.execute(
            f'CREATE TABLE "{layer}" ("{pk}" INTEGER PRIMARY KEY '
            f'AUTOINCREMENT, "{gcol}" BLOB'
            + (f", {ddl_cols}" if ddl_cols else "") + ")")

        bounds = [None] * 4
        gtypes: set[str] = set()
        fid_part = '"fid", ' if has_fid else ""
        n_params = (1 if has_fid else 0) + 1 + len(attr_fields)
        ins = (f'INSERT INTO "{layer}" ({fid_part}"{gcol}"'
               + "".join(f', "{f.name}"' for f in attr_fields)
               + ") VALUES (" + ",".join("?" * n_params) + ")")
        bool_cols = {f.name for f in attr_fields
                     if isinstance(f.dataType, T.BooleanType)}
        for r in rows:
            wkb = r[gcol]
            blob = None
            if wkb is not None:
                wkb = bytes(wkb)
                env = W.envelope(wkb)           # parse once: header + bounds
                blob = wrap_gp_header(wkb, srs_id, envelope=env)
                x0, y0, x1, y1 = env
                if x0 == x0:   # skip NaN (empty-geometry) envelopes —
                    # min(NaN, x) keeps NaN and poisons gpkg_contents
                    bounds[0] = x0 if bounds[0] is None else min(bounds[0], x0)
                    bounds[1] = y0 if bounds[1] is None else min(bounds[1], y0)
                    bounds[2] = x1 if bounds[2] is None else max(bounds[2], x1)
                    bounds[3] = y1 if bounds[3] is None else max(bounds[3], y1)
                gtypes.add(W.geometry_type(wkb))
            # NULL fid -> bind None: sqlite autoincrements it (crashing
            # the whole write on one null key helps nobody)
            vals = ([None if r["fid"] is None else int(r["fid"])]
                    if has_fid else []) + [blob]
            for f in attr_fields:
                v = r[f.name]
                if f.name in bool_cols and v is not None:
                    v = int(v)
                elif isinstance(v, (bytes, bytearray, memoryview)):
                    v = bytes(v)
                elif v is not None and not isinstance(
                        v, (int, float, str)):
                    v = str(v)
                vals.append(v)
            con.execute(ins, vals)

        gtype_name = (next(iter(gtypes)).upper() if len(gtypes) == 1
                      else "GEOMETRY")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", layer, *bounds, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, gcol, gtype_name, srs_id))
        con.commit()
    finally:
        con.close()
