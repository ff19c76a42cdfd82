"""GeoParquet read/write for Spark.

Reference behavior: read at api/table.py:166-236 (+ partition_reader),
write strategies at core/common.py:2960-3118 / core/write_strategies/.
Spark's parquet writer cannot emit custom footer key-value metadata, so
the write path here runs pyarrow ``ParquetWriter``s INSIDE executors via
``mapInPandas`` — one pass, no driver materialization, footer ``geo``
metadata stamped on every file (SURVEY.md section 7 milestone 2).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from geoparquet_io_spark.meta import (
    GEOPARQUET_VERSIONS,
    GeoColumnMeta,
    GeoMeta,
)

# Reference best-practice write defaults (core/common.py:70-110):
# ZSTD level 15, 100k-row row groups, stats+dictionary on.
DEFAULT_COMPRESSION = "zstd"
DEFAULT_COMPRESSION_LEVEL = 15
DEFAULT_ROW_GROUP_ROWS = 100_000


def native_geo_types_supported() -> bool:
    """True when the runtime pyarrow can annotate parquet columns with
    the native GEOMETRY/GEOGRAPHY logical types (Arrow >= 19's
    ``pa.geometry``/``pa.geography`` — the GeoParquet 2.0 parquet-level
    mapping).  pyarrow 16.x in this container cannot; callers fall back
    to the GeoArrow extension mapping + 2.0 footer JSON."""
    return hasattr(pa, "geometry") or hasattr(pa, "geometry_type")


def patch_footer_metadata(path: str, updates: dict) -> int:
    """Update a parquet file's key-value footer metadata in O(footer),
    WITHOUT re-encoding any data page: serialize a new FileMetaData
    (same row groups — their absolute offsets are unchanged — plus the
    updated schema metadata) and APPEND it as the new footer.  Parquet
    readers locate the footer from the end of the file, so the old
    footer becomes dead bytes and every reader (pyarrow, DuckDB, Spark)
    sees the new metadata over the untouched pages.

    This is the scale-correct form of a metadata-only fix: on a 100 TB
    lake, stamping bbox/covering/geo metadata must cost footer IO, not
    a full decompress+re-encode of every file.  ``updates`` values of
    ``None`` DELETE the key.  Returns the appended byte count."""
    md = pq.ParquetFile(path).metadata
    schema = pq.read_schema(path)
    meta = dict(schema.metadata or {})
    for k, v in updates.items():
        k = k.encode() if isinstance(k, str) else k
        if v is None:
            meta.pop(k, None)
        else:
            meta[k] = v.encode() if isinstance(v, str) else v
    new_schema = schema.with_metadata(meta)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as tf:
        tmp = tf.name
    try:
        pq.write_metadata(new_schema, tmp, metadata_collector=[md])
        raw = open(tmp, "rb").read()
    finally:
        os.unlink(tmp)
    if raw[:4] != b"PAR1":
        raise RuntimeError("write_metadata produced a non-parquet buffer")
    footer = raw[4:]                    # [thrift FileMetaData][len][PAR1]
    with open(path, "ab") as fh:
        fh.write(footer)
    return len(footer)


def _first_parquet_file(path: str) -> str | None:
    if os.path.isfile(path):
        return path
    hits = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return hits[0] if hits else None


def read_footer_geo(path: str | list[str]) -> GeoMeta | None:
    """Driver-side footer metadata read — no Spark job
    (reference reads footers the same way, core/duckdb_metadata.py:61-240).

    After a distributed write with ``per_file_bbox`` each footer carries
    only its own file's bbox, so for multi-file datasets the per-file
    bboxes are UNIONED — footer-only reads, fanned out on a thread pool
    (metadata reads are I/O-bound).  Past ``max_union_files`` the bbox is
    CLEARED instead of swept: at a 100 TB dataset's file count a driver
    sweep is minutes of startup latency, and an absent bbox is honest
    where an understated one (first file only) would be wrong.

    ``path`` may be a single file, a dataset directory (recursive glob),
    or an explicit file list (snapshot membership reads)."""
    if isinstance(path, list):
        files = sorted(path)
    elif os.path.isfile(path):
        return GeoMeta.from_footer(pq.read_schema(path).metadata)
    else:
        files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True))
    if not files:
        return None
    geo = GeoMeta.from_footer(pq.read_schema(files[0]).metadata)
    # (GeoMeta.primary never returns None — a missing entry yields a
    # detached default whose bbox is None, caught just below)
    if geo is None or len(files) == 1:
        return geo
    max_union_files = 1024
    if geo.primary.bbox is None:
        return geo
    if len(files) > max_union_files:
        geo.ensure_primary().bbox = None
        return geo
    from concurrent.futures import ThreadPoolExecutor

    def _bbox(f: str):
        g = GeoMeta.from_footer(pq.read_schema(f).metadata)
        return g.primary.bbox if g is not None and g.primary is not None else None

    with ThreadPoolExecutor(max_workers=min(32, len(files) - 1)) as ex:
        boxes = list(ex.map(_bbox, files[1:]))
    from geoparquet_io_spark.meta import bbox_union

    union = geo.primary.bbox
    for b in boxes:
        # spec-aware union: 3D+3D keeps Z, mixed projects to 2D — the
        # positional 4-tuple union read a 3D file's zmin as xmax
        union = bbox_union(union, b)
        if union is None:
            break
    geo.ensure_primary().bbox = union
    return geo


def _geo_from_arrow_extensions(schema: "pa.Schema") -> GeoMeta | None:
    """GeoParquet 2.0 / geo-native files carry typed geometry columns
    instead of (or alongside) the 1.x ``geo`` footer JSON.  The reference
    recognizes Parquet-native GeometryType logical types
    (core/extract.py:175-191, core/metadata_utils.py:48); on this pyarrow
    (16.x, no Parquet GEOMETRY logical type support) the readable
    equivalent is the GeoArrow extension convention those files use at the
    Arrow layer: ``ARROW:extension:name`` in {geoarrow.wkb, geoarrow.*}
    with optional extension metadata ``{"crs": ...}``.  Synthesize the
    same GeoMeta either way so downstream operators see one data model."""
    cols: dict[str, GeoColumnMeta] = {}
    for fld in schema:
        md = fld.metadata or {}
        ext = md.get(b"ARROW:extension:name", b"").decode()
        if not ext.startswith("geoarrow."):
            continue
        crs = None
        raw = md.get(b"ARROW:extension:metadata")
        if raw:
            try:
                ext_meta = json.loads(raw)
                crs = ext_meta.get("crs")
                if isinstance(crs, dict):
                    ident = crs.get("id") or {}
                    if ident.get("authority") and ident.get("code") is not None:
                        crs = f"{ident['authority']}:{ident['code']}"
            except (ValueError, AttributeError):
                pass
        encoding = "WKB" if ext == "geoarrow.wkb" else ext.split(".", 1)[1]
        cols[fld.name] = GeoColumnMeta(encoding=encoding, crs=crs)
    if not cols:
        return None
    primary = "geometry" if "geometry" in cols else sorted(cols)[0]
    return GeoMeta(primary_column=primary, columns=cols)


def read(spark: SparkSession, path: str, geometry_column: str | None = None):
    """Read GeoParquet -> GeoTable (reference: api/table.py:166-185).
    Falls back to GeoArrow extension-typed columns (the GeoParquet 2.0
    arrow mapping) when the 1.x ``geo`` footer JSON is absent."""
    from geoparquet_io_spark.geotable import GeoTable

    df = spark.read.parquet(path)
    geo = read_footer_geo(path)
    if geo is None:
        f = _first_parquet_file(path)
        if f is not None:
            geo = _geo_from_arrow_extensions(pq.read_schema(f))
    if geo is None and geometry_column:
        geo = GeoMeta(primary_column=geometry_column,
                      columns={geometry_column: GeoColumnMeta()})
    if geo is not None and geometry_column:
        geo = geo.with_primary_column(geometry_column)
    return GeoTable(df, geo)


def read_partition(
    spark: SparkSession,
    path: str,
    hive_partitioning: bool = True,
    allow_schema_diff: bool = False,
):
    """Read a partitioned dataset (reference: core/partition_reader.py:22-78).
    ``allow_schema_diff`` == DuckDB union_by_name == Spark mergeSchema."""
    from geoparquet_io_spark.geotable import GeoTable

    reader = spark.read
    if allow_schema_diff:
        reader = reader.option("mergeSchema", "true")
    if not hive_partitioning:
        # treat dirs as plain file globs, no partition column synthesis
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.parquet(path)
    if hive_partitioning:
        df = _cast_null_partition_types(df, path)
    return GeoTable(df, read_footer_geo(path))


def _cast_null_partition_types(df: DataFrame, path: str) -> DataFrame:
    """Restore recorded partition-column types on an EMPTY partitioned
    dataset: the zero-row write places its schema-only file under
    ``c=__HIVE_DEFAULT_PARTITION__`` dirs, whose all-null values make
    Spark infer StringType for every partition column.  The write
    records the real types in that file's footer (PARTITION_TYPES_KEY);
    cast a recorded column back ONLY while it is still all-null (the
    pure empty state).  Once real dir values exist, inference owns the
    type: casting then could CORRUPT values (dirs like month=01 infer
    as int 1; casting back to the recorded 'string' would yield '1',
    not '01').  The probe is depth-1 first — a dataset that never had
    an empty write pays one cheap listdir, never a recursive walk."""
    from pyspark.sql import functions as F

    # the empty-state file's FIRST partition dir sits directly under
    # path; only recurse inside an actual __HIVE_DEFAULT_PARTITION__ hit
    top = _glob.glob(os.path.join(path, "*=__HIVE_DEFAULT_PARTITION__"))
    if not top:
        return df
    probe = []
    for d in sorted(top):
        probe += _glob.glob(os.path.join(d, "**", "*.parquet"),
                            recursive=True)
    # the schema-only file carries a filename MARKER so it is found by
    # name, not by sort order (r8 ADVICE: data files share the
    # part-NNNNN-{uuid} shape, and with >64 null-partition data files
    # the uuid sort could push the keyed file past the scan bound,
    # silently skipping the restore).  Datasets written before the
    # marker fall back to the bounded sorted footer scan.
    marked = [f for f in probe
              if os.path.basename(f).endswith(_SCHEMA_FILE_SUFFIX)]
    for f in (sorted(marked) or sorted(probe)[:64]):
        md = pq.read_schema(f).metadata or {}
        raw = md.get(PARTITION_TYPES_KEY)
        if raw is None:
            continue   # pre-record schema or null-partition data file
        todo = [(col, ddl) for col, ddl in json.loads(raw).items()
                if col in df.columns
                and df.schema[col].dataType.simpleString() != ddl]
        if todo:
            # all-null gate from the DIRECTORY LISTING, no Spark job at
            # all (r9 review — the r8 one-aggregate version was still a
            # full-dataset scan on every read once real data existed):
            # partition-column values come only from dir names, so a
            # column is all-null iff every `col=` dir is the hive
            # default.  Early exit the walk once every recorded column
            # has a real value.
            cols = {c for c, _ in todo}
            real = _cols_with_real_dir_values(path, cols)
            for col, ddl in todo:
                if col not in real:
                    df = df.withColumn(col, F.col(col).cast(ddl))
        break
    return df


def _cols_with_real_dir_values(path: str, cols: set) -> set:
    """Subset of ``cols`` that have at least one hive dir with a real
    (non-``__HIVE_DEFAULT_PARTITION__``) value anywhere under ``path``.
    Walks directories only; returns as soon as every column is found."""
    found: set = set()
    for _root, dirs, _files in os.walk(path):
        dirs[:] = [d for d in dirs
                   if not d.startswith((".", "_"))]
        for d in dirs:
            if "=" not in d:
                continue
            c, v = d.split("=", 1)
            if c in cols and v != "__HIVE_DEFAULT_PARTITION__":
                found.add(c)
        if found == cols:
            break
    return found


# ---------------------------------------------------------------------------
# Write
# ---------------------------------------------------------------------------

def _make_native_geometry_type(crs):
    """pyarrow's canonical GEOMETRY extension type (>= 19: ``pa.geometry``),
    which the parquet writer maps to the parquet-native GEOMETRY logical
    annotation (reference: core/metadata_utils.py:48).  Returns None when
    the runtime pyarrow predates it.  Signature differences across
    versions are absorbed (crs kwarg -> positional -> none)."""
    ctor = getattr(pa, "geometry", None) or getattr(pa, "geometry_type", None)
    if ctor is None:
        return None
    if crs is not None:
        try:
            return ctor(crs=crs)
        except TypeError:
            try:
                return ctor(crs)
            except TypeError:
                # this pyarrow's ctor can't take our CRS: do NOT emit a
                # native type that silently drops it — returning None
                # falls back to the GeoArrow metadata path, which
                # carries the CRS
                return None
    try:
        return ctor()
    except TypeError:
        return None


def _arrow_schema_with_geo(df: DataFrame, geo: GeoMeta | None) -> pa.Schema:
    """Dataset arrow schema carrying BOTH geo conventions: the 1.x ``geo``
    footer JSON and GeoArrow extension metadata on each geometry field
    (the GeoParquet 2.0 arrow mapping) — typed readers see typed columns,
    1.x readers see the footer, neither interferes with the other.

    For version 2.0 / parquet-geo-only on a pyarrow that has the
    canonical GEOMETRY extension type (>= 19), geometry fields get the
    NATIVE type instead: the parquet writer then emits the
    parquet-level GEOMETRY logical annotation.  Both writers
    ``cast(schema)`` their tables, and binary -> extension-over-binary
    is a storage cast."""
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    if geo is None:
        return schema
    native = (geo.version in ("2.0", "parquet-geo-only")
              and native_geo_types_supported())
    all_native = bool(geo.columns) and native
    for name, col in geo.columns.items():
        idx = schema.get_field_index(name)
        if idx < 0:
            # geo entry names a column absent from the frame: it cannot
            # be natively annotated, so parquet-geo-only must keep the
            # footer fallback (skipping the reset dropped ALL geometry
            # metadata on pyarrow >= 19 — r8 review)
            all_native = False
            continue
        fld = schema.field(idx)
        if not (pa.types.is_binary(fld.type) or pa.types.is_large_binary(fld.type)):
            all_native = False
            continue
        if native:
            gt = _make_native_geometry_type(col.crs)
            if gt is not None:
                schema = schema.set(idx, pa.field(name, gt, fld.nullable))
                continue
        all_native = False
        ext_meta: dict = {}
        if col.crs is not None:
            ext_meta["crs"] = col.crs
        fld = fld.with_metadata({
            **(fld.metadata or {}),
            b"ARROW:extension:name": b"geoarrow.wkb",
            b"ARROW:extension:metadata": json.dumps(ext_meta).encode(),
        })
        schema = schema.set(idx, fld)
    if geo.version == "parquet-geo-only" and all_native:
        # the mode's whole point: parquet-native GEOMETRY logical types
        # ONLY, no GeoParquet footer JSON (when the runtime couldn't
        # emit native types, the 2.0.0-footer fallback below keeps the
        # file readable instead)
        return schema
    return schema.with_metadata(
        {**(schema.metadata or {}), b"geo": geo.to_json().encode()}
    )


def write(
    df: DataFrame,
    path: str,
    geo: GeoMeta | None = None,
    partition_by: list[str] | None = None,
    single_file: bool | None = None,
    compression: str = DEFAULT_COMPRESSION,
    compression_level: int = DEFAULT_COMPRESSION_LEVEL,
    row_group_rows: int = DEFAULT_ROW_GROUP_ROWS,
    max_rows_per_file: int | None = None,
    overwrite: bool = True,
    per_file_bbox: str | None = None,
    target_row_group_mb: float | None = None,
    version: str | None = None,
) -> list[str]:
    """Write GeoParquet with footer ``geo`` metadata.  Returns written files.

    - ``version``: override the footer spec version ("1.0"/"1.1"/"2.0"/
      "parquet-geo-only"; default keeps ``geo.version``).  For "2.0" the
      file carries the GeoArrow extension mapping (always emitted) plus a
      2.0.0 footer; the parquet-native GEOMETRY logical annotation
      (reference: core/metadata_utils.py:48, core/extract.py:175-191) is
      emitted only when the runtime pyarrow supports it
      (:func:`native_geo_types_supported` — pyarrow >= 19; this container
      has 16.1, so the fallback is warned about and documented).

    - ``single_file=True`` -> exactly ``path`` (a .parquet file), streamed
      through the driver batch-by-batch (reference single-file semantics;
      its arrow_streaming strategy, write_strategies/arrow_streaming.py:81-341).
    - directory mode (default)   -> one file per task via executor-side
      pyarrow writers; with ``partition_by`` -> hive ``col=value/`` dirs.
    - ``per_file_bbox=<bbox column>`` -> each file's footer ``geo`` metadata
      carries THAT file's bbox (the reference invariant for partitioned
      outputs, core/partition_common.py:657-705).  Costs one executor-local
      rewrite per file (the reference's disk-rewrite strategy).
    """
    if version is not None:
        import copy as _copy

        if version not in GEOPARQUET_VERSIONS:
            raise ValueError(
                f"unknown GeoParquet version {version!r}; "
                f"have {sorted(GEOPARQUET_VERSIONS)}")
        if geo is not None and geo.version != version:
            geo = _copy.deepcopy(geo)
            geo.version = version
        if version in ("2.0", "parquet-geo-only") \
                and not native_geo_types_supported():
            # GeoParquet 2.0's parquet-level GEOMETRY logical annotation
            # needs pyarrow >= 19 (pa.geometry / GEOMETRY logical type);
            # this runtime can't emit it.  The written file still carries
            # the 2.0 arrow mapping (GeoArrow extension metadata on every
            # geometry field, stamped unconditionally below) plus the
            # version-2.0.0 footer JSON — the documented fallback; typed
            # readers (incl. this repo's _geo_from_arrow_extensions)
            # recognize it.
            import warnings

            warnings.warn(
                "pyarrow %s cannot write parquet-native GEOMETRY logical "
                "types (needs >= 19); emitting GeoArrow-typed columns + "
                "2.0 footer metadata instead" % pa.__version__)
    if single_file is None:
        single_file = path.endswith(".parquet") and partition_by is None
    elif single_file:
        # silently ignoring these wrote one unpartitioned file while the
        # caller believed the data was hive-partitioned / bounded / kept
        bad = [n for n, v in [("partition_by", partition_by),
                              ("max_rows_per_file", max_rows_per_file),
                              ("per_file_bbox", per_file_bbox)]
               if v is not None]
        if bad:
            raise ValueError(
                f"single_file=True is incompatible with {bad}; use the "
                "directory (distributed) write")
        if not overwrite and os.path.exists(path):
            raise FileExistsError(
                f"{path!r} exists and overwrite=False (single-file mode "
                "has no append)")

    if target_row_group_mb is not None:
        # size groups to the reference's 64-256 MB guidance from a bounded
        # compressed sample (core/common.py:1705,2610)
        from geoparquet_io_spark.operators.inspect_check import (
            estimate_row_group_rows,
        )

        row_group_rows = estimate_row_group_rows(
            df, target_mb=target_row_group_mb, compression=compression,
            compression_level=compression_level)

    if single_file:
        return _write_single_file(df, path, geo, compression, compression_level, row_group_rows)
    return _write_distributed(
        df, path, geo, partition_by, compression, compression_level, row_group_rows,
        max_rows_per_file, overwrite, per_file_bbox,
    )


def _write_single_file(df, path, geo, compression, compression_level, row_group_rows):
    schema = _arrow_schema_with_geo(df, geo)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    # write to a dot-temp and publish with one rename: opening the
    # ParquetWriter directly on the destination TRUNCATED any existing
    # good file before the data materialized, and a mid-write failure
    # left a valid-looking zero-row parquet where real data used to be
    # (the distributed path always had this temp+rename protection)
    tmp = os.path.join(
        os.path.dirname(os.path.abspath(path)),
        f".inprogress-{uuid.uuid4().hex[:12]}-"
        f"{os.path.basename(path)}")
    writer = pq.ParquetWriter(
        tmp, schema, compression=compression, compression_level=compression_level
    )
    try:
        # toArrow() materializes; for the huge case use directory mode.
        tbl = df.toArrow().cast(schema)
        if tbl.num_rows == 0:
            writer.write_table(tbl)
        for batch_start in range(0, tbl.num_rows, row_group_rows):
            writer.write_table(tbl.slice(batch_start, row_group_rows))
        writer.close()
        os.replace(tmp, path)
    finally:
        writer.close()   # idempotent; closes on the failure path
        if os.path.exists(tmp):
            os.unlink(tmp)
    return [path]


#: foreign .inprogress-* task files older than this are treated as a
#: crashed job's orphans and reclaimed by the next writer.  NOTE the
#: sharp edge: a LIVE foreign write whose task file mtime goes stale
#: past the window (its stage stalled mid-write) loses the file and its
#: commit-time os.replace fails — so the default is a full week, far
#: beyond any plausible single-write stall, trading slower disk
#: reclamation for never killing a slow job.  Override via
#: SPARK_GRAFT_INPROGRESS_ORPHAN_AGE (seconds).
# footer KV key on the zero-row schema-only file recording the written
# partition-column Spark types (dir values are all-null in the empty
# state, so readers would otherwise infer StringType for every one)
PARTITION_TYPES_KEY = b"spark_graft.partition_types"
# filename suffix of the zero-row write's schema-only file; keeps the
# part- prefix (Spark treats it as a data file) but is matchable by name
_SCHEMA_FILE_SUFFIX = "-schema.parquet"

INPROGRESS_ORPHAN_AGE_SEC = int(os.environ.get(
    "SPARK_GRAFT_INPROGRESS_ORPHAN_AGE", 7 * 24 * 3600))


def _write_distributed(
    df, path, geo, partition_by, compression, compression_level, row_group_rows,
    max_rows_per_file, overwrite, per_file_bbox=None,
):
    if per_file_bbox is not None:
        if per_file_bbox not in df.columns:
            raise ValueError(
                f"per_file_bbox column {per_file_bbox!r} not in schema")
        # the struct SHAPE must be validated too: get_field_index
        # returns -1 for a missing name and flatten()[-1] would then
        # silently read the LAST child for every min/max — stamping
        # wrong footer bboxes that mis-prune file skipping forever
        from pyspark.sql import types as T

        dt = df.schema[per_file_bbox].dataType
        names = set(dt.names) if isinstance(dt, T.StructType) else set()
        missing = {"xmin", "ymin", "xmax", "ymax"} - names
        if missing:
            raise ValueError(
                f"per_file_bbox column {per_file_bbox!r} must be a "
                f"struct with xmin/ymin/xmax/ymax fields; missing "
                f"{sorted(missing)} (got {dt.simpleString()})")
    geo_json = geo.to_json() if geo is not None else None
    schema = _arrow_schema_with_geo(df, geo)
    schema_ser = schema.serialize().to_pybytes()
    # per-job id scopes the in-flight prefix AND the orphan sweep: two
    # concurrent appends to the same directory (a designed scenario —
    # commit_snapshot / vacuum grace both assume it) must never delete
    # each other's in-flight task files
    job_id = uuid.uuid4().hex[:12]
    inprog_prefix = f".inprogress-{job_id}-"
    if overwrite and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    part_cols = list(partition_by or [])
    if part_cols:
        # co-locate each partition value; AQE may still split skewed keys,
        # which just yields >1 file for that value (allowed by the layout).
        df = df.repartition(*part_cols)
    data_cols = [f.name for f in schema if f.name not in part_cols]
    data_schema = pa.schema(
        [schema.field(n) for n in data_cols], metadata=schema.metadata
    )

    # per-file-bbox files buffer batches in memory up to this many rows so
    # the footer can be stamped with the EXACT bbox in a single parquet
    # encode (no read-modify-rewrite).  Memory is comparable to what the
    # parquet writer's own row-group buffer would hold; files that outgrow
    # the cap fall back to streaming + one footer rewrite.  (pyarrow >= 18
    # makes the fallback unnecessary via ParquetWriter.add_key_value_metadata
    # — stamp at close; not available on this pyarrow.)
    # the cap must not scale with max_rows_per_file: a 50M-row file limit
    # would otherwise disable spilling entirely and buffer whole files
    buffer_cap = (4 * row_group_rows if max_rows_per_file is None
                  else min(max_rows_per_file, 4 * row_group_rows))

    def write_partition(batches: Iterator["pa.RecordBatch"]):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        full_schema = pa.ipc.read_schema(pa.BufferReader(schema_ser))
        dschema = pa.schema(
            [full_schema.field(n) for n in data_cols], metadata=full_schema.metadata
        )
        buffered = per_file_bbox is not None and geo_json is not None
        # key -> state; streaming: [writer, file, rows]
        #              buffered:  [None, file, rows, parts(list of tables), bbox]
        open_w: dict[tuple, list] = {}
        emitted: list[tuple[str, int]] = []

        def _new_file(k: tuple) -> str:
            d = path
            if part_cols:
                d = os.path.join(
                    path, *[f"{c}={_hive_escape(v)}" for c, v in zip(part_cols, k)]
                )
                os.makedirs(d, exist_ok=True)
            # dot-prefixed while in flight: parquet readers (Spark,
            # pyarrow.dataset, this repo's _files()) skip dot-files, so a
            # failed or speculative task attempt can never leak a partial
            # or duplicate file into reads — the driver renames the
            # manifest's survivors to their visible names after collect()
            return os.path.join(
                d, f"{inprog_prefix}part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet")

        def _open(k: tuple):
            f = _new_file(k)
            if buffered:
                open_w[k] = [None, f, 0, [], None]
            else:
                w = pq.ParquetWriter(
                    f, dschema, compression=compression,
                    compression_level=compression_level,
                )
                open_w[k] = [w, f, 0]
            return open_w[k]

        def _bbox_of(sub: "pa.Table"):
            import pyarrow.compute as pc

            col = sub.column(per_file_bbox).combine_chunks()
            # flatten(), NOT .field(): .field() ignores struct-level
            # nulls and reads the (undefined, typically 0.0) child
            # values under them — a null bbox row would wrongly extend
            # the footer bbox to 0.  flatten() propagates parent nulls;
            # pc.min/max then skip them.
            xmin, ymin, xmax, ymax = (
                col.flatten()[col.type.get_field_index(n)]
                for n in ("xmin", "ymin", "xmax", "ymax"))
            return [
                pc.min(xmin).as_py(), pc.min(ymin).as_py(),
                pc.max(xmax).as_py(), pc.max(ymax).as_py(),
            ]

        def _track_bbox(slot: list, sub: "pa.Table"):
            vals = _bbox_of(sub)
            if any(v is None for v in vals):
                # all rows in this chunk had null bboxes: no contribution
                # (an all-null file leaves the footer bbox absent)
                return
            cur = slot[4]
            slot[4] = vals if cur is None else [
                min(cur[0], vals[0]), min(cur[1], vals[1]),
                max(cur[2], vals[2]), max(cur[3], vals[3]),
            ]

        def _geo_with_bbox(bbox) -> bytes:
            from geoparquet_io_spark.meta import GeoMeta as _GM

            g = _GM.from_json(geo_json)
            if bbox is not None:
                g.ensure_primary().bbox = [float(v) for v in bbox]
            return g.to_json().encode()

        def _spill_to_writer(slot: list):
            """Buffered file outgrew the cap: switch to a streaming writer
            (dataset-level geo in the schema); footer gets a single rewrite
            at close to stamp the exact bbox."""
            w = pq.ParquetWriter(
                slot[1], dschema, compression=compression,
                compression_level=compression_level,
            )
            for part in slot[3]:
                w.write_table(part)
            slot[0], slot[3] = w, []

        def _close_slot(slot: list):
            if not buffered:
                slot[0].close()
                return
            if slot[0] is not None:  # spilled: streaming writer + footer patch
                slot[0].close()
                # O(footer) metadata patch — the spilled pages are never
                # decompressed or re-encoded just to stamp the file bbox
                patch_footer_metadata(slot[1],
                                      {b"geo": _geo_with_bbox(slot[4])})
                return
            # common case: whole file buffered -> ONE encode, exact footer
            fschema = dschema.with_metadata(
                {**(dschema.metadata or {}), b"geo": _geo_with_bbox(slot[4])}
            )
            w = pq.ParquetWriter(
                slot[1], fschema, compression=compression,
                compression_level=compression_level,
            )
            try:
                tbl = pa.concat_tables(slot[3]).cast(fschema) if slot[3] else \
                    pa.Table.from_batches([], schema=fschema)
                if tbl.num_rows == 0:
                    w.write_table(tbl)
                for start in range(0, tbl.num_rows, row_group_rows):
                    w.write_table(tbl.slice(start, row_group_rows))
            finally:
                w.close()

        def _append(k: tuple, sub: "pa.Table"):
            sub = sub.cast(dschema)
            while sub.num_rows:
                slot = open_w.get(k) or _open(k)
                take = sub.num_rows
                if max_rows_per_file:
                    take = min(take, max_rows_per_file - slot[2])
                chunk = sub.slice(0, take)
                if buffered:
                    _track_bbox(slot, chunk)
                    if slot[0] is not None:
                        slot[0].write_table(chunk)
                    else:
                        slot[3].append(chunk)
                        if slot[2] + take > buffer_cap:
                            _spill_to_writer(slot)
                else:
                    slot[0].write_table(chunk)
                slot[2] += take
                sub = sub.slice(take)
                if max_rows_per_file and slot[2] >= max_rows_per_file:
                    _close_slot(slot)
                    emitted.append((slot[1], slot[2]))
                    del open_w[k]

        try:
            for batch in batches:
                tbl = pa.Table.from_batches([batch]).cast(full_schema)
                if part_cols:
                    keys = list(zip(*[tbl.column(c).to_pylist() for c in part_cols]))
                    by_key: dict[tuple, list[int]] = {}
                    for i, k in enumerate(keys):
                        by_key.setdefault(k, []).append(i)
                    for k, idxs in by_key.items():
                        _append(k, tbl.take(idxs).select(data_cols))
                else:
                    _append((), tbl.select(data_cols))
        finally:
            for slot in open_w.values():
                _close_slot(slot)
                emitted.append((slot[1], slot[2]))
        out = pa.table(
            {
                "file": [f for f, _ in emitted],
                "rows": [n for _, n in emitted],
            },
            schema=pa.schema([("file", pa.string()), ("rows", pa.int64())]),
        )
        yield from out.to_batches()

    result_schema = "file string, rows long"
    res = df.mapInArrow(write_partition, schema=result_schema) if hasattr(df, "mapInArrow") else None
    if res is None:  # pragma: no cover - old spark fallback
        raise RuntimeError("requires Spark >= 3.3 (mapInArrow)")
    rows = res.collect()
    # task commit: collect() holds exactly one result per partition (the
    # winning attempt), so renaming only the manifest's files and sweeping
    # the rest makes failed/speculative attempts invisible to readers
    final_files = []
    for r in rows:
        hidden = r["file"]
        d, base = os.path.split(hidden)
        final = os.path.join(d, base[len(inprog_prefix):])
        os.replace(hidden, final)
        final_files.append(final)
    import time as _time

    now = _time.time()
    for root_dir, _dirs, fnames in os.walk(path):
        for fn in fnames:
            if not fn.startswith(".inprogress-"):
                continue
            full = os.path.join(root_dir, fn)
            # sweep this job's own orphaned attempts immediately; a
            # FOREIGN job's in-flight files are its live task-commit
            # manifest — reclaim them only past a generous age window
            # (a crashed writer's orphans are invisible to readers but
            # would otherwise leak disk forever; nothing else sweeps
            # dot-files).  Covers legacy un-scoped `.inprogress-part-*`
            # names too.
            if fn.startswith(inprog_prefix):
                os.unlink(full)
                continue
            try:
                if now - os.path.getmtime(full) > INPROGRESS_ORPHAN_AGE_SEC:
                    os.unlink(full)
            except OSError:
                pass  # racing with its own writer/committer: leave it
    if not rows:
        # an empty APPEND to a dataset that already has data is a
        # complete no-op: writing the schema-only default-partition file
        # here would add a phantom null partition plus per-read probe
        # cost to a perfectly healthy dataset (r8 review)
        existing = _glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True)
        if any(not os.path.basename(f).startswith(".") for f in existing):
            return []
        # zero input rows (a filter matching nothing is a normal pipeline
        # outcome): emit ONE schema-only file so the dataset stays
        # readable — spark.read.parquet on an empty directory raises
        # UNABLE_TO_INFER_SCHEMA.  For partitioned layouts the file MUST
        # match what data files contain (partition columns live in dir
        # names, never inside files): inlining them would make a later
        # append with real hive dirs fail with a duplicate-column error.
        # Placing it under __HIVE_DEFAULT_PARTITION__ dirs keeps the
        # partition columns discoverable even in the empty state.
        d, f_schema = path, schema
        if part_cols:
            d = os.path.join(
                path, *[f"{c}=__HIVE_DEFAULT_PARTITION__" for c in part_cols])
            os.makedirs(d, exist_ok=True)
            # dir values are all-null here, so a reader infers each
            # partition column as StringType — record the WRITTEN types
            # in this file's footer so read_partition can cast them back
            # (they round-trip from real dir values once data exists)
            from pyspark.sql.pandas.types import from_arrow_type

            ptypes = {c: from_arrow_type(
                schema.field(c).type).simpleString() for c in part_cols}
            md = dict(data_schema.metadata or {})
            md[PARTITION_TYPES_KEY] = json.dumps(ptypes).encode()
            f_schema = data_schema.with_metadata(md)
        # marker suffix: read_partition finds this file by NAME among
        # arbitrarily many null-partition data files (r8 ADVICE)
        f = os.path.join(
            d, f"part-00000-{uuid.uuid4().hex[:8]}{_SCHEMA_FILE_SUFFIX}")
        pq.write_table(pa.Table.from_batches([], schema=f_schema), f,
                       compression=compression,
                       compression_level=compression_level)
        return [f]
    return final_files


def _hive_escape(v) -> str:
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    # Spark's unescapePathName consumes exactly TWO hex digits per % —
    # %{codepoint:02X} emitted 3-4 digits for ord > 0xFF, so 'a→b'
    # round-tripped as 'a!92b' (r8 review).  Match Spark's own writer:
    # non-ASCII characters are filesystem-legal and stay RAW in the dir
    # name (the reader takes them literally); only ASCII specials get
    # the %XX escape.
    return "".join(
        ch if ch.isalnum() or ch in "-_." or ord(ch) > 0x7F
        else f"%{ord(ch):02X}"
        for ch in s)


def write_bloom(df: DataFrame, path: str, bloom_columns: list[str],
                ndv: int | None = None, compression: str = "zstd",
                mode: str = "overwrite") -> list[str]:
    """Write parquet WITH split-block bloom filters on ``bloom_columns``
    — the point-lookup row-group skipper: at 100 TB an equality probe
    (doc_id, fingerprint, join key) skips every row group whose bloom
    rejects the value, without reading data pages.  Goes through
    Spark's native parquet writer (parquet-mr), the only writer in this
    stack that emits blooms — the pyarrow footer path (:func:`write`)
    can't, so bloom writes target NON-geo tables; geo datasets get
    file-level skipping from bbox manifests instead
    (operators/maintenance.py) — the two skipping mechanisms are
    complementary by design.

    Note parquet-mr OMITS the bloom for a column whose row group stayed
    fully dictionary-encoded (the dictionary already gives exact
    skipping there); blooms appear exactly where they pay — high-NDV
    columns.  ``check bloom`` / ``check_bloom_filters`` reports what was
    actually written.
    """
    missing = [c for c in bloom_columns if c not in df.columns]
    if missing:
        raise ValueError(f"bloom columns not in schema: {missing}")
    w = df.write.option("compression", compression)
    for c in bloom_columns:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if ndv is not None:
            w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    w.mode(mode).parquet(path)
    return sorted(_glob.glob(os.path.join(path, "*.parquet")))
