"""Named admin-boundary dataset catalog.

The reference ships loaders for countries / GAUL L2 / Overture divisions
with default remote sources, caching, and per-dataset level->column
mappings (core/admin_datasets.py:250-430).  This is the Spark-first
equivalent: a spec registry + one loader that resolves a name to a
GeoTable, so ``add_admin_divisions``/``partition_by_admin`` can take a
dataset NAME instead of requiring the caller to assemble the table.

Remote fetch is environment-gated (this container has no network):
- local paths read directly,
- http(s) sources download once into a cache directory (driver-side),
- s3 sources are normalized to s3a:// for Spark's hadoop connectors.
A clear error names the gate when the environment can't reach a source.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class AdminDatasetSpec:
    name: str
    source: str                      # default public source (reference parity)
    levels: tuple                    # user-facing level names
    level_columns: dict              # level name -> source column
    geometry_column: str = "geometry"
    bbox_column: str | None = "bbox"
    description: str = ""
    read_options: dict = field(default_factory=dict)

    def validate_levels(self, levels) -> None:
        bad = [lv for lv in levels if lv not in self.levels]
        if bad:
            raise ValueError(
                f"dataset {self.name!r} has levels {list(self.levels)}; "
                f"unknown: {bad}")

    def columns_for(self, levels) -> list[str]:
        self.validate_levels(levels)
        return [self.level_columns[lv] for lv in levels]


# default sources mirror the reference's catalog entries
# (core/admin_datasets.py:260-261, 295-298, 323-430)
CATALOG: dict[str, AdminDatasetSpec] = {
    s.name: s for s in [
        AdminDatasetSpec(
            name="countries",
            source="https://data.source.coop/cholmes/admin-boundaries/countries.parquet",
            levels=("continent", "country"),
            level_columns={"continent": "continent", "country": "country"},
            description="current country boundaries (single parquet)",
        ),
        AdminDatasetSpec(
            name="gaul",
            source="s3://nlebovits/gaul-l2-admin/by_country/*.parquet",
            levels=("country", "department"),
            level_columns={"country": "gaul0_name", "department": "gaul1_name"},
            description="GAUL L2 admin units, hive-partitioned by country",
        ),
        AdminDatasetSpec(
            name="overture-divisions",
            source="s3://overturemaps-us-west-2/release/latest/theme=divisions/type=division_area/*.parquet",
            levels=("country", "region"),
            level_columns={"country": "country", "region": "region"},
            description="Overture Maps division areas",
            read_options={"mergeSchema": "false"},
        ),
    ]
}


def list_admin_datasets() -> dict[str, str]:
    return {name: s.description for name, s in CATALOG.items()}


def _default_cache_dir() -> str:
    return os.environ.get(
        "SPARK_GRAFT_ADMIN_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "geoparquet_io_spark"))


def _materialize_source(source: str, cache_dir: str | None) -> str:
    """Resolve a spec source to something spark.read.parquet accepts."""
    if source.startswith(("http://", "https://")):
        import hashlib

        cache = cache_dir or _default_cache_dir()
        os.makedirs(cache, exist_ok=True)
        # key by full-URL hash + basename: two sources sharing a filename
        # (e.g. a versioned override) must not collide into one cache entry
        tag = hashlib.sha256(source.encode()).hexdigest()[:12]
        local = os.path.join(cache, f"{tag}-{os.path.basename(source)}")
        if not os.path.exists(local):
            import urllib.request

            try:
                urllib.request.urlretrieve(source, local + ".part")
                os.replace(local + ".part", local)
            except OSError as e:
                raise RuntimeError(
                    f"admin dataset download requires network access "
                    f"(fetching {source}): {e}") from e
        return local
    if source.startswith("s3://"):
        # Spark reads S3 through the hadoop-aws connector as s3a://
        return "s3a://" + source[len("s3://"):]
    return source


def load_admin_dataset(spark, name: str, source: str | None = None,
                       cache_dir: str | None = None):
    """Catalog name -> GeoTable.  ``source`` overrides the default
    (reference: AdminDataset(source_path=...), core/admin_datasets.py:28-57)."""
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from geoparquet_io_spark.sources.geoparquet import read_footer_geo

    spec = CATALOG.get(name)
    if spec is None:
        raise ValueError(
            f"unknown admin dataset {name!r}; available: {sorted(CATALOG)}")
    path = _materialize_source(source or spec.source, cache_dir)
    reader = spark.read
    for k, v in spec.read_options.items():
        reader = reader.option(k, v)
    df = reader.parquet(path)
    geo = None
    if not path.startswith("s3a://"):
        try:
            geo = read_footer_geo(path.replace("*.parquet", "").rstrip("/*"))
        except OSError:
            geo = None
    if geo is None:
        geo = GeoMeta(primary_column=spec.geometry_column,
                      columns={spec.geometry_column: GeoColumnMeta()})
    gt = GeoTable(df, geo.with_primary_column(spec.geometry_column))
    return gt


def resolve_admin(spark, admin, source: str | None = None):
    """GeoTable passthrough, or a catalog name string -> loaded GeoTable."""
    if isinstance(admin, str):
        return load_admin_dataset(spark, admin, source=source)
    return admin
