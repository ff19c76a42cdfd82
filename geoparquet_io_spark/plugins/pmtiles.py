"""PMTiles generation: GeoParquet -> tippecanoe -> .pmtiles.

Reference parity: plugins/gpio-pmtiles/gpio_pmtiles/core.py (the
reference shells out to its OWN CLI — ``gpio extract | gpio convert
geojson | tippecanoe``).  The Spark-first shape has no self-pipe: the
extract/reproject steps are the engine's own lazy operators, and the
driver streams newline-delimited GeoJSON features straight into a
``tippecanoe`` child process (the same splittable feature_lines kernel
write_geojsonl uses — executors compute features in parallel,
``toLocalIterator`` keeps only one partition on the driver at a time).
tippecanoe itself is a single-machine tiler, so the final hop is
driver-side by nature — exactly like the reference, where the whole
pipeline runs on one host.

tippecanoe is not bundled: when it is missing the plugin raises
``TippecanoeNotFoundError`` naming the install options and the
streaming fallback — an honest gate, same contract as the reference.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

__all__ = [
    "TippecanoeNotFoundError",
    "build_tippecanoe_command",
    "create_pmtiles",
    "register",
]


class TippecanoeNotFoundError(Exception):
    """tippecanoe is not on PATH (reference core.py:10-21)."""

    def __init__(self):
        super().__init__(
            "tippecanoe not found in PATH.\n\n"
            "To write PMTiles, install tippecanoe:\n"
            "  macOS:  brew install tippecanoe\n"
            "  Ubuntu: sudo apt install tippecanoe\n"
            "  Source: https://github.com/felt/tippecanoe#installation\n\n"
            "Alternatively, stream GeoJSONSeq yourself:\n"
            "  gpio-spark convert geojsonl data.parquet /dev/stdout | "
            "tippecanoe -P -o output.pmtiles"
        )


def build_tippecanoe_command(
    output_path: str,
    layer: str | None = None,
    min_zoom: int | None = None,
    max_zoom: int | None = None,
    executable: str = "tippecanoe",
) -> list[str]:
    """The tippecanoe argv (reference core.py:159-192): ``-P`` parallel
    line-delimited input, explicit layer (default = output stem),
    ``-Z/-z`` zoom pins or ``-zg`` auto-detect, and
    ``--drop-densest-as-needed`` so dense zooms degrade instead of
    failing.  List-argv only — nothing passes through a shell, so no
    metacharacter validation is needed (the reference validates because
    it renders a pipeline string)."""
    cmd = [executable, "-P", "-o", output_path]
    cmd.extend(["-l", layer if layer else Path(output_path).stem])
    if min_zoom is not None and max_zoom is not None:
        cmd.extend(["-Z", str(min_zoom), "-z", str(max_zoom)])
    elif max_zoom is not None:
        cmd.extend(["-z", str(max_zoom)])
    else:
        cmd.append("-zg")
    cmd.append("--drop-densest-as-needed")
    return cmd


def create_pmtiles(
    gt,
    output_path: str,
    layer: str | None = None,
    min_zoom: int | None = None,
    max_zoom: int | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    where: str | None = None,
    include_cols: list[str] | None = None,
    precision: int = 6,
    executable: str = "tippecanoe",
    verbose: bool = False,
) -> None:
    """GeoTable -> ``output_path`` PMTiles via tippecanoe.

    Mirrors the reference pipeline (core.py:66-157): optional
    reproject-to-4326 (tippecanoe consumes lon/lat only), optional
    extract (bbox / SQL where / column projection — the geometry column
    always rides along), GeoJSON features at ``precision`` decimals,
    tippecanoe.  All filters are the engine's lazy operators, so the
    parquet scan prunes columns and pushes the WHERE down before any
    feature is rendered."""
    if shutil.which(executable) is None:
        raise TippecanoeNotFoundError()
    from geoparquet_io_spark.functions import crs as _crs
    from geoparquet_io_spark.sources.geojson import feature_lines

    if gt.crs is not None and not _crs.is_geographic(gt.crs):
        gt = gt.reproject("OGC:CRS84")
    if bbox is not None or where is not None or include_cols is not None:
        gt = gt.extract(columns=include_cols, bbox=bbox, where=where)
    cmd = build_tippecanoe_command(output_path, layer, min_zoom, max_zoom,
                                   executable)
    if verbose:
        print("Running:", " ".join(cmd), file=sys.stderr)
    feats = feature_lines(gt.df, gt.geometry_column, precision)
    proc = subprocess.Popen(
        cmd, stdin=subprocess.PIPE,
        stdout=None if verbose else subprocess.DEVNULL,
        stderr=None,          # tippecanoe writes progress to stderr
        text=True,
    )
    try:
        assert proc.stdin is not None
        for row in feats.toLocalIterator(prefetchPartitions=True):
            proc.stdin.write(row["feature"])
            proc.stdin.write("\n")
        proc.stdin.close()
    except BrokenPipeError:
        # tippecanoe died mid-stream; fall through to the returncode
        # check, which reports the real failure instead of EPIPE
        pass
    finally:
        rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"tippecanoe failed with exit code {rc}")


def _cmd_pmtiles(args) -> int:
    from geoparquet_io_spark.session import get_spark
    from geoparquet_io_spark.sources import geoparquet as _gp

    spark = get_spark("gpio-spark-pmtiles")
    gt = _gp.read(spark, args.input)
    bbox = None
    if args.bbox:
        parts = [float(v) for v in args.bbox.split(",")]
        if len(parts) != 4:
            raise SystemExit("--bbox needs minx,miny,maxx,maxy")
        bbox = tuple(parts)
    include = args.include_cols.split(",") if args.include_cols else None
    create_pmtiles(
        gt, args.output, layer=args.layer,
        min_zoom=args.min_zoom, max_zoom=args.max_zoom,
        bbox=bbox, where=args.where, include_cols=include,
        precision=args.precision, executable=args.tippecanoe_path,
        verbose=args.verbose,
    )
    return 0


def register(subparsers) -> None:
    """CLI verb (reference plugins/gpio-pmtiles/gpio_pmtiles/cli.py):
    ``pmtiles INPUT OUTPUT [--layer --min-zoom --max-zoom --bbox
    --where --include-cols --precision]``."""
    p = subparsers.add_parser(
        "pmtiles",
        help="generate PMTiles from GeoParquet via tippecanoe")
    p.add_argument("input", help="input GeoParquet path")
    p.add_argument("output", help="output .pmtiles path")
    p.add_argument("--layer", "-l", default=None,
                   help="layer name (default: output stem)")
    p.add_argument("--min-zoom", type=int, default=None)
    p.add_argument("--max-zoom", type=int, default=None)
    p.add_argument("--bbox", default=None,
                   help="minx,miny,maxx,maxy filter")
    p.add_argument("--where", default=None, help="SQL WHERE filter")
    p.add_argument("--include-cols", default=None,
                   help="comma-separated columns to keep")
    p.add_argument("--precision", type=int, default=6,
                   help="coordinate decimals (default 6, ~10 cm)")
    p.add_argument("--tippecanoe-path", default="tippecanoe",
                   help="tippecanoe executable (default: from PATH)")
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=_cmd_pmtiles)
