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
    "read_pmtiles",
    "register",
    "tileid_to_zxy",
    "write_pmtiles",
    "zxy_to_tileid",
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


# ---------------------------------------------------------------------------
# PMTiles v3 container codec (beyond the reference plugin, which can
# only shell out to tippecanoe): write a (z, x, y, data) tile table
# into a .pmtiles archive and read one back as a DataFrame.  Public
# spec: github.com/protomaps/PMTiles/blob/main/spec/v3 — 127-byte
# header, varint-encoded clustered directories, Hilbert tile ids.
# Directory parsing is driver-side (directories are KB-scale by
# design); tile payload reads are DISTRIBUTED (mapInPandas over the
# entry list, each task reading its byte ranges).
# ---------------------------------------------------------------------------

_PM_MAGIC = b"PMTiles"
_PM_HEADER = 127
_COMPRESSION_NONE = 1
_COMPRESSION_GZIP = 2


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """Hilbert tile id (spec: cumulative 4^i base per zoom, then the
    standard Hilbert d index of (x, y) on the 2^z grid)."""
    if z < 0 or x < 0 or y < 0 or x >= (1 << z) or y >= (1 << z):
        raise ValueError(f"tile out of range: z={z} x={x} y={y}")
    acc = ((1 << (2 * z)) - 1) // 3
    s = (1 << z) >> 1
    d = 0
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:            # rotate quadrant
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return acc + d


def tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    """Inverse of :func:`zxy_to_tileid`."""
    if tid < 0:
        raise ValueError(f"negative tile id {tid}")
    z = 0
    while tid >= (1 << (2 * z)):
        tid -= 1 << (2 * z)
        z += 1
    n = 1 << z
    x = y = 0
    t = tid
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return z, x, y


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7


def _encode_directory(entries) -> bytes:
    """entries: sorted [(tile_id, offset, length, run_length)] — spec
    encoding: count, delta tile_ids, run_lengths, lengths, offsets
    (offset 0 = previous offset + previous length, else value + 1)."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last)
        last = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _varint(0)
        else:
            out += _varint(off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def _decode_directory(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    tids, rls, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        rls.append(v)
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        lens.append(v)
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        if v == 0:
            if i == 0:
                raise ValueError("PMTiles directory: first offset is 0")
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(tids, offs, lens, rls))


def write_pmtiles(tiles, path: str, tile_type: int = 1,
                  tile_compression: int = _COMPRESSION_NONE,
                  metadata: dict | None = None,
                  max_tiles: int = 2_000_000) -> dict:
    """Pack a tile table into a PMTiles v3 archive.

    ``tiles``: a Spark DataFrame with (z, x, y, data) columns or a list
    of such tuples.  The archive is a single driver-side artifact (same
    shape as the shapefile/GeoPackage writers): tiles are collected
    (``max_tiles``-guarded), sorted by Hilbert tile id (clustered=1),
    and identical payloads are deduplicated into one tile content (the
    spec's content-addressing).  Directories are written uncompressed
    (internal_compression=1) into the root — readers follow leaf
    pointers only when present, and none are.  Returns a report dict.
    """
    import gzip as _gzip
    import json as _json
    import struct

    if hasattr(tiles, "collect"):
        rows = tiles.select("z", "x", "y", "data") \
            .limit(max_tiles + 1).collect()
        if len(rows) > max_tiles:
            raise ValueError(
                f"more than {max_tiles} tiles — raise max_tiles if the "
                "archive is really meant to be that large")
        items = [(int(r["z"]), int(r["x"]), int(r["y"]), bytes(r["data"]))
                 for r in rows]
    else:
        items = [(int(z), int(x), int(y), bytes(d)) for z, x, y, d in tiles]
    if not items:
        raise ValueError("no tiles to write")
    seen: dict[int, tuple] = {}
    for z, x, y, d in items:
        tid = zxy_to_tileid(z, x, y)
        if tid in seen and seen[tid][3] != d:
            raise ValueError(f"duplicate tile z={z} x={x} y={y} with "
                             "different payloads")
        seen[tid] = (z, x, y, d)
    ordered = sorted(seen.items())
    # content-address identical payloads
    data_blob = bytearray()
    content_off: dict[bytes, tuple[int, int]] = {}
    entries = []
    for tid, (z, x, y, d) in ordered:
        if d not in content_off:
            content_off[d] = (len(data_blob), len(d))
            data_blob += d
        off, ln = content_off[d]
        entries.append((tid, off, ln, 1))
    root = _encode_directory(entries)
    meta = _json.dumps(metadata or {}).encode()
    zs = [z for _, (z, _, _, _) in ordered]
    header = bytearray(_PM_HEADER)
    header[0:7] = _PM_MAGIC
    header[7] = 3
    root_off = _PM_HEADER
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off            # no leaf directories
    struct.pack_into("<QQQQQQQQQQQ", header, 8,
                     root_off, len(root), meta_off, len(meta),
                     leaf_off, 0, data_off, len(data_blob),
                     len(entries), len(entries), len(content_off))
    header[96] = 1                                 # clustered
    header[97] = _COMPRESSION_NONE                 # internal compression
    header[98] = tile_compression
    header[99] = tile_type
    header[100] = min(zs)
    header[101] = max(zs)
    # bounds in E7 from the union of the written tiles' envelopes on
    # the web-mercator grid (viewers and the pmtiles CLI use these for
    # the initial extent/zoom, so a whole-world placeholder misleads)
    import math as _math

    def _merc_lat(ytile: float, z: int) -> float:
        n = _math.pi * (1.0 - 2.0 * ytile / (1 << z))
        return _math.degrees(_math.atan(_math.sinh(n)))

    lon_min = min(x / (1 << z) * 360.0 - 180.0 for _, (z, x, y, _) in ordered)
    lon_max = max((x + 1) / (1 << z) * 360.0 - 180.0
                  for _, (z, x, y, _) in ordered)
    lat_max = max(_merc_lat(y, z) for _, (z, x, y, _) in ordered)
    lat_min = min(_merc_lat(y + 1, z) for _, (z, x, y, _) in ordered)
    e7 = 10**7
    struct.pack_into("<iiii", header, 102,
                     int(round(lon_min * e7)), int(round(lat_min * e7)),
                     int(round(lon_max * e7)), int(round(lat_max * e7)))
    header[118] = min(zs)
    # center = bounds midpoint at min zoom
    struct.pack_into("<ii", header, 119,
                     int(round((lon_min + lon_max) / 2.0 * e7)),
                     int(round((lat_min + lat_max) / 2.0 * e7)))
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(root)
        f.write(meta)
        f.write(bytes(data_blob))
    return {"tiles": len(entries), "contents": len(content_off),
            "bytes": _PM_HEADER + len(root) + len(meta) + len(data_blob)}


def read_pmtiles(spark, path: str):
    """PMTiles v3 archive -> DataFrame (z, x, y, data).

    Header + directories parse on the driver (KB-scale by design; gzip
    internal compression handled); tile PAYLOAD reads are distributed —
    each task reads its entries' byte ranges from the file.  Run-length
    entries expand to one row per addressed tile (sharing the payload,
    exactly the spec's meaning)."""
    import gzip as _gzip
    import struct
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    with open(path, "rb") as f:
        header = f.read(_PM_HEADER)
        if len(header) < _PM_HEADER or header[0:7] != _PM_MAGIC:
            raise ValueError(f"{path!r} is not a PMTiles archive")
        if header[7] != 3:
            raise ValueError(f"unsupported PMTiles version {header[7]}")
        (root_off, root_len, _meta_off, _meta_len, leaf_off, _leaf_len,
         data_off, _data_len, _n_addr, _n_entries, _n_contents) = \
            struct.unpack_from("<QQQQQQQQQQQ", header, 8)
        internal_comp = header[97]

        def _load_dir(off: int, ln: int):
            f.seek(off)
            buf = f.read(ln)
            if internal_comp == _COMPRESSION_GZIP:
                buf = _gzip.decompress(buf)
            elif internal_comp != _COMPRESSION_NONE:
                raise ValueError(
                    f"unsupported internal compression {internal_comp}")
            return _decode_directory(buf)

        tile_entries = []
        for tid, off, ln, rl in _load_dir(root_off, root_len):
            if rl == 0:        # leaf directory pointer
                tile_entries.extend(_load_dir(leaf_off + off, ln))
            else:
                tile_entries.append((tid, off, ln, rl))
    rows = []
    for tid, off, ln, rl in tile_entries:
        for i in range(rl):    # run-length: consecutive tile ids share
            z, x, y = tileid_to_zxy(tid + i)
            rows.append((z, x, y, int(data_off + off), int(ln)))
    edf = spark.createDataFrame(
        rows, "z int, x int, y int, __off long, __len long")
    schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ])

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as fh:
            for pdf in batches:
                data = []
                for off, ln in zip(pdf["__off"], pdf["__len"]):
                    fh.seek(int(off))
                    data.append(fh.read(int(ln)))
                out = pdf[["z", "x", "y"]].copy()
                out["data"] = data
                yield out

    return edf.mapInPandas(fetch, schema=schema)
