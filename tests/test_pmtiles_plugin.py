"""PMTiles plugin (bundled): gate, command construction, and the full
stream-into-tippecanoe pipeline against a FAKE tippecanoe (the real
binary is not in this container — the fake records its argv and copies
stdin, so the test asserts exactly what a real run would receive).
Reference parity: plugins/gpio-pmtiles/gpio_pmtiles/core.py."""

import json
import os
import stat

import pytest

from geoparquet_io_spark.plugins import pmtiles as PM


def _fake_tippecanoe(tmp_path):
    """A stand-in executable: writes its argv to <out>.args and copies
    stdin to <out>.features, then creates the -o target."""
    exe = tmp_path / "tippecanoe"
    exe.write_text(
        "#!/bin/sh\n"
        'out=""\n'
        'prev=""\n'
        'for a in "$@"; do\n'
        '  if [ "$prev" = "-o" ]; then out="$a"; fi\n'
        '  prev="$a"\n'
        "done\n"
        'echo "$@" > "$out.args"\n'
        'cat > "$out.features"\n'
        'echo pmtiles > "$out"\n'
    )
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(exe)


def _points_gt(spark, n=20):
    from geoparquet_io_spark.functions import geom as G
    from geoparquet_io_spark.geotable import GeoTable
    from geoparquet_io_spark.meta import GeoColumnMeta, GeoMeta
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.col("id").cast("long").alias("fid"),
        (F.col("id") * 3.0).alias("lon"),
        (F.col("id") * 1.5 - 10.0).alias("lat"),
    ).withColumn("geometry", G.st_point(F.col("lon"), F.col("lat")))
    geo = GeoMeta(primary_column="geometry",
                  columns={"geometry": GeoColumnMeta(crs="OGC:CRS84")})
    return GeoTable(df.drop("lon", "lat"), geo)


def test_tippecanoe_missing_raises_honest_gate(spark, tmp_path):
    gt = _points_gt(spark)
    with pytest.raises(PM.TippecanoeNotFoundError) as ei:
        PM.create_pmtiles(gt, str(tmp_path / "out.pmtiles"),
                          executable="definitely-not-a-real-binary")
    assert "tippecanoe" in str(ei.value)
    assert "brew install" in str(ei.value)


def test_build_tippecanoe_command_zoom_and_layer_defaults():
    # default layer = output stem, auto zoom
    cmd = PM.build_tippecanoe_command("/x/y/roads.pmtiles")
    assert cmd[:4] == ["tippecanoe", "-P", "-o", "/x/y/roads.pmtiles"]
    assert cmd[cmd.index("-l") + 1] == "roads"
    assert "-zg" in cmd and "--drop-densest-as-needed" in cmd
    # explicit layer + both zooms -> -Z/-z, no -zg
    cmd = PM.build_tippecanoe_command("o.pmtiles", layer="L",
                                      min_zoom=2, max_zoom=9)
    assert cmd[cmd.index("-l") + 1] == "L"
    assert cmd[cmd.index("-Z") + 1] == "2"
    assert cmd[cmd.index("-z") + 1] == "9"
    assert "-zg" not in cmd
    # max only -> -z only
    cmd = PM.build_tippecanoe_command("o.pmtiles", max_zoom=7)
    assert "-Z" not in cmd and cmd[cmd.index("-z") + 1] == "7"


def test_create_pmtiles_streams_features_through_fake(spark, tmp_path):
    exe = _fake_tippecanoe(tmp_path)
    gt = _points_gt(spark, n=20)
    out = str(tmp_path / "pts.pmtiles")
    PM.create_pmtiles(gt, out, executable=exe, max_zoom=5, precision=3)
    assert os.path.exists(out)
    args = open(out + ".args").read().split()
    assert args[args.index("-l") + 1] == "pts"
    assert args[args.index("-z") + 1] == "5"
    lines = [ln for ln in open(out + ".features").read().splitlines() if ln]
    assert len(lines) == 20
    feats = [json.loads(ln) for ln in lines]
    assert all(f["type"] == "Feature" for f in feats)
    assert sorted(f["properties"]["fid"] for f in feats) == list(range(20))
    # precision honored
    coords = feats[0]["geometry"]["coordinates"]
    assert all(round(c, 3) == c for c in coords)


def test_create_pmtiles_filters_before_tiling(spark, tmp_path):
    exe = _fake_tippecanoe(tmp_path)
    gt = _points_gt(spark, n=20)
    out = str(tmp_path / "filtered.pmtiles")
    PM.create_pmtiles(gt, out, executable=exe,
                      bbox=(0.0, -10.0, 30.0, 20.0),   # fids 0..10 by lon/lat
                      where="fid % 2 = 0",
                      include_cols=["fid"])
    lines = [ln for ln in open(out + ".features").read().splitlines() if ln]
    feats = [json.loads(ln) for ln in lines]
    got = sorted(f["properties"]["fid"] for f in feats)
    assert got == [0, 2, 4, 6, 8, 10]


def test_create_pmtiles_reprojects_projected_input(spark, tmp_path):
    """A projected (meter-valued) GeoTable must arrive at tippecanoe in
    lon/lat: the plugin reprojects to OGC:CRS84 first."""
    exe = _fake_tippecanoe(tmp_path)
    gt = _points_gt(spark, n=5).reproject("EPSG:3857")
    out = str(tmp_path / "m.pmtiles")
    PM.create_pmtiles(gt, out, executable=exe)
    feats = [json.loads(ln) for ln in
             open(out + ".features").read().splitlines() if ln]
    for f in feats:
        x, y = f["geometry"]["coordinates"]
        assert -180.0 <= x <= 180.0 and -90.0 <= y <= 90.0


def test_create_pmtiles_propagates_tippecanoe_failure(spark, tmp_path):
    exe = tmp_path / "tippecanoe-fail"
    exe.write_text("#!/bin/sh\ncat > /dev/null\nexit 3\n")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    gt = _points_gt(spark, n=3)
    with pytest.raises(RuntimeError, match="exit code 3"):
        PM.create_pmtiles(gt, str(tmp_path / "x.pmtiles"),
                          executable=str(exe))


def test_cli_verb_registered_and_runs_end_to_end(spark, tmp_path,
                                                 monkeypatch):
    """The bundled plugin registers a `pmtiles` verb on the CLI parser,
    and the verb drives the whole flow (read parquet -> stream -> fake
    tippecanoe)."""
    from geoparquet_io_spark import cli as CLI

    parser = CLI.build_parser()
    src = str(tmp_path / "pts.parquet")
    _points_gt(spark, n=7).write(src)
    exe = _fake_tippecanoe(tmp_path)
    out = str(tmp_path / "cli.pmtiles")
    args = parser.parse_args([
        "pmtiles", src, out, "--max-zoom", "4", "--layer", "mylayer",
        "--tippecanoe-path", exe,
    ])
    assert args.fn(args) == 0
    assert os.path.exists(out)
    argv = open(out + ".args").read().split()
    assert argv[argv.index("-l") + 1] == "mylayer"
    lines = [ln for ln in open(out + ".features").read().splitlines() if ln]
    assert len(lines) == 7


def test_pmtiles_tileid_hilbert_roundtrip_and_anchors():
    for z in range(0, 9):
        step = max(1, (1 << z) // 3)
        for x in range(0, 1 << z, step):
            for y in range(0, 1 << z, step):
                tid = PM.zxy_to_tileid(z, x, y)
                assert PM.tileid_to_zxy(tid) == (z, x, y)
    # spec: per-zoom bases are cumulative powers of 4
    assert PM.zxy_to_tileid(0, 0, 0) == 0
    assert PM.zxy_to_tileid(1, 0, 0) == 1
    assert PM.zxy_to_tileid(2, 0, 0) == 5
    assert PM.zxy_to_tileid(3, 0, 0) == 21
    import pytest as _p
    with _p.raises(ValueError):
        PM.zxy_to_tileid(2, 4, 0)          # x >= 2^z


def test_pmtiles_container_roundtrip(spark, tmp_path):
    """write_pmtiles -> read_pmtiles roundtrip: tiles come back exactly,
    identical payloads are content-deduplicated, and the reader output
    is a distributed DataFrame."""
    out = str(tmp_path / "t.pmtiles")
    tiles = [(0, 0, 0, b"root-tile"),
             (1, 0, 1, b"shared"), (1, 1, 1, b"shared"),
             (2, 3, 2, b"deep" * 100)]
    rep = PM.write_pmtiles(tiles, out, metadata={"name": "t"})
    assert rep["tiles"] == 4
    assert rep["contents"] == 3          # 'shared' stored once
    got = {(r["z"], r["x"], r["y"]): bytes(r["data"])
           for r in PM.read_pmtiles(spark, out).collect()}
    assert got == {(z, x, y): d for z, x, y, d in tiles}
    # DataFrame input path + duplicate-with-different-payload guard
    df = spark.createDataFrame(tiles, "z int, x int, y int, data binary")
    out2 = str(tmp_path / "t2.pmtiles")
    PM.write_pmtiles(df, out2)
    assert PM.read_pmtiles(spark, out2).count() == 4
    import pytest as _p
    with _p.raises(ValueError, match="duplicate tile"):
        PM.write_pmtiles([(1, 0, 0, b"a"), (1, 0, 0, b"b")],
                         str(tmp_path / "bad.pmtiles"))
    with _p.raises(ValueError, match="not a PMTiles"):
        p = tmp_path / "junk.pmtiles"
        p.write_bytes(b"NOTPMTILES" + b"\x00" * 200)
        PM.read_pmtiles(spark, str(p))


def test_pmtiles_header_bounds_derived_from_tiles(tmp_path):
    """Regression (r10 advice): the header used to hardcode whole-world
    E7 bounds and center (0,0); viewers use these for initial extent,
    so they must derive from the written tiles' web-mercator
    envelopes.  z1 tile (0,0) covers lon [-180,0], lat [0,85.05...];
    adding z1 (1,1) (lon [0,180], lat [-85.05,0]) widens the union."""
    import math
    import struct

    def hdr_bounds(path):
        raw = open(path, "rb").read(PM._PM_HEADER)
        w, s, e, n = struct.unpack_from("<iiii", raw, 102)
        cz = raw[118]
        clon, clat = struct.unpack_from("<ii", raw, 119)
        return ([v / 1e7 for v in (w, s, e, n)], cz,
                (clon / 1e7, clat / 1e7))

    merc_top = math.degrees(math.atan(math.sinh(math.pi)))  # 85.0511...
    p1 = str(tmp_path / "one.pmtiles")
    PM.write_pmtiles([(1, 0, 0, b"nw")], p1)
    (w, s, e, n), cz, (clon, clat) = hdr_bounds(p1)
    assert (w, e) == (-180.0, 0.0)
    assert abs(s) < 1e-6 and abs(n - merc_top) < 1e-6
    assert cz == 1
    assert abs(clon - -90.0) < 1e-6
    assert abs(clat - merc_top / 2) < 1e-6

    p2 = str(tmp_path / "two.pmtiles")
    PM.write_pmtiles([(1, 0, 0, b"nw"), (1, 1, 1, b"se")], p2)
    (w, s, e, n), _, (clon, clat) = hdr_bounds(p2)
    assert (w, e) == (-180.0, 180.0)
    assert abs(s + merc_top) < 1e-6 and abs(n - merc_top) < 1e-6
    assert abs(clon) < 1e-6 and abs(clat) < 1e-6


def test_pmtiles_reader_handles_gzip_dirs_run_lengths_and_leaves(
        spark, tmp_path):
    """Spec features our writer never emits must still read: gzip
    internal compression, run-length entries (consecutive Hilbert ids
    sharing one payload), and leaf-directory pointers."""
    import gzip
    import struct

    payload = b"RLTILE"
    # three consecutive tile ids at z1: (1,0,0) id 1 .. id 3
    leaf = PM._encode_directory([(1, 0, len(payload), 3)])
    leaf_gz = gzip.compress(leaf)
    # root holds ONE leaf pointer (run_length 0, offset into leaf section)
    root = PM._encode_directory([(1, 0, len(leaf_gz), 0)])
    root_gz = gzip.compress(root)
    header = bytearray(PM._PM_HEADER)
    header[0:7] = PM._PM_MAGIC
    header[7] = 3
    root_off = PM._PM_HEADER
    meta_off = root_off + len(root_gz)
    leaf_off = meta_off
    data_off = leaf_off + len(leaf_gz)
    struct.pack_into("<QQQQQQQQQQQ", header, 8,
                     root_off, len(root_gz), meta_off, 0,
                     leaf_off, len(leaf_gz), data_off, len(payload),
                     3, 1, 1)
    header[96] = 1
    header[97] = PM._COMPRESSION_GZIP
    header[98] = PM._COMPRESSION_NONE
    header[99] = 1
    header[100], header[101] = 1, 1
    p = tmp_path / "rl.pmtiles"
    p.write_bytes(bytes(header) + root_gz + leaf_gz + payload)
    got = {(r["z"], r["x"], r["y"]): bytes(r["data"])
           for r in PM.read_pmtiles(spark, str(p)).collect()}
    want_keys = {PM.tileid_to_zxy(t) for t in (1, 2, 3)}
    assert set(got) == want_keys
    assert all(v == payload for v in got.values())
