"""STAC Item/Collection generation from GeoParquet footer metadata.

Pure-python port of the reference's driver-side STAC publisher
(core/stac.py:139-479): bbox -> geometry, projection properties, asset
links.  Not a data-plane operator — works off the footer only.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from geoparquet_io_spark.operators.inspect_check import inspect_summary


def _bbox_to_geometry(b: list[float]) -> dict:
    xmin, ymin, xmax, ymax = b[:4]
    return {
        "type": "Polygon",
        "coordinates": [[
            [xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin],
        ]],
    }


def generate_stac_item(
    path: str,
    item_id: str | None = None,
    asset_href: str | None = None,
    datetime_utc: str | None = None,
    extra_properties: dict | None = None,
) -> dict:
    """STAC 1.0 Item for a GeoParquet file/dataset."""
    s = inspect_summary(path)
    geo = s.get("geo") or {}
    bbox = geo.get("bbox") or [-180.0, -90.0, 180.0, 90.0]
    dt = datetime_utc or _dt.datetime.now(_dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    props = {
        "datetime": dt,
        "table:row_count": s["rows"],
        "table:columns": [{"name": c} for c in s["columns"]],
    }
    crs = geo.get("crs")
    proj_used = False
    if isinstance(crs, str):
        props["proj:code"] = crs
        proj_used = True
    elif isinstance(crs, dict):
        # PROJJSON (the normal GeoParquet footer form): publish the
        # AUTH:CODE when identified, else the full projjson — never
        # proj:code null, which the extension defines as "undefined CRS"
        ident = crs.get("id") or {}
        if ident.get("authority") and ident.get("code") is not None:
            props["proj:code"] = f"{ident['authority']}:{ident['code']}"
        else:
            props["proj:projjson"] = crs
        proj_used = True
    if extra_properties:
        props.update(extra_properties)
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [
            "https://stac-extensions.github.io/table/v1.2.0/schema.json",
        ] + ([
            "https://stac-extensions.github.io/projection/v2.0.0/schema.json",
        ] if proj_used else []),
        "id": item_id or os.path.splitext(os.path.basename(path))[0],
        "geometry": _bbox_to_geometry(_planar_bbox(bbox)),
        "bbox": _planar_bbox(bbox),
        "properties": props,
        "links": [],
        "assets": {
            "data": {
                "href": asset_href or os.path.abspath(path),
                "type": "application/vnd.apache.parquet",
                "title": "GeoParquet data",
                "roles": ["data"],
            }
        },
    }


def _planar_bbox(b):
    """[xmin, ymin, xmax, ymax] from a 4- or 6-element GeoParquet bbox
    (6 = xmin,ymin,zmin,xmax,ymax,zmax — slicing [:4] grabbed zmin as
    xmax and published inverted extents)."""
    b = list(b)
    if len(b) == 6:
        return [b[0], b[1], b[3], b[4]]
    return b[:4]


def generate_stac_collection(items: list[dict], collection_id: str,
                             description: str = "") -> dict:
    boxes = [it["bbox"] for it in items if it.get("bbox")]
    union = [
        min(b[0] for b in boxes), min(b[1] for b in boxes),
        max(b[2] for b in boxes), max(b[3] for b in boxes),
    ] if boxes else [-180.0, -90.0, 180.0, 90.0]
    # STAC allows datetime: null when start/end_datetime are given —
    # fall back and skip items with no usable stamp instead of crashing
    dts = sorted(
        d for it in items
        for d in [it.get("properties", {}).get("datetime")
                  or it.get("properties", {}).get("start_datetime")]
        if d is not None)
    # the interval UPPER bound must see end_datetime too: an open-ended
    # item (datetime null, start 2020, end 2025) otherwise published a
    # temporal extent ending years before the data does
    ends = sorted(
        d for it in items
        for d in [it.get("properties", {}).get("end_datetime")
                  or it.get("properties", {}).get("datetime")
                  or it.get("properties", {}).get("start_datetime")]
        if d is not None)
    return {
        "type": "Collection",
        "stac_version": "1.0.0",
        "id": collection_id,
        "description": description or collection_id,
        "license": "proprietary",
        "extent": {
            "spatial": {"bbox": [union]},
            "temporal": {"interval": [[dts[0] if dts else None,
                                       ends[-1] if ends else None]]},
        },
        "links": [],
    }


_RFC3339 = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"
)


def _check_datetime(value, where: str, errors: list[str]) -> None:
    import re

    if value is None:
        return
    if not isinstance(value, str) or not re.match(_RFC3339, value):
        errors.append(f"{where} is not RFC 3339 UTC datetime: {value!r}")


def _item_checks(d: dict, res: dict, stac_dir: str | None) -> None:
    for field in ("id", "geometry", "bbox", "properties", "assets", "links"):
        if field not in d:
            res["errors"].append(f"missing required field: {field}")
    props = d.get("properties") or {}
    if "datetime" not in props:
        if not ("start_datetime" in props and "end_datetime" in props):
            res["errors"].append(
                "properties.datetime missing (and no start/end_datetime pair)")
    else:
        _check_datetime(props.get("datetime"), "properties.datetime",
                        res["errors"])
    for k in ("start_datetime", "end_datetime", "created", "updated"):
        if k in props:
            _check_datetime(props[k], f"properties.{k}", res["errors"])
    if not isinstance(d.get("id"), str) or not d.get("id"):
        res["errors"].append("id must be a non-empty string")
    # geometry/bbox consistency
    geom, bbox = d.get("geometry"), d.get("bbox")
    if bbox is not None:
        if not isinstance(bbox, (list, tuple)) or len(bbox) not in (4, 6):
            res["errors"].append(
                f"invalid bbox length: {len(bbox) if hasattr(bbox, '__len__') else bbox}")
        else:
            pb = _planar_bbox(bbox)
            # west > east is LEGAL (antimeridian crossing, GeoJSON 5.2);
            # only inverted latitude is an ordering error
            if pb[1] > pb[3]:
                res["errors"].append(f"invalid bbox ordering: {list(bbox)}")
            elif (isinstance(geom, dict) and geom.get("type") == "Polygon"
                  and pb[0] <= pb[2]):
                try:
                    coords = [pt for ring in geom.get("coordinates", [])
                              for pt in ring]
                    eps = 1e-9
                    inside = all(
                        pb[0] - eps <= x <= pb[2] + eps
                        and pb[1] - eps <= y <= pb[3] + eps
                        for x, y in ((float(c[0]), float(c[1]))
                                     for c in coords))
                except (TypeError, ValueError, IndexError, KeyError):
                    res["errors"].append(
                        "malformed Polygon coordinates (expected nested "
                        "[[x, y], ...] rings)")
                else:
                    if coords and not inside:
                        res["errors"].append(
                            "geometry coordinates fall outside bbox")
    if isinstance(geom, dict):
        if geom.get("type") not in (
                "Point", "MultiPoint", "LineString", "MultiLineString",
                "Polygon", "MultiPolygon", "GeometryCollection"):
            res["errors"].append(f"invalid geometry type: {geom.get('type')}")
        if geom.get("type") == "Polygon":
            for ring in geom.get("coordinates", []):
                if len(ring) < 4 or ring[0] != ring[-1]:
                    res["errors"].append(
                        "polygon ring not closed (first != last) or too short")
    # assets
    assets = d.get("assets") or {}
    for key, asset in assets.items():
        href = asset.get("href", "")
        if not href:
            res["errors"].append(f"asset {key!r} missing href")
        elif stac_dir is not None and not href.startswith(
                ("http://", "https://", "s3://", "gs://", "abfs://")):
            p = href if os.path.isabs(href) else os.path.join(stac_dir, href)
            if not os.path.exists(p):
                res["warnings"].append(
                    f"asset {key!r} href does not resolve locally: {href}")
        if "type" not in asset:
            res["warnings"].append(f"asset {key!r} missing media type")
    if assets and not any("data" in (a.get("roles") or [])
                          for a in assets.values()):
        res["warnings"].append("no asset with 'data' role found")
    res["info"]["asset_count"] = len(assets)
    # links
    links = d.get("links") or []
    if not any(ln.get("rel") == "self" for ln in links):
        res["warnings"].append("no 'self' link found (recommended)")
    res["info"]["link_count"] = len(links)
    # proj extension consistency
    code = props.get("proj:code") or props.get("proj:epsg")
    if code is not None:
        s = f"EPSG:{code}" if isinstance(code, int) else str(code)
        # the projection extension allows NON-numeric codes (OGC:CRS84 —
        # which this library's own generator emits for the default CRS —
        # IAU_2015:30100, ...): require authority:code shape only
        parts = s.split(":", 1)
        if len(parts) != 2 or not parts[0] or not parts[1]:
            res["errors"].append(f"malformed proj code: {code!r}")


def _collection_checks(d: dict, res: dict) -> None:
    for field in ("id", "description", "license", "extent", "links"):
        if field not in d:
            res["errors"].append(f"missing required field: {field}")
    ext = d.get("extent") or {}
    sp = (ext.get("spatial") or {}).get("bbox")
    if not sp or not isinstance(sp, list):
        res["errors"].append("extent.spatial.bbox missing or not a list")
    else:
        for b in sp:
            # a FLAT list of floats (instead of a list of bboxes) is a
            # common malformation — report it, don't crash on len(float)
            if not isinstance(b, (list, tuple)):
                res["errors"].append(
                    "extent.spatial.bbox must be a LIST of bboxes "
                    f"(got element {b!r})")
                continue
            # west > east allowed (antimeridian); latitude must order
            if len(b) not in (4, 6) or _planar_bbox(b)[1] > _planar_bbox(b)[3]:
                res["errors"].append(f"invalid collection bbox: {b}")
    ti = (ext.get("temporal") or {}).get("interval")
    if not ti or not isinstance(ti, list):
        res["errors"].append("extent.temporal.interval missing or not a list")
    else:
        for iv in ti:
            if len(iv) != 2:
                res["errors"].append(f"temporal interval must be a pair: {iv}")
                continue
            for v in iv:
                _check_datetime(v, "extent.temporal.interval", res["errors"])
            if iv[0] and iv[1] and iv[0] > iv[1]:
                res["errors"].append(f"temporal interval reversed: {iv}")


def validate_stac_dict(d: dict, stac_dir: str | None = None) -> dict:
    """Pure-python STAC 1.x validation (no pystac in this container):
    required fields per type, RFC 3339 datetimes, geometry/bbox
    consistency (including bbox containment and ring closure), asset
    href resolution + media types + data role, self link, proj extension
    code shape, and collection extent sanity — the reference's check set
    re-expressed without jsonschema (core/stac_check.py:26-128).
    Returns {"valid", "errors", "warnings", "info"}."""
    res: dict = {"valid": True, "errors": [], "warnings": [], "info": {}}
    t = d.get("type")
    res["info"]["stac_type"] = t or "Unknown"
    res["info"]["stac_version"] = d.get("stac_version", "Unknown")
    if "stac_version" not in d:
        res["errors"].append("missing required field: stac_version")
    if t == "Feature":
        _item_checks(d, res, stac_dir)
    elif t == "Collection":
        _collection_checks(d, res)
    else:
        res["errors"].append(f"type must be 'Feature' or 'Collection', got {t!r}")
    res["valid"] = not res["errors"]
    return res


def validate_stac_file(path: str) -> dict:
    """Load + validate a STAC JSON file (reference: validate_stac_file,
    core/stac_check.py:131-171)."""
    try:
        with open(path) as f:
            d = json.load(f)
    except json.JSONDecodeError as e:
        return {"valid": False, "errors": [f"invalid JSON: {e}"],
                "warnings": [], "info": {}}
    except FileNotFoundError:
        return {"valid": False, "errors": [f"file not found: {path}"],
                "warnings": [], "info": {}}
    except (OSError, UnicodeDecodeError) as e:
        # directory / permission / encoding problems: the contract is a
        # {'valid': False, errors} result, not an unhandled exception
        return {"valid": False, "errors": [f"cannot read {path}: {e}"],
                "warnings": [], "info": {}}
    return validate_stac_dict(d, stac_dir=os.path.dirname(path) or ".")


def validate_stac_item(item: dict) -> list[str]:
    """Back-compat shim: error list only (see validate_stac_dict)."""
    return validate_stac_dict(item)["errors"]


def write_stac_item(path: str, out_path: str, **kw) -> dict:
    item = generate_stac_item(path, **kw)
    with open(out_path, "w") as f:
        json.dump(item, f, indent=2)
    return item
