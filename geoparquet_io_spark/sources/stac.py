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
    if crs:
        props["proj:code"] = crs if isinstance(crs, str) else None
    if extra_properties:
        props.update(extra_properties)
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [
            "https://stac-extensions.github.io/table/v1.2.0/schema.json",
        ],
        "id": item_id or os.path.splitext(os.path.basename(path))[0],
        "geometry": _bbox_to_geometry(bbox),
        "bbox": bbox[:4],
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


def generate_stac_collection(items: list[dict], collection_id: str,
                             description: str = "") -> dict:
    boxes = [it["bbox"] for it in items if it.get("bbox")]
    union = [
        min(b[0] for b in boxes), min(b[1] for b in boxes),
        max(b[2] for b in boxes), max(b[3] for b in boxes),
    ] if boxes else [-180.0, -90.0, 180.0, 90.0]
    dts = sorted(it["properties"]["datetime"] for it in items)
    return {
        "type": "Collection",
        "stac_version": "1.0.0",
        "id": collection_id,
        "description": description or collection_id,
        "license": "proprietary",
        "extent": {
            "spatial": {"bbox": [union]},
            "temporal": {"interval": [[dts[0] if dts else None,
                                       dts[-1] if dts else None]]},
        },
        "links": [],
    }


def validate_stac_item(item: dict) -> list[str]:
    """Minimal structural validation (reference: core/stac_check.py)."""
    errors = []
    for key in ("type", "stac_version", "id", "geometry", "bbox", "properties", "assets"):
        if key not in item:
            errors.append(f"missing key: {key}")
    if item.get("type") != "Feature":
        errors.append("type must be 'Feature'")
    if "properties" in item and "datetime" not in item["properties"]:
        errors.append("properties.datetime missing")
    b = item.get("bbox")
    if b and not (len(b) in (4, 6) and b[0] <= b[2] and b[1] <= b[3]):
        errors.append("invalid bbox")
    return errors


def write_stac_item(path: str, out_path: str, **kw) -> dict:
    item = generate_stac_item(path, **kw)
    with open(out_path, "w") as f:
        json.dump(item, f, indent=2)
    return item
