"""Byte-compatible compact GeoJSON writer.

Port of the reference golden writer
(reference tests/src/compact_geojson.rs:42-139): fixed 2-space
indentation ladder, one `[x, y]` vertex per line, integral floats
printed without a trailing `.0`, properties pretty-printed with sorted
keys — so our regenerated goldens are byte-diffable against the
reference's fixture corpus.

Features are plain dicts: {"geometry": {"type", "coordinates"},
"properties": dict, "type": "Feature"}.
"""

from __future__ import annotations

import json
import math


def _float_to_string(x: float) -> str:
    # serde_json's ryu output with the reference's ".0"-strip
    # (compact_geojson.rs:46-53).  Python repr is also
    # shortest-round-trip; normalize exponent spelling ("1e+30" →
    # "1e30", "1e-07" → "1e-7") to match ryu.
    if x == math.floor(x) and abs(x) < 1e16:
        return str(int(x))
    s = repr(float(x))
    if "e" in s:
        mant, exp = s.split("e")
        exp_i = int(exp)
        s = f"{mant}e{exp_i}"
    return s


def _write_polygon(polygon, out, indent: int) -> None:
    # compact_geojson.rs:42-71
    pad = " " * indent
    for i, ring in enumerate(polygon):
        out.append(pad + "[\n")
        for j, point in enumerate(ring):
            comma = "," if j < len(ring) - 1 else ""
            out.append(
                f"{pad}  [{_float_to_string(point[0])}, "
                f"{_float_to_string(point[1])}]{comma}\n"
            )
        out.append(pad + ("],\n" if i < len(polygon) - 1 else "]\n"))


def _write_multi_polygon(polygons, out, indent: int) -> None:
    # compact_geojson.rs:74-84
    pad = " " * indent
    for i, polygon in enumerate(polygons):
        out.append(pad + "[\n")
        _write_polygon(polygon, out, indent + 2)
        out.append(pad + ("],\n" if i < len(polygons) - 1 else "]\n"))


def _indent_block(indent: int, s: str) -> str:
    # compact_geojson.rs:15-28 — indent every line but the first
    pad = " " * indent
    lines = s.split("\n")
    return "\n".join(line if i == 0 else pad + line for i, line in enumerate(lines))


def _write_feature(feature: dict, out, is_last: bool) -> None:
    # compact_geojson.rs:86-126
    w = lambda s: out.append("    " + s)
    w("{\n")
    w('  "geometry": {\n')
    w('    "coordinates": [\n')
    geom = feature["geometry"]
    gtype = geom["type"]
    if gtype == "Polygon":
        _write_polygon(geom["coordinates"], out, 10)
    elif gtype == "MultiPolygon":
        _write_multi_polygon(geom["coordinates"], out, 10)
    else:
        raise ValueError("Feature must either be MultiPolygon or Polygon")
    props = feature.get("properties") or {}
    # serde_json::Map is a BTreeMap (sorted keys); to_string_pretty
    # uses 2-space indent — json.dumps(indent=2, sort_keys=True) matches.
    props_str = _indent_block(6, json.dumps(props, indent=2, sort_keys=True))
    w('    ],\n')
    w('    "type": "' + gtype + '"\n')
    w("  },\n")
    w('  "properties": ' + props_str + ",\n")
    w('  "type": "Feature"\n')
    w("},\n" if not is_last else "}\n")


def feature_collection_string(features) -> str:
    """The full FeatureCollection text (compact_geojson.rs:128-139)."""
    out = []
    out.append("{\n")
    out.append('  "features": [\n')
    for i, feature in enumerate(features):
        _write_feature(feature, out, i == len(features) - 1)
    out.append("  ],\n")
    out.append('  "type": "FeatureCollection"\n')
    out.append("}\n")
    return "".join(out)


def write_compact_geojson(features, filename: str) -> None:
    with open(filename, "w") as f:
        f.write(feature_collection_string(features))


def convert_to_feature(mp, op_tag: str | None = None) -> dict:
    """MultiPolygon → GeoJSON Feature dict, tagged with its operation
    (reference tests/src/helper.rs:154-173)."""
    props = {} if op_tag is None else {"operation": op_tag}
    return {
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [
                [[[float(x), float(y)] for (x, y) in ring] for ring in poly]
                for poly in mp
            ],
        },
        "properties": props,
        "type": "Feature",
    }
