"""Test-case visualizer — SVG port of the reference's plotting tool.

Mirrors ``/root/reference/tests/scripts/plot_test_cases.py`` (invoked
via ``tests/src/helper.rs:180-193``): for every expected-result feature
of a fixture it renders a three-panel figure — operands A/B shaded,
result shaded, and an overlay of all three — with per-ring vertex
markers, hole-aware even-odd fills, the operation title, and the
"Swap A/B broken" badge.  This environment has no matplotlib, so the
output is standalone SVG (pure stdlib), one file per (case, op):

    python -m rust_geo_booleanop_ray.plot_cases <fixture.geojson ...> -o /tmp/plots

The same drawing entry points are importable for programmatic use
(``render_case_svgs``, ``figure_svg``).
"""

from __future__ import annotations

import argparse
import os
from xml.sax.saxutils import escape

from .sources.geojson_fixtures import FixtureCase, load_fixture

_PANEL_W = 340
_PANEL_H = 340
_MARGIN = 26
_TITLE_H = 34

_COLORS = ("#1f4fbf", "#bf1932", "#0f8a3d")  # A, B, result


def _bounds(mps):
    xs = [x for mp in mps for poly in mp for ring in poly for x, _ in ring]
    ys = [y for mp in mps for poly in mp for ring in poly for _, y in ring]
    if not xs:
        return (0.0, 0.0, 1.0, 1.0)
    minx, maxx = min(xs), max(xs)
    miny, maxy = min(ys), max(ys)
    dx = (maxx - minx) or 1.0
    dy = (maxy - miny) or 1.0
    return (minx - 0.05 * dx, miny - 0.05 * dy, maxx + 0.05 * dx, maxy + 0.05 * dy)


class _Proj:
    """World → panel pixel transform (uniform scale, y flipped)."""

    def __init__(self, bounds, ox: float):
        minx, miny, maxx, maxy = bounds
        sx = (_PANEL_W - 2 * _MARGIN) / (maxx - minx)
        sy = (_PANEL_H - 2 * _MARGIN) / (maxy - miny)
        self.s = min(sx, sy)
        self.minx, self.miny = minx, miny
        self.ox = ox

    def __call__(self, x: float, y: float):
        px = self.ox + _MARGIN + (x - self.minx) * self.s
        py = _TITLE_H + _PANEL_H - _MARGIN - (y - self.miny) * self.s
        return px, py


def _mp_elements(mp, proj, color: str, shade: bool, markers: bool = True):
    """SVG elements for one multipolygon: even-odd filled path (holes
    punch out), per-ring outlines, small vertex dots."""
    parts = []
    d = []
    for poly in mp:
        for ring in poly:
            if not ring:
                continue
            pts = [proj(x, y) for x, y in ring]
            d.append(
                "M "
                + " L ".join(f"{px:.2f} {py:.2f}" for px, py in pts)
                + " Z"
            )
    if not d:
        return parts
    path = " ".join(d)
    if shade:
        parts.append(
            f'<path d="{path}" fill="{color}" fill-opacity="0.15" '
            f'fill-rule="evenodd" stroke="none"/>'
        )
    parts.append(
        f'<path d="{path}" fill="none" stroke="{color}" stroke-width="1.2"/>'
    )
    if markers:
        dots = []
        for poly in mp:
            for ring in poly:
                for x, y in ring[:-1] if ring and ring[0] == ring[-1] else ring:
                    px, py = proj(x, y)
                    dots.append(f'<circle cx="{px:.2f}" cy="{py:.2f}" r="1.6" fill="{color}"/>')
        parts.extend(dots)
    return parts


def figure_svg(case_name: str, op_tag: str, subject, clipping, result, swap_ab_is_broken: bool = False) -> str:
    """One three-panel SVG figure: [A, B] | [result] | [overlay]."""
    width = 3 * _PANEL_W
    height = _TITLE_H + _PANEL_H
    bounds = _bounds([subject, clipping, result])
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width/2:.0f}" y="20" text-anchor="middle" '
        f'font-family="sans-serif" font-size="14">'
        f"{escape(case_name)} / {escape(op_tag)}</text>",
    ]
    if swap_ab_is_broken:
        out.append(
            f'<rect x="{width-150}" y="6" width="142" height="20" rx="6" fill="#FF3860"/>'
            f'<text x="{width-79}" y="20" text-anchor="middle" '
            f'font-family="sans-serif" font-size="11" fill="white">Swap A/B broken</text>'
        )
    panels = [
        [(subject, _COLORS[0], True), (clipping, _COLORS[1], True)],
        [(result, _COLORS[2], True)],
        [(subject, _COLORS[0], False), (clipping, _COLORS[1], False), (result, _COLORS[2], False)],
    ]
    for pi, layers in enumerate(panels):
        ox = pi * _PANEL_W
        out.append(
            f'<rect x="{ox + 2}" y="{_TITLE_H}" width="{_PANEL_W - 4}" '
            f'height="{_PANEL_H - 2}" fill="none" stroke="#cccccc"/>'
        )
        proj = _Proj(bounds, ox)
        for mp, color, shade in layers:
            out.extend(_mp_elements(mp, proj, color, shade))
    out.append("</svg>")
    return "\n".join(out)


def render_case_svgs(case: FixtureCase, out_dir: str) -> list[str]:
    """Write one SVG per expected operation of a fixture; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for exp in case.expected:
        path = os.path.join(out_dir, f"{case.name}_{exp.op_tag}.svg")
        with open(path, "w") as f:
            f.write(
                figure_svg(
                    case.name,
                    exp.op_tag,
                    case.subject,
                    case.clipping,
                    exp.result,
                    exp.swap_ab_is_broken,
                )
            )
        written.append(path)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description="Plot boolean-op test cases as SVG.")
    ap.add_argument("files", nargs="+", help="fixture GeoJSON file(s)")
    ap.add_argument("-o", "--output", default="test_case_plots", help="output directory")
    args = ap.parse_args(argv)
    for f in sorted(args.files):
        case = load_fixture(f)
        for p in render_case_svgs(case, args.output):
            print(p)


if __name__ == "__main__":
    main()
