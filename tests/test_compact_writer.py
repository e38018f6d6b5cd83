"""Compact-GeoJSON writer parity: byte-identical to the reference's
golden writer (reference tests/src/compact_geojson.rs) and full
regenerate-the-golden round trips through the Martinez kernel."""

import glob
import json
import os
import shutil

import pytest

from rust_geo_booleanop_ray.run_fixture import run_generic_test_case
from rust_geo_booleanop_ray.sinks import feature_collection_string
from rust_geo_booleanop_ray.sources.generators import (
    generate_circles_vs_rects,
    generate_grid_polygons,
    generate_random_triangles_polygons,
)

from rust_geo_booleanop_ray.sources.fixture_pairs import DEFAULT_FIXTURE_DIR

FIXTURE_DIR = DEFAULT_FIXTURE_DIR
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.geojson")))


@pytest.mark.parametrize(
    "path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES]
)
def test_writer_byte_round_trip(path):
    """Parsing a golden file and re-serializing must be byte-identical."""
    orig = open(path).read()
    fc = json.loads(orig)
    assert feature_collection_string(fc["features"]) == orig


@pytest.mark.parametrize(
    "name", ["touching_boxes", "nested_polys1", "issue96", "xor_holes1"]
)
def test_regenerate_golden(tmp_path, name):
    """The CLI REGEN path: run the kernel on a fixture and rewrite it;
    output must equal the golden byte-for-byte (run_single_test.rs:15-38,
    generic_test_cases.rs REGEN mode)."""
    src = os.path.join(FIXTURE_DIR, f"{name}.geojson")
    dst = str(tmp_path / f"{name}.geojson")
    shutil.copy(src, dst)
    run_generic_test_case(dst)
    assert open(dst).read() == open(src).read()


def test_generators_shapes():
    """Canned benchmark datasets match the reference's documented sizes
    (data_generators.rs:125-141)."""
    a, b = generate_grid_polygons()
    assert len(a) == 961 and len(b) == 961
    a, b = generate_circles_vs_rects()
    assert len(a) == 30 and all(len(p) == 2 and len(p[0]) == 500 for p in a)
    assert len(b) == 30
    a, b = generate_random_triangles_polygons()
    assert len(a) == 10 and len(b) == 10
    # determinism
    c, _ = generate_random_triangles_polygons()
    assert a == c


def test_plot_cases_svg(tmp_path):
    """SVG visualizer (reference plot_test_cases.py port): one
    well-formed figure per expected op, panels + shaded paths present."""
    import xml.etree.ElementTree as ET

    from rust_geo_booleanop_ray.plot_cases import main as plot_main

    fixture = os.path.join(FIXTURE_DIR, "basic2_poly_with_hole.geojson")
    out = tmp_path / "plots"
    plot_main([fixture, "-o", str(out)])
    files = sorted(out.iterdir())
    assert len(files) >= 4  # one per expected operation
    for f in files:
        root = ET.parse(f).getroot()
        assert root.tag.endswith("svg")
        paths = [e for e in root.iter() if e.tag.endswith("path")]
        assert len(paths) >= 6  # shaded + outline per layer across panels
