"""Arrow geometry codec round-trip + vectorized bbox tests."""

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.sources.arrow_geom import (
    arrow_mp_bounds,
    arrow_to_mps,
    mp_bounds,
    mps_to_arrow,
    shoelace_area,
)

MPS = [
    [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]],
    [
        [
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
            [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)],
        ],
        [[(10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0), (10.0, 10.0)]],
    ],
    [],  # empty multipolygon
    [[[(-5.0, -7.0), (-4.0, -7.0), (-4.0, -6.0), (-5.0, -7.0)]]],
]


def test_round_trip():
    arr = mps_to_arrow(MPS)
    back = arrow_to_mps(arr)
    assert back == [
        [[[tuple(map(float, pt)) for pt in ring] for ring in poly] for poly in mp]
        for mp in MPS
    ]


def test_round_trip_nulls():
    arr = mps_to_arrow([MPS[0], None, MPS[3]])
    back = arrow_to_mps(arr)
    assert back[1] is None
    assert back[0] == MPS[0]


def test_bounds_vectorized_matches_scalar():
    arr = mps_to_arrow(MPS)
    b = arrow_mp_bounds(arr)
    for i, mp in enumerate(MPS):
        if not mp:
            assert b["minx"][i] == np.inf and b["maxx"][i] == -np.inf
            continue
        exp = mp_bounds(mp)
        got = (b["minx"][i], b["miny"][i], b["maxx"][i], b["maxy"][i])
        assert got == exp


def test_bounds_on_slice():
    arr = mps_to_arrow(MPS)
    sl = arr.slice(1, 2)
    b = arrow_mp_bounds(sl)
    exp = mp_bounds(MPS[1])
    assert (b["minx"][0], b["miny"][0], b["maxx"][0], b["maxy"][0]) == exp
    assert b["minx"][1] == np.inf


def test_shoelace():
    assert shoelace_area(MPS[0]) == 4.0
    # square with hole: 16 - 4 (hole by ring position) + 1
    assert shoelace_area(MPS[1]) == 13.0
    # winding-independent: holes subtract regardless of orientation
    ccw_hole = [
        [
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
            [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)],
        ]
    ]
    assert shoelace_area(ccw_hole) == 12.0


def test_arrow_mp_areas_matches_scalar_shoelace():
    """Vectorized structural areas == the scalar loop, bit-for-bit,
    including holes, multi-poly rows, empties, and sliced arrays."""
    import numpy as np
    from rust_geo_booleanop_ray.sources.arrow_geom import (
        arrow_mp_areas,
        mps_to_arrow,
        shoelace_area,
    )

    sq = [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]
    hole = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]
    tri = [[(10.0, 10.0), (13.0, 10.0), (10.0, 14.0), (10.0, 10.0)]]
    mps = [
        [sq],                       # plain square
        [[sq[0], hole]],            # square with hole
        [],                         # empty multipolygon
        [sq, tri],                  # two polygons
        [[sq[0], hole], tri],       # mixed
    ]
    arr = mps_to_arrow(mps)
    vec = arrow_mp_areas(arr)
    ref = np.array([shoelace_area(mp) for mp in mps])
    assert (vec == ref).all()
    # sliced view must not absorb trailing rings
    sl = arr.slice(1, 3)
    assert (arrow_mp_areas(sl) == ref[1:4]).all()


def test_arrow_mp_areas_position_independent():
    """A row's area must not depend on its neighbors in the buffer:
    bit-for-bit equal to the scalar shoelace on irrational-ish coords
    whether the row is alone or embedded mid-batch (regression: the
    ring-boundary cross term used to be added then subtracted back,
    rounding differently per position)."""
    import numpy as np

    from rust_geo_booleanop_ray.sources.arrow_geom import (
        arrow_mp_areas,
        mps_to_arrow,
        shoelace_area,
    )
    from rust_geo_booleanop_ray.stages.footprint import derive_footprints
    from rust_geo_booleanop_ray.sources.images import synth_image_batch
    from rust_geo_booleanop_ray.sources.arrow_geom import arrow_to_mps

    fp = derive_footprints(synth_image_batch(np.arange(25)))["footprint"]
    fp = fp.combine_chunks() if hasattr(fp, "combine_chunks") else fp
    mps = arrow_to_mps(fp)
    batch_areas = arrow_mp_areas(fp)
    for i, mp in enumerate(mps):
        solo = arrow_mp_areas(mps_to_arrow([mp]))[0]
        assert batch_areas[i] == solo, i
        assert batch_areas[i] == shoelace_area(mp), i
