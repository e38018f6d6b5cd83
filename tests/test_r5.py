"""Round-5 additions: distributed curation plans, WKB codec,
substring dedup, incremental dedup."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_corpus_curation_paths_identical(ray_session):
    """The broadcast fast path and the corpus-fraction scale path
    (bucketed semi-join + anti-join) are two physical plans of the
    SAME query — outputs must match row-for-row."""
    from rust_geo_booleanop_ray.pipelines.queries import q_corpus_curation

    fast = pa.Table.from_pylist(
        q_corpus_curation(SF, scale_path=False).take_all()
    ).sort_by("source")
    scale = pa.Table.from_pylist(
        q_corpus_curation(SF, scale_path=True).take_all()
    ).sort_by("source")
    assert fast.equals(scale)
    assert fast.num_rows > 0


def test_image_curation_no_driver_pairs(ray_session):
    """image_curation's variant collapse runs as a distributed
    anti-join; result unchanged vs an independent recompute of the
    drop logic from generator pixels at small N."""
    from rust_geo_booleanop_ray.pipelines.queries import q_image_curation
    from rust_geo_booleanop_ray.sources.images import (
        _neardup_pixels,
        _phash64,
        image_quality_keep,
        quality_stats,
    )

    N = 300
    t = pa.Table.from_pylist(q_image_curation(SF, n_images=N).take_all())
    # independent recompute: quality gate, then canonical-min pHash
    # collapse (exact popcount over all survivor pairs at this tiny N)
    keep = []
    for i in range(N):
        px = _neardup_pixels(i)
        b, _, _ = quality_stats(px)
        if image_quality_keep(b, px.size):
            keep.append((i, np.uint64(_phash64(px))))
    dropped = set()
    for ai in range(len(keep)):
        for bi in range(ai + 1, len(keep)):
            ia, ha = keep[ai]
            ib, hb = keep[bi]
            if bin(int(ha ^ hb)).count("1") <= 6:
                # banded candidates: require ≥1 equal 16-bit band
                if any(
                    (int(ha) >> (16 * k)) & 0xFFFF == (int(hb) >> (16 * k)) & 0xFFFF
                    for k in range(4)
                ):
                    dropped.add(max(ia, ib))
    expected = len(keep) - len(dropped)
    assert sum(t["n"].to_pylist()) == expected
