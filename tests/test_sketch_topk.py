"""Unit tests for the grouped top-k combiner and the HLL sketch stage."""

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.stages.sketch import (
    HLL_M,
    hll_finalize_group,
    hll_partial,
)
from rust_geo_booleanop_ray.stages.topk import grouped_topk_batch, topk_select


def test_topk_select_matches_brute_force():
    rng = np.random.RandomState(7)
    g = rng.randint(0, 5, 200)
    v = rng.randint(0, 50, 200).astype(np.int64)
    tie = np.arange(200, dtype=np.int64)
    rng.shuffle(tie)
    idx, rank = topk_select(g, v, tie, 3)
    # brute force per group
    for grp in range(5):
        rows = [(int(v[i]), int(tie[i]), i) for i in np.flatnonzero(g == grp)]
        rows.sort(key=lambda r: (-r[0], r[1]))
        want = [r[2] for r in rows[:3]]
        got = [int(i) for i, gg in zip(idx, g[idx]) if gg == grp]
        assert got == want
        got_ranks = [int(r) for i, r in zip(idx, rank) if g[i] == grp]
        assert got_ranks == list(range(1, len(want) + 1))


def test_topk_combiner_is_exact():
    """top-k of per-part top-ks == global top-k (the monoid property
    the shuffle relies on)."""
    rng = np.random.RandomState(3)
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], 500).tolist()),
            "v": pa.array(rng.randint(0, 30, 500).astype(np.int64)),
            "tie": pa.array(np.random.RandomState(4).permutation(500).astype(np.int64)),
        }
    )
    whole, rank_whole = grouped_topk_batch(
        t, "g", t["v"].to_numpy(), t["tie"].to_numpy(), 4
    )
    parts = [t.slice(0, 130), t.slice(130, 170), t.slice(300)]
    partials = []
    for p in parts:
        kept, _ = grouped_topk_batch(p, "g", p["v"].to_numpy(), p["tie"].to_numpy(), 4)
        partials.append(kept)
    merged = pa.concat_tables(partials)
    re_kept, rank_re = grouped_topk_batch(
        merged, "g", merged["v"].to_numpy(), merged["tie"].to_numpy(), 4
    )
    key = lambda tbl: sorted(
        zip(
            tbl["g"].to_pylist(), tbl["v"].to_pylist(), tbl["tie"].to_pylist()
        )
    )
    assert key(re_kept) == key(whole)


def _finalize(partials, group_col="g"):
    merged = pa.concat_tables(partials)
    return hll_finalize_group(merged, group_col)


def test_hll_estimate_accuracy_and_merge():
    """Sketch estimate lands within the expected HLL error band
    (~1.04/sqrt(64) ≈ 13% rse) and merging partials == one-shot."""
    n = 20000
    keys = np.arange(n, dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "g": pa.array(["x"] * n)})
    one_shot = _finalize([hll_partial(t, "k", "g")])
    split = _finalize(
        [hll_partial(t.slice(0, 7000), "k", "g"),
         hll_partial(t.slice(7000, 9000), "k", "g"),
         hll_partial(t.slice(16000), "k", "g")]
    )
    assert one_shot.to_pydict() == split.to_pydict()
    est = one_shot["est_distinct"][0].as_py()
    assert abs(est - n) / n < 0.35  # 64 registers -> sigma ~13%
    # duplicates must not move the sketch at all
    dup = pa.concat_tables([t, t, t.slice(0, 5000)])
    dup_res = _finalize([hll_partial(dup, "k", "g")])
    assert dup_res.to_pydict() == one_shot.to_pydict()


def test_hll_register_width():
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "g": pa.array(["a"] * 3)})
    part = hll_partial(t, "k", "g")
    assert part["hll_regs"].type == pa.list_(pa.uint8(), HLL_M)
    assert part.num_rows == 1
