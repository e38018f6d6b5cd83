"""Distributed linear-algebra aggregates over embedding columns.

The covariance / Gram-matrix scale shape a training-data pipeline
needs before PCA or whitening: each block folds its (n, d) embedding
slab into one d x d partial product, Ray's aggregate tree-reduce SUMS
the partials (matrix addition is associative and commutative), and
the driver receives a single d x d grid regardless of input size —
the same fixed-size-state contract as the sketches in sketch.py.

Embeddings are quantized half-up at three decimals before the
product, so every Gram entry is an exact int64 and the DuckDB oracle
can mirror the whole computation (list_transform quantize, then
SUM(qv[i] * qv[j]) over the dimension cross product).

No reference analogue: the reference's only aggregation is the
per-call bbox fold (/root/reference/lib/src/boolean/fill_queue.rs:
77-80); this is engine-native functionality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GRAM_QUANT = 1000  # half-up fixed-point scale: q = floor(x*1000 + 0.5)


def quantize_embeddings(col) -> np.ndarray:
    """(n, d) int64 fixed-point matrix from a list<float> column.

    float32 -> float64 first (exact), then the same half-up
    expression the SQL mirror uses: floor(x * 1000 + 0.5)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    v = flat.reshape(len(arr), -1)
    return np.floor(v * float(GRAM_QUANT) + 0.5).astype(np.int64)


def build_gram(ds, col: str, dim: int) -> np.ndarray:
    """Distributed d x d Gram matrix  G = sum_rows q q^T  (int64).

    One (dim, dim) int64 partial per block into the tree-reduce; the
    driver pull is dim^2 * 8 bytes (32 KiB at d=64) independent of
    row count — at 100 TB this is the only viable covariance shape."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(state: np.ndarray, block) -> np.ndarray:
        t = pa.table(block) if not isinstance(block, pa.Table) else block
        q = quantize_embeddings(t[col])
        return state + q.T @ q

    agg = AggregateFn(
        init=lambda _: np.zeros((dim, dim), dtype=np.int64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: a + b,
        name="gram",
    )
    return ds.aggregate(agg)["gram"]


def build_dim_stats(ds, col: str, dim: int) -> dict:
    """Distributed per-dimension profile of an embedding column:
    (sum, min, max) over each of the d dimensions, in quantized int64.

    Same fixed-size-state contract as build_gram: each block folds its
    (n, d) slab into three length-d vectors, the tree-reduce combines
    them (sum add / min min / max max — all associative+commutative),
    and the driver receives 3·d int64 regardless of row count.  This
    is the feature-profiling pass (normalization constants, clip
    ranges, dead-dimension detection) before training."""
    from ray.data.aggregate import AggregateFn

    # state rows: 0 = sum, 1 = min, 2 = max (one ndarray — Ray's
    # aggregate plumbing preserves a single array state end-to-end,
    # like build_gram's (d, d) grid)
    def init(_):
        s = np.empty((3, dim), dtype=np.int64)
        s[0] = 0
        s[1] = np.iinfo(np.int64).max
        s[2] = np.iinfo(np.int64).min
        return s

    def accumulate_block(state, block):
        t = pa.table(block) if not isinstance(block, pa.Table) else block
        q = quantize_embeddings(t[col])
        if len(q) == 0:  # empty block: min/max(axis=0) would raise
            return state
        out = state.copy()
        out[0] += q.sum(axis=0)
        out[1] = np.minimum(out[1], q.min(axis=0))
        out[2] = np.maximum(out[2], q.max(axis=0))
        return out

    def merge(a, b):
        out = np.empty_like(a)
        out[0] = a[0] + b[0]
        out[1] = np.minimum(a[1], b[1])
        out[2] = np.maximum(a[2], b[2])
        return out

    agg = AggregateFn(
        init=init, accumulate_block=accumulate_block, merge=merge, name="dim_stats"
    )
    st = ds.aggregate(agg)["dim_stats"]
    return {"sum": st[0], "min": st[1], "max": st[2]}


def kmeans_iterate(ds, col: str, dim: int, k: int, init: np.ndarray, iters: int):
    """Distributed k-means on QUANTIZED integer embeddings: per
    iteration one streamed pass — each block computes exact int64 L2²
    assignments against the broadcast centroids and folds to a
    (k, 1+dim) partial (count + per-dim sums); a Sum tree-reduce
    brings k·(1+dim) ints to the driver, which updates centroids with
    TRUNCATING integer division (sign-preserved — DuckDB's `//`
    truncates toward zero, so the oracle replays every op).  Empty
    clusters keep their previous centroid.  Returns the final
    centroids; assignment against them is one more streamed pass."""
    import ray
    from ray.data.aggregate import AggregateFn

    cent = init.astype(np.int64).copy()
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def accumulate_block(state: np.ndarray, block, _ref=cent_ref) -> np.ndarray:
            t = pa.table(block) if not isinstance(block, pa.Table) else block
            c = ray.get(_ref)
            q = quantize_embeddings(t[col])
            if len(q) == 0:
                return state
            d2 = (
                (q * q).sum(axis=1, keepdims=True)
                - 2 * (q @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            out = state.copy()
            np.add.at(out[:, 0], assign, 1)
            np.add.at(out[:, 1:], assign, q)
            return out

        # one (k, 1+d) int64 grid per block, tree-reduced by + — the
        # build_gram contract; never a per-column Sum exchange
        grid = ds.aggregate(
            AggregateFn(
                init=lambda _: np.zeros((k, 1 + dim), dtype=np.int64),
                accumulate_block=accumulate_block,
                merge=lambda a, b: a + b,
                name="kmeans",
            )
        )["kmeans"]
        new = cent.copy()
        for c in range(k):
            n = int(grid[c, 0])
            if n == 0:
                continue
            s = grid[c, 1:]
            new[c] = np.where(s < 0, -((-s) // n), s // n)
        cent = new
    return cent


def kmeans_assign_summary(ds, col: str, centroids: np.ndarray):
    """Final streamed assignment pass → per-cluster (n_members,
    centroid L1 norm) summary table."""
    import ray
    from ray.data.aggregate import Sum

    k = len(centroids)
    cent_ref = ray.put(centroids.astype(np.int64))

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        q = quantize_embeddings(b[col])
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        cnt = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "n_members": pa.array(cnt),
            }
        )

    norms = np.abs(centroids.astype(np.int64)).sum(axis=1)

    def attach(b: pa.Table) -> pa.Table:
        cl = b["cluster"].to_numpy()
        return b.append_column("c_norm1", pa.array(norms[cl], pa.int64()))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n_members", alias_name="n_members"))
        .map_batches(attach, batch_format="pyarrow")
    )
