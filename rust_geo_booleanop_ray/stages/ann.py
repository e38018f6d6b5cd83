"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (ray.put once; each batch task reads the same
object), per-batch partial top-k, then a tiny groupby(query) merge.
Scale path: sign-LSH bucketing (stages/dedup.EmbeddingLshBucket) —
probe only matching buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _embedding_matrix(batch_col) -> np.ndarray:
    emb = batch_col
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(emb), -1)


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against broadcast queries.

    ``queries`` is a ray.ObjectRef to (query_ids: int64[Q],
    matrix: float64[Q, D]) or the plain tuple.  Emits per-batch partial
    candidates (query_id, vec_id, cosine) — merge with TopKPerQuery.
    """

    def __init__(self, queries, k: int, exclude_self: bool = False):
        try:
            import ray

            if isinstance(queries, ray.ObjectRef):
                queries = ray.get(queries)
        except ImportError:
            pass
        self.query_ids, qmat = queries
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qunit = qmat / np.maximum(qnorm, 1e-12)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _embedding_matrix(batch["embedding"]).astype(np.float64)
        ids = batch["vec_id"].to_numpy()
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = self.qunit @ unit.T  # (Q, n)
        if self.exclude_self:
            sims = np.where(
                np.asarray(self.query_ids)[:, None] == ids[None, :], -np.inf, sims
            )
        k = min(self.k, sims.shape[1])
        # deterministic tie-break (-cosine, vec_id) — argpartition keeps
        # an arbitrary subset of tied candidates at the k boundary
        part = np.empty((sims.shape[0], k), dtype=np.int64)
        for r in range(sims.shape[0]):
            part[r] = np.lexsort((ids, -sims[r]))[:k]
        q_idx = np.repeat(np.arange(sims.shape[0]), k)
        v_idx = part.ravel()
        vals = sims[q_idx, v_idx]
        keep = np.isfinite(vals)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(self.query_ids)[q_idx[keep]], pa.int64()),
                "vec_id": pa.array(ids[v_idx[keep]], pa.int64()),
                "cosine": pa.array(vals[keep].astype(np.float64)),
            }
        )


class TopKPerQuery:
    """map_groups fn: merge partial candidates → global top-k.

    Deterministic tie-break: (-cosine, vec_id)."""

    def __init__(self, k: int):
        self.k = k
        self.__name__ = type(self).__name__

    def __call__(self, group: pa.Table) -> pa.Table:
        # Arrow-native merge: dedup by vec_id (duplicate candidates
        # carry equal cosines), lexsort (-cosine, vec_id), head k
        vid = group["vec_id"].to_numpy()
        cos = group["cosine"].to_numpy()
        uniq, first = np.unique(vid, return_index=True)
        order = np.lexsort((uniq, -cos[first]))[: self.k]
        take = pa.array(first[order].astype(np.int64))
        out = group.take(take)
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )


def brute_force_topk(embeddings_ds, queries, k: int):
    """Assemble the two-stage ANN baseline over a Dataset with
    (vec_id, embedding)."""
    cands = embeddings_ds.map_batches(
        BruteForceTopK(queries, k), batch_format="pyarrow"
    )
    return cands.groupby("query_id").map_groups(
        TopKPerQuery(k), batch_format="pyarrow"
    )


def lsh_bucketed_topk(embeddings_ds, queries, k: int, dim: int = 64, n_bits: int = 8, seed: int = 13):
    """Scale-path ANN: probe only rows sharing the query's LSH bucket.

    PARTITIONING ASSUMPTION: recall is bounded by bucket collision
    probability; n_bits trades recall for candidate volume.  Exactness
    is NOT guaranteed — this is the approximate path; use
    brute_force_topk as ground truth.
    """
    from .dedup import EmbeddingLshBucket

    bucketer = EmbeddingLshBucket(dim=dim, n_bits=n_bits, seed=seed)
    query_ids, qmat = queries
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qbits = (qnorm @ bucketer.planes) > 0
    qbucket = np.zeros(len(query_ids), dtype=np.int64)
    for b in range(qbits.shape[1]):
        qbucket |= qbits[:, b].astype(np.int64) << b
    by_bucket: dict = {}
    for qi, qb in enumerate(qbucket):
        by_bucket.setdefault(int(qb), []).append(qi)

    def probe(batch: pa.Table) -> pa.Table:
        bucketed = bucketer(batch)
        buckets = bucketed["bucket"].to_numpy()
        vecs = _embedding_matrix(bucketed["embedding"]).astype(np.float64)
        ids = bucketed["vec_id"].to_numpy()
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        qid_arr = np.asarray(query_ids)
        out_q, out_v, out_s = [], [], []
        for qb, q_idxs in by_bucket.items():
            mask = buckets == qb
            if not mask.any():
                continue
            sims = qnorm[q_idxs] @ unit[mask].T
            sub_ids = ids[mask]
            # vectorized assembly: repeat/tile, no per-candidate loop
            out_q.append(np.repeat(qid_arr[q_idxs], len(sub_ids)))
            out_v.append(np.tile(sub_ids, len(q_idxs)))
            out_s.append(sims.ravel())
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cands = embeddings_ds.map_batches(probe, batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(
        TopKPerQuery(k), batch_format="pyarrow"
    )


def ivf_fixed_centroids(n_centroids: int = 16, dim: int = 64, seed: int = 29) -> np.ndarray:
    """Pretrained-centroid stand-in that makes IVF fully deterministic
    and SQL-mirrorable: Rademacher ±1 rows (splitmix64 signs).  All
    rows share the same norm (√dim), so nearest-centroid assignment of
    a unit vector equals argmax of the raw signed coordinate sums —
    the form an oracle can inline as literal sign expressions.  Real
    k-means training (train_ivf_centroids) remains the scale path,
    pinned by the recall test."""
    from .dedup import rademacher_planes

    return rademacher_planes(dim, n_centroids, seed).T.copy()


def train_ivf_centroids(matrix: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side SAMPLE (at 100 TB
    you train on ~1M sampled rows, never the full table).  Returns unit
    centroids (n_centroids, D)."""
    rng = np.random.default_rng(seed)
    unit = matrix / np.maximum(np.linalg.norm(matrix, axis=1, keepdims=True), 1e-12)
    cent = unit[rng.choice(len(unit), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ cent.T, axis=1)
        for c in range(n_centroids):
            members = unit[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(embeddings_ds, queries, k: int, centroids: np.ndarray, nprobe: int = 4):
    """IVF ANN: rows are bucketed by nearest centroid (the inverted
    lists); each query probes only its ``nprobe`` nearest lists.

    PARTITIONING ASSUMPTION: recall bounded by nprobe/n_centroids (the
    standard IVF trade); brute_force_topk is the ground truth.  The
    centroid matrix is broadcast once (small); assignment and probing
    are numpy matmuls inside map_batches."""
    query_ids, qmat = queries
    qunit = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qsims = qunit @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probed = np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]
    by_centroid: dict = {}
    for qi in range(len(query_ids)):
        for c in probed[qi]:
            by_centroid.setdefault(int(c), []).append(qi)

    import ray

    cent_ref = ray.put(centroids)

    def probe(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vecs = _embedding_matrix(batch["embedding"]).astype(np.float64)
        ids = batch["vec_id"].to_numpy()
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(unit @ cent.T, axis=1)
        qid_arr = np.asarray(query_ids)
        out_q, out_v, out_s = [], [], []
        for c, q_idxs in by_centroid.items():
            mask = assign == c
            if not mask.any():
                continue
            sims = qunit[q_idxs] @ unit[mask].T
            sub_ids = ids[mask]
            out_q.append(np.repeat(qid_arr[q_idxs], len(sub_ids)))
            out_v.append(np.tile(sub_ids, len(q_idxs)))
            out_s.append(sims.ravel())
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cands = embeddings_ds.map_batches(probe, batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(
        TopKPerQuery(k), batch_format="pyarrow"
    )


# ------------------------------------------------------------------ PQ


def pq_fixed_codebooks(
    m: int = 4, n_centroids: int = 16, dim: int = 64, seed: int = 37
) -> np.ndarray:
    """Deterministic (m, K, dim//m) ±1 codebooks — the pretrained-
    codebook stand-in that makes product quantization SQL-mirrorable
    (same trick as ivf_fixed_centroids): every centroid of a subspace
    shares the norm √(dim/m), so nearest-centroid assignment reduces
    to argmax of signed coordinate sums.  Real per-subspace k-means
    (pq_train) remains the scale path, pinned by the recall test."""
    from .dedup import rademacher_planes

    sub = dim // m
    return np.stack(
        [rademacher_planes(sub, n_centroids, seed + s).T.copy() for s in range(m)]
    )


def pq_train(
    matrix: np.ndarray, m: int = 4, n_centroids: int = 16, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Per-subspace k-means on a driver-side SAMPLE (at 10^12 vectors
    you train codebooks on ~1M sampled rows, never the full table)."""
    n, dim = matrix.shape
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_centroids, sub))
    for s in range(m):
        X = matrix[:, s * sub : (s + 1) * sub]
        cent = X[rng.choice(n, size=n_centroids, replace=False)].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_centroids):
                members = X[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_encode(vecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Vectors → (n, m) centroid codes.  With equal-norm (±1)
    codebooks argmin-distance == argmax of the signed sums; first
    max wins (numpy argmax semantics, mirrored by list_position)."""
    n, dim = vecs.shape
    m, k, sub = codebooks.shape
    X = vecs.reshape(n, m, sub)
    scores = np.einsum("nms,mks->nmk", X, codebooks)
    return np.argmax(scores, axis=2)


def pq_topk(embeddings_ds, queries, k: int, codebooks: np.ndarray):
    """Product-quantization ANN (the 10^12-vector scale path): each
    vector is compressed to m small centroid codes INSIDE map_batches
    (64 floats → m bytes on the wire at scale); queries rank candidates
    by asymmetric-distance lookups (ADC) into an m×K table of exact
    query-centroid dot products.  With equal-norm codebooks, ADC
    ordering by approximate distance equals descending Σ_s ⟨q_s,
    C_s[code_s]⟩ — the form the SQL oracle replays.

    PARTITIONING ASSUMPTION: none — one streaming pass over the
    vectors plus the standard tiny per-query merge; codebooks + LUTs
    broadcast once via ray.put."""
    import ray

    query_ids, qmat = queries
    m, K, sub = codebooks.shape
    Q = qmat.reshape(len(query_ids), m, sub)
    lut = np.einsum("qms,mks->qmk", Q, codebooks)  # (Q, m, K)
    lut_ref = ray.put(lut)
    books_ref = ray.put(codebooks)
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def encode_score(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        tbl = ray.get(lut_ref)
        vecs = _embedding_matrix(batch["embedding"]).astype(np.float64)
        ids = batch["vec_id"].to_numpy()
        codes = pq_encode(vecs, books)  # (n, m)
        scores = np.zeros((len(qid_arr), len(ids)))
        for s in range(books.shape[0]):
            scores += tbl[:, s, codes[:, s]]
        # partial top-k per query before the exchange
        kk = min(k, len(ids))
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(qid_arr, kk)
        out_v = ids[part.ravel()]
        out_s = np.take_along_axis(scores, part, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    cands = embeddings_ds.map_batches(encode_score, batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(
        TopKPerQuery(k), batch_format="pyarrow"
    )


class ShortlistRerank:
    """map_batches stage for two-stage retrieval: exact cosine scoring
    restricted to each query's candidate shortlist (ids produced by a
    cheap first stage — PQ/IVF/LSH).  The corpus streams through ONCE;
    per query, a sorted-array membership check (searchsorted, no Python
    set) selects only shortlisted rows before any distance work.
    Output is ≤ Σ|shortlist| rows total — k-bounded regardless of
    corpus size — so the downstream merge is trivially small."""

    def __init__(self, queries, shortlists: dict):
        try:
            import ray

            if isinstance(queries, ray.ObjectRef):
                queries = ray.get(queries)
        except ImportError:
            pass
        self.query_ids, qmat = queries
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qunit = qmat / np.maximum(qnorm, 1e-12)
        self.shortlists = {
            int(q): np.sort(np.asarray(v, dtype=np.int64))
            for q, v in shortlists.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        vecs = _embedding_matrix(batch["embedding"]).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(np.asarray(self.query_ids)):
            sl = self.shortlists.get(int(qid))
            if sl is None or not len(sl):
                continue
            pos = np.searchsorted(sl, ids)
            pos[pos >= len(sl)] = len(sl) - 1
            m = sl[pos] == ids
            if not m.any():
                continue
            sims = unit[m] @ self.qunit[qi]
            out_q.append(np.full(int(m.sum()), qid, dtype=np.int64))
            out_v.append(ids[m])
            out_s.append(sims)
        if not out_q:
            return pa.schema(
                [
                    pa.field("query_id", pa.int64()),
                    pa.field("vec_id", pa.int64()),
                    pa.field("cosine", pa.float64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(
                    np.concatenate(out_s).astype(np.float64), pa.float64()
                ),
            }
        )
