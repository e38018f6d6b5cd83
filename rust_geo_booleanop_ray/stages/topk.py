"""Grouped top-k: the k best rows PER GROUP, with a per-batch combiner.

Global top-k (``ds.sort().limit()``) is already a catalog op; per-group
top-k is the engine addition a training-data pipeline needs (best k
captions per image cluster, k highest-quality docs per source, ...).

Scale shape: top-k under a total order is a monoid — the top-k of a
union is the top-k of the concatenated per-part top-ks — so each
map_batches task keeps at most k rows per group seen in its own batch
and only O(batches x groups x k) rows enter the groupby shuffle; the
per-group finalizer re-ranks the survivors.  Skewed groups therefore
cost the exchange nothing: a billion-row group still ships k rows per
batch.

Ordering is (value DESC, tie ASC) — the tie column must be unique per
row (a key) so the result set is deterministic and oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run_positions(sorted_keys: np.ndarray) -> np.ndarray:
    """Position of each element within its run of equal adjacent keys."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    return np.arange(n) - starts[run_id]


def topk_select(
    group_codes: np.ndarray,
    value: np.ndarray,
    tie: np.ndarray,
    k: int,
    smallest: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-group top-k over parallel arrays.

    group_codes: any orderable dtype (dictionary indices are fine — the
    order of groups is irrelevant, only run adjacency matters).
    value: larger is better (any orderable dtype when ``smallest``;
    int64 otherwise — the descending pass negates).  tie: int64,
    smaller wins.  ``smallest=True`` keeps the k SMALLEST values
    instead, without negation — safe for uint64 hash ranks.
    Returns (row_indices, rank_1_based) for the kept rows.
    """
    order = np.lexsort((tie, value if smallest else -value, group_codes))
    pos = _run_positions(group_codes[order])
    sel = pos < k
    return order[sel], (pos[sel] + 1).astype(np.int64)


def grouped_topk_batch(
    batch: pa.Table,
    group_col: str,
    value: np.ndarray,
    tie: np.ndarray,
    k: int,
    smallest: bool = False,
) -> tuple[pa.Table, np.ndarray]:
    """Apply topk_select to an Arrow batch; returns the filtered batch
    (original columns) and the rank array, in rank order per group."""
    gcol = batch[group_col]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    codes = np.asarray(gcol.dictionary_encode().indices)
    keep, rank = topk_select(codes, value, tie, k, smallest=smallest)
    return batch.take(pa.array(keep)), rank
