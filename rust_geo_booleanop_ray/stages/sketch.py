"""Mergeable distinct-count sketch (HyperLogLog-style, 64 registers).

The engine addition the reference has no analogue for (its only
aggregate is a per-call bbox accumulation, /root/reference/lib/src/
boolean/fill_queue.rs:77-80): an approximate COUNT DISTINCT whose
per-batch state is a FIXED-SIZE register vector, so the groupby
exchange moves 64 bytes per (batch, group) regardless of row count —
the canonical mergeable-sketch scale shape for 100-TB inputs.

Sketch definition (deterministic, so the DuckDB oracle can mirror it
bit-for-bit):

  h      = splitmix64(key)            (the repo-wide stable hash)
  bucket = h mod 64                   (p = 6, m = 64 registers)
  w      = h >> 6                     (58 value bits)
  rho(w) = trailing_zeros(w) + 1, or 59 when w == 0
  register[bucket] = max(rho) over the group's keys

Merging partials is an elementwise max — associative and commutative,
so per-batch pre-aggregation is exact, like a sum.  The reported
estimate uses the HLL raw formula with alpha fixed as the rational
709/1000 and the indicator sum scaled by 2^59 so every quantity is an
exact integer:

  D   = sum_j 2^(59 - register[j])          (integer, <= 64 * 2^59)
  est = floor(709 * m^2 * 2^59 / (1000 * D)), capped at 2^62

Python bigints on the engine side, HUGEINT on the SQL side — the same
integers, hence hash-exact CORRECTNESS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _POPCOUNT8
from .footprint import _splitmix64

HLL_M = 64  # registers (p = 6)
HLL_RHO_MAX = 59  # 58 value bits -> rho in 1..59
_EST_CAP = 1 << 62


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POPCOUNT8[x.view(np.uint8).reshape(x.shape + (8,))].sum(
        axis=-1, dtype=np.int64
    )


def hll_rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per hash — vectorized trailing-zero count."""
    bucket = (h & np.uint64(HLL_M - 1)).astype(np.int64)
    w = h >> np.uint64(6)
    low = w & (~w + np.uint64(1))  # lowest set bit (w & -w)
    tz = _popcount64(low - np.uint64(1))  # valid when w != 0
    rho = np.where(w == np.uint64(0), HLL_RHO_MAX, tz + 1).astype(np.int64)
    return bucket, rho


def hll_partial(
    batch: pa.Table, key_col: str, group_col: str
) -> pa.Table:
    """Per-batch combiner: one (group, registers[64]) row per distinct
    group in the batch.  Registers ride as fixed_size_list<uint8, 64>."""
    keys = batch[key_col].to_numpy().astype(np.uint64)
    bucket, rho = hll_rho(_splitmix64(keys))
    gcol = batch[group_col]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    dict_arr = gcol.dictionary_encode()
    gidx = np.asarray(dict_arr.indices)
    n_groups = len(dict_arr.dictionary)
    regs = np.zeros((n_groups, HLL_M), dtype=np.uint8)
    np.maximum.at(regs, (gidx, bucket), rho.astype(np.uint8))
    return pa.table(
        {
            group_col: dict_arr.dictionary,
            "hll_regs": pa.FixedSizeListArray.from_arrays(
                pa.array(regs.reshape(-1), pa.uint8()), HLL_M
            ),
        }
    )


def hll_finalize_group(group: pa.Table, group_col: str) -> pa.Table:
    """Final reducer for one group: elementwise-max the partial register
    vectors, emit integer-exact (n_zero, reg_sum, est_distinct)."""
    col = group["hll_regs"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    regs = np.asarray(col.flatten()).reshape(-1, HLL_M).max(axis=0)
    n_zero = int((regs == 0).sum())
    reg_sum = int(regs.sum())
    d = sum(1 << (HLL_RHO_MAX - int(r)) for r in regs)  # exact bigint
    est = min((709 * HLL_M * HLL_M << HLL_RHO_MAX) // (1000 * d), _EST_CAP)
    return pa.table(
        {
            group_col: group[group_col][:1],
            "n_zero": pa.array([n_zero], pa.int64()),
            "reg_sum": pa.array([reg_sum], pa.int64()),
            "est_distinct": pa.array([est], pa.int64()),
        }
    )


# ------------------------------------------------------- count-min sketch

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
CMS_SEED = 0x243F6A8885A308D3  # row i xors key with i * CMS_SEED


def cms_bucket(keys: np.ndarray, i: int) -> np.ndarray:
    """Row-i bucket index: splitmix64(key ^ (i * seed)) mod W."""
    k = keys.astype(np.uint64, copy=False) ^ (
        np.uint64(i) * np.uint64(CMS_SEED)
    )
    return (_splitmix64(k) % np.uint64(CMS_W)).astype(np.int64)


def build_cms(ds, key: str) -> np.ndarray:
    """Distributed count-min sketch over ``ds[key]`` (integer keys).

    Each block folds its key value-counts into a local D×W int64 grid;
    Ray's aggregate tree-reduce SUMS the grids — addition is
    associative and commutative, so the sketch is order-independent
    and therefore exactly reproducible by the SQL oracle.  The driver
    receives one 32 KiB array regardless of input size."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(state: np.ndarray, block) -> np.ndarray:
        t = pa.table(block) if not isinstance(block, pa.Table) else block
        vc = t[key].combine_chunks().value_counts()
        keys = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy().astype(np.int64)
        s = state.copy()
        for i in range(CMS_D):
            np.add.at(s[i], cms_bucket(keys, i), counts)
        return s

    agg = AggregateFn(
        init=lambda _: np.zeros((CMS_D, CMS_W), dtype=np.int64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: a + b,
        name="cms",
    )
    return ds.aggregate(agg)["cms"]


def cms_estimate(state: np.ndarray, probe_keys: np.ndarray) -> np.ndarray:
    """Point-frequency upper-bound estimates: min over rows of the
    probed bucket (the classic CM guarantee: est ≥ true, within
    eps·N with prob 1−delta)."""
    ests = np.stack(
        [state[i][cms_bucket(probe_keys, i)] for i in range(CMS_D)]
    )
    return ests.min(axis=0)


# ------------------------------------------------- histogram quantile sketch

HQ_BINS = 256


def hq_partial(batch: pa.Table, group_col: str, value: np.ndarray, bin_w: float) -> pa.Table:
    """Per-block histogram-quantile partial: fixed HQ_BINS equi-width
    bins over [0, HQ_BINS·bin_w); emits (group, bin, n) rows — ≤
    groups × 256 rows per block into the Sum exchange, independent of
    row count.  The bounded-state cousin of the exact value-histogram
    in q_group_quantiles: state never grows with distinct values, the
    trade is quantiles quantized to bin lower edges."""
    bins = np.minimum(
        np.floor(value / bin_w).astype(np.int64), HQ_BINS - 1
    )
    t = pa.table({group_col: batch[group_col], "bin": pa.array(bins)})
    agg = pa.TableGroupBy(t, [group_col, "bin"]).aggregate([([], "count_all")])
    return agg.rename_columns([group_col, "bin", "n"])


def hq_finalize_group(group: pa.Table, group_col: str, bin_w: float) -> pa.Table:
    """Per-group quantile estimates from the merged histogram: the
    lower edge (in bin_w units, exact int64) of the bin where the
    cumulative count first reaches the integer rank ceil(q·n) — the
    whole estimate is integer arithmetic, so the SQL mirror is exact."""
    bins = group["bin"].to_numpy()
    ns = group["n"].to_numpy()
    order = np.argsort(bins)
    bins, ns = bins[order], ns[order]
    cum = np.cumsum(ns)
    n_tot = int(cum[-1])
    out = {group_col: group[group_col].slice(0, 1)}
    for q_num, q_den, name in ((1, 2, "p50_lo"), (9, 10, "p90_lo")):
        rank = -(-q_num * n_tot // q_den)  # ceil(q·n) in integers
        i = int(np.searchsorted(cum, rank))
        out[name] = pa.array([int(bins[i]) * int(bin_w)], pa.int64())
    out["n_tot"] = pa.array([n_tot], pa.int64())
    return pa.table(out)
