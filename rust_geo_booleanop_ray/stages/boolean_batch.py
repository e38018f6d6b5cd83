"""Boolean ops as stateless Ray Data batch kernels.

The reference's unit of work is one polygon pair per call
(lib/src/boolean/mod.rs:88); here the unit is an Arrow batch of pairs —
rows are independent, so parallelism is across rows/batches and the
sweep stays sequential per row.  The batch-level vectorized bbox
prefilter reproduces the reference's disjoint short-circuit
(mod.rs:106-109) across the whole batch at once (numpy on the offset
buffers, no per-row Python until a pair actually overlaps).

Usage:
    ds.map_batches(BooleanOpBatch("intersection"), batch_format="pyarrow")
    ds.map_batches(BooleanOpBatch(op_column="op"), batch_format="pyarrow")
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.convex_clip import clip_convex_ring_to_rect, is_single_convex_ring
from ..geom import OPERATIONS, boolean_op, trivial_result
from ..sources.arrow_geom import (
    MULTIPOLYGON_T,
    arrow_mp_bounds,
    arrow_to_mps,
    mps_to_arrow,
)


def _axis_rect(mp):
    """(x0, y0, x1, y1) if mp is a single axis-aligned rectangle ring,
    else None."""
    if len(mp) != 1 or len(mp[0]) != 1:
        return None
    ring = mp[0][0]
    if len(ring) != 5 or ring[0] != ring[4]:
        return None
    xs = {p[0] for p in ring}
    ys = {p[1] for p in ring}
    if len(xs) != 2 or len(ys) != 2:
        return None
    for k in range(4):
        if ring[k][0] != ring[k + 1][0] and ring[k][1] != ring[k + 1][1]:
            return None
    return min(xs), min(ys), max(xs), max(ys)


class BooleanOpBatch:
    """Callable batch kernel: subject × clipping → result multipolygon.

    Stateless — safe as a plain map_batches function (Ray task pool).
    ``operation`` fixes one op for the whole stage; ``op_column`` reads a
    per-row op tag instead.
    """

    def __init__(
        self,
        operation: str | None = None,
        op_column: str | None = None,
        subject_col: str = "subject",
        clipping_col: str = "clipping",
        result_col: str = "result",
        mode: str = "exact",
        on_error: str = "raise",
    ):
        if (operation is None) == (op_column is None):
            raise ValueError("exactly one of operation / op_column required")
        if operation is not None and operation not in OPERATIONS:
            raise ValueError(f"unknown operation: {operation!r}")
        if mode not in ("exact", "auto"):
            raise ValueError(mode)
        if on_error not in ("raise", "null"):
            raise ValueError(on_error)
        # on_error='null': poison-pill isolation — a degenerate geometry
        # yields a null result + error string instead of failing the
        # whole task/partition (at 100 TB one bad row must not kill a
        # block; Ray would otherwise retry the task against the same
        # deterministic failure).
        self.on_error = on_error
        self.operation = operation
        self.op_column = op_column
        self.subject_col = subject_col
        self.clipping_col = clipping_col
        self.result_col = result_col
        # mode='auto': in the PYTHON fallback path, route convex-subject
        # ∩ axis-rect-clipping rows through Sutherland–Hodgman (exact
        # for that input class) and keep the Martinez sweep for the
        # rest.  With the native batch kernel available the whole batch
        # goes through one C call regardless of mode (it is faster than
        # the per-row convex path and produces canonical Martinez
        # output).  mode='exact' documents call sites that REQUIRE
        # bit-for-bit golden vertex order (the fixture suite).
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj_arr = batch[self.subject_col]
        clip_arr = batch[self.clipping_col]

        # Whole-batch native path: one C call over the Arrow offset
        # chains (zero per-row Python; bbox short-circuit happens
        # inside).  Skipped in on_error='null' mode (poison-pill needs
        # per-row isolation) and when a column has nulls.
        if self.on_error == "raise":
            from ..native import native_boolean_batch

            if self.op_column is not None:
                ops = batch[self.op_column].to_pylist()
            else:
                ops = [self.operation] * batch.num_rows
            res_arr = native_boolean_batch(subj_arr, clip_arr, ops)
            if res_arr is not None:
                return batch.append_column(
                    pa.field(self.result_col, MULTIPOLYGON_T), res_arr
                )

        # Vectorized disjoint-bbox prefilter (trivial result, no sweep).
        sb = arrow_mp_bounds(subj_arr)
        cb = arrow_mp_bounds(clip_arr)
        disjoint = (
            (sb["minx"] > cb["maxx"])
            | (cb["minx"] > sb["maxx"])
            | (sb["miny"] > cb["maxy"])
            | (cb["miny"] > sb["maxy"])
        )

        subjects = arrow_to_mps(subj_arr)
        clippings = arrow_to_mps(clip_arr)
        if self.op_column is not None:
            ops = batch[self.op_column].to_pylist()
        else:
            ops = [self.operation] * len(subjects)

        results = []
        errors = []
        for i, (s, c, op) in enumerate(zip(subjects, clippings, ops)):
            try:
                if s is None or c is None:
                    results.append(None)
                elif disjoint[i]:
                    results.append(trivial_result(s, c, op))
                elif self.mode == "auto" and op == "intersection":
                    rect = _axis_rect(c)
                    if rect is not None and is_single_convex_ring(s):
                        ring = clip_convex_ring_to_rect(s[0][0], *rect)
                        results.append([] if ring is None else [[ring]])
                    else:
                        results.append(boolean_op(s, c, op))
                else:
                    results.append(boolean_op(s, c, op))
                errors.append(None)
            except Exception as exc:  # noqa: BLE001 — poison-pill isolation
                if self.on_error == "raise":
                    raise
                results.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")

        out = batch.append_column(
            pa.field(self.result_col, MULTIPOLYGON_T), mps_to_arrow(results)
        )
        if self.on_error == "null":
            out = out.append_column(
                pa.field(self.result_col + "_error", pa.string()),
                pa.array(errors, pa.string()),
            )
        return out
