"""Optional per-kernel debug dump — analog of the reference's
`debug-booleanop` feature (reference lib/src/boolean/sweep_event.rs:257-286
JSON trace + subdivide_segments.rs:28-31 debug.csv): the processed sweep
events with their computed flags, as an Arrow table suitable for
writing/inspection.  Diagnostic only; not on any hot path."""

from __future__ import annotations

import pyarrow as pa

from .boolean_op import OPERATIONS
from .subdivide import fill_queue, subdivide

_TRANS_NAMES = {0: "None", 1: "InOut", 2: "OutIn"}
_EDGE_NAMES = {0: "Normal", 1: "NonContributing", 2: "SameTransition", 3: "DifferentTransition"}


def sweep_trace(subject, clipping, operation) -> pa.Table:
    """Run the sweep for one pair and dump the processed events in
    sweep order (x-sorted, as subdivide returns them)."""
    if operation not in OPERATIONS:
        raise ValueError(f"unknown operation: {operation!r}")
    queue, sbbox, cbbox = fill_queue(subject, clipping, operation)
    events = subdivide(queue, sbbox, cbbox, operation)
    cols = {
        "x": [], "y": [], "other_x": [], "other_y": [],
        "left": [], "is_subject": [], "contour_id": [],
        "in_out": [], "other_in_out": [], "edge_type": [],
        "result_transition": [],
    }
    for e in events:
        other = e.other_event
        cols["x"].append(e.point[0])
        cols["y"].append(e.point[1])
        cols["other_x"].append(other.point[0] if other else None)
        cols["other_y"].append(other.point[1] if other else None)
        cols["left"].append(bool(e.left))
        cols["is_subject"].append(bool(e.is_subject))
        cols["contour_id"].append(int(e.contour_id))
        cols["in_out"].append(bool(e.in_out))
        cols["other_in_out"].append(bool(e.other_in_out))
        cols["edge_type"].append(_EDGE_NAMES[e.edge_type])
        cols["result_transition"].append(_TRANS_NAMES[e.result_transition])
    return pa.table(
        {
            "x": pa.array(cols["x"], pa.float64()),
            "y": pa.array(cols["y"], pa.float64()),
            "other_x": pa.array(cols["other_x"], pa.float64()),
            "other_y": pa.array(cols["other_y"], pa.float64()),
            "left": pa.array(cols["left"]),
            "is_subject": pa.array(cols["is_subject"]),
            "contour_id": pa.array(cols["contour_id"], pa.int64()),
            "in_out": pa.array(cols["in_out"]),
            "other_in_out": pa.array(cols["other_in_out"]),
            "edge_type": pa.array(cols["edge_type"], pa.string()),
            "result_transition": pa.array(cols["result_transition"], pa.string()),
        }
    )
