"""In/out transition-flag propagation and result-membership predicates.

Mirrors reference lib/src/boolean/compute_fields.rs:6-104.
"""

from __future__ import annotations

from .sweep_event import (
    EDGE_DIFFERENT_TRANSITION,
    EDGE_NON_CONTRIBUTING,
    EDGE_NORMAL,
    EDGE_SAME_TRANSITION,
    TRANS_IN_OUT,
    TRANS_NONE,
    TRANS_OUT_IN,
    SweepEvent,
)

OP_INTERSECTION = "intersection"
OP_DIFFERENCE = "difference"
OP_UNION = "union"
OP_XOR = "xor"


def compute_fields(event: SweepEvent, prev: SweepEvent | None, operation: str) -> None:
    if prev is not None:
        if event.is_subject == prev.is_subject:
            event.in_out = not prev.in_out
            event.other_in_out = prev.other_in_out
        elif prev.is_vertical():
            event.in_out = not prev.other_in_out
            event.other_in_out = not prev.in_out
        else:
            event.in_out = not prev.other_in_out
            event.other_in_out = prev.in_out

        # Connect to previous in result (skip non-result / vertical prevs).
        if prev.is_in_result() and not prev.is_vertical():
            event.prev_in_result = prev
        elif prev.prev_in_result is not None:
            event.prev_in_result = prev.prev_in_result
        else:
            event.prev_in_result = None
    else:
        event.in_out = False
        event.other_in_out = True
        event.prev_in_result = None

    if not _in_result(event, operation):
        event.result_transition = TRANS_NONE
    else:
        event.result_transition = _determine_result_transition(event, operation)


def _in_result(event: SweepEvent, operation: str) -> bool:
    # reference compute_fields.rs:60-77
    et = event.edge_type
    if et == EDGE_NORMAL:
        if operation == OP_INTERSECTION:
            return not event.other_in_out
        if operation == OP_UNION:
            return event.other_in_out
        if operation == OP_DIFFERENCE:
            return (event.is_subject and event.other_in_out) or (
                not event.is_subject and not event.other_in_out
            )
        return True  # xor
    if et == EDGE_SAME_TRANSITION:
        return operation in (OP_INTERSECTION, OP_UNION)
    if et == EDGE_DIFFERENT_TRANSITION:
        return operation == OP_DIFFERENCE
    return False  # EDGE_NON_CONTRIBUTING


def _determine_result_transition(event: SweepEvent, operation: str) -> int:
    # reference compute_fields.rs:79-104
    this_in = not event.in_out
    that_in = not event.other_in_out
    if operation == OP_INTERSECTION:
        is_in = this_in and that_in
    elif operation == OP_UNION:
        is_in = this_in or that_in
    elif operation == OP_XOR:
        is_in = this_in != that_in
    else:  # difference — asymmetric on subject vs clipping
        if event.is_subject:
            is_in = this_in and not that_in
        else:
            is_in = that_in and not this_in
    return TRANS_OUT_IN if is_in else TRANS_IN_OUT
