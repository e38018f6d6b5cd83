"""Sweep events, the queue comparator and a Rust-BinaryHeap-faithful heap.

Semantics mirror reference lib/src/boolean/sweep_event.rs (event model and
the inverted ``Ord`` at sweep_event.rs:220-255) and the ``BinaryHeap``
pop order the reference relies on.  Because the reference's comparator is
not antisymmetric for fully-tied events, bit-for-bit output parity
requires replicating the exact heap sift algorithm (std::collections::
BinaryHeap push/pop), not just the comparator — hence ``EventHeap``.

Points are (x, y) float tuples.  Events are mutable Python objects with
identity semantics (the Rust code shares them via Rc and compares by
pointer where identity matters).
"""

from __future__ import annotations

from .predicates import signed_area

# EdgeType (reference sweep_event.rs:10-16)
EDGE_NORMAL = 0
EDGE_NON_CONTRIBUTING = 1
EDGE_SAME_TRANSITION = 2
EDGE_DIFFERENT_TRANSITION = 3

# ResultTransition (reference sweep_event.rs:18-23)
TRANS_NONE = 0
TRANS_IN_OUT = 1
TRANS_OUT_IN = 2


class SweepEvent:
    __slots__ = (
        "contour_id",
        "point",
        "is_subject",
        "is_exterior_ring",
        "left",
        "other_event",
        "prev_in_result",
        "edge_type",
        "in_out",
        "other_in_out",
        "result_transition",
        "other_pos",
        "output_contour_id",
    )

    def __init__(self, contour_id, point, left, other_event, is_subject, is_exterior_ring):
        self.contour_id = contour_id
        self.point = point
        self.is_subject = is_subject
        self.is_exterior_ring = is_exterior_ring
        self.left = left
        self.other_event = other_event  # SweepEvent | None (Rust: Weak)
        self.prev_in_result = None
        self.edge_type = EDGE_NORMAL
        self.in_out = False
        self.other_in_out = False
        self.result_transition = TRANS_NONE
        self.other_pos = 0
        self.output_contour_id = -1

    # --- queries (reference sweep_event.rs:163-194) ---

    def is_in_result(self) -> bool:
        return self.result_transition != TRANS_NONE

    def is_below(self, p) -> bool:
        other = self.other_event
        if other is None:
            return False
        if self.left:
            return signed_area(self.point, other.point, p) > 0.0
        return signed_area(other.point, self.point, p) > 0.0

    def is_above(self, p) -> bool:
        return not self.is_below(p)

    def is_vertical(self) -> bool:
        other = self.other_event
        return other is not None and self.point[0] == other.point[0]

    def is_before(self, other: "SweepEvent") -> bool:
        return event_cmp(self, other) > 0

    def is_after(self, other: "SweepEvent") -> bool:
        return event_cmp(self, other) < 0

    def __repr__(self):  # debug aid only
        return (
            f"SweepEvent(p={self.point}, {'L' if self.left else 'R'}, "
            f"{'A' if self.is_subject else 'B'}, c={self.contour_id})"
        )


def event_cmp(e1: SweepEvent, e2: SweepEvent) -> int:
    """Exact port of the reference's inverted Ord (sweep_event.rs:224-255).

    Returns -1 ("Less") / +1 ("Greater"); Greater ⇔ e1 pops earlier from the
    max-heap ⇔ e1 is temporally before e2.  Never returns 0 (the reference
    comparator never yields Equal either).
    """
    p1 = e1.point
    p2 = e2.point

    if p1[0] > p2[0]:
        return -1
    if p1[0] < p2[0]:
        return 1
    if p1[1] > p2[1]:
        return -1
    if p1[1] < p2[1]:
        return 1

    if e1.left != e2.left:
        # less_if(self.is_left()): left events pop later
        return -1 if e1.left else 1

    o1 = e1.other_event
    o2 = e2.other_event
    if o1 is not None and o2 is not None:
        if signed_area(p1, o1.point, o2.point) != 0.0:
            # less_if(!self.is_below(other2.point))
            return -1 if not e1.is_below(o2.point) else 1

    # less_if(!self.is_subject && other.is_subject)
    return -1 if (not e1.is_subject and e2.is_subject) else 1


class EventHeap:
    """Max-heap replicating Rust std::collections::BinaryHeap sift order.

    Pops the 'greatest' element under ``event_cmp`` — with the inverted
    comparator that is the temporally-first event.  push = append +
    sift_up; pop = swap root/tail + sift_down_to_bottom, exactly as the
    Rust std implementation, so tie-breaking among comparator-equal
    events matches the reference bit-for-bit.
    """

    __slots__ = ("data",)

    def __init__(self):
        self.data: list[SweepEvent] = []

    def __len__(self):
        return len(self.data)

    def push(self, item: SweepEvent) -> None:
        data = self.data
        data.append(item)
        # sift_up(0, len-1)
        pos = len(data) - 1
        element = data[pos]
        while pos > 0:
            parent = (pos - 1) >> 1
            # if element <= data[parent]: break   (le == cmp is Less; cmp never Equal)
            if event_cmp(element, data[parent]) < 0:
                break
            data[pos] = data[parent]
            pos = parent
        data[pos] = element

    def pop(self) -> SweepEvent | None:
        data = self.data
        if not data:
            return None
        item = data.pop()
        if not data:
            return item
        item, data[0] = data[0], item
        self._sift_down_to_bottom(0)
        return item

    def _sift_down_to_bottom(self, pos: int) -> None:
        data = self.data
        end = len(data)
        start = pos
        element = data[pos]
        # walk down always taking the greater child, to the bottom
        child = 2 * pos + 1
        while child + 1 < end:
            # choose right child if left <= right
            if event_cmp(data[child], data[child + 1]) < 0:
                child += 1
            data[pos] = data[child]
            pos = child
            child = 2 * pos + 1
        if child == end - 1:
            data[pos] = data[child]
            pos = child
        # sift_up(start, pos)
        while pos > start:
            parent = (pos - 1) >> 1
            if event_cmp(element, data[parent]) < 0:
                break
            data[pos] = data[parent]
            pos = parent
        data[pos] = element
