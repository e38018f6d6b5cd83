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

from heapq import heappop, heappush

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
        return self.__lt__(other)

    def is_after(self, other: "SweepEvent") -> bool:
        # event_cmp never returns 0 ⇒ after ⇔ not before
        return not self.__lt__(other)

    def __lt__(self, other: "SweepEvent") -> bool:
        """True ⇔ self pops earlier (inlined event_cmp(self, other) > 0).

        This is the comparator heapq sees; CPython's heapq sift argument
        order matches Rust std BinaryHeap exactly (see EventHeap)."""
        p1 = self.point
        p2 = other.point
        x1 = p1[0]
        x2 = p2[0]
        if x1 != x2:
            return x1 < x2
        y1 = p1[1]
        y2 = p2[1]
        if y1 != y2:
            return y1 < y2
        if self.left != other.left:
            return not self.left
        o1 = self.other_event
        o2 = other.other_event
        if o1 is not None and o2 is not None:
            if signed_area(p1, o1.point, o2.point) != 0.0:
                return self.is_below(o2.point)
        return self.is_subject or not other.is_subject

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
    comparator that is the temporally-first event — so tie-breaking
    among comparator-equal events matches the reference bit-for-bit.

    Implemented on CPython's C ``heapq`` with ``SweepEvent.__lt__`` as the
    min-heap comparator (lt ⇔ pops earlier).  This is safe for parity:
    CPython's sift algorithms are operation-for-operation identical to
    Rust std's — push is append + sift-up breaking when
    ``not lt(new, parent)`` (Rust: break when cmp(element, parent) is
    Less); pop swaps in the tail and walks to the bottom choosing the
    right child when ``not lt(left, right)`` (Rust: child+1 when
    cmp(left, right) is Less), then sifts up — so even with the
    non-antisymmetric comparator every comparison has the same argument
    order and outcome, and tied events land in the same slots.
    """

    __slots__ = ("data",)

    def __init__(self):
        self.data: list[SweepEvent] = []

    def __len__(self):
        return len(self.data)

    def push(self, item: SweepEvent) -> None:
        heappush(self.data, item)

    def pop(self) -> SweepEvent | None:
        if not self.data:
            return None
        return heappop(self.data)
