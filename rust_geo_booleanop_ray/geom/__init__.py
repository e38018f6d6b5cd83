"""Pure-Python/numpy Martinez–Rueda–Feito boolean-op kernel.

Re-derivation (not a port) of the semantics of the reference engine's
core (reference repo: 21re/rust-geo-booleanop, lib/src/boolean/): exact
orientation predicates, sweep-line subdivision, in/out flag propagation
and contour assembly.  This package is Ray-free; the distributed engine
wraps it as stateless map_batches kernels (see ..stages).
"""

from .boolean_op import (
    OPERATIONS,
    boolean_op,
    difference,
    intersection,
    trivial_result,
    union,
    xor,
)
from .compute_fields import OP_DIFFERENCE, OP_INTERSECTION, OP_UNION, OP_XOR
from .predicates import nextafter, orient2d, signed_area

__all__ = [
    "OPERATIONS",
    "OP_DIFFERENCE",
    "OP_INTERSECTION",
    "OP_UNION",
    "OP_XOR",
    "boolean_op",
    "difference",
    "intersection",
    "nextafter",
    "orient2d",
    "signed_area",
    "trivial_result",
    "union",
    "xor",
]
