"""Semirings and monoids as vectorized NumPy/Arrow kernels.

Re-expresses the reference's algebraic-structure layer
(``include/graphblas/ops.hpp`` 27 binary operators,
``include/graphblas/identities.hpp``, ``monoid.hpp:54``, ``semiring.hpp:186``)
as plain Python dataclasses carrying:

- a NumPy ufunc (used with ``reduceat`` for segment reductions inside spmv
  kernels, and as the element-wise combine in eWise ops),
- the identity element (``identities.hpp``: zero/one/±infinity/false/true),
- the matching Arrow ``TableGroupBy`` aggregate name and Ray
  ``groupby().aggregate`` reducer, so one semiring instance drives both the
  in-batch combiner and the wide shuffle combine.

Only structures actually used by the shipped algorithms are instantiated
(SURVEY §2.1): plus-times, min-plus, (or,and), (max,first), (min,first),
plus-first/second pattern semirings (≙ ``left_assign_if`` /
``right_assign_if``, ops.hpp:85/:141), and the scalar monoids used by
convergence checks ((or, not_equal) ≙ label.hpp:253; (add, abs_diff) ≙
simple_pagerank.hpp:433-437).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np


@dataclass(frozen=True)
class Monoid:
    """Associative+commutative combine with identity (≙ grb::Monoid)."""

    name: str
    ufunc: np.ufunc          # used elementwise and via .reduceat / .reduce
    identity: float | int | bool
    arrow_agg: str           # pyarrow TableGroupBy aggregate function name
    idempotent: bool = False  # ≙ grb::is_idempotent (type_traits.hpp)

    def reduce(self, arr: np.ndarray) -> float:
        if arr.size == 0:
            return self.identity
        return self.ufunc.reduce(arr)

    def segment_reduce(self, values: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """Reduce contiguous segments: values[starts[i]:starts[i+1]] per i."""
        if values.size == 0:
            return np.empty(0, dtype=values.dtype)
        return self.ufunc.reduceat(values, starts)


# Multiplicative "operators" for semirings: f(x_at_src, edge_weight) -> contrib.
def _mul_times(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    return x * w


def _mul_plus(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    return x + w


def _mul_first(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    # ≙ left_assign_if (ops.hpp:85): matrix value ignored — "pattern" product.
    return x


def _mul_second(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    # ≙ right_assign_if (ops.hpp:141).
    return w


def _mul_min(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    return np.minimum(x, w)


def _mul_and(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    return np.logical_and(x, w)


@dataclass(frozen=True)
class Semiring:
    """Additive monoid + multiplicative binary op (≙ grb::Semiring).

    The mul op takes ``(x_values_gathered_at_src, edge_weights)`` arrays and
    returns the per-edge contribution; the add monoid combines contributions
    per destination vertex (segment reduce in the gather kernel, groupby
    aggregate in the shuffle kernel).
    """

    name: str
    add: Monoid
    mul: Callable[[np.ndarray, np.ndarray], np.ndarray]
    mul_identity: float | int | bool = 1.0


MONOID_PLUS = Monoid("plus", np.add, 0.0, "sum")
MONOID_MIN = Monoid("min", np.minimum, np.inf, "min", idempotent=True)
MONOID_MAX = Monoid("max", np.maximum, -np.inf, "max", idempotent=True)
MONOID_OR = Monoid("lor", np.logical_or, False, "max", idempotent=True)
MONOID_AND = Monoid("land", np.logical_and, True, "min", idempotent=True)

PLUS_TIMES = Semiring("plus_times", MONOID_PLUS, _mul_times, 1.0)
MIN_PLUS = Semiring("min_plus", MONOID_MIN, _mul_plus, 0.0)
MAX_MIN = Semiring("max_min", MONOID_MAX, _mul_min, np.inf)
OR_AND = Semiring("or_and", MONOID_OR, _mul_and, True)
# Pattern semirings — the matrix is structure-only (Matrix<void>,
# compressed_storage.hpp:797): multiply passes the vector value through.
PLUS_FIRST = Semiring("plus_first", MONOID_PLUS, _mul_first)
PLUS_SECOND = Semiring("plus_second", MONOID_PLUS, _mul_second)
MAX_FIRST = Semiring("max_first", MONOID_MAX, _mul_first)
MIN_FIRST = Semiring("min_first", MONOID_MIN, _mul_first)

SEMIRINGS = {
    s.name: s
    for s in (
        PLUS_TIMES,
        MIN_PLUS,
        MAX_MIN,
        OR_AND,
        PLUS_FIRST,
        PLUS_SECOND,
        MAX_FIRST,
        MIN_FIRST,
    )
}


# The complete 27-operator surface of include/graphblas/ops.hpp as
# vectorized callables (D1×D2→D3 over NumPy arrays) — usable anywhere a
# binary op is accepted (eWise ops, BLAS0 apply/fold, dot's mul slot).
# The *_if variants equal their unconditional forms under GraphBLAS
# semantics: the mask argument of assign-if is carried by structural
# masks in this engine, never by the op itself (ops.hpp:85,:141 note
# the value-level behavior is identical).
BINARY_OPS: dict[str, Callable[[np.ndarray, np.ndarray], np.ndarray]] = {
    "left_assign": lambda x, y: x,                       # ops.hpp:58
    "left_assign_if": lambda x, y: x,                    # :85
    "right_assign": lambda x, y: y,                      # :115
    "right_assign_if": lambda x, y: y,                   # :141
    "add": np.add,                                       # :175
    "mul": np.multiply,                                  # :208
    "max": np.maximum,                                   # :241
    "min": np.minimum,                                   # :274
    "subtract": np.subtract,                             # :301
    "divide": np.divide,                                 # :328
    "divide_reverse": lambda x, y: np.divide(y, x),      # :353
    "equal": np.equal,                                   # :379
    "not_equal": np.not_equal,                           # :405
    "any_or": lambda x, y: np.where(x != 0, x, y),       # :434
    "logical_or": np.logical_or,                         # :462
    "logical_and": np.logical_and,                       # :490
    "relu": np.maximum,                                  # :514 (max(x, y))
    "abs_diff": lambda x, y: np.abs(np.subtract(x, y)),  # :541
    "argmin": lambda x, y: np.where(x <= y, x, y),       # :573 (on values)
    "argmax": lambda x, y: np.where(x >= y, x, y),       # :600
    "square_diff": lambda x, y: np.square(np.subtract(x, y)),  # :623
    "zip": lambda x, y: np.stack([x, y], axis=-1),       # :649 (pair)
    "equal_first": lambda x, y: x,                       # :678
    "less_than": np.less,                                # :707
    "leq": np.less_equal,                                # :736
    "greater_than": np.greater,                          # :765
    "geq": np.greater_equal,                             # :794
}
