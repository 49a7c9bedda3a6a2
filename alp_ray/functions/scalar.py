"""BLAS0 — scalar primitives (≙ include/graphblas/blas0.hpp:179,287,391).

The reference's level-0 layer applies a binary operator to plain scalars:
``apply(out, x, y, op)``, ``foldr(x, inout, op)``, ``foldl(inout, x, op)``.
In a Python host these are trivially driver-side (SURVEY §2.2); they
exist here so the algebraic surface is complete and so monoid folds over
Python sequences share the same operator objects as the distributed
kernels.
"""

from __future__ import annotations

from typing import Iterable

from alp_ray.functions.semiring import Monoid


def apply(op, x, y):
    """out ← op(x, y) (grb::apply, blas0.hpp:179)."""
    return op(x, y)


def foldr(op, x, inout):
    """inout ← op(x, inout) (grb::foldr, blas0.hpp:287)."""
    return op(x, inout)


def foldl(op, inout, x):
    """inout ← op(inout, x) (grb::foldl, blas0.hpp:391)."""
    return op(inout, x)


def fold_all(monoid: Monoid, xs: Iterable):
    """Reduce a Python iterable under a monoid (identity if empty)."""
    acc = monoid.identity
    for x in xs:
        acc = monoid.ufunc(acc, x)
    return acc
