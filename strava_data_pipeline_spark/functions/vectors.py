"""Vector math over ``array<float>`` columns — JVM-side, no UDFs.

Dot products / norms / cosine are expressed with ``zip_with`` +
``aggregate`` higher-order functions, so they run inside whole-stage
codegen and never cross the Python boundary. Everything is computed in
double with a deterministic left-to-right fold, which keeps results
bit-comparable with the DuckDB oracle's sequential list_sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """array<float> → array<double> (do all math in double)."""
    return F.transform(vec, lambda v: v.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; caller is responsible for non-zero vectors."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded at an agreed precision — the cross-engine contract
    (both engines fold in the same order; rounding absorbs last-ulp
    differences)."""
    return F.round(cosine(a, b), digits)


def cosine_rounded_hoisted(
    a: Column, b: Column, norm_a: Column, norm_b: Column, digits: int = 6
) -> Column:
    """``cosine_rounded`` with the two norms precomputed once per vector
    and hoisted OUT of the pair join: a pair then costs one dot fold
    instead of three 64-element reductions (measured 2-3× on the
    pair-verify tiers). Bitwise-identical to ``cosine_rounded`` — the
    norm expression is the same fold in the same order, just evaluated
    on the per-vector frame, and the divisor keeps the same
    ``norm_a * norm_b`` multiplication order — so the rounded score
    (and every DuckDB oracle hash) is untouched."""
    return F.round(dot(a, b) / (norm_a * norm_b), digits)
