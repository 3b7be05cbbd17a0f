"""Distance scalar functions as Spark column expressions (JVM-side, codegen).

Formula parity with the reference (needed for recall >= 0.99 at identical
sketch config):

- Jaccard      J = common/(n1+n2-common), 0 if denom 0   (src/MST.cpp:514-519)
- Mash         D = -(1/k)*ln(2J/(1+J)); J=1->0, J<=0->1,
               clamped <= 1                               (src/MST.cpp:520-528)
- containment  c = common/min(n1,n2); D = -(1/k)*ln(c)   (src/MST.cpp:529-540)
- size ratio   skip pair if max(n1,n2) > R*min(n1,n2),
               R = 2*e^{dk}-1                            (src/MST.cpp:26-37,504-512)
- common bound skip pair if common < ceil(j*(n1+n2)/(1+j)),
               j = e^{-dk}/(2-e^{-dk})                   (src/greedy.cpp:649-653)

All are plain column expressions so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaccard_expr(common: Column, n1: Column, n2: Column) -> Column:
    denom = n1 + n2 - common
    return F.when(denom > 0, common.cast("double") / denom.cast("double")).otherwise(F.lit(0.0))


def mash_distance_expr(j: Column, k: int) -> Column:
    return (
        F.when(j >= 1.0, F.lit(0.0))
        .when(j <= 0.0, F.lit(1.0))
        .otherwise(F.least(F.lit(1.0), -F.log(2.0 * j / (1.0 + j)) / F.lit(float(k))))
    )


def containment_distance_expr(common: Column, n1: Column, n2: Column, k: int) -> Column:
    c = common.cast("double") / F.least(n1, n2).cast("double")
    return (
        F.when(F.least(n1, n2) <= 0, F.lit(1.0))
        .when(common <= 0, F.lit(1.0))
        .when(c >= 1.0, F.lit(0.0))
        .otherwise(F.least(F.lit(1.0), -F.log(c) / F.lit(float(k))))
    )


def greedy_containment_distance_expr(common: Column, n1: Column, n2: Column,
                                     k: int) -> Column:
    """The greedy path's containment VARIANT (src/greedy.cpp:1245-1259,
    2771-2788 minhash_mash_distance): the Mash transform applied to the
    containment ratio c = common/min(n1,n2) instead of Jaccard —
    D = -(1/k)*ln(2c/(1+c)), min(n1,n2)=0 -> 1.0, clamped to [0, 1]."""
    m = F.least(n1, n2)
    c = F.when(m > 0, common.cast("double") / m.cast("double")).otherwise(F.lit(0.0))
    return mash_distance_expr(c, k)


def size_ratio_pred(n1: Column, n2: Column, max_ratio: float) -> Column:
    """True iff the pair is worth evaluating (src/MST.cpp:504-512)."""
    return F.greatest(n1, n2) <= F.lit(float(max_ratio)) * F.least(n1, n2)


def common_lower_bound_expr(n1: Column, n2: Column, jaccard_min: float) -> Column:
    """Minimum intersection count for distance <= d (src/greedy.cpp:649-653)."""
    return F.ceil(F.lit(float(jaccard_min)) * (n1 + n2).cast("double")
                  / F.lit(1.0 + float(jaccard_min)))


def ani_expr(dist: Column) -> Column:
    """ANI = 100*(1-D) (src/MST.cpp:552-556)."""
    return 100.0 * (1.0 - dist)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side.

    Uses zip_with + aggregate (no Python).  Deterministic left-to-right fold.
    """
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
