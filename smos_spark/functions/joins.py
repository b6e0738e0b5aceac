"""Null-safe equi-join helper.

`df.join(other, ["k"])` silently drops NULL==NULL matches, but
`groupBy`/window partitioning treat NULL keys as a regular group — so
an operator variant that replaces a window with aggregate+join
DIVERGES on NULL keys unless the join is null-safe. Spark's
`eqNullSafe` (`<=>`) is a supported hash-join key (broadcast and
shuffled), so this costs nothing over a plain equi-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

__all__ = ["null_safe_join"]


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join on `keys` with NULL==NULL matching (`<=>`), returning the
    keys once (from the left side), like the list-of-names join."""
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_r_{k}")
    cond: Column | None = None
    for k in keys:
        c = left[k].eqNullSafe(renamed[f"_r_{k}"])
        cond = c if cond is None else (cond & c)
    return left.join(renamed, cond, how).drop(*[f"_r_{k}" for k in keys])
