"""Multi-level OLAP aggregation: CUBE / ROLLUP / GROUPING SETS with
unambiguous level ids — every subtotal level of a report in ONE pass
over the data.

Spark plans these through a single ``Expand`` + hash aggregate (each
input row fans out once per grouping set, partials combine map-side),
which beats unioning k separate ``groupBy`` jobs by k data scans —
at 100 TB that is the whole game.

The standard footgun is ambiguity: in the output, a NULL dimension
value can mean "this row aggregates that dimension away" OR "the data
really had NULL there".  Every report here therefore carries ``gid``
— ``Σ grouping(dim_i) · 2^(k-1-i)`` (leftmost dim = most significant
bit) — computed from per-dimension ``grouping()`` flags so an external
SQL engine replays it bit for bit.

Reference parity: none (no aggregation tier in pandera);
beyond-reference OLAP next to ``relational.py``.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column as C
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["olap_report"]


def olap_report(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Mapping[str, C],
    *,
    mode: Union[str, Sequence[Sequence[str]]] = "cube",
) -> DataFrame:
    """One-pass multi-level aggregate over ``dims``.

    ``mode``: ``"cube"`` (all 2^k levels), ``"rollup"`` (the k+1
    hierarchical prefixes), or an explicit list of grouping sets (each
    a subset of ``dims``, e.g. ``[["a", "b"], ["a"], []]``).

    Output: ``*dims, gid, *aggs`` — ``gid``'s bit i (from the left) is
    1 when ``dims[i]`` is aggregated away on that row, so ``gid = 0``
    is the finest grain and ``gid = 2^k − 1`` the grand total; a NULL
    dim value with its bit at 0 is a genuine NULL category.
    """
    dims = list(dims)
    if not dims:
        raise ValueError("need at least one dimension")
    if not aggs:
        raise ValueError("need at least one aggregate")
    k = len(dims)
    if mode == "cube":
        grouped = df.cube(*[F.col(d) for d in dims])
    elif mode == "rollup":
        grouped = df.rollup(*[F.col(d) for d in dims])
    else:
        sets = [list(s) for s in mode]
        unknown = {c for s in sets for c in s} - set(dims)
        if unknown:
            raise ValueError(f"grouping sets use non-dims: {sorted(unknown)}")
        grouped = df.groupingSets(
            [[F.col(c) for c in s] for s in sets],
            *[F.col(d) for d in dims],
        )
    gid = None
    for i, d in enumerate(dims):
        term = F.grouping(F.col(d)).cast("long") * F.lit(
            1 << (k - 1 - i)
        )
        gid = term if gid is None else gid + term
    out = grouped.agg(
        gid.alias("gid"),
        *[expr.alias(name) for name, expr in aggs.items()],
    )
    return out.select(*dims, "gid", *aggs.keys())
