"""As-of join — latest-prior (or earliest-later) snapshot per key.

Not in the reference (GeoTables.jl has no temporal join; its join
surface is geojoin/tablejoin, ``src/geoops/tablejoin.jl:5``) — this is
the training-data-pipeline temporal companion: attach to every page
fetch the most recent per-host metadata snapshot, to every click the
latest prior purchase, to every document the crawl-config row in force
at its ``warc_ts``.

Physical plan (the single-shuffle union trick — no per-row probe, no
range explosion):

1. Tag left rows ``side=1`` and right rows ``side=0``; pack the right
   payload into ONE struct column (null on left rows); union by name.
2. One window per key: ``partitionBy(on).orderBy(ts, side, tie)`` with
   ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each left row
   picks up the payload of the nearest preceding right row in a single
   sorted pass.
3. Keep ``side=1`` rows, unpack the struct (suffixing right columns).

Cost at 100 TB: exactly one shuffle of |left|+|right| rows on the join
key, then a linear in-partition scan — the same shape as a sorted merge
join, with no row multiplication under duplicate timestamps. The window
is always key-partitioned (never global); a pathologically hot key
serializes only its own rows, same as any per-key sort.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAY = "__asof_pay"
_TIE = "__asof_tie"


def _ts_valid(df: DataFrame, ts: str):
    """Predicate: ``ts`` is a usable as-of position. NULL never is; for
    float/double ts columns NaN isn't either (it passes ``isNotNull``
    and Spark orders NaN GREATER than every double, so an unfiltered
    NaN right row would sort to the probe end of the window and leak
    its payload — the same class of corruption as NULL, which pandas
    ``merge_asof`` likewise rejects at the door)."""
    from pyspark.sql.types import DoubleType, FloatType

    c = F.col(ts)
    if isinstance(df.schema[ts].dataType, (DoubleType, FloatType)):
        return c.isNotNull() & ~F.isnan(c)
    return c.isNotNull()


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Iterable[str],
    ts: str,
    kind: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right row whose ``ts``
    is the latest ≤ left's (``kind='backward'``, inclusive) or the
    earliest ≥ left's (``kind='forward'``) within the same ``on`` key.

    Right non-key columns (including its ``ts``) come back suffixed
    with ``suffix``; unmatched left rows keep them null. ``tolerance_s``
    (seconds) nulls the match when the time gap exceeds it, preserving
    the left row. ``tie_col`` breaks equal-timestamp ties
    deterministically (max wins backward, min wins forward); without
    it, equal-ts right duplicates would make the result shuffle-order
    dependent, so pass one whenever the right side isn't unique on
    ``(on..., ts)``.
    """
    if kind not in ("backward", "forward"):
        raise ValueError("kind must be 'backward' or 'forward'")
    on = list(on)
    if not on:
        raise ValueError("asof_join requires on= key columns")
    for c in on + [ts]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")

    pay_cols = [c for c in right.columns if c not in on]
    out_names = {c: f"{c}{suffix}" for c in pay_cols}
    if len(set(out_names.values()) & set(left.columns)) > 0:
        clash = sorted(set(out_names.values()) & set(left.columns))
        raise ValueError(f"suffixed right columns collide with left: {clash}")

    # NULL-ts (and for float ts, NaN-ts) right rows can never be a valid
    # "latest prior"/"earliest later" match, but under the window
    # ordering they would sort to an end of the partition and leak their
    # payload (pandas merge_asof rejects null keys outright; we drop
    # them — same matches, no error).
    r = (
        right.filter(_ts_valid(right, ts))
        .select(
            *[F.col(c) for c in on],
            F.col(ts).alias(_TS),
            (F.col(tie_col) if tie_col else F.lit(0)).alias(_TIE),
            F.struct(*[F.col(c).alias(out_names[c]) for c in pay_cols]).alias(_PAY),
        )
        .withColumn(_SIDE, F.lit(0))
    )
    l = (
        left.withColumn(_TS, F.col(ts))
        .withColumn(_SIDE, F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if kind == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc_nulls_first()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc(), F.col(_TIE).desc_nulls_first()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w)).filter(
        F.col(_SIDE) == 1
    )

    pay = F.col(_PAY)
    if tolerance_s is not None:
        rts = pay[out_names[ts]].cast("double")
        lts = F.col(ts).cast("double")
        gap = (lts - rts) if kind == "backward" else (rts - lts)
        pay = F.when(gap <= F.lit(float(tolerance_s)), pay)
    # a NULL-ts (or float NaN-ts) left row has no as-of position: always
    # a null match (without this, forward mode's "ts desc nulls last"
    # ordering would hand such rows the minimum-ts right payload, and a
    # NaN left ts — ordered greater than every double — would vacuum up
    # the max-ts payload in backward mode)
    pay = F.when(_ts_valid(left, ts), pay)

    return matched.select(
        *[F.col(c) for c in left.columns],
        *[pay[out_names[c]].alias(out_names[c]) for c in pay_cols],
    )
