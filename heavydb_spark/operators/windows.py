"""Window-function gaps vs the reference (SURVEY.md §2.5).

The reference's window kinds (Shared/sqldefs.h:143-173) are Spark
built-ins except FORWARD_FILL / BACKWARD_FILL and
CONDITIONAL_CHANGE_EVENT, provided here as plan-level compositions
(QueryEngine/WindowContext.cpp:534 computes these natively; we get the
same semantics from ignore-nulls last/first and a lag+running-sum).

All helpers return Columns usable inside `.select`/`.withColumn`; they
stay JVM-side (no UDFs) so whole-stage codegen applies. Window state at
scale: Spark sorts each partition (like the reference's sortPartition,
WindowContext.cpp:1238); skewed partition keys are the scale hazard —
callers should partition on reasonably-distributed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def forward_fill(col: Column, partition_by, order_by) -> Column:
    """Last non-null value at-or-before the current row.

    Reference: FORWARD_FILL (sqldefs.h:170, WindowContext fill kinds).
    """
    w = (
        Window.partitionBy(*_as_list(partition_by))
        .orderBy(*_as_list(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last(col, ignorenulls=True).over(w)


def backward_fill(col: Column, partition_by, order_by) -> Column:
    """First non-null value at-or-after the current row (BACKWARD_FILL)."""
    w = (
        Window.partitionBy(*_as_list(partition_by))
        .orderBy(*_as_list(order_by))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return F.first(col, ignorenulls=True).over(w)


def conditional_change_event(expr: Column, partition_by, order_by) -> Column:
    """Running count of times `expr` changes value within the partition.

    Reference: CONDITIONAL_CHANGE_EVENT (sqldefs.h:173). Implemented as
    lag-compare + running sum — two window passes over one sort order,
    which Catalyst executes in a single Window physical node chain.
    """
    w_row = Window.partitionBy(*_as_list(partition_by)).orderBy(
        *_as_list(order_by)
    )
    changed = (
        ~expr.eqNullSafe(F.lag(expr).over(w_row))
        & F.lag(expr).over(w_row).isNotNull()
    ).cast("long")
    w_run = w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.sum(changed).over(w_run)


def _as_list(x):
    return x if isinstance(x, (list, tuple)) else [x]


def lag_in_frame(
    col: Column,
    offset: int,
    partition_by,
    order_by,
    preceding: int | None = None,
    range_preceding=None,
) -> Column:
    """LAG_IN_FRAME (sqldefs.h:154): the value `offset` rows before the
    current row, RESTRICTED to a ROWS frame [`preceding` PRECEDING,
    CURRENT ROW] (`preceding=None` = UNBOUNDED PRECEDING) — NULL if
    that row falls outside the frame.

    For a constant ROWS frame the in-frame test is frame-shape
    arithmetic, not data: row current−offset is inside iff
    offset <= preceding, and plain LAG already yields NULL when the
    row crosses the partition start. So this is O(1) state per row —
    no per-row frame materialization (the memory role the reference's
    segment tree plays, QueryEngine/Utils/SegmentTree.h; a
    collect_list-over-frame emulation is O(frame) per row and dies on
    wide frames at scale).

    For a RANGE frame (interval framing on the single numeric/interval
    order column, translateIntervalExprForWindowFraming) pass
    `range_preceding` instead: the row `offset` back is in-frame iff
    its order value is within `range_preceding` of the current one —
    one extra lag over the order column, still O(1) state."""
    w = Window.partitionBy(*_as_list(partition_by)).orderBy(
        *_as_list(order_by)
    )
    if preceding is not None and offset > preceding:
        return F.when(F.lit(False), col)  # typed NULL: out of frame everywhere
    if range_preceding is not None:
        first = _as_list(order_by)[0]
        order_col = F.col(first) if isinstance(first, str) else first
        in_frame = (
            F.lag(order_col, offset).over(w) >= order_col - range_preceding
        )
        return F.when(in_frame, F.lag(col, offset).over(w))
    return F.lag(col, offset).over(w)


def lead_in_frame(
    col: Column,
    offset: int,
    partition_by,
    order_by,
    following: int | None = None,
    range_following=None,
) -> Column:
    """LEAD_IN_FRAME (sqldefs.h:156): `offset` rows after the current
    row within a ROWS frame [CURRENT ROW, `following` FOLLOWING]
    (`following=None` = UNBOUNDED FOLLOWING), or a RANGE frame via
    `range_following` (see lag_in_frame). Same O(1) arithmetic —
    LEAD handles the partition-end clip."""
    w = Window.partitionBy(*_as_list(partition_by)).orderBy(
        *_as_list(order_by)
    )
    if following is not None and offset > following:
        return F.when(F.lit(False), col)
    if range_following is not None:
        first = _as_list(order_by)[0]
        order_col = F.col(first) if isinstance(first, str) else first
        in_frame = (
            F.lead(order_col, offset).over(w) <= order_col + range_following
        )
        return F.when(in_frame, F.lead(col, offset).over(w))
    return F.lead(col, offset).over(w)
