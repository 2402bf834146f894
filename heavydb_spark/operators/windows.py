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

from pyspark.sql import Column, Window, WindowSpec
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


def lag_in_frame(col: Column, offset: int, w: WindowSpec) -> Column:
    """LAG_IN_FRAME (sqldefs.h:154): the value `offset` rows before the
    current row, RESTRICTED to the window frame — NULL if that falls
    outside the frame. `w` must be ordered with a frame ending at
    CURRENT ROW. Plain LAG ignores framing; this is the frame-aware
    variant, emulated with a frame-ordered list aggregate.

    The value is wrapped in a struct before collect_list — collect_list
    drops bare NULL elements (shifting offsets) but never drops structs,
    so NULL values survive at their correct frame position.

    Memory note: the per-row list is O(frame length); with an
    unbounded-preceding frame on a huge partition this is the hazard the
    reference's segment tree avoids — bound the frame at scale."""
    lst = F.collect_list(F.struct(col.alias("v"))).over(w)
    return F.when(
        F.size(lst) > offset,
        F.element_at(lst, F.size(lst) - offset).getField("v"),
    )


def lead_in_frame(col: Column, offset: int, w: WindowSpec) -> Column:
    """LEAD_IN_FRAME (sqldefs.h:156): `offset` rows after the current
    row within the frame; `w` must be ordered with a frame starting at
    CURRENT ROW. NULL-safe via struct wrapping (see lag_in_frame)."""
    lst = F.collect_list(F.struct(col.alias("v"))).over(w)
    return F.when(
        F.size(lst) > offset,
        F.element_at(lst, offset + 1).getField("v"),
    )
