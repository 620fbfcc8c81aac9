"""Change-event validation / dead-letter gate.

A real binlog tail carries malformed events (null keys after upstream
schema drift, clock-skewed or negative sequence numbers, unknown op
codes). Applying them would either corrupt the keyed MERGE (a NULL
key hashes to one hot bucket and can never be updated again) or fail
the batch. The gate classifies each row ONCE with a codegen CASE
chain (no Python, no shuffle, no extra pass — Catalyst collapses the
rule column into both branches' filters) and routes failures to a
quarantine sink with the violated rule attached.

Replaces the reference's drop-bad-rows-silently parse branch
(reference src/common_package/process_raw_data.py:68-80 — a line
with an unknown field count is simply `return`ed away) with an
auditable dead-letter path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REASON_COL = "_reject_reason"
# 'P' = partial image (NULL column means keep stored value; hydrated
# into a full row by LakeTable.hydrate_patches before the merge)
VALID_OPS = ("I", "U", "D", "P")


def with_reject_reason(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    allow_partial: bool = True,
) -> DataFrame:
    """Annotate each event with the FIRST violated rule (NULL when the
    row is clean). Rule order is fixed so engine and oracle agree:
    null_key, then bad_lsn, then bad_op. With ``allow_partial=False``
    (a pipeline that disabled patch hydration) op='P' classifies as
    ``bad_op`` — merge applies full images only, so an unhydrated
    partial image would overwrite stored values with its NULLs."""
    ops = VALID_OPS if allow_partial else tuple(o for o in VALID_OPS if o != "P")
    null_key = None
    for k in key_cols:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    reason = (
        F.when(null_key, F.lit("null_key"))
        .when(F.col(lsn_col).isNull() | (F.col(lsn_col) < 0), F.lit("bad_lsn"))
        .when(
            F.col(op_col).isNull() | ~F.col(op_col).isin(*ops),
            F.lit("bad_op"),
        )
    )
    return events.withColumn(REASON_COL, reason)


def split_events(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    allow_partial: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined rows keep every input column
    plus ``_reject_reason``. Both sides are lazy projections of one
    annotated plan; no data moves until each side's sink runs."""
    ann = with_reject_reason(events, key_cols, lsn_col, op_col, allow_partial)
    clean = ann.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    bad = ann.filter(F.col(REASON_COL).isNotNull())
    return clean, bad
