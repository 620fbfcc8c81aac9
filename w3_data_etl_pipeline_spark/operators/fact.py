"""Fact-table build (reference operator J1).

The reference rewrites the 155k-row staging table ELEVEN times —
one CTAS plus ten (UPDATE-join + RENAME COLUMN) passes, one per
dimension (reference src/dags/w3c.py:249-396). Here the whole build
is ONE ``select`` over ten chained LEFT broadcast-hash joins, executed
by Catalyst in a single whole-stage-codegen'd pass: dims are tiny by
construction (they are DISTINCT projections of the fact), so every
join broadcasts and the fact is never shuffled at all. NULL natural
keys stay NULL surrogate keys (left join — SURVEY.md §2.6.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_fact(
    staging: DataFrame,
    dims: dict[str, tuple[DataFrame, str | list[str], str]],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """dims: {dim_name: (dim_df, natural_key_col(s), surrogate_id_col)}.

    Replaces each natural key column on the fact with the dim's
    surrogate id (aliased ``<dim_name>_id``).
    """
    fact = staging
    id_cols = []
    for name, (dim, nat, sid) in dims.items():
        nats = [nat] if isinstance(nat, str) else nat
        proj = dim.select(*nats, F.col(sid).alias(f"{name}_id"))
        fact = fact.join(F.broadcast(proj), on=nats, how="left")
        id_cols.append(f"{name}_id")
    if keep_cols is not None:
        fact = fact.select(*keep_cols, *id_cols)
    return fact
