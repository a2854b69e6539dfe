"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no true streaming, but the engine's streaming
surface (SURVEY.md §2.10) includes the Spark-native path for operators
that need per-key state beyond windowed aggregation: Arrow-batched
pandas groups with an explicit ``GroupState`` handle. State is
per-key, checkpointed with the query, and evicted by timeout — the
bounded-state discipline a 100 TB stream needs.

Two operators:

* :func:`running_totals` — per-key cumulative event count/sum across
  micro-batches (the streaming analogue of the A1 dashboard counters).
* :func:`seen_key_filter` — streaming first-occurrence dedup: emits a
  row only the first time its key is seen (state = one flag per key),
  the streaming form of the engine's exact-dedup operator.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, amount_sum double"
_RUNNING_STATE = "n long, s double"


def _running_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["amount"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "amount_sum": [s]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user totals across the whole stream.

    Input stream needs (user_id, amount). Each micro-batch emits the
    updated cumulative row for every user present in the batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_fn,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEEN_SCHEMA = "k string, first_ts timestamp"
_SEEN_STATE = "seen boolean"


def _seen_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return
    first_ts = None
    for pdf in pdfs:
        ts = pdf["ts"].min()
        if first_ts is None or ts < first_ts:
            first_ts = ts
    state.update((True,))
    yield pd.DataFrame({"k": [key[0]], "first_ts": [first_ts]})


def seen_key_filter(stream: DataFrame) -> DataFrame:
    """Streaming exact-dedup: one output row per distinct key, at its
    first appearance. Input needs (k, ts)."""
    return stream.groupBy("k").applyInPandasWithState(
        _seen_fn,
        outputStructType=SEEN_SCHEMA,
        stateStructType=_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
