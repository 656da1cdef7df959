"""Custom stateful streaming operator: cross-batch LWW staleness filter.

The MERGE sink already resolves last-writer-wins *within* the table, but a
long-running stream can cheaply pre-filter events that are older than the
newest LSN already seen for their key — cutting sink traffic on redelivery-
heavy feeds (at-least-once upstreams routinely redeliver whole chunks; the
reference tolerates this only via full MERGE rescans, loader.py:941-982).

Implemented with ``applyInPandasWithState``: per-key state = max LSN seen so
far; each micro-batch's group (Arrow-batched pandas, no per-row Python in the
JVM loop) emits only rows with lsn > state, then advances the state. State
lives in the streaming state store (checkpointed, restart-safe).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def lww_staleness_filter(
    stream: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
) -> DataFrame:
    """Stateful filter: drop events at-or-below the per-key high-water LSN.

    Output schema == input schema. Keys are the grouping columns, so state
    is partitioned exactly like the downstream MERGE shuffle.
    """
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("max_lsn", T.LongType())])

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        # Strictly-greater: assumes the CDC contract's totally-ordered,
        # UNIQUE per-key LSNs (documented on merge_cdc_batch). Under that
        # contract an event AT the high-water can only be a byte-identical
        # redelivery, which is exactly what this filter exists to drop. If a
        # feed ever emitted two DIFFERENT events at one LSN (contract
        # violation), filter-on vs filter-off could diverge on the tie —
        # equal-LSN events would need `>=` passthrough instead.
        (max_lsn,) = state.get if state.exists else (-1,)
        hi = max_lsn
        for pdf in pdfs:
            fresh = pdf[pdf[lsn_col] > max_lsn]
            if len(fresh):
                hi = max(hi, int(fresh[lsn_col].max()))
                yield fresh
        if hi > max_lsn:
            state.update((hi,))

    return (stream.groupBy(*key_cols)
            .applyInPandasWithState(fn, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
