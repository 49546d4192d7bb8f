"""Custom stateful streaming operators (applyInPandasWithState).

The built-in stateful surface (windows, dropDuplicatesWithinWatermark) is
covered by Q80-Q84; this module is the escape hatch the prompt's
"custom stateful operators" family needs — arbitrary per-key state carried
across micro-batches, with Arrow-batched pandas on the worker side.

Scale notes: state lives in the executor state store partitioned by the
grouping key (one shuffle on the key per micro-batch); the pandas function
sees one key's rows per call, so memory is bounded by per-key batch size,
not stream size. At 100 TB day-volume the knobs that matter are the state
store provider (RocksDB in prod) and a timeout policy so abandoned keys
get evicted — both orthogonal to this operator's logic.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_count(stream_df: DataFrame, key: str = "user_id") -> DataFrame:
    """Cumulative per-key event count, one emission per key per micro-batch.

    The canonical minimal stateful operator: state = a single counter per
    key, carried across micro-batches; each batch in which the key appears
    emits the running total after that batch. Deterministic given a
    deterministic batch split, which is what the replay harness provides.
    """

    def fn(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        n += sum(len(p) for p in pdfs)
        state.update((n,))
        yield pd.DataFrame({key: [key_tuple[0]], "cum_events": [n]})

    return stream_df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=f"{key} bigint, cum_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf python package for its
    driver-side runner; absent in this container — the operator is gated,
    not broken."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_max_tws(stream_df: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running max (integer cents) via Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState: typed state handles (ValueState/ListState/
    MapState), timers, and TTL, over the RocksDB state store.

    Same semantics as ``running_count`` above but carrying a max: state is
    one bigint per key; each micro-batch in which the key appears emits
    the cumulative max so far. Raises NotImplementedError when the
    protobuf runtime the runner needs is unavailable (tws_available()).
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(python runner protocol); install protobuf to enable"
        )
    from typing import Iterator as _Iterator

    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _MaxProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._mx = handle.getValueState("mx", "mx bigint")

        def handleInputRows(
            self, key_tuple, rows, timer_values
        ) -> _Iterator[pd.DataFrame]:
            mx = self._mx.get()[0] if self._mx.exists() else None
            for pdf in rows:
                if len(pdf):
                    m = int((pdf["value"] * 100 + 0.5).astype("int64").max())
                    mx = m if mx is None else max(mx, m)
            self._mx.update((mx,))
            yield pd.DataFrame(
                {key: [key_tuple[0]], "cum_max_cents": [mx]}
            )

        def close(self) -> None:
            pass

    spark = stream_df.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return stream_df.groupBy(key).transformWithStateInPandas(
        _MaxProc(),
        outputStructType=f"{key} bigint, cum_max_cents bigint",
        outputMode="Update",
        timeMode="None",
    )
