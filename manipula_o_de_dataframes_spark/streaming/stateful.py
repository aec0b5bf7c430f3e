"""Custom stateful streaming operator (applyInPandasWithState).

The escape hatch for streaming semantics windowed aggregates can't
express: arbitrary per-key state carried across micro-batches. Here the
state is a running (count, total) per key — the same plumbing carries
dedup sets, feature accumulators, or session carts in production. Each
micro-batch the function receives that key's new rows as Arrow-backed
pandas frames plus its GroupState, and emits the updated running row.

Scale shape: state lives in the state store, partitioned by key (one
shuffle on the grouping key per batch); the Python worker only ever
sees one key's delta at a time, so per-batch memory is O(batch), not
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "key string, n long, total double"
# state carries exact integer cents — a double field here would silently
# null out the int values the worker stores
STATE_SCHEMA = "n long, cents long"


def running_totals_stream(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, exact-cents total) across micro-batches.

    Money is accumulated in integer cents inside the worker (exact, so
    the running total is independent of how rows split across batches)
    and rendered to a double only on emit.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    def update(key, pdfs, state):
        (k,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # round each VALUE to cents, then sum ints — rounding a
            # float batch-sum instead would make the total depend on
            # how rows split across micro-batches
            cents += int(pdf[value_col].map(lambda v: round(v * 100)).sum())
        state.update((n, cents))
        yield pd.DataFrame({"key": [k], "n": [n], "total": [cents / 100.0]})

    renamed = stream_df.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
