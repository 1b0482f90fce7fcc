"""Custom stateful streaming operators (applyInPandasWithState).

The charter's "custom stateful operator" surface: arbitrary per-key
state carried across micro-batches, Arrow-batched. The example operator
is a per-key running aggregate (count + sum + last-seen timestamp) —
the canonical shape a user-defined sessionizer/accumulator plugs into:
swap ``_update`` for any transition function.

Scale notes: state lives in the state store partitioned by the group
key (one shuffle per batch on that key, same as any streaming agg);
emitted rows per batch are one per ACTIVE key, so downstream sinks see
updates, not the full keyspace. Use watermark + timeout for state
eviction on unbounded keyspaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "key bigint, n_events bigint, sum_value double, last_ts timestamp"
_STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def running_totals_stateful(
    sdf: DataFrame, key_col: str = "user_id", value_col: str = "value", ts_col: str = "ts"
) -> DataFrame:
    """Per-key running (count, sum, last-seen ts) maintained in group
    state across micro-batches; emits the updated totals for keys seen
    in each batch. ``last_ts`` is part of the STATE, not recomputed per
    batch — a late event must never move a key's last-seen timestamp
    backwards across micro-batches.
    """
    from rehiver_spark.session import ship_package

    ship_package(sdf.sparkSession)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, last_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            mx = pdf[ts_col].max()
            last_ts = mx if last_ts is None or pd.isna(last_ts) else max(last_ts, mx)
        state.update((n, float(total), last_ts))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "sum_value": [total], "last_ts": [last_ts]}
        )

    return (
        sdf.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
