"""AIMD per-host rate control as a custom stateful streaming operator.

The reference adapts fetch concurrency per run with AIMD
(``Scraping_project/src/stage3/async_enrichment.py:76-176``: halve the
concurrency when the success rate drops below 0.95, add 2 otherwise;
per-domain circuit breaker in ``retry_strategies.py:256-390``). In the
rebuild the politeness *budget* lives in frontier selection; this operator is
the streaming-side controller that produces the per-host budget for the next
generation from a live stream of fetch events — state is kept per host,
Arrow-batched, no per-row Python at the API. The transition function is a
pure shared core (:func:`_aimd_step`) exposed through BOTH stateful APIs:
``applyInPandasWithState`` (this Spark pin's stable path) and
``transformWithStateInPandas`` (the Spark-4 successor, RocksDB-backed) —
output parity between the two is pinned in tests/test_streaming.py.

State per host: (concurrency, total, failures, consecutive_failures).
Circuit breaker: after >= 5 consecutive failures the host's budget drops to
0 (open); any success closes it again (half-open semantics are the caller's
re-probe of a zero-budget host at a low rate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

AIMD_START = 8
AIMD_STEP = 2
AIMD_MAX = 64
AIMD_THRESHOLD = 0.95
BREAKER_LIMIT = 5  # consecutive failures -> open circuit

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("n_events", LongType()),
        StructField("n_failures", LongType()),
        StructField("success_rate", DoubleType()),
        StructField("concurrency", IntegerType()),
        StructField("circuit_open", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("concurrency", IntegerType()),
        StructField("total", LongType()),
        StructField("failures", LongType()),
        StructField("consec_failures", IntegerType()),
    ]
)


def _aimd_step(
    host: str,
    state_tuple: tuple[int, int, int, int] | None,
    parts: list[pd.DataFrame],
) -> tuple[tuple[int, int, int, int], pd.DataFrame] | None:
    """Pure AIMD transition shared by BOTH stateful APIs: (state, batch) ->
    (new state, one output row). Keeping it API-free pins that the
    applyInPandasWithState and transformWithStateInPandas operators are the
    same controller."""
    if state_tuple is not None:
        conc, total, failures, consec = state_tuple
    else:
        conc, total, failures, consec = AIMD_START, 0, 0, 0
    if not parts:
        return None
    batch = pd.concat(parts, ignore_index=True)
    # consecutive-failure tracking needs a deterministic event order: batch
    # arrival order is partition/shuffle-dependent, so sort by every
    # available ordering column as a tie-break chain (a single column,
    # e.g. ts, leaves same-timestamp events in concat order)
    order_cols = [c for c in ("ts", "seq", "event_id", "url") if c in batch.columns]
    if order_cols:
        batch = batch.sort_values(order_cols, kind="mergesort")
    ok = batch["is_valid"].astype(bool)
    batch_n = len(batch)
    batch_fail = int((~ok).sum())
    for v in ok.to_numpy():
        consec = 0 if v else consec + 1
    total += batch_n
    failures += batch_fail
    rate = 1.0 - (batch_fail / batch_n) if batch_n else 1.0
    if rate < AIMD_THRESHOLD:
        conc = max(1, conc // 2)  # multiplicative decrease
    else:
        conc = min(AIMD_MAX, conc + AIMD_STEP)  # additive increase
    circuit_open = consec >= BREAKER_LIMIT
    out = pd.DataFrame(
        [
            {
                "host": host,
                "n_events": batch_n,
                "n_failures": batch_fail,
                "success_rate": rate,
                "concurrency": 0 if circuit_open else conc,
                "circuit_open": circuit_open,
            }
        ]
    )
    return (conc, total, failures, consec), out


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (host,) = key
    stepped = _aimd_step(host, state.get if state.exists else None, list(pdfs))
    if stepped is None:
        return
    new_state, out = stepped
    state.update(new_state)
    yield out


def aimd_budgets(fetch_events: DataFrame) -> DataFrame:
    """fetch-event stream (host, is_valid, ...) -> per-host budget updates.

    Uses ``applyInPandasWithState`` (deprecated-track in newer Spark but
    fully supported at this pin and needs no special state-store provider);
    :func:`aimd_budgets_tws` is the identical controller on the successor
    ``transformWithStateInPandas`` API — tests pin output parity."""
    return fetch_events.groupBy("host").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def aimd_budgets_tws(fetch_events: DataFrame) -> DataFrame:
    """Same AIMD controller on the Spark-4 ``transformWithStateInPandas``
    API (the migration target once applyInPandasWithState is removed).
    Requires the RocksDB state store provider:
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.

    ENV-GATED in this container: the API's state-server protocol imports
    google.protobuf, which is not installed here, so the end-to-end parity
    test skips (tests/test_streaming.py documents the crash signature);
    the shared ``_aimd_step`` core keeps the two operators semantically
    identical regardless."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _AimdProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("aimd", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (host,) = key
            prev = tuple(self._state.get()) if self._state.exists() else None
            stepped = _aimd_step(host, prev, list(rows))
            if stepped is None:
                return iter(())
            new_state, out = stepped
            self._state.update(new_state)
            return iter([out])

        def close(self) -> None:
            pass

    return fetch_events.groupBy("host").transformWithStateInPandas(
        _AimdProcessor(), OUTPUT_SCHEMA, "append", "none"
    )
