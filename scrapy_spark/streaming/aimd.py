"""AIMD per-host rate control as a custom stateful streaming operator.

The reference adapts fetch concurrency per run with AIMD
(``Scraping_project/src/stage3/async_enrichment.py:76-176``: halve the
concurrency when the success rate drops below 0.95, add 2 otherwise;
per-domain circuit breaker in ``retry_strategies.py:256-390``). In the
rebuild the politeness *budget* lives in frontier selection; this operator is
the streaming-side controller that produces the per-host budget for the next
generation from a live stream of fetch events — state is kept per host with
``applyInPandasWithState`` (Arrow-batched, no per-row Python at the API).

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


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (host,) = key
    if state.exists:
        conc, total, failures, consec = state.get
    else:
        conc, total, failures, consec = AIMD_START, 0, 0, 0
    # consecutive-failure tracking needs a deterministic event order: batch
    # arrival order is partition/shuffle-dependent, so sort by event
    # time/sequence before scanning
    parts = list(pdfs)
    if not parts:
        return
    batch = pd.concat(parts, ignore_index=True)
    # composite sort key: a single column (e.g. ts) leaves same-timestamp
    # events in concat order, which is shuffle/partition-dependent — use
    # every available ordering column as a tie-break chain
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
    state.update((conc, total, failures, consec))
    yield pd.DataFrame(
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


def aimd_budgets(fetch_events: DataFrame) -> DataFrame:
    """fetch-event stream (host, is_valid, ...) -> per-host budget updates."""
    return fetch_events.groupBy("host").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
