"""Per-source streaming token quotas — the data-recipe gate for
STREAMING corpus construction: admit documents from each source until
that source's token budget is exhausted, then drop the overflow, keeping
a running ledger of how much of each budget is used.

Why this operator: the batch mixture sampler (``operators/splits.py``)
expresses a *rate* per source ("keep 25 % of src1"); a streaming intake
needs an absolute *budget* per source ("at most 10 M tokens of src1,
however fast it arrives"), which is inherently stateful — admission
depends on everything admitted before. No built-in expresses it:
watermarked aggregation emits aggregates (not gated rows) and
``dropDuplicatesWithinWatermark`` keys on identity, not on a running
sum. So this is the custom-stateful escape hatch, implemented on
``applyInPandasWithState`` like ``windows.py``'s first-seen dedup.

A ``transformWithState`` (Spark 4 arbitrary-state API) twin is provided
as :class:`TokenQuotaProcessor` — typed ValueState handles, TTL support,
one processor for batch and streaming — but its Python worker protocol
requires ``google.protobuf``, which is absent from this container
(verified: the TWS driver worker crashes on import), so like the real
media decoders it is an injectable forward path, exercised only where
the dependency exists (tests skip on missing protobuf).

Semantics (both implementations): documents are admitted in arrival
order within each micro-batch; a document that would cross the remaining
budget is dropped whole — documents never split (the packing
invariant). State per source is ONE long (tokens admitted so far):
bounded by the number of sources, never corpus-sized.

Determinism note: admission is order-sensitive at the budget boundary —
in a real stream, arrival order IS the semantic (first come, first
admitted). The tests pin cases whose outcome is order-independent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = (
    "source STRING, doc_id BIGINT, n_tokens BIGINT, "
    "admitted BOOLEAN, budget_used BIGINT"
)
STATE_SCHEMA = StructType([StructField("used", LongType())])


def _gate_batch(
    batch: pd.DataFrame, source: str, budget: int, used: int
) -> tuple[pd.DataFrame, int]:
    admitted, budget_used = [], []
    for n in batch["n_tokens"]:
        n = int(n)
        ok = budget < 0 or used + n <= budget
        if ok:
            used += n
        admitted.append(ok)
        budget_used.append(used)
    out = pd.DataFrame(
        {
            "source": source,
            "doc_id": batch["doc_id"],
            "n_tokens": batch["n_tokens"],
            "admitted": admitted,
            "budget_used": budget_used,
        }
    )
    return out, used


def apply_token_quota(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int = -1,
    source_col: str = "source",
) -> DataFrame:
    """Gate a streaming document frame through per-source token budgets.

    Input needs (``source_col``, doc_id, n_tokens); output is one row
    per input document with ``admitted`` and the running ``budget_used``
    — filter on ``admitted`` for the corpus, aggregate the flags for the
    intake ledger. A negative budget (and ``default_budget``'s default)
    means unlimited. State: one long per source, in the checkpoint."""
    budgets = dict(budgets)
    default = int(default_budget)

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        source = key[0]
        budget = budgets.get(source, default)
        (used,) = state.get if state.exists else (0,)
        for batch in pdfs:
            if batch.empty:
                continue
            out, used = _gate_batch(batch, source, budget, used)
            yield out
        state.update((used,))

    keyed = docs.select(
        docs[source_col].alias("source"), "doc_id", "n_tokens"
    ).groupBy("source")
    return keyed.applyInPandasWithState(
        gate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cap_events_per_key(
    events: DataFrame, key_col: str, max_events_per_key: int
) -> DataFrame:
    """Admit at most ``max_events_per_key`` rows per key over the
    stream's lifetime, dropping the overflow — the upstream state
    bound for per-group collectors downstream (the
    `operators/dialogs.assemble_dialogs_stream` composition: its
    session state materializes every admitted turn, and no pre-agg
    window exists in streaming, so the place to bound a never-idle
    speaker is BEFORE the stateful agg, here). Schema passes through
    unchanged; state per key is ONE long (rows admitted so far), in
    the checkpoint — replay-safe like every applyInPandasWithState
    gate. Same determinism doctrine as :func:`apply_token_quota`:
    admission is arrival-ordered, and at the cap boundary arrival
    order IS the semantic.

    This is a lifetime cap (the quota shape), not a per-session one:
    a capped key contributes nothing further until the operator's
    state is reset. That is the right bluntness for the pathological
    case it exists for — a bot that never goes idle has no session
    boundary to scope a finer cap to."""
    if max_events_per_key <= 0:
        raise ValueError(
            "cap_events_per_key: max_events_per_key must be > 0"
        )
    out_schema = events.schema

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (used,) = state.get if state.exists else (0,)
        for batch in pdfs:
            room = max_events_per_key - used
            if room <= 0:
                break
            out = batch.iloc[:room]
            used += len(out)
            if len(out):
                yield out
        state.update((used,))

    return events.groupBy(key_col).applyInPandasWithState(
        gate,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


try:  # pragma: no cover - exercised only where protobuf exists
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TokenQuotaProcessor(StatefulProcessor):
        """transformWithStateInPandas twin of :func:`apply_token_quota`
        (see module docstring for the environment gate). Usage::

            docs.groupBy("source").transformWithStateInPandas(
                statefulProcessor=TokenQuotaProcessor(budgets),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Append",
                timeMode="None",
            )
        """

        def __init__(self, budgets: dict[str, int], default_budget: int = -1):
            self._budgets = dict(budgets)
            self._default = int(default_budget)

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._used = handle.getValueState("used", "used BIGINT")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            source = key[0]
            budget = self._budgets.get(source, self._default)
            used = self._used.get()[0] if self._used.exists() else 0
            for batch in rows:
                out, used = _gate_batch(batch, source, budget, used)
                yield out
            self._used.update((used,))

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover
    TokenQuotaProcessor = None  # type: ignore[assignment]
