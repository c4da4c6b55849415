"""Custom stateful streaming operators via applyInPandasWithState.

``dedup_stream``: exactly-once-per-content event stream — drops any
event whose (key, fingerprint) was already seen, carrying the seen-set
in grouped state with a processing-time TTL. The streaming twin of the
batch exact-dedup operator: at 100 TB/day this is the ingestion-side
filter that keeps duplicate documents from ever reaching storage.

State size control: fingerprints are 64-bit hashes (not raw content),
state expires after ``ttl_minutes`` of group inactivity, and the
per-group set is capped (oldest-first eviction) — all three are the
standard knobs for unbounded-key streaming state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen array<long>"


def dedup_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    fingerprint_col: str = "fingerprint",
    ttl_minutes: int | None = 60,
    max_state: int = 100_000,
) -> DataFrame:
    """Streaming exact dedup per key. Input must already carry a LONG
    ``fingerprint`` column (e.g. ``xxhash64(text)``). Output = the
    surviving (first-seen) rows' key, fingerprint, and ts.

    ``ttl_minutes=None`` disables state expiry (NoTimeout). Note for
    tests/finite sources: with ProcessingTimeTimeout the engine keeps
    scheduling batches to evaluate timeouts, so
    ``query.processAllAvailable()`` never returns — use
    ``ttl_minutes=None`` when driving a finite drop folder."""
    out_schema = f"{key_col} long, {fingerprint_col} long, ts timestamp"
    use_ttl = ttl_minutes is not None

    def _fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()
            return
        seen: list[int] = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            keep_rows = []
            for fp, ts in zip(pdf[fingerprint_col], pdf["ts"]):
                fp = int(fp)
                if fp not in seen_set:
                    seen_set.add(fp)
                    seen.append(fp)
                    keep_rows.append((key[0], fp, ts))
            if keep_rows:
                yield pd.DataFrame(
                    keep_rows, columns=[key_col, fingerprint_col, "ts"]
                )
        if len(seen) > max_state:
            seen = seen[-max_state:]
        state.update((seen,))
        if use_ttl:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return events.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming funnel progression — CEP-lite pattern detection as a
    custom stateful operator (``applyInPandasWithState``), the
    incremental twin of ``behavior.funnel_counts(method='walk')``:
    per-user state is (stage reached, ts of the advancing event); an
    arriving event advances the state iff it is the NEXT step and
    strictly later than the last advance — the same greedy
    time-ordered walk the batch operator folds, so on an in-order
    finite feed the stream's max step per user equals the batch
    funnel (parity-tested).

    Emits one row per advancement: (user, step_idx 1-based, step,
    ts) — downstream can aggregate live conversion counts in the same
    query. Events are sorted by ts inside each micro-batch; ACROSS
    batches arrival order is trusted (the standard processing-time
    caveat — event-time reorder needs a watermark buffer upstream,
    e.g. a windowed sort in a foreachBatch stage).

    State is two scalars per user — unlike the batch walk, nothing
    per-event is retained, so state size is #users regardless of
    stream length.
    """
    step_list = list(steps)
    out_schema = f"{user_col} long, step_idx int, step string, ts timestamp"

    def _fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        stage, last_ts = (state.get if state.exists else (0, None))
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for et, ts in zip(pdf[type_col], pdf[ts_col]):
                if stage >= len(step_list):
                    break
                if et == step_list[stage] and (
                    last_ts is None or ts > last_ts
                ):
                    stage += 1
                    last_ts = ts
                    rows.append((key[0], stage, et, ts))
        state.update((stage, last_ts))
        if rows:
            yield pd.DataFrame(
                rows, columns=[user_col, "step_idx", "step", "ts"]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType="stage int, last_ts timestamp",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
