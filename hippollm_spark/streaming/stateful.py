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
