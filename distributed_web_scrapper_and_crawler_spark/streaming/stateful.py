"""Custom stateful streaming operators (applyInPandasWithState).

The batch engine's seen-set is a Bloom-prefiltered anti-join against an
Iceberg-style keys table (plans/round.py). In a pure Structured
Streaming deployment the same invariant — "each URL is admitted at most
once, forever" — becomes per-key state inside the stream:
``dedup_url_stream`` keeps a per-HOST set of admitted url_hashes in
GroupState and emits only first occurrences, across micro-batches.

Keying by host (not by url) keeps the state-store key count equal to
the host count, with each host's hash set stored as one packed int64
binary blob — the same partitioned-by-host layout the batch engine's
politeness scheduler uses, so hot-host skew lands on the shuffle the
same way. A per-url key would also work but stores one state row per
URL (state-store bloat at 10^10) — this layout is the deliberate
scale choice, with the blob bounded by ``max_hashes_per_host``.

The batch round loop remains the primary engine (SURVEY.md §2.10:
reproducible ordering needs rounds); this module is the streaming
surface a Structured-Streaming-native user would reach for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "host string, url string, url_hash long"
DEDUP_STATE_SCHEMA = "hashes binary"


def dedup_url_stream(
    urls: DataFrame,
    max_hashes_per_host: int = 1_000_000,
) -> DataFrame:
    """Streaming exactly-once URL admission: groupBy(host) +
    applyInPandasWithState, state = packed int64 array of admitted
    url_hashes per host.

    Input stream schema must contain (host string, url string,
    url_hash long). Output = the first occurrence of each url_hash per
    host, across all micro-batches. State per host is capped at
    ``max_hashes_per_host`` (overflowing hosts keep admitting — a
    documented fail-open, mirroring the batch engine's rule that a
    degraded filter must never drop URLs silently... but here without a
    ground-truth table the cap is a hard bound, so size it for the
    host's expected URL count).
    """

    def admit(key, pdf_iter, state: GroupState):
        if state.exists:
            (blob,) = state.get
            seen = set(np.frombuffer(blob, dtype=np.int64).tolist())
        else:
            seen = set()
        overflow = len(seen) >= max_hashes_per_host
        for pdf in pdf_iter:
            mask = []
            for h in pdf["url_hash"]:
                h = int(h)
                if h in seen:
                    mask.append(False)
                elif overflow:
                    mask.append(True)  # fail-open past the cap
                else:
                    seen.add(h)
                    overflow = len(seen) >= max_hashes_per_host
                    mask.append(True)
            kept = pdf[pd.Series(mask, index=pdf.index)]
            if len(kept):
                yield kept[["host", "url", "url_hash"]]
        state.update((np.array(sorted(seen), dtype=np.int64).tobytes(),))

    return urls.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
