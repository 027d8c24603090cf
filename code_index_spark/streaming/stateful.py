"""Custom stateful streaming operator via applyInPandasWithState:
first-mention detection per conversation.

For each conv_id, state holds the set of entity surfaces already seen;
each micro-batch emits only mentions whose surface is NEW for that
conversation — the streaming analogue of the reference's per-file
skip-cache (cache.py:134-197), keyed by conversation instead of file.

State is bounded by a processing-time timeout: conversations idle
longer than `state_ttl` are evicted (transcripts are append-ordered per
conv, so an evicted conv re-seeding its set only risks re-emitting a
first-mention after a long gap — acceptable for a monitoring signal,
documented here).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, turn_idx int, surface string"
STATE_SCHEMA = "seen array<string>"


def _make_fn(state_ttl_ms: int | None):
    def first_mentions_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emits (conv_id, turn_idx, surface) for surfaces not yet seen
        in this conversation."""
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        out_turn: list[int] = []
        out_surface: list[str] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx")
            for turn_idx, surface in zip(pdf["turn_idx"].values, pdf["surface"].values):
                if surface not in seen:
                    seen.add(surface)
                    out_turn.append(int(turn_idx))
                    out_surface.append(surface)
        state.update((sorted(seen),))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if out_turn:
            yield pd.DataFrame(
                {"conv_id": conv_id, "turn_idx": out_turn, "surface": out_surface}
            )

    return first_mentions_fn


def first_mentions_stream(mentions_stream, state_ttl_ms: int | None = 3_600_000):
    """mentions(conv_id, turn_idx, surface) stream → first mentions.

    Input is typically extract_triples(...) filtered to pred='class'
    and projected; grouping shuffles by conv_id, state lives with the
    partition (RocksDB/HDFS-backed state store in production).

    state_ttl_ms: processing-time eviction for idle conversations.
    NOTE: with a timeout configured, an availableNow trigger never
    self-terminates (the engine keeps scheduling empty batches to fire
    timeouts) — pass state_ttl_ms=None for run-to-completion batch
    backfills and keep the TTL for continuous streams."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return mentions_stream.groupBy("conv_id").applyInPandasWithState(
        _make_fn(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
