"""Custom stateful streaming operators (applyInPandasWithState) —
SURVEY §2.9's "custom stateful operator" slot.

* ``streaming_tile_totals``  — running per-tile image counts: state is
  one long per tile, updated each micro-batch, emitted as (tile, total,
  batch_delta).  The streaming analogue of tiling.tile_counts whose
  totals survive across micro-batches AND restarts (state lives in the
  checkpoint).
* ``streaming_first_seen``   — stateful exact dedup: the first row of
  each key ever seen is emitted, later duplicates are dropped — the
  infinite-stream analogue of dedup.exact_dedup (state = one marker per
  key; at design scale use a TTL timeout to bound state).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import functions as s2f


def streaming_tile_totals(
    tiled: DataFrame, level: int, tile_col: str | None = None
) -> DataFrame:
    """(tile, total, batch_delta) per micro-batch, totals carried in
    per-tile state.  ``tiled`` must already carry the tile column (e.g.
    from ingest.tile_stream) or a leaf ``cell`` to derive it from."""
    tile = tile_col or f"cell_l{level}"
    if tile not in tiled.columns:
        tiled = tiled.withColumn(tile, s2f.parent_expr("cell", level))

    def update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        delta = 0
        for pdf in pdfs:
            delta += len(pdf)
        (prev,) = state.get if state.exists else (0,)
        total = prev + delta
        state.update((total,))
        yield pd.DataFrame(
            {"tile": [key[0]], "total": [total], "batch_delta": [delta]}
        )

    return (
        tiled.withColumn("tile", F.col(tile))
        .groupBy("tile")
        .applyInPandasWithState(
            update,
            outputStructType="tile long, total long, batch_delta long",
            stateStructType="total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_first_seen(
    stream: DataFrame, key_col: str, ttl_minutes: float | None = 60.0
) -> DataFrame:
    """Emit only the FIRST occurrence of each key across the stream
    (state = one marker per key).

    ``ttl_minutes`` bounds the state: a key idle for that long has its
    marker EXPIRED (ProcessingTimeTimeout), so state size tracks the
    distinct keys of the trailing window instead of the whole stream —
    the standard bounded-memory trade for infinite-stream dedup (a
    duplicate arriving after the TTL is re-emitted).  Each sighting
    refreshes the timer (sliding TTL).  Pass ``None`` for exact
    whole-stream dedup with unbounded state.
    """
    use_ttl = ttl_minutes is not None
    ttl_ms = int(ttl_minutes * 60_000) if use_ttl else 0

    def update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if n == 0:
            return
        if state.exists:
            if use_ttl:
                state.setTimeoutDuration(ttl_ms)
            return
        state.update((True,))
        if use_ttl:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "n_first_batch": [n]})

    return (
        stream.withColumn("key", F.col(key_col))
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType="key string, n_first_batch long",
            stateStructType="seen boolean",
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_ttl
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
