"""Exactly-once streaming writes INTO the snapshot catalog — the bridge
between the engine's two halves: Structured Streaming upstream, the
Iceberg-ish SnapshotCatalog downstream.

The standard foreachBatch idempotent-sink pattern: each micro-batch
commits as its own snapshot whose id is a pure function of the stream's
batchId, so a replayed batch (stream restart after a crash between the
sink's commit and the checkpoint write) finds its manifest already present
and SKIPS — the append chain can never double-append. Combined with the
catalog's atomic manifest swap, the pipeline is exactly-once end to end:
the file source replays at-least-once, the sink deduplicates by id.

Stream snapshots take ids in a reserved high range (STREAM_ID_BASE +
batchId) so they can never collide with crawl rounds (contiguous low ids)
or compaction maintenance snapshots (COMPACTION_ID_BASE range) — the same
separate-sequence discipline as SnapshotCatalog.compact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.tables import SnapshotCatalog

STREAM_ID_BASE = 2_000_000_000


def stream_to_catalog(
    stream: DataFrame,
    catalog_root: str,
    table: str,
    checkpoint_dir: str,
    base_id: int = STREAM_ID_BASE,
    output_partitions: int | None = 1,
):
    """Start an availableNow stream appending each micro-batch to
    ``table`` in the catalog at ``catalog_root``, exactly once. Returns
    the StreamingQuery (caller awaits termination)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import os

        cat = SnapshotCatalog(batch_df.sparkSession, catalog_root)
        sid = base_id + batch_id
        try:
            cat.snapshot(sid)
            exists = True
        except FileNotFoundError:
            exists = False
        if exists:
            if any(s.snapshot_id == sid for s in cat.lineage()):
                return  # replayed batch: already durably committed
            # manifest written but the crash hit before the CURRENT swap:
            # the snapshot is an orphan no later commit built on — remove
            # and redo. (The checkpoint only ever replays the most recent
            # batch, so the lineage walk stays within any sane retention.)
            os.remove(
                os.path.join(catalog_root, "manifests", f"snap-{sid}.json")
            )
        cat.commit(
            sid,
            appends={table: batch_df},
            counters={"stream_batch": batch_id},
            output_partitions=output_partitions,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
