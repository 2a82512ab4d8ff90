"""Streaming WARC archival — foreachBatch wrapper over the batch
``write_warc`` sink: a crawl's fetch stream lands as WARC shards the
moment each micro-batch commits, the way production crawlers archive
while crawling rather than in a nightly batch.

Exactly-once layout: every epoch writes into its OWN subdirectory
(``epoch=<id>/``) so concurrent epochs never collide on shard names,
and a replayed epoch (foreachBatch is at-least-once) rewrites the same
directory with byte-identical shards — ``write_warc``'s record ids and
gzip mtimes are deterministic, so replay is a no-op overwrite, not a
duplicate. The per-epoch manifest is committed LAST via atomic rename:
a manifest's existence implies its epoch's shards are complete, giving
downstream consumers (``read_warc``/``cdx_index`` over
``<out>/epoch=*/``) a transactional view with no partial-epoch reads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from sparkcrawl.sources.warc import write_warc


def stream_warc_export(
    fetch_stream: DataFrame,
    out_dir: str,
    compress: bool = True,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    **write_kwargs,
):
    """Start a streaming query archiving ``fetch_stream`` rows (the
    fetch-log shape: url, status_code, content_type, body, fetched_at)
    as WARC shards under ``out_dir``. Returns the StreamingQuery."""
    manifest_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(manifest_dir, exist_ok=True)

    def _export(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch_dir = os.path.join(out_dir, f"epoch={epoch_id:010d}")
        # manifest is one row per shard (= per partition): bounded
        rows = write_warc(batch_df, epoch_dir, compress=compress,
                          **write_kwargs).collect()
        manifest = {
            "epoch": epoch_id,
            "shards": [
                {"path": r["path"], "n_records": r["n_records"],
                 "n_bytes": r["n_bytes"]}
                for r in rows
            ],
        }
        tmp = os.path.join(manifest_dir, f".{epoch_id:010d}.json.tmp")
        final = os.path.join(manifest_dir, f"{epoch_id:010d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic: manifest present == epoch done

    writer = fetch_stream.writeStream.foreachBatch(_export) \
        .outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
