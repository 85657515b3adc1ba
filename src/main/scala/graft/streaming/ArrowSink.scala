package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.ArrowIpc

/** Streaming Arrow IPC export — the streaming twin of
  * [[graft.sources.ArrowIpc.writeShards]]: a continuously-landing
  * corpus exports to `.arrows` shards as it arrives, one shard set per
  * micro-batch under `dir/batch-NNNNN/`, so downstream dataloaders
  * (pyarrow/polars/duckdb) can start consuming while ingest is still
  * running. foreachBatch + the batch writer keeps exactly ONE code
  * path for encoding (no reimplementation drift), batch directories
  * are append-only (a reader never observes a half-written set under a
  * completed batch id — shards are written before foreachBatch
  * returns, and the checkpoint makes batch ids monotone), and payload
  * bytes never visit the driver. Read everything exported so far with
  * `ArrowIpc.readShards(spark, s"$dir/batch-*")` — the Hadoop glob
  * spans batch directories. Stream≡batch in StreamingSpec.
  *
  * Exactly-once across restarts: foreachBatch is at-least-once (after
  * a crash the checkpoint REPLAYS the in-flight batch id), so each
  * batch directory follows the marker protocol — a replayed id whose
  * `_COMPLETE` marker exists is skipped untouched, and a partial
  * directory from a mid-write crash (no marker) is wiped and
  * rewritten before the marker lands. Readers that must not observe
  * in-flight output gate on the marker; the glob read above is for
  * completed-stream consumption. */
object ArrowSink {

  def start(df: DataFrame, dir: String, checkpoint: String)
      : StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) { writeBatchIdempotent(batch, dir, id); () }
      }
      .start()

  /** The marker-gated single-batch write — also the crash-recovery
    * path, exercised directly by StreamingSpec. */
  def writeBatchIdempotent(batch: DataFrame, dir: String, id: Long)
      : Unit = {
    val target = new org.apache.hadoop.fs.Path(f"$dir/batch-$id%05d")
    val fs = target.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(target, "_COMPLETE")
    if (!fs.exists(marker)) {
      if (fs.exists(target)) fs.delete(target, true) // partial: crashed write
      ArrowIpc.writeShards(batch, target.toString)
      fs.create(marker, true).close()
    }
  }
}
