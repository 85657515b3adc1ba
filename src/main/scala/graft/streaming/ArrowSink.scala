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
  * spans batch directories. Stream≡batch in StreamingSpec. */
object ArrowSink {

  def start(df: DataFrame, dir: String, checkpoint: String)
      : StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          ArrowIpc.writeShards(batch, f"$dir/batch-$id%05d")
          ()
        }
      }
      .start()
}
