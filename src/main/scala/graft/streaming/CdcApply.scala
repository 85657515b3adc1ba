package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — the streaming twin of the batch
  * `snapshot_upsert` merge: a change feed `(change_id, op, key,
  * payload…)` arrives as a stream and is merged into a parquet state
  * table once per micro-batch through `foreachBatch`.
  *
  * Semantics per batch: latest change per key wins inside the batch
  * (`change_id` orders them), then one full-outer hash join against
  * the current state applies upserts and drops deletes — identical
  * logic to the batch merge, so stream-after-N-batches ≡ batch-merge
  * (StreamingSpec pins it).
  *
  * The state swap is WRITE-NEW-THEN-RENAME: a batch both reads and
  * replaces the state table, and overwriting a parquet dir that the
  * same job is lazily reading would corrupt it mid-scan; writing to
  * `<state>.next` and renaming through the Hadoop FS makes the swap a
  * metadata operation (atomic on HDFS/local; object stores get
  * per-batch prefix versions instead — same seam as BlobStore).
  *
  * At 100 TB the per-batch full-outer join is the honest cost of
  * merge-on-read-less storage; production systems amortize it with
  * bucketed state (join without shuffle) or deletion vectors — the
  * join shape here is the same either way.
  */
object CdcApply {

  /** Start applying `changes` (a streaming DataFrame with columns
    * `change_id: Long, op: String('upsert'|'delete'), key: Long` +
    * payload columns) into the parquet state at `stateDir`. */
  def start(changes: DataFrame, stateDir: String,
            checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, stateDir)
      }
      .start()

  /** One micro-batch merge (also directly unit-testable). */
  def applyBatch(batch: DataFrame, stateDir: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val payloadCols = batch.columns.filterNot(
      Set("change_id", "op", "key")).toSeq
    // Reject unknown ops up front: without this, an op that is neither
    // 'upsert' nor 'delete' (a producer typo like 'Upsert') falls into
    // the merge's otherwise() branch and silently INSERTS the key with
    // all-null payload (new key) or silently keeps stale state
    // (existing key) — corruption, not an error.
    val checked = batch.withColumn("op",
      when(col("op").isin("upsert", "delete"), col("op"))
        .otherwise(raise_error(concat(
          lit("CdcApply: unknown op '"), col("op"),
          lit("' for key "), col("key"),
          lit(" (expected 'upsert' or 'delete')")))))
    // latest change per key within the batch wins
    val w = Window.partitionBy("key").orderBy(col("change_id").desc)
    val latest = checked
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery: the swap below renames target→.old then
    // .next→target. A crash between the two leaves NO target but a
    // complete pre-batch copy at .old — promote it back before reading,
    // else this batch would merge against empty state and the cleanup
    // delete of .old would destroy the only surviving copy. (.old is
    // only ever a fully-promoted former target, so it is always safe to
    // restore; a lone .next with no .old means the first-ever batch
    // crashed mid-write — empty state is then correct and .next is
    // overwritten below.)
    if (!fs.exists(new Path(stateDir)) &&
        fs.exists(new Path(stateDir + ".old"))) {
      require(fs.rename(new Path(stateDir + ".old"), new Path(stateDir)),
        s"cannot restore $stateDir from crash-surviving .old")
    }
    val current =
      if (fs.exists(new Path(stateDir))) spark.read.parquet(stateDir)
      else latest.filter(lit(false)).select(
        (col("key") +: payloadCols.map(col)): _*)
    val ch = latest.select(
      (col("key").as("__ck") +: col("op").as("__op") +:
        payloadCols.map(c => col(c).as(s"__c_$c"))): _*)
    val merged = current
      .join(ch, col("key") === col("__ck"), "full_outer")
      .filter(coalesce(col("__op"), lit("keep")) =!= "delete")
      .select((coalesce(col("key"), col("__ck")).as("key") +:
        payloadCols.map(c =>
          when(col("__op") === "upsert", col(s"__c_$c"))
            .otherwise(col(c)).as(c))): _*)
    val next = new Path(stateDir + ".next")
    merged.write.mode(SaveMode.Overwrite).parquet(next.toString)
    val target = new Path(stateDir)
    val old = new Path(stateDir + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) {
      require(fs.rename(target, old), s"cannot retire $target")
    }
    require(fs.rename(next, target), s"cannot promote $next")
    fs.delete(old, true)
  }
}
