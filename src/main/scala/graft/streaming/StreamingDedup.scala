package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Dedup

/** Dedup-on-ingest: a streaming documents source is deduplicated against
  * everything that arrived before it, composing the incremental dedup
  * family's persisted-state economy with Structured Streaming — the
  * production arrival loop ([[graft.pipeline.Dedup.exactIncremental]])
  * as a `foreachBatch` sink.
  *
  * State layout under `root`:
  *  - `root/digests` — the append-only digest table: each micro-batch
  *    appends its own [[Dedup.exact]] digests after being judged. The
  *    table is the probe target of the NEXT batch — scanned under a
  *    broadcast of that batch's digest set, never shuffled (the
  *    [[Dedup.spanDupsIncremental]] shape; duplicate digests across
  *    layers are harmless — the probe distincts the touched set).
  *  - `root/verdicts` — the sink: one (doc_id, text_hash, is_new,
  *    batch_id) row per arrived doc, `is_new` = first occurrence in
  *    arrival order (earlier batch wins; within a batch, lowest id — so
  *    with ids increasing in arrival order the verdicts equal a full
  *    corpus-wide [[Dedup.exact]] first-occurrence pass).
  *
  * Exactly-once shape: the streaming checkpoint records batch coverage;
  * a batch REPLAYED after a failure between the two appends re-appends
  * rows. Digest duplicates are semantically inert (see above); verdict
  * rows are at-least-once — readers needing exactly-once dedup verdicts
  * read `dropDuplicates("batch_id", "doc_id")`, the usual idempotent-sink
  * convention for append-mode foreachBatch.
  *
  * The other incremental operators compose the same way: persist
  * [[Dedup.gramCounts]] layers for span dedup or [[Dedup.minhashBands]]
  * for near-dup pairs, append per batch, probe on arrival.
  */
object StreamingDedup {

  /** Start judging `docs` (a STREAMING DataFrame with `doc_id`, `text`)
    * against the digest state at `root`. */
  def start(spark: SparkSession, docs: DataFrame, root: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    val digestsDir = s"$root/digests"
    val verdictsDir = s"$root/verdicts"
    docs
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          import s.implicits._
          val base =
            if (java.nio.file.Files.isDirectory(
                java.nio.file.Paths.get(digestsDir)))
              s.read.parquet(digestsDir)
            else Seq.empty[String].toDF("text_hash")
          Dedup.exactIncremental(batch, base)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(verdictsDir)
          Dedup.exact(batch).select("text_hash")
            .write.mode("append").parquet(digestsDir)
          ()
        }
      }
      .start()
  }
}
