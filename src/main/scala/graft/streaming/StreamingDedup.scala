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
  *  - `root/digests` — the append-only digest table, one
  *    (text_hash, batch_id) row per distinct digest per batch. A batch is
  *    judged ONLY against digests with `batch_id < its own` — so a batch
  *    REPLAYED after its digest append (the foreachBatch at-least-once
  *    window: crash after the appends, before the checkpoint commit)
  *    never sees its own digests and re-emits byte-identical verdicts.
  *    The probe is the [[Dedup.spanDupsIncremental]] shape: the state
  *    table is scanned under a broadcast of the batch's digest set,
  *    never shuffled.
  *  - `root/verdicts` — the sink: one (doc_id, text_hash, is_new,
  *    batch_id) row per arrived doc, `is_new` = first occurrence in
  *    arrival order (earlier batch wins; within a batch, lowest id — so
  *    with ids increasing in arrival order the verdicts equal a full
  *    corpus-wide first-occurrence pass). Digests derive from the SAME
  *    judged frame (no second md5 scan of the batch), so the state table
  *    carries the normalized null≡empty digests by construction.
  *
  * Exactly-once shape: the streaming checkpoint records batch coverage;
  * a replayed batch re-appends rows. Digest re-appends are inert (the
  * batch_id filter plus the probe's distinct); verdict rows are
  * at-least-once AND identical across replays (see above), so readers
  * needing exactly-once verdicts read
  * `dropDuplicates("batch_id", "doc_id")` — the usual idempotent-sink
  * convention for append-mode foreachBatch.
  *
  * The other incremental operators compose the same way: persist
  * [[Dedup.gramCounts]] layers for span dedup or [[Dedup.minhashBands]]
  * for near-dup pairs, append per batch with the same batch_id tag,
  * probe on arrival.
  */
object StreamingDedup {

  /** Start judging `docs` (a STREAMING DataFrame with `doc_id`, `text`)
    * against the digest state at `root`. The state dirs may live on any
    * Hadoop-visible filesystem (existence is resolved through the same
    * FileSystem Spark writes to, not the driver's local disk). */
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
          val hPath = new org.apache.hadoop.fs.Path(digestsDir)
          val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          val base =
            if (fs.exists(hPath))
              s.read.parquet(digestsDir)
                .filter(col("batch_id") < batchId)
            else Seq.empty[String].toDF("text_hash")
          val verdicts = Dedup.exactIncremental(batch, base)
            .withColumn("batch_id", lit(batchId))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          verdicts.write.mode("append").parquet(verdictsDir)
          verdicts.select(col("text_hash")).distinct()
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(digestsDir)
          verdicts.unpersist(blocking = false)
          ()
        }
      }
      .start()
  }

  /** Semantic dedup-on-ingest: the embedding arrival loop
    * ([[graft.pipeline.Similarity.semDedupIncremental]]) as the same
    * foreachBatch sink over a streaming (vec_id, embedding) source. The
    * quantizer is FROZEN for the stream's lifetime (the composability pin
    * of the incremental family — refitting is a compaction-cadence event
    * that rebuilds the state table).
    *
    * State layout under `root`:
    *  - `root/cells` — assigned-cell rows of KEPT docs only (the greedy
    *    keep rule needs exactly the kept set as the future base),
    *    batch_id-tagged: a replayed batch judges only `batch_id < its
    *    own`, so re-verdicts are byte-identical (the digest-table trick);
    *  - `root/verdicts` — (vec_id, is_new, batch_id), at-least-once with
    *    the `dropDuplicates("batch_id", "vec_id")` reader shape. Rows
    *    exist only for docs with a valid embedding (malformed vectors
    *    fall out via the assignment kernel's null contract). */
  def startSemantic(spark: SparkSession, vecs: DataFrame, root: String,
      checkpointDir: String, centroids: Array[Array[Double]],
      minCos: Double,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(vecs.isStreaming, "vecs must be a streaming DataFrame")
    val cellsDir = s"$root/cells"
    val verdictsDir = s"$root/verdicts"
    vecs
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val hPath = new org.apache.hadoop.fs.Path(cellsDir)
          val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          val base =
            if (fs.exists(hPath))
              s.read.parquet(cellsDir)
                .filter(col("batch_id") < batchId).drop("batch_id")
            else
              graft.pipeline.Similarity.assignCells(batch.limit(0),
                centroids)
          val verdicts = graft.pipeline.Similarity
            .semDedupIncremental(batch, base, centroids, minCos)
            .withColumn("batch_id", lit(batchId))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          verdicts.write.mode("append").parquet(verdictsDir)
          graft.pipeline.Similarity.assignCells(batch, centroids)
            .join(verdicts.filter(col("is_new")).select(col("vec_id")),
              Seq("vec_id"), "left_semi")
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(cellsDir)
          verdicts.unpersist(blocking = false)
          ()
        }
      }
      .start()
  }
}
