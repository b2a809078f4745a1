package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{Compactor, IndexBuilder, IndexMerger, IndexStore}
import graft.model.{EngineConf, Turn}

/** Structured Streaming ingest: a stream of transcript turns is folded into
  * the index as a sequence of atomic snapshot commits.
  *
  * The reference has no streaming — its closest analog is the mtime
  * incremental scan with mark-before-scan watermark semantics (reference:
  * app/Indexer/Indexer.cpp:185-206; SURVEY.md §2.1 S4). This module is the
  * north star's upgrade path: `readStream → withWatermark →
  * dropDuplicatesWithinWatermark → foreachBatch(merge)`.
  *
  * Exactly-once shape: Spark's streaming checkpoint records which source
  * offsets each batch covered; [[IndexMerger]] commits each batch as an
  * immutable snapshot. A replayed batch (failure between merge-commit and
  * checkpoint-commit) re-merges the same turns — idempotent under the
  * engine's additive semantics (re-indexed docs keep their postings, stats
  * overwritten with the same values).
  */
object StreamingIndexer {

  /** Start folding `turns` (a STREAMING Dataset) into the index at `root`.
    *
    * @param watermark max lateness of `ts` used to expire the per-key
    *   dedup state (the streaming analog of the reference's
    *   mark-before-scan watermark)
    * @param maxLayers each micro-batch merge adds one snapshot layer;
    *   when the layer count reaches this bound a squash compaction runs
    *   (result-identical), keeping layered-read amplification O(1) over an
    *   unbounded stream — the streaming analog of LSM compaction. Defaults
    *   to `conf.maxLayers`, the same bound the batch CLI path applies (an
    *   explicit argument overrides the config for this stream only).
    */
  def start(spark: SparkSession, turns: Dataset[Turn], root: String,
      checkpointDir: String, watermark: String = "1 hour",
      conf: EngineConf = EngineConf.default,
      trigger: Trigger = Trigger.AvailableNow(),
      maxLayers: Int = -1): StreamingQuery = {
    val layerBound = if (maxLayers > 0) maxLayers else conf.maxLayers
    require(turns.isStreaming, "turns must be a streaming Dataset")
    turns
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        if (!batch.isEmpty) {
          val store = new IndexStore(root)
          if (store.currentVersion.isEmpty)
            IndexBuilder.build(batch.sparkSession, batch, root, conf)
          else {
            IndexMerger.merge(batch.sparkSession, batch, root, conf)
            if (store.layers(store.currentVersion.get).length >= layerBound)
              Compactor.compact(batch.sparkSession, root, conf)
          }
          ()
        }
      }
      .start()
  }
}
