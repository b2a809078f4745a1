package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{EngineConf, Turn}
import graft.search.Percolator

/** The alerting loop: percolate each ARRIVING micro-batch of turns
  * against the registered query set and append the matches — the
  * Elasticsearch-percolate / Lucene-Monitor use case composed with
  * Structured Streaming.
  *
  * [[Percolator.matchesUnsorted]] is a stateless codegen projection
  * (queries compile into the plan), so this streams NATIVELY: append
  * mode, no state store, no watermark, no foreachBatch — the cheapest
  * possible streaming operator shape, and exactly-once to the parquet
  * sink (file-sink commit log). At 100 TB-scale ingest the percolation
  * adds zero shuffle to the stream: alerts are produced in the same
  * stage that reads the source. */
object StreamingPercolator {

  /** Start the loop: alerts (conv_id, turn_idx, query_id) append to
    * `outDir` as parquet; `checkpoint` is the sink's commit log. */
  def start(turns: Dataset[Turn], queries: Seq[String], outDir: String,
      checkpoint: String, conf: EngineConf = EngineConf.default,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    Percolator.matchesUnsorted(turns, queries, conf)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
