package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Document deletion as LSM tombstones — the capability the reference's
  * additive merge lacks entirely (app/Index/Index_Merge.cpp never removes a
  * document; its only deletion path is rebuilding the index). The design is
  * Lucene's live-docs posture expressed over the layered snapshot store:
  *
  *   - `delete` commits a new snapshot whose ONLY payload is the tombstone
  *     table (old set ∪ newly matched ids) — Θ(deletes), the index tables
  *     ride along by reference, nothing is rewritten;
  *   - queries mask tombstoned docs out of the HIT SET ([[graft.search
  *     .Searcher]]: the doc-key resolution join and the WAND skip list);
  *     collection statistics (numDocs, avgdl, per-term df) stay as-of the
  *     snapshot until compaction — exactly Lucene's contract, where deleted
  *     docs stop matching immediately but keep influencing scores until
  *     their segments merge away;
  *   - a merge that re-indexes a tombstoned key RESURRECTS it (the
  *     tombstone set shrinks by the batch's ids — re-adding a doc means it
  *     should be found again), with the ordinary M1/M4 re-index semantics
  *     for its postings;
  *   - [[Compactor.compact]] PURGES: tombstoned rows leave docs/doc_stats,
  *     their postings are decode-filtered out, stats recompute — the
  *     compacted snapshot equals a fresh build over the live corpus.
  *
  * 100-TB shape: resolution is one docs-table scan with the delete keys
  * broadcast (the IndexMerger batch_prep economy); the tombstone write is
  * a single small file. Between compactions the tombstone set is bounded
  * by deletes-since-compaction — the same bound Lucene's per-segment
  * live-docs bitmaps carry.
  */
object IndexDeleter {

  /** Tombstone every indexed doc matching `keys` and commit a new snapshot.
    *
    * `keys` carries `conv_id` and optionally a nullable `turn_idx`: a row
    * with turn_idx null (or a keys frame without the column) deletes the
    * WHOLE conversation; a non-null turn_idx deletes that one turn. Keys
    * matching nothing (or only already-tombstoned docs) are a no-op: the
    * current snapshot stays, nothing is written.
    *
    * Returns (meta of the snapshot now current, newly tombstoned count). */
  def delete(spark: SparkSession, root: String, keys: DataFrame)
      : (IndexMeta, Long) = {
    import spark.implicits._
    val store = new IndexStore(root)
    val oldV = store.currentVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot to delete from at $root"))
    val oldMeta = store.meta(oldV)
    val docs = store.docsAt(spark, oldV)

    val hasTurn = keys.columns.contains("turn_idx")
    val turnKeys =
      if (hasTurn) keys.filter($"turn_idx".isNotNull)
        .select($"conv_id", $"turn_idx".cast("int").as("turn_idx")).distinct()
      else keys.limit(0).select($"conv_id", lit(0).as("turn_idx"))
    val convKeys =
      (if (hasTurn) keys.filter($"turn_idx".isNull) else keys)
        .select($"conv_id").distinct()
    // ONE docs scan, keys broadcast (the merge batch_prep economy)
    val matched = docs.join(broadcast(turnKeys), Seq("conv_id", "turn_idx"))
      .select($"doc_id")
      .unionByName(docs.join(broadcast(convKeys), Seq("conv_id"))
        .select($"doc_id"))
      .distinct()

    val existing = store.deletedIdsAt(spark, oldV)
    val fresh = existing match {
      case None => matched
      case Some(del) => matched.join(broadcast(del), Seq("doc_id"), "left_anti")
    }
    val nNew = fresh.count()
    if (nNew == 0) return (oldMeta, 0L)

    val v = store.nextVersion
    val dir = store.snapshotDir(v)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val union = existing match {
      case None => matched
      case Some(del) => del.unionByName(matched).distinct()
    }
    // tombstones are tiny by contract — one file, like replaced_terms
    union.repartition(1).sortWithinPartitions($"doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/deleted")

    // the index tables ride along by reference: this layer's data dirs are
    // never written, so the layered readers (hasData) skip them
    store.writeLayers(v, store.layers(oldV) :+ TableLayer(v, s"v$v/docs",
      s"v$v/doc_stats", s"v$v/postings", s"v$v/dict", None,
      Some(s"v$v/deleted")))
    // stats stay as-of the snapshot (the Lucene staleness contract);
    // compaction recomputes them exactly
    store.writeMeta(v, oldMeta.copy(version = v))
    store.watermark(oldV).foreach(store.writeWatermark(v, _))
    store.recordStage(v, "delete", nNew, 0L,
      Map("deletedFrom" -> s"v$oldV", "newTombstones" -> nNew))
    store.commit(v)
    (store.meta(v), nNew)
  }
}
