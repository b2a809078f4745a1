package graft

import java.nio.file.{Files, Paths}

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.EngineConf
import graft.verify.IndexCheck

/** Checkpoint-resume (north_rule): a build interrupted after some stages
  * committed resumes into the SAME staging version, skips the completed
  * stages (their outputs are taken as-is), and runs only the rest. */
class ResumeSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64,
    blockSize = 16)

  test("a partially-built snapshot resumes, reusing completed stage outputs") {
    val root = tmpDir("graft-resume")
    val store = new IndexStore(root)
    val corpus = TranscriptGen.dataset(spark, 30)

    // simulate a crash after the prep stage committed: write a DOCTORED
    // _prep (one sentinel turn replaces the real corpus) and record the
    // stage in the manifest, but leave the snapshot uncommitted
    val v = store.nextVersion
    assert(v == 1)
    Files.createDirectories(Paths.get(store.snapshotDir(v)))
    Seq((0L, "conv-sentinel", 0, "sentinel zebra unique wordhere", 4, 4))
      .toDF("doc_id", "conv_id", "turn_idx", "text", "word_count", "dl")
      .write.parquet(s"${store.snapshotDir(v)}/_prep")
    store.recordStage(v, "prep", -1L, 0L)

    // re-running the build must resume v1 and SKIP prep — so the final
    // index reflects the sentinel prep, not the 30-conversation corpus
    val meta = IndexBuilder.build(spark, corpus, root, conf)
    assert(meta.version == 1)
    assert(store.currentVersion.contains(1))
    assert(meta.numDocs == 1)
    val docs = store.docs(spark).as[(Long, String, Int)].collect()
    assert(docs.toSeq == Seq((0L, "conv-sentinel", 0)))
    val dict = store.dict(spark).select("term").as[String].collect().toSet
    assert(dict == Set("sentinel", "zebra", "unique", "wordhere"))
    assert(IndexCheck.healthy(spark, store))

    // manifest carries the resumed lineage: prep recorded once, later
    // stages recorded by the resumed run
    val stages = store.completedStages(1)
    assert(Set("prep", "docs", "doc_stats", "hot_terms", "postings", "dict",
      "meta").subsetOf(stages))
  }

  test("a fully-committed snapshot is never resumed into — next build is v2") {
    val root = tmpDir("graft-resume2")
    IndexBuilder.build(spark, TranscriptGen.dataset(spark, 10), root, conf)
    val store = new IndexStore(root)
    assert(store.currentVersion.contains(1))
    assert(store.nextVersion == 2)
  }
}
