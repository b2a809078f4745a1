package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row

import graft.index.{IndexBuilder, IndexStore}
import graft.model.EngineConf
import graft.search.Searcher
import graft.sources.FileCorpus

/** The file-directory source: reference scan semantics (S1-S3 + the S6
  * .md empty-set quirk) over an actual folder of files, end to end into
  * the index. */
class FileCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default.copy(maxPostingsPerPart = 64,
    blockSize = 16)

  private def write(dir: String, rel: String, text: String): Unit = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text)
  }

  test("directory scan: extensions, hidden paths, md quirk, end-to-end search") {
    val dir = tmpDir("graft-fs-corpus")
    write(dir, "notes/alpha.txt", "zebra wombat searching indexes therefore")
    write(dir, "notes/bravo.md", "marked content should vanish entirely")
    write(dir, "notes/.hidden/secret.txt", "hidden zebra never indexed")
    write(dir, "skipme.log", "wrong extension zebra")
    write(dir, "deep/nested/charlie.txt", "zebra appears again nested")

    val corpus = FileCorpus.read(spark, dir)
    val rows = corpus.collect().map(t => t.conv_id -> t.text).toMap
    // allowlist + hidden-path skip (S2/S3)
    assert(rows.keySet == Set("notes/alpha.txt", "notes/bravo.md",
      "deep/nested/charlie.txt"))
    // S6 quirk: the .md doc row survives with EMPTY tokens
    assert(rows("notes/bravo.md") == "")
    assert(rows("notes/alpha.txt").contains("wombat"))

    // end-to-end: build + search over the folder
    val idx = tmpDir("graft-fs-idx")
    val meta = IndexBuilder.build(spark, corpus, idx, conf)
    assert(meta.numDocs == 3)
    val store = new IndexStore(idx)
    // the md doc has zero word_count/dl (reference keeps the path entry)
    val mdStats = store.docStats(spark).join(store.docs(spark), "doc_id")
      .filter($"conv_id" === "notes/bravo.md")
      .select($"word_count", $"dl").as[(Int, Int)].head()
    assert(mdStats == ((0, 0)))
    val s = new Searcher(spark, store, conf)
    val got = s.searchCount("zebra").collect()
      .map { case Row(c: String, _: Int, _: Long) => c }.toSet
    assert(got == Set("notes/alpha.txt", "deep/nested/charlie.txt"))
    assert(s.searchCount("marked").collect().isEmpty) // md content not indexed
    s.close()

    // quirk off: markdown content indexes
    val full = FileCorpus.read(spark, dir, mdEmptyQuirk = false)
    assert(full.filter(_.conv_id == "notes/bravo.md").head().text
      .contains("marked"))
  }

  test("filename tokenization (T3): .txt filename words join the word set") {
    val dir = tmpDir("graft-fs-fname")
    // body never contains 'networking'; only the filename does
    write(dir, "networking-guide.txt", "zebra wombat searching indexes")
    // .md: the reference's get_words never reaches the filename either
    write(dir, "elephant-notes.md", "ignored body")
    // body-final token of 4 chars must KEEP its end-of-file rule even with
    // the filename appended ('wxyz' is kept only by the final 4..19 rule)
    write(dir, "shortend.txt", "searching ends with wxyz")

    val idx = tmpDir("graft-fs-fname-idx")
    IndexBuilder.build(spark, FileCorpus.read(spark, dir), idx, conf)
    val s = new Searcher(spark, new IndexStore(idx), conf)
    def hits(q: String): Set[String] =
      s.searchCount(q).collect().map(_.getString(0)).toSet
    // a query matching only the filename finds the file (reference
    // Indexer.cpp:92-111)
    assert(hits("networking") == Set("networking-guide.txt"))
    assert(hits("guide") == Set("networking-guide.txt"))
    // .md filenames contribute nothing under the quirk
    assert(hits("elephant") == Set.empty)
    // body-final rule preserved: 'wxyz' (len 4) still indexed (quoted =
    // exact match, since 4-char wildcards are dropped by the min-char quirk)
    assert(hits(""""wxyz"""") == Set("shortend.txt"))
    // the filename base itself indexes ('shortend', interior 5-14)
    assert(hits("shortend") == Set("shortend.txt"))
    s.close()
  }

  test("root path with regex metacharacters strips positionally") {
    // '(', '+', '.' are regex metacharacters (the r2 regexp_replace strip
    // threw or mis-stripped on them) but legal in Hadoop path globs —
    // '[', '{', '*' are glob chars Hadoop itself rejects, out of scope
    val base = tmpDir("graft-fs-meta")
    val dir = java.nio.file.Paths.get(base, "w(e+i).rd").toString
    write(dir, "sub/alpha.txt", "zebra wombat indexes")
    val rows = FileCorpus.read(spark, dir).collect()
    assert(rows.map(_.conv_id).toSet == Set("sub/alpha.txt"))
  }
}
