package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, GraftPosGrams, TextStats}
import graft.tokenize.GraftFunctions
import org.apache.spark.unsafe.types.UTF8String

/** Span-level exact dedup: the native positional-gram kernel, spanDups
  * against an in-memory brute force (every k-window occurrence counting +
  * interval merge), planted-span recovery, and the removeSpans rewrite. */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  // ---- kernel --------------------------------------------------------------

  test("graft_posgrams: every k-gram in order, short docs empty") {
    def pg(s: String, k: Int): Seq[String] =
      (0 until GraftPosGrams.posGrams(UTF8String.fromString(s), k)
        .numElements()).map(i =>
        GraftPosGrams.posGrams(UTF8String.fromString(s), k)
          .getUTF8String(i).toString)
    assert(pg("a b c d", 2) == Seq("a b", "b c", "c d"))
    assert(pg("a b c d", 4) == Seq("a b c d"))
    assert(pg("a b c", 4) == Seq.empty)
    assert(pg("", 1) == Seq.empty)
    assert(pg("  x   y  ", 2) == Seq("x y")) // ws-split parity
    // repeated grams are NOT deduped (unlike graft_shingles)
    assert(pg("a b a b a", 2) == Seq("a b", "b a", "a b", "b a"))
  }

  test("graft_posgrams agrees between codegen and interpreted eval") {
    GraftFunctions.register(spark)
    val df = Seq((0L, "a b c a b c d"), (1L, "x y"), (2L, "")).toDF("id", "t")
    def run(): Seq[(Long, Seq[String])] =
      df.select(col("id"), call_function("graft_posgrams", col("t"), lit(3)))
        .as[(Long, Seq[String])].collect().toSeq.sortBy(_._1)
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  // ---- brute force ---------------------------------------------------------

  /** In-memory reference: count every k-window across the corpus, mark
    * windows occurring >= minOcc times, merge per-doc into maximal
    * intervals, fingerprint the span slice. */
  private def brute(docs: Seq[(Long, String)], k: Int,
      minOcc: Int = 2): Seq[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty) }.toMap
    val windows = docs.flatMap { case (id, _) =>
      val w = toks(id)
      (0 to w.length - k).filter(_ >= 0).map(p =>
        (id, p + 1, w.slice(p, p + k).mkString(" ")))
    }
    val occ = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = windows.filter(w => occ(w._3) >= minOcc)
    dup.groupBy(_._1).toSeq.flatMap { case (id, ws) =>
      val ps = ws.map(_._2).sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      ps.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2 + 1) {
          val (s, _) = spans.last
          spans(spans.length - 1) = (s, math.max(spans.last._2, p + k - 1))
        } else spans += ((p, p + k - 1))
      }
      spans.map { case (s, e) =>
        val text = toks(id).slice(s - 1, e).mkString(" ")
        var h = 0L
        text.codePoints().forEach(c => h = (h * 31 + c) % TextStats.FpMod)
        (id, s.toLong, (e - s + 1).toLong, h)
      }
    }.sortBy(r => (r._1, r._2))
  }

  private def planted: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(13)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    val boiler = "this license block repeats verbatim in many documents here"
    def words(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    Seq(
      (0L, words(30)),                              // random
      (1L, words(10) + " " + boiler + " " + words(10)), // boiler mid
      (2L, boiler + " " + words(25)),               // boiler at start
      (3L, words(12) + " " + boiler),               // boiler at end
      (4L, words(40)),                              // random
      (5L, boiler + " " + words(5) + " " + boiler), // boiler twice in ONE doc
      (6L, "tiny doc"),                             // < k tokens
      (7L, words(9) + " " + words(9))               // random, likely unique
    )
  }

  test("spanDups equals brute force on planted boilerplate (k=6)") {
    val docs = planted
    val got = Dedup.spanDups(docs.toDF("doc_id", "text"), k = 6)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == brute(docs, 6))
    // the planted boiler block (9 tokens) must surface in docs 1,2,3,5
    val byDoc = got.groupBy(_._1)
    Seq(1L, 2L, 3L, 5L).foreach(d =>
      assert(byDoc.contains(d), s"doc $d lost its planted span"))
    // identical spans share the cluster hash: docs 2 and 3 carry the
    // pure boiler block at different offsets
    assert(byDoc(2L).map(_._4).intersect(byDoc(3L).map(_._4)).nonEmpty)
  }

  test("within-doc repetition alone is a duplicated span") {
    // the repeated phrase occurs ONLY in this doc, twice
    val docs = Seq(
      (0L, "p q r s t u v w p q r s t u v w"),
      (1L, "completely unrelated other words entirely different here now"))
    val got = Dedup.spanDups(docs.toDF("doc_id", "text"), k = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == brute(docs, 8))
    assert(got.exists(_._1 == 0L))
    assert(!got.exists(_._1 == 1L))
  }

  test("spanDups brute-force identity on a random small corpus (k=3)") {
    val rnd = new scala.util.Random(99)
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (0L until 30L).map(i =>
      i -> Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(5))).mkString(" "))
    val got = Dedup.spanDups(docs.toDF("doc_id", "text"), k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == brute(docs, 3))
  }

  test("seeded fuzz: spanDups == brute force across seeds, k, vocab shape") {
    // small vocabularies force heavy accidental window collisions (the
    // adversarial regime for the island merge); the unicode vocab checks
    // the fingerprint's codepoint fold end to end
    val shapes = Seq(
      (101L, 2, Array("a", "b", "c")),
      (202L, 4, Array("aa", "bb", "cc", "dd", "ee")),
      (303L, 5, Array("naïve", "café", "über", "straße", "λσπ")),
      (404L, 3, Array("x")) // single-word vocab: everything collides
    )
    for ((seed, k, vocab) <- shapes) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 25L).map(i =>
        i -> Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      val got = Dedup.spanDups(docs.toDF("doc_id", "text"), k = k)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == brute(docs, k), s"seed=$seed k=$k")
    }
  }

  test("hashGrams scale path is output-identical to the string path") {
    // xxhash64 keys replace gram strings on the exchange; at test sizes a
    // collision is ~1e-12 so the outputs must match exactly
    val corpora = Seq(planted, {
      val rnd = new scala.util.Random(77)
      val vocab = Array("p", "q", "r", "s", "t", "u")
      (0L until 40L).map(i =>
        i -> Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(6)))
          .mkString(" "))
    })
    for ((docs, ci) <- corpora.zipWithIndex; k <- Seq(3, 6)) {
      val df = docs.toDF("doc_id", "text")
      val str = Dedup.spanDups(df, k = k)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val hashed = Dedup.spanDups(df, k = k, hashGrams = true)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(str == hashed, s"corpus=$ci k=$k")
    }
  }

  test("removeSpans strips exactly the covered tokens, keeps clean docs") {
    val docs = planted
    val df = docs.toDF("doc_id", "text")
    val spans = Dedup.spanDups(df, k = 6)
    val got = Dedup.removeSpans(df, spans)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // brute: drop covered positions
    val bruteSpans = brute(docs, 6).groupBy(_._1)
    docs.foreach { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val covered = bruteSpans.getOrElse(id, Seq.empty)
        .flatMap(s => s._2 to (s._2 + s._3 - 1)).toSet
      val kept = toks.zipWithIndex.collect {
        case (tok, i) if !covered.contains(i + 1L) => tok }
      assert(got(id) == ((kept.length.toLong, kept.mkString(" "))),
        s"doc $id")
    }
    // doc 0 (random 30 words over a 20-word vocab CAN collide on 6-grams
    // only by exact repetition — astronomically unlikely at this seed):
    // assert at least one doc passed through untouched end-to-end
    assert(got.exists { case (id, (n, _)) =>
      n == docs.toMap.apply(id).split("\\s+").count(_.nonEmpty) })
  }

  // ---- graft_despan kernel -------------------------------------------------

  test("graft_despan: clipping, overlap union, empty inputs, ws parity") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def run(t: String, ranges: (Long, Long)*): (Long, String) = {
      val r = graft.pipeline.GraftDespan.despan(UTF8String.fromString(t),
        new GenericArrayData(ranges.map(_._1).toArray),
        new GenericArrayData(ranges.map(_._2).toArray))
      (r.getLong(0), r.getUTF8String(1).toString)
    }
    assert(run("a b c d e", (2L, 2L)) == ((3L, "a d e")))
    // overlapping + abutting ranges union
    assert(run("a b c d e", (1L, 2L), (2L, 2L), (4L, 1L)) == ((1L, "e")))
    // no ranges: full text survives, ws-normalized like wsTokens
    assert(run("  a   b  ") == ((2L, "a b")))
    // out-of-range clipped, non-positive skipped, order irrelevant
    assert(run("a b c", (9L, 4L), (2L, 0L), (2L, -3L), (-5L, 7L)) ==
      ((2L, "b c")))
    // full cover and empty text
    assert(run("a b", (1L, 2L)) == ((0L, "")))
    assert(run("") == ((0L, "")))
    // overflow-safe clipping: a huge length clips instead of wrapping
    // negative and silently skipping the range
    assert(run("a b c", (2L, Long.MaxValue)) == ((1L, "a")))
    // negative start with a length long enough to reach into range
    assert(run("a b c", (-5L, 1000L)) == ((0L, "")))
    // negative start whose range ends before token 1: covers nothing
    assert(run("a b c", (-5L, 3L)) == ((3L, "a b c")))
    // Long.MinValue start can never reach token 1
    assert(run("a b c", (Long.MinValue, Long.MaxValue)) == ((3L, "a b c")))
  }

  test("graft_despan agrees between codegen and interpreted eval") {
    GraftFunctions.register(spark)
    val df = Seq(
      (0L, "a b c d e f", Array(2L, 5L), Array(2L, 2L)),
      (1L, "x y", Array.emptyLongArray, Array.emptyLongArray),
      (2L, "", Array(1L), Array(1L))).toDF("id", "t", "st", "ln")
    def run(): Seq[(Long, Long, String)] =
      df.select(col("id"),
          call_function("graft_despan", col("t"), col("st"), col("ln"))
            .as("r"))
        .select(col("id"), col("r.n_kept"), col("r.clean_text"))
        .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    val withCodegen = run()
    assert(withCodegen ==
      Seq((0L, 2L, "a d"), (1L, 2L, "x y"), (2L, 0L, "")))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  // ---- incremental (streaming/merge-loop) mode -----------------------------

  private def spansOf(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("spanDupsIncremental == full recompute restricted to the batch") {
    // the load-bearing case is CROSS-SLICE duplication: batch doc 1's
    // boiler block occurs once in the batch but twice in the base (docs 2
    // and 5), so the batch alone would never flag it — only the persisted
    // base counts can
    val docs = planted
    val batchIds = Set(1L, 6L, 7L)
    val base = docs.filterNot(d => batchIds(d._1))
    val batch = docs.filter(d => batchIds(d._1))
    for (k <- Seq(3, 6); hashed <- Seq(false, true)) {
      val full = brute(docs, k).filter(r => batchIds(r._1))
      val counts = Dedup.gramCounts(base.toDF("doc_id", "text"), k = k,
        hashGrams = hashed)
      val inc = spansOf(Dedup.spanDupsIncremental(
        batch.toDF("doc_id", "text"), counts, k = k, hashGrams = hashed))
      assert(inc == full, s"k=$k hashed=$hashed")
      if (k == 6)
        assert(inc.exists(_._1 == 1L), "cross-slice boiler span lost")
    }
  }

  test("seeded fuzz: incremental == restricted full across seeds and splits") {
    for (seed <- Seq(11L, 22L, 33L); k <- Seq(2, 4)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("a", "b", "c", "d")
      val docs = (0L until 40L).map(i =>
        i -> Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(4))).mkString(" "))
      val cut = 10 + rnd.nextInt(20)
      val base = docs.filter(_._1 < cut)
      val batch = docs.filter(_._1 >= cut)
      val counts = Dedup.gramCounts(base.toDF("doc_id", "text"), k = k)
      val inc = spansOf(Dedup.spanDupsIncremental(
        batch.toDF("doc_id", "text"), counts, k = k))
      assert(inc == brute(docs, k).filter(_._1 >= cut), s"seed=$seed k=$k")
    }
  }

  test("incremental loop: per-batch spans match a full recompute at each step") {
    // the streaming/merge economy end to end: three arriving batches, the
    // count state folded forward between them with mergeGramCounts; each
    // batch's spans must equal spanDups over EVERYTHING SEEN SO FAR
    // restricted to that batch — including unioned UNSQUASHED layers
    val rnd = new scala.util.Random(55)
    val vocab = Array("m", "n", "o", "p", "q")
    val docs = (0L until 60L).map(i =>
      i -> Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(5))).mkString(" "))
    val batches = docs.grouped(20).toSeq
    val k = 3
    var layers = List(Dedup.gramCounts(batches(0).toDF("doc_id", "text"), k))
    for (bi <- 1 until 3) {
      val batch = batches(bi)
      val seen = batches.take(bi + 1).flatten
      val expect = brute(seen, k)
        .filter(r => batch.exists(_._1 == r._1))
      // unioned layers (no pre-squash)
      val viaLayers = spansOf(Dedup.spanDupsIncremental(
        batch.toDF("doc_id", "text"), Dedup.mergeGramCounts(layers: _*), k))
      assert(viaLayers == expect, s"batch $bi via layers")
      // squashed state (compaction) — identical
      val squashed = Dedup.mergeGramCounts(layers: _*)
      val viaSquash = spansOf(Dedup.spanDupsIncremental(
        batch.toDF("doc_id", "text"), squashed, k))
      assert(viaSquash == expect, s"batch $bi via squash")
      layers ::= Dedup.gramCounts(batch.toDF("doc_id", "text"), k)
    }
  }

  test("crossedGrams: the compaction rescan key is exact and sufficient") {
    for (seed <- Seq(7L, 19L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("a", "b", "c", "d", "e")
      val k = 3
      val docs = (0L until 40L).map(i =>
        i -> Seq.fill(rnd.nextInt(22))(vocab(rnd.nextInt(5))).mkString(" "))
      val base = docs.filter(_._1 < 25)
      val batch = docs.filter(_._1 >= 25)
      def winds(ds: Seq[(Long, String)]): Seq[(Long, String)] = ds.flatMap {
        case (id, t) =>
          val w = t.split("\\s+").filter(_.nonEmpty)
          (0 to w.length - k).filter(_ >= 0)
            .map(p => id -> w.slice(p, p + k).mkString(" "))
      }
      val baseOcc = winds(base).groupBy(_._2).view.mapValues(_.size).toMap
      val batchOcc = winds(batch).groupBy(_._2).view.mapValues(_.size).toMap
      val expect = (baseOcc.keySet & batchOcc.keySet).filter(g =>
        baseOcc(g) < 2 && baseOcc(g) + batchOcc(g) >= 2)
      val crossed = Dedup.crossedGrams(batch.toDF("doc_id", "text"),
          Dedup.gramCounts(base.toDF("doc_id", "text"), k), k)
        .as[(String, Long, Long)].collect()
      assert(crossed.map(_._1).toSet == expect, s"seed=$seed")
      crossed.foreach { case (g, bo, to) =>
        assert(bo == baseOcc(g).toLong && to == batchOcc(g).toLong)
      }
      // SUFFICIENCY: a base doc containing no crossed gram keeps its
      // spans verbatim under the grown corpus — only docs the rescan key
      // selects can change (the compaction contract)
      val affected = base.filter { case (_, t) =>
        winds(Seq(0L -> t)).exists(w => expect(w._2)) }.map(_._1).toSet
      val before = brute(base, k).groupBy(_._1)
      val after = brute(docs, k).filter(r => r._1 < 25).groupBy(_._1)
      (base.map(_._1).toSet -- affected).foreach { d =>
        assert(before.getOrElse(d, Nil) == after.getOrElse(d, Nil),
          s"seed=$seed unaffected doc $d changed")
      }
      // and the split actually exercises the property
      assert(affected.nonEmpty, s"seed=$seed planted no crossings")
    }
  }

  test("incremental plan: the base count table is scanned, never shuffled") {
    // the Θ(batch) contract: the only gram exchange is the BATCH count
    // aggregate — a persisted base count table rides a broadcast probe
    // (batch gram keys) and a broadcast totalling join, so a second
    // hashpartitioning(g exchange would mean the base got shuffled
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inc_counts").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Dedup.gramCounts(docs.filter($"doc_id" % 2 === 0), k = 8)
      .write.mode("overwrite").parquet(dir)
    val counts = spark.read.parquet(dir)
    val inc = Dedup.spanDupsIncremental(
      docs.filter($"doc_id" % 2 === 1), counts, k = 8)
    inc.collect() // exchange reuse resolves in the FINAL adaptive plan
    val plan = inc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
      .linesIterator.filterNot(_.contains("ReusedExchange")).mkString("\n")
    assert("Exchange hashpartitioning\\(g".r.findAllIn(plan).length == 1,
      plan)
    assert("Exchange hashpartitioning\\(doc_id".r
      .findAllIn(plan).length == 1, plan)
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("exactIncremental plan: base digests scanned, batch-sized shuffles") {
    // the arrival-loop contract for the exact family: a PERSISTED digest
    // table rides broadcast probes; the only text_hash exchanges are the
    // Θ(batch) firsts aggregate and the batch-bounded touched distinct —
    // a third would mean the base table itself got repartitioned
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inc_digests").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Dedup.exact(docs.filter($"doc_id" % 2 === 0))
      .write.mode("overwrite").parquet(dir)
    val digests = spark.read.parquet(dir)
    val inc = Dedup.exactIncremental(docs.filter($"doc_id" % 2 === 1),
      digests)
    inc.collect()
    val plan = inc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
      .linesIterator.filterNot(_.contains("ReusedExchange")).mkString("\n")
    assert("Exchange hashpartitioning\\(text_hash".r
      .findAllIn(plan).length <= 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("minhashIncremental plan: every base-side join is a broadcast") {
    // the base band table and the base corpus appear only under broadcast
    // probes (band collision + candidate semi-join): an SMJ anywhere in
    // the final adaptive plan would mean a base-side frame got shuffled —
    // the exchange this operator exists to avoid. Batch-sized shuffles
    // (batch signatures, candidate distinct, verify aggregates) remain.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inc_bands").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = docs.filter($"doc_id" % 2 === 0)
    Dedup.minhashBands(base, numHashes = 64, bands = 16)
      .write.mode("overwrite").parquet(dir)
    val bands = spark.read.parquet(dir)
    val inc = Dedup.minhashLshPairsIncremental(
      docs.filter($"doc_id" % 2 === 1), base, bands,
      numHashes = 64, bands = 16, minPct = 60)
    inc.collect()
    val plan = inc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("jaccardIncremental plan: shingle table never shuffled") {
    // the exact-recall family member: persisted shingle sets + sizes ride
    // broadcast probes of the batch's shingles — intersection counts come
    // off the probe join's partial aggregation, so NOTHING exchanges by
    // shingle (an `Exchange hashpartitioning(shingle` would mean the base
    // inverted index got repartitioned — the full op's join, the exact
    // cost the incremental mode exists to avoid); pair/doc aggregates
    // stay batch- or pair-list-sized
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inc_shingles").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = docs.filter($"doc_id" % 2 === 0)
    Dedup.shingleSets(base, n = 3).write.mode("overwrite")
      .parquet(s"$dir/sets")
    val sets = spark.read.parquet(s"$dir/sets")
    Dedup.shingleSetSizes(sets).write.mode("overwrite")
      .parquet(s"$dir/sizes")
    val inc = Dedup.jaccardPairsIncremental(
      docs.filter($"doc_id" % 2 === 1), sets,
      baseSizes = Some(spark.read.parquet(s"$dir/sizes")),
      n = 3, minPct = 60)
    inc.collect()
    val plan = inc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
      .linesIterator.filterNot(_.contains("ReusedExchange")).mkString("\n")
    assert(!plan.contains("Exchange hashpartitioning(shingle"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
