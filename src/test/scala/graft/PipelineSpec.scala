package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextStats}

/** Training-data pipeline operators: dedup, similarity, text stats,
  * multimodal plumbing — exactness checked against in-memory brute force. */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  // tiny corpus with planted exact + near duplicates
  private lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river edge"), // near dup of 0
    (3L, "spark shuffles partitions across the cluster with hash joins"),
    (4L, "completely different text about embeddings and vector search"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today"), // near dup
    (6L, "short text"),
    (7L, "a a a a a the the the of of in to") // stopword soup
  ).toDF("doc_id", "text")

  private def wordSet(s: String): Set[String] = s.split("\\s+").toSet
  private def shingleSet(s: String, n: Int = 3): Set[String] =
    s.split("\\s+").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
  private def jacc(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0 else (a & b).size.toDouble / (a | b).size

  test("exact dedup groups identical texts under the smallest id") {
    val groups = Dedup.exact(docs).collect()
    val dupGroup = groups.filter(_.getAs[Long]("n_dups") > 1)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 0L)
    assert(dupGroup.head.getAs[Long]("n_dups") == 2L)
  }

  test("shingles match sliding-window brute force") {
    val got = Dedup.shingles(docs, 3).as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val local = docs.as[(Long, String)].collect().toMap
    for ((id, text) <- local) {
      val expected = shingleSet(text)
      assert(got.getOrElse(id, Set.empty) == expected, s"doc $id")
    }
  }

  test("jaccardPairs equals brute-force pairs at the threshold") {
    val local = docs.as[(Long, String)].collect().toMap
    val expected = (for {
      a <- local.keys; b <- local.keys if a < b
      sa = shingleSet(local(a)); sb = shingleSet(local(b))
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size; uni = (sa | sb).size
      if inter * 100 >= uni * 60
    } yield (a, b)).toSet
    val got = Dedup.jaccardPairs(docs, n = 3, minPct = 60)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(expected.contains((0L, 1L))) // sanity: planted pairs exist
  }

  test("capped jaccardPairs: precision 1, full recall on the driver corpus") {
    // the scale config (hot-shingle skew cap) on the real testdata: dropped
    // shingles only remove CANDIDATE routes and lower the counted
    // intersection, so pairs are a subset of exact; with cap ≈ 1% of the
    // corpus the planted near-dups all survive via cold shingles — the
    // property the q_dedup_jaccard_capped gate entry relies on
    val driverDocs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = Dedup.jaccardPairs(driverDocs, n = 3, minPct = 80)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.jaccardPairs(driverDocs, n = 3, minPct = 80,
        hotShingleCap = Some(5))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact)) // capped inter is a lower bound
    assert(capped == exact, s"recall ${capped.size}/${exact.size}")
    assert(exact.nonEmpty)
  }

  test("minhash LSH pairs: precision 1.0 and full recall on planted dups") {
    val exact = Dedup.jaccardPairs(docs, n = 3, minPct = 60)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, numHashes = 64, bands = 16,
      minPct = 60).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // exact verification ⇒ precision 1
    assert(lsh.contains((0L, 1L)) && lsh.contains((0L, 2L)))
  }

  test("incremental minhash == full pairs restricted to the batch") {
    // batch = odd ids {1,3,5,7}, base = even: the planted dups put pairs
    // in BOTH classes the contract covers — batch-internal (1,5) and
    // cross (0,1)/(0,5)/(2,5)... — while base-only pairs must not leak
    val batch = docs.filter($"doc_id" % 2 === 1)
    val base = docs.filter($"doc_id" % 2 === 0)
    val full = Dedup.minhashLshPairs(docs, numHashes = 64, bands = 16,
        minPct = 60).as[(Long, Long, Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(expected.exists(p => p._1 % 2 == 1 && p._2 % 2 == 1),
      "fixture lost its batch-internal pair")
    assert(expected.exists(p => p._1 % 2 != p._2 % 2),
      "fixture lost its cross pair")
    val baseBands = Dedup.minhashBands(base, numHashes = 64, bands = 16)
    val inc = Dedup.minhashLshPairsIncremental(batch, base, baseBands,
        numHashes = 64, bands = 16, minPct = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == expected, s"diff: ${inc -- expected} / ${expected -- inc}")
    // the degraded big-batch path (band table SMJ, corpus still never
    // shuffled) must produce the identical set
    val incSmj = Dedup.minhashLshPairsIncremental(batch, base, baseBands,
        numHashes = 64, bands = 16, minPct = 60, broadcastBands = false)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(incSmj == expected)
  }

  test("incremental jaccard == full pairs restricted to the batch") {
    // same split as the minhash test: planted dups give batch-internal
    // AND cross pairs; base-only pairs must not leak
    val batch = docs.filter($"doc_id" % 2 === 1)
    val base = docs.filter($"doc_id" % 2 === 0)
    val full = Dedup.jaccardPairs(docs, n = 3, minPct = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(expected.exists(p => p._1 % 2 != p._2 % 2),
      "fixture lost its cross pair")
    val baseSets = Dedup.shingleSets(base, n = 3)
    for (bc <- Seq(true, false);
         sizes <- Seq(Some(Dedup.shingleSetSizes(baseSets)), None)) {
      val inc = Dedup.jaccardPairsIncremental(batch, baseSets,
          baseSizes = sizes, n = 3, minPct = 60, broadcastShingles = bc)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(inc == expected,
        s"broadcast=$bc sizes=${sizes.nonEmpty}: " +
          s"diff ${inc -- expected} / ${expected -- inc}")
    }
  }

  test("incremental jaccard: hashed-shingle state identical on this corpus") {
    val batch = docs.filter($"doc_id" % 2 === 1)
    val base = docs.filter($"doc_id" % 2 === 0)
    val expected = Dedup.jaccardPairs(docs, n = 3, minPct = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    val hashedSets = Dedup.shingleSets(base, n = 3, hashShingles = true)
    val inc = Dedup.jaccardPairsIncremental(batch, hashedSets,
        n = 3, minPct = 60, hashShingles = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == expected)
  }

  test("incremental jaccard: combined-df skew cap == capped full run") {
    // plant boilerplate shared by half the corpus so the cap engages on
    // the COMBINED df (base df 3 + batch df 2 crosses cap 4; neither side
    // alone does): the incremental hot set must equal the full run's
    val boiler = "every one of these documents shares this exact header line"
    val bodies = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      "kilo lima mike november oscar papa quebec romeo sierra tango",
      "uniform victor whiskey xray yankee zulu one two three four",
      "red orange yellow green blue indigo violet pink brown black",
      "monday tuesday wednesday thursday friday saturday sunday noon dusk dawn",
      "north south east west center upper lower inner outer middle")
    val corpus = (0L until 10L).map { i =>
      val body = bodies((i % bodies.length).toInt)
      val text = if (i < 5) s"$boiler $body extra$i" else s"$body tail$i"
      (i, text)
    }.toDF("doc_id", "text")
    val batch = corpus.filter($"doc_id" % 2 === 1)
    val base = corpus.filter($"doc_id" % 2 === 0)
    val cap = 4
    val fullCapped = Dedup.jaccardPairs(corpus, n = 3, minPct = 20,
        hotShingleCap = Some(cap))
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = fullCapped.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    val fullUncapped = Dedup.jaccardPairs(corpus, n = 3, minPct = 20)
      .as[(Long, Long, Long, Long)].collect().toSet
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(expected != fullUncapped,
      "fixture must make the cap change the answer, or the test is vacuous")
    val baseSets = Dedup.shingleSets(base, n = 3)
    // the df state maintained as per-batch LAYERS folded by mergeShingleDf
    // (the compaction-cadence path) must equal the one-shot table — feed
    // the cap from the layered form to prove the maintenance loop
    val layered = Dedup.mergeShingleDf(
      Dedup.shingleDfCounts(Dedup.shingleSets(base.filter($"doc_id" < 4),
        n = 3)),
      Dedup.shingleDfCounts(Dedup.shingleSets(base.filter($"doc_id" >= 4),
        n = 3)))
    assert(layered.as[(String, Long)].collect().toMap ==
      Dedup.shingleDfCounts(baseSets).as[(String, Long)].collect().toMap)
    val inc = Dedup.jaccardPairsIncremental(batch, baseSets,
        baseSizes = Some(Dedup.shingleSetSizes(baseSets)),
        baseDf = Some(layered),
        n = 3, minPct = 20, hotShingleCap = Some(cap))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == expected,
      s"diff ${inc -- expected} / ${expected -- inc}")
  }

  test("incremental simhash == full pairs restricted to the batch") {
    val batch = docs.filter($"doc_id" % 2 === 1)
    val base = docs.filter($"doc_id" % 2 === 0)
    for (bits <- Seq(31, 64)) {
      val full = Dedup.simhashPairs(docs, maxHamming = 3, bits = bits)
        .as[(Long, Long, Long)].collect().toSet
      val expected = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
      assert(expected.nonEmpty, s"fixture lost its pairs at bits=$bits")
      val sigs = Dedup.simhash(base, bits = bits)
      for (bc <- Seq(true, false)) {
        val inc = Dedup.simhashPairsIncremental(batch, sigs,
            maxHamming = 3, bits = bits, broadcastSigs = bc)
          .as[(Long, Long, Long)].collect().toSet
        assert(inc == expected,
          s"bits=$bits broadcast=$bc: ${inc -- expected} / ${expected -- inc}")
      }
    }
  }

  test("incremental exact dedup: first-occurrence verdicts vs brute force") {
    // batch = odd ids; doc 1 duplicates base doc 0 (not new), and a
    // batch-internal dup pair exercises the lower-id-wins rule
    // the planted pair's text appears NOWHERE else in the fixture, so its
    // first occurrence is unambiguously doc 9 (both planted ids are odd →
    // batch-internal pair, lower id wins); 12/13 plant the null≡empty
    // convention — a null-text arrival must get a verdict, and it matches
    // a base empty-string doc
    val withBatchDup = docs.unionByName(Seq(
      (9L, "a genuinely fresh sentence that only these two docs share"),
      (11L, "a genuinely fresh sentence that only these two docs share"),
      (12L, ""),
      (13L, null.asInstanceOf[String])
    ).toDF("doc_id", "text"))
    val batch = withBatchDup.filter($"doc_id" % 2 === 1)
    val base = withBatchDup.filter($"doc_id" % 2 === 0)
    for (bc <- Seq(true, false)) {
      val got = Dedup.exactIncremental(batch, Dedup.exact(base),
          broadcastDigests = bc)
        .select("doc_id", "is_new").as[(Long, Boolean)].collect().toMap
      // local replica under the null≡empty convention
      def norm(t: String): String = if (t == null) "" else t
      val baseTexts = base.select("text").as[String].collect()
        .map(norm).toSet
      val local = batch.select("doc_id", "text").as[(Long, String)].collect()
        .map { case (id, t) => (id, norm(t)) }
      val firstId = local.groupBy(_._2).map { case (t, ds) =>
        t -> ds.map(_._1).min }
      assert(got.keySet == local.map(_._1).toSet,
        "one verdict row per batch doc, null text included")
      local.foreach { case (id, text) =>
        val expect = !baseTexts.contains(text) && firstId(text) == id
        assert(got(id) == expect, s"doc $id (broadcast=$bc)")
      }
      assert(!got(1L), "doc 1 duplicates base doc 0")
      assert(got(9L) && !got(11L), "batch-internal dup: lower id wins")
      assert(!got(13L), "null-text arrival matches the base empty doc")
    }
  }

  test("seeded fuzz: incremental exact/minhash == full-run restriction") {
    // random corpora from tiny vocabularies (heavy accidental shingle
    // overlap — the adversarial regime for candidate generation), random
    // batch predicates: both incremental operators must reproduce the
    // full run restricted to pairs/docs touching the batch, on BOTH join
    // paths
    for ((seed, mod) <- Seq((41L, 2), (42L, 3), (43L, 5))) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("ga", "bu", "zo", "meu", "ren", "tok")
      val corpus = (0L until 40L).map(i =>
        i -> Seq.fill(4 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")).toDF("doc_id", "text")
      val batch = corpus.filter($"doc_id" % mod === 1)
      val base = corpus.filter($"doc_id" % mod =!= 1)
      // minhash family
      val full = Dedup.minhashLshPairs(corpus, numHashes = 64, bands = 16,
        minPct = 60).as[(Long, Long, Long, Long)].collect().toSet
      val expPairs = full.filter(p => p._1 % mod == 1 || p._2 % mod == 1)
      val bands = Dedup.minhashBands(base, numHashes = 64, bands = 16)
      for (bc <- Seq(true, false)) {
        val inc = Dedup.minhashLshPairsIncremental(batch, base, bands,
            numHashes = 64, bands = 16, minPct = 60, broadcastBands = bc)
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(inc == expPairs, s"seed=$seed mod=$mod broadcast=$bc")
      }
      // exact family
      val texts = corpus.as[(Long, String)].collect()
      val baseTexts = texts.filter(_._1 % mod != 1).map(_._2).toSet
      val batchDocs = texts.filter(_._1 % mod == 1)
      val firstId = batchDocs.groupBy(_._2).map { case (t, ds) =>
        t -> ds.map(_._1).min }
      val expNew = batchDocs.map { case (id, t) =>
        id -> (!baseTexts.contains(t) && firstId(t) == id) }.toMap
      for (bc <- Seq(true, false)) {
        val got = Dedup.exactIncremental(batch, Dedup.exact(base),
            broadcastDigests = bc)
          .select("doc_id", "is_new").as[(Long, Boolean)].collect().toMap
        assert(got == expNew, s"seed=$seed mod=$mod broadcast=$bc")
      }
    }
  }

  test("kmeansRefine: distributed Lloyd step == local step; error drops") {
    val rnd = new scala.util.Random(5)
    val pts = (0L until 200L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    // a wrong-dimension vector rides along and must be ignored
    val df = (pts :+ (900L, Array.fill(3)(0.1f))).toDF("vec_id", "embedding")
    val seed = Array.fill(4)(Array.fill(8)(rnd.nextGaussian()))
    val refined = Similarity.kmeansRefine(df, seed, iters = 1)
    // local replica of one Lloyd step over the same float→double casts
    val local = pts.map(_._2.map(_.toDouble))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def nearest(p: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bd = d2(p, cs(0)); var j = 1
      while (j < cs.length) {
        val dj = d2(p, cs(j)); if (dj < bd) { bd = dj; best = j }; j += 1
      }
      best
    }
    val byCell = local.groupBy(p => nearest(p, seed))
    val expected = seed.zipWithIndex.map { case (s0, cell) =>
      byCell.get(cell) match {
        case Some(ps) =>
          val sum = new Array[Double](8)
          ps.foreach(p => (0 until 8).foreach(i => sum(i) += p(i)))
          sum.map(_ / ps.length)
        case None => s0
      }
    }
    refined.zip(expected).zipWithIndex.foreach { case ((r, e), cell) =>
      r.zip(e).foreach { case (rv, ev) =>
        assert(math.abs(rv - ev) < 1e-6, s"cell $cell: $rv vs $ev")
      }
    }
    // quantization error is non-increasing (the Lloyd guarantee)
    def qerr(cs: Array[Array[Double]]): Double =
      local.map(p => cs.map(c => d2(p, c)).min).sum
    assert(qerr(refined) <= qerr(seed) + 1e-9,
      s"refinement raised error: ${qerr(seed)} -> ${qerr(refined)}")
  }

  test("graft_fphash == the HOF ascii-fold formula (incl. unicode)") {
    graft.tokenize.GraftFunctions.register(spark)
    val texts = Seq("", "a", "hello world", "Mixed CASE 123 !?",
      "naïve façade Äpfel", "中文 and ascii", "😀 emoji pair",
      "x" * 500).toDF("text")
    // the r2 reference formula: aggregate over per-codepoint split
    val hof = aggregate(filter(split(col("text"), ""), c => c =!= ""),
      lit(0L), (acc, c) => (acc * 31 + ascii(c)) % TextStats.FpMod)
    val rows = texts.select(TextStats.fingerprintCol(col("text")).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("graft_shingles == the wsTokens sliding-window HOF form") {
    graft.tokenize.GraftFunctions.register(spark)
    val texts = Seq("", "a", "a b", "a b c", "a b c d e", "a  b\tc\nd",
      "x y x y x y", "  leading and trailing  ", "unicode space here?",
      "a b c a b c a b c").toDF("text")
    for (n <- Seq(2, 3)) {
      val toks = TextStats.wsTokens(col("text"))
      val hof = when(size(toks) >= n,
        array_distinct(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast("array<string>"))
      val rows = texts.select(
        call_function("graft_shingles", col("text"), lit(n)).as("native"),
        hof.as("hof")).as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (nat, h) => assert(nat == h, s"n=$n") }
    }
  }

  test("graft_dot/graft_norm2 == the zip_with HOF folds (nulls, mismatch)") {
    graft.tokenize.GraftFunctions.register(spark)
    val vecs: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] = Seq(
      (Seq(1.0f, 2.5f, -3.0f), Seq(0.5f, -1.0f, 2.0f)),
      (Seq(0.1f, 0.2f), Seq(0.3f, 0.4f)),
      (Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]),
      (Seq(1.0f, 2.0f), Seq(1.0f)),                   // length mismatch
      (Seq[java.lang.Float](1.0f, null), Seq(2.0f, 3.0f))) // null element
    val df = vecs.toDF("a", "b")
    val hofDot = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val hofNorm = aggregate(
      transform(col("a"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      call_function("graft_dot", col("a"), col("b")).as("nd"), hofDot.as("hd"),
      call_function("graft_norm2", col("a")).as("nn"), hofNorm.as("hn"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot null parity: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"dot: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"norm null parity: $r")
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), s"norm: $r")
    }
  }

  test("connected components: min-label fixpoint equals local union-find") {
    // a chain a-b, b-c where a-c may NOT be a pair (non-transitivity):
    // components must still group all three
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 9L), (9L, 7L), (7L, 5L),
      (10L, 11L)).toDF("id_a", "id_b")
    // both execution paths must agree: driver union-find (small graphs)
    // and the distributed min-label iteration (forced via threshold 0)
    val got = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val gotDist = Dedup.components(pairs, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == gotDist)
    // local union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = parent.keySet ++ got.keySet
    val expected = ids.map(i => i -> find(i)).toMap
    assert(got == expected)
    assert(got(2L) == 0L && got(7L) == 5L && got(11L) == 10L)
  }

  test("survivors: best-quality doc wins its cluster, not the lowest id") {
    // cluster {0,1,2}: doc 0 (lowest id) fails the quality keep filter
    // (too short), doc 2 beats doc 1 on token count → 2 survives.
    // cluster {7,8}: quality ties exactly → lowest id 7 survives.
    val docs = Seq(
      (0L, "tiny doc"), // fails keep: < 5 tokens
      (1L, "shared payload words one two three four five six"),
      (2L, "shared payload words one two three four five six seven eight"),
      (7L, "identical quality text with exactly these seven words"),
      (8L, "identical quality text with exactly these seven words"),
      (9L, "unclustered standalone document with plenty of words here")
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Dedup.survivors(docs, pairs)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 7L, 8L)) // clustered docs only
    assert(got(0L) == ((0L, false)))
    assert(got(1L) == ((0L, false)))
    assert(got(2L) == ((0L, true))) // keep=true + most tokens
    assert(got(7L) == ((7L, true))) // exact tie → lowest id
    assert(got(8L) == ((7L, false)))
  }

  test("stratified sample: deterministic, stable under corpus growth") {
    val lang = TextStats.langId(docs)
    val rates = Map("en" -> 50)
    val s1 = TextStats.stratifiedSample(lang, rates, defaultPct = 100)
      .select("doc_id").as[Long].collect().toSet
    // same call twice -> identical (no RNG state)
    val s2 = TextStats.stratifiedSample(lang, rates, defaultPct = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    // a doc's fate is independent of the rest of the corpus
    val half = TextStats.stratifiedSample(
        TextStats.langId(docs.filter($"doc_id" < 4)), rates, defaultPct = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(half == s1.filter(_ < 4L))
    // local recomputation of the bucket arithmetic
    val langLocal = lang.as[(Long, String, Long)].collect()
    val expected = langLocal.collect { case (id, lp, _)
        if ((id % 2147483647L) * 2654435761L) % 2147483647L % 100 <
          (if (lp == "en") 50 else 100) => id }.toSet
    assert(s1 == expected)
  }

  test("simhash: identical texts agree; near dups within small hamming") {
    val sig = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(1L))
    val ham02 = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    assert(ham02 <= 6, s"hamming(0,2)=$ham02")
    val ham04 = java.lang.Long.bitCount(sig(0L) ^ sig(4L))
    assert(ham04 > ham02)
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("brute-force cosine top-k matches local computation exactly") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val local = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = vecs.filter($"vec_id" < 3)
    val got = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    for (q <- 0L until 3L) {
      val expected = local.keys.filter(_ != q).toSeq
        .map(i => (i, cos(local(q), local(i))))
        .sortBy { case (i, c) => (-c, i) }.take(5).map(_._1)
      assert(got(q) == expected, s"query $q")
    }
  }

  test("LSH ANN: exact rerank within buckets, decent recall vs brute force") {
    val rnd = new scala.util.Random(11)
    // clustered data so LSH has structure to find
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextFloat() - 0.5f))
    val vecs = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 10)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ann = Similarity.lshTopK(vecs, queries, k = 10, bits = 8)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 4L).map { q =>
      (ann.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.5, s"mean recall@10 = $mean")
  }

  test("blocked near-dup pairs: bit-exact vs the brute cross join") {
    val rnd = new scala.util.Random(17)
    val base = (0L until 300L).map { i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))
    }
    // planted near-dups: clones with small noise
    val vecs = (base ++ Seq(300L, 301L, 302L).zip(Seq(0L, 1L, 1L)).map {
      case (nid, src) =>
        (nid, base(src.toInt)._2.map(v => v + (rnd.nextFloat() - 0.5f) * 0.05f))
    }).toDF("vec_id", "embedding")
    val brute = Similarity.bruteNearDupPairs(vecs, minCos = 0.42)
      .as[(Long, Long, Double)].collect().toSet
    for (tileRows <- Seq(64, 1000)) {
      val blocked = Similarity.blockedNearDupPairs(vecs, minCos = 0.42,
        tileRows = tileRows).as[(Long, Long, Double)].collect().toSet
      assert(blocked == brute, s"tileRows=$tileRows") // incl. exact cos bits
    }
    assert(brute.exists { case (a, b, _) => a == 0L && b == 300L })
  }

  test("blocked near-dup pairs: sparse and negative vec_ids") {
    // all-even ids leave odd residue tiles empty; negative ids exercise the
    // floor-mod tile assignment (ADVICE r2: raw modulo + .get crashed here)
    val rnd = new scala.util.Random(23)
    val ids = (0 until 120).map(i => i.toLong * 2 - 40) // negatives + even-only
    val vecs = ids.map { i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteNearDupPairs(vecs, minCos = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Similarity.blockedNearDupPairs(vecs, minCos = 0.3,
      tileRows = 16).as[(Long, Long, Double)].collect().toSet
    assert(blocked == brute)
    assert(brute.nonEmpty) // threshold low enough that pairs exist
  }

  test("IVF ANN: coarse-quantized probing with good recall on clustered data") {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextFloat() - 0.5f))
    val vecs = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 10)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(vecs, queries, k = 10, nLists = 8, nProbe = 2)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 4L).map { q =>
      (ivf.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.7, s"mean IVF recall@10 = $mean")
  }

  test("semDedup: exact-verified pairs, good recall, min-id survivors") {
    // clustered embeddings with planted within-cluster near-dups: each
    // base vector i gets a near-copy at i+100 (tiny perturbation → cosine
    // near 1), across 4 well-separated clusters
    val rnd = new scala.util.Random(17)
    def unit(a: Array[Float]): Array[Float] = {
      val n = math.sqrt(a.map(x => x * x.toDouble).sum).toFloat
      a.map(_ / n)
    }
    val centers = Array.fill(4)(unit(Array.fill(16)(rnd.nextGaussian().toFloat)))
    val base = (0L until 100L).map { i =>
      val c = centers((i % 4).toInt)
      (i, unit(c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f)))
    }
    val dups = base.map { case (i, v) =>
      (i + 100L, unit(v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)))
    }
    // a null and an empty embedding ride along: the fit must skip them
    // (driver-side NPE otherwise) and the native assignment drops them
    // from every cell join — they appear in no pair and no verdict
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
      .unionByName(spark.sql(
        """SELECT 900L AS vec_id, CAST(null AS array<float>) AS embedding
           UNION ALL
           SELECT 901L, array()"""))
    val minCos = 0.995
    val brutePairs = Similarity.bruteNearDupPairs(vecs, minCos)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ivfPairs = Similarity.ivfNearDupPairs(vecs, minCos, nLists = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision 1: within-cell pairs are exact-cosine verified
    assert(ivfPairs.subsetOf(brutePairs),
      s"false pairs: ${ivfPairs -- brutePairs}")
    // recall: every planted (i, i+100) pair shares a tight cluster; the
    // quantizer must co-locate nearly all of them
    val planted = (0L until 100L).map(i => (i, i + 100L)).toSet
    assert(planted.subsetOf(brutePairs), "planting broke — not near dups")
    val recall = (ivfPairs & planted).size.toDouble / planted.size
    assert(recall >= 0.9, s"planted recall = $recall")
    // verdicts: one survivor per component, and it is the min id
    val verdicts = Similarity.semDedup(vecs, minCos, nLists = 8)
      .as[(Long, Long, Boolean)].collect()
    val byRep = verdicts.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      assert(members.count(_._3) == 1, s"component $rep survivor count")
      assert(members.filter(_._3).head._1 == members.map(_._1).min,
        s"component $rep survivor not min id")
      assert(rep == members.map(_._1).min)
    }
  }

  test("hashing-trick vectors: kernel identity; dup texts feed the ANN family") {
    import graft.pipeline.GraftFpHash
    import graft.tokenize.Tokenizer
    val dim = 16
    def run(): Map[Long, Seq[Float]] = TextStats.hashingVectors(docs, dim)
      .as[(Long, Seq[Float])].collect().toMap
    val got = run()
    val local = docs.as[(Long, String)].collect().toMap
    for ((id, text) <- local) {
      val v = new Array[Float](dim)
      for (t <- Tokenizer.tokens(text)) {
        val h = GraftFpHash.hashStr(t)
        v(((h >> 1) % dim).toInt) += (if ((h & 1L) == 0L) 1f else -1f)
      }
      assert(got(id).toSeq == v.toSeq, s"doc $id")
    }
    // codegen and interpreted eval agree (house kernel standard)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == got)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // the text→embedding bridge: exact-dup texts collide to identical
    // vectors, so the exact blocked kernel finds the planted dup pair at
    // cosine 1 over HASHED vectors (zero-vector docs fall out via NaN)
    val vecs = TextStats.hashingVectors(docs, dim)
      .withColumnRenamed("doc_id", "vec_id")
    val pairs = Similarity.blockedNearDupPairs(vecs, minCos = 0.9999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("incremental semdedup: pair restriction identity + greedy verdicts") {
    // frozen quantizer (three axis cells) + handcrafted geometry:
    //  cell 0 — a 20°-spaced CHAIN of batch-only docs 21-23-25 (21·23 and
    //    23·25 ≥ minCos, 21·25 below): greedy keeps 21, drops 23, keeps 25
    //    — the case where arrival-greedy genuinely diverges from
    //    batch-holistic components (which would drop 25 too);
    //  cell 1 — base docs 2,6 + batch docs 7,9 all identical: (2,6) is a
    //    base-only pair that must NOT leak; 7,9 are base-hit drops;
    //  cell 2 — batch-only exact dups 11,13 (11 kept, 13 dropped) and 15
    //    at 30° (in-cell but below threshold: kept).
    val rad = math.Pi / 180
    def v(deg: Double, cell: Int): Seq[Float] = {
      val (c, s) = (math.cos(deg * rad).toFloat, math.sin(deg * rad).toFloat)
      cell match {
        case 0 => Seq(c, s, 0f, 0f)
        case 1 => Seq(0f, c, s, 0f)
        case _ => Seq(0f, s, c, 0f)
      }
    }
    val rows = Seq(
      (21L, v(0, 0)), (23L, v(20, 0)), (25L, v(40, 0)),
      (2L, v(0, 1)), (6L, v(0, 1)), (7L, v(0, 1)), (9L, v(0, 1)),
      (11L, v(0, 2)), (13L, v(0, 2)), (15L, v(30, 2)))
    val corpus = rows.toDF("vec_id", "embedding")
    val batch = corpus.filter($"vec_id" % 2 === 1)
    val base = corpus.filter($"vec_id" % 2 === 0)
    val cents = Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
      Array(0, 0, 1.0, 0))
    val minCos = 0.9

    // centroid state round-trips through its persistable table form
    val roundTrip = Similarity.centroidsFrom(
      Similarity.centroidTable(spark, cents))
    assert(roundTrip.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)

    val full = Similarity.ivfNearDupPairs(corpus, minCos, nLists = 3,
        quantizer = Some(cents))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full.contains((21L, 23L)) && full.contains((23L, 25L)) &&
      !full.contains((21L, 25L)), s"chain geometry broken: $full")
    val expected = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    assert(full.contains((2L, 6L)) && !expected.contains((2L, 6L)),
      "fixture lost its base-only pair")
    val baseAssigned = Similarity.assignCells(base, cents)
    for (bc <- Seq(true, false)) {
      val inc = Similarity.ivfNearDupPairsIncremental(batch, baseAssigned,
          cents, minCos, broadcastAssigned = bc)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(inc == expected,
        s"broadcast=$bc: ${inc -- expected} / ${expected -- inc}")
    }
    val verdicts = Similarity.semDedupIncremental(batch, baseAssigned,
        cents, minCos).as[(Long, Boolean)].collect().toMap
    assert(verdicts == Map(21L -> true, 23L -> false, 25L -> true,
      7L -> false, 9L -> false, 11L -> true, 13L -> false, 15L -> true),
      verdicts.toString)
  }

  test("text stats: token counts, quality, fingerprint vs brute force") {
    val tc = TextStats.tokenCounts(docs).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val local = docs.as[(Long, String)].collect().toMap
    for ((id, text) <- local) {
      assert(tc(id)._2 == text.split("\\s+").count(_.nonEmpty), s"ws $id")
      assert(tc(id)._4 == text.length, s"chars $id")
    }
    val q = TextStats.quality(docs)
    val kept = q.filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(7L)) // stopword soup dropped
    assert(!kept.contains(6L)) // too short
    assert(kept.contains(0L))
    val fp = TextStats.fingerprint(docs).as[(Long, Long)].collect().toMap
    def localFp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % TextStats.FpMod)
    for ((id, text) <- local) assert(fp(id) == localFp(text), s"fp $id")
    assert(fp(0L) == fp(1L) && fp(0L) != fp(2L))
  }

  test("approx_count_distinct sketch stays within its error bound") {
    val df = (0L until 20000L).map(i => (i % 7, i % 4831))
      .toDF("grp", "v")
    val rows = df.groupBy($"grp")
      .agg(org.apache.spark.sql.functions
          .approx_count_distinct($"v", 0.02).as("approx"),
        org.apache.spark.sql.functions.countDistinct($"v").as("exact"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (g, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"group $g: approx=$approx exact=$exact err=$err")
    }
  }

  test("approx_percentile matches exact quantiles within accuracy bound") {
    val rnd = new scala.util.Random(31)
    val vals = (0 until 5000).map(_ => rnd.nextGaussian() * 10 + 50)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val fracs = Seq(0.25, 0.5, 0.75, 0.95)
    val approx = df.agg(org.apache.spark.sql.functions.approx_percentile(
        $"v", org.apache.spark.sql.functions.array(fracs.map(
          org.apache.spark.sql.functions.lit(_)): _*),
        org.apache.spark.sql.functions.lit(10000)).as("q"))
      .as[Seq[Double]].head()
    val sorted = vals.sorted
    fracs.zip(approx).foreach { case (f, got) =>
      // accuracy 10000 => rank error <= n/10000 < 1 here, so the sketch
      // value must be an element within one rank of the exact position
      val pos = (f * (sorted.length - 1)).toInt
      val window = sorted.slice(math.max(0, pos - 2), pos + 3)
      assert(window.contains(got), s"q$f: $got not near ${window.toList}")
    }
  }

  test("language ID picks profile with most marker hits") {
    val d = Seq(
      (0L, "the cat and the dog of the house"),
      (1L, "der hund und die katze"),
      (2L, "xyz qrs tuv")).toDF("doc_id", "text")
    val got = TextStats.langId(d).as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got(0L) == "en")
    assert(got(1L) == "de")
    assert(got(2L) == "und")
  }

  test("multimodal: stub decode via mapPartitions keeps schema and determinism") {
    val media = Multimodal.attachMedia(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == docs.count())
    val byId = feats.map(f => f.doc_id -> f).toMap
    // deterministic: same payload ⇒ same features (docs 0 and 1 identical)
    assert(byId(0L).features.toSeq == byId(1L).features.toSeq)
    assert(byId(0L).features.length == graft.pipeline.StubCodec.FeatureDim)
    val local = docs.as[(Long, String)].collect().toMap
    assert(byId(3L).n_bytes == local(3L).getBytes("UTF-8").length)
    // frame sampling only on video rows (doc_id % 3 == 2)
    val frames = Multimodal.sampleVideoFrames(media)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(frames.forall(_ % 3 == 2))
  }

  test("multimodal: REAL PNG round trip through ImageIoCodec matches closed form") {
    // genuine javax.imageio encode -> binary column -> decode through the
    // MediaCodec seam; dims and channel means must equal the generator's
    // arithmetic (the q_mm_decode contract)
    val ids = (0L until 40L).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.attachPng(ids), graft.pipeline.ImageIoCodec).collect()
    assert(feats.length == 40)
    feats.foreach { f =>
      val i = f.doc_id
      assert(f.width == 8 + (i % 16).toInt, s"doc $i width")
      assert(f.height == 8 + ((i / 16) % 16).toInt, s"doc $i height")
      assert(f.features.length == graft.pipeline.ImageIoCodec.FeatureDim)
      assert(f.features(0) == ((i * 7) % 256).toFloat, s"doc $i mean_r")
      assert(f.features(1) == ((i * 13) % 256).toFloat, s"doc $i mean_g")
      assert(f.features(2) == ((i * 31) % 256).toFloat, s"doc $i mean_b")
      // the payload is an encoded PNG, not raw pixels
      assert(f.n_bytes > 8, s"doc $i payload size")
    }
    // PNG magic on the wire
    val payload = Multimodal.attachPng(ids).filter(_.doc_id == 5L)
      .collect().head.media
    assert(payload.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
  }

  test("multimodal: a custom codec plugs into the same pipeline") {
    // a 2-dim codec with per-partition session accounting: proves the
    // MediaCodec seam — only the codec changes, the pipeline is untouched
    object TwoDimCodec extends graft.pipeline.MediaCodec {
      def featureDim: Int = 2
      def open(): graft.pipeline.MediaCodec.Session =
        new graft.pipeline.MediaCodec.Session {
          def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int) =
            (bytes.length, 1)
          def features(kind: String, bytes: Array[Byte]): Array[Float] =
            Array(bytes.length.toFloat, if (kind == "video") 1f else 0f)
          def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
            Seq(bytes)
        }
    }
    val media = Multimodal.attachMedia(docs)
    val feats = Multimodal.extractFeatures(media, TwoDimCodec).collect()
    assert(feats.forall(_.features.length == 2))
    val local = docs.as[(Long, String)].collect().toMap
    feats.foreach { f =>
      assert(f.width == local(f.doc_id).getBytes("UTF-8").length)
      assert(f.features(1) == (if (f.doc_id % 3 == 2) 1f else 0f))
    }
    // one frame per video row under the custom codec
    val frames = Multimodal.sampleVideoFrames(media, 2, TwoDimCodec)
    assert(frames.count() ==
      docs.filter($"doc_id" % 3 === 2).count())
  }
}
