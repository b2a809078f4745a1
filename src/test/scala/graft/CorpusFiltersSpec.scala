package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusFilters, GraftRepStats, TextStats}
import graft.tokenize.GraftFunctions

/** Corpus-hygiene operators: PII redaction, repetition quality filter
  * (native graft_repstats kernel), benchmark decontamination — exactness
  * checked against in-memory brute force. */
class CorpusFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (0L, "plain text with no pii at all just words"),
    (1L, "reach me at jane.doe+spam@mail.example.org or bob@x.io thanks"),
    (2L, "server 192.168.0.1 and backup 10.0.0.254 were unreachable"),
    (3L, "call 555-123-4567 or 555-000-1111 after noon"),
    (4L, "mixed a@b.co then 1.2.3.4 then 111-222-3333 in one line"),
    (5L, ""), // empty text
    (6L, "bogus 999.999.999.999 and 256.1.1.1 are not addresses"),
    (7L, "intl +44 555-123-4567 parens (555) 000-1111 dotted 555.123.4567"),
    (8L, "padded 192.168.010.001 yes but 0100.1.1.1 no")
  ).toDF("doc_id", "text")

  // ---- PII redaction -------------------------------------------------------

  test("piiRedact counts and redacts emails, ips, phones") {
    val rows = CorpusFilters.piiRedact(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_ip"),
          r.getAs[Long]("n_phone"), r.getAs[String]("clean_text"))).toMap
    assert(rows(0L) == ((0L, 0L, 0L, "plain text with no pii at all just words")))
    assert(rows(1L)._1 == 2L && rows(1L)._4 ==
      "reach me at <EMAIL> or <EMAIL> thanks")
    assert(rows(2L)._2 == 2L && rows(2L)._4 ==
      "server <IP> and backup <IP> were unreachable")
    assert(rows(3L)._3 == 2L && rows(3L)._4 ==
      "call <PHONE> or <PHONE> after noon")
    assert(rows(4L) == ((1L, 1L, 1L,
      "mixed <EMAIL> then <IP> then <PHONE> in one line")))
    assert(rows(5L) == ((0L, 0L, 0L, "")))
    // range-valid IPv4: out-of-range octets are NOT addresses
    assert(rows(6L) == ((0L, 0L, 0L,
      "bogus 999.999.999.999 and 256.1.1.1 are not addresses")))
    // phone envelope: +CC prefix, (area) parens, dotted separators
    assert(rows(7L)._3 == 3L && rows(7L)._4 ==
      "intl <PHONE> parens <PHONE> dotted <PHONE>")
    // zero-padded octets are in range; 4-digit octets are not octets
    assert(rows(8L) == ((0L, 1L, 0L, "padded <IP> yes but 0100.1.1.1 no")))
  }

  // ---- url filter ----------------------------------------------------------

  test("urlFilter counts urls and flags blocklisted domains") {
    val df = Seq(
      (0L, "no links here at all"),
      (1L, "see https://ok.example.org/path and http://also-fine.net"),
      (2L, "bad one http://spam.bad-site.com/x?q=1 inline"),
      (3L, "mixed https://ok.example.org http://spam.bad-site.com/y end"),
      (4L, "scheme-less www.spam.bad-site.com is not a url match"),
      (5L, "subdomain http://a.b.spam.bad-site.com/z evades nothing"),
      (6L, "shout HTTP://SPAM.BAD-SITE.COM/X and move on"),
      (7L, "sentence ends with http://spam.bad-site.com."),
      (8L, "lookalike http://notspam.bad-site.co/x is fine")
    ).toDF("doc_id", "text")
    val rows = CorpusFilters.urlFilter(df, Seq("spam.bad-site.com"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_urls"), r.getAs[Long]("n_blocked"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rows(0L) == ((0L, 0L, true)))
    assert(rows(1L) == ((2L, 0L, true)))
    assert(rows(2L) == ((1L, 1L, false)))
    assert(rows(3L) == ((2L, 1L, false)))
    assert(rows(4L) == ((0L, 0L, true)))
    assert(rows(5L) == ((1L, 1L, false))) // subdomain of a blocked domain
    assert(rows(6L) == ((1L, 1L, false))) // uppercase scheme + host
    assert(rows(7L) == ((1L, 1L, false))) // trailing sentence dot stripped
    assert(rows(8L) == ((1L, 0L, true))) // suffix-overlap but NOT subdomain
  }

  test("urlFilter with an empty blocklist keeps everything") {
    val df = Seq((0L, "see https://ok.example.org/path and more"))
      .toDF("doc_id", "text")
    val rows = CorpusFilters.urlFilter(df, Seq.empty).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_urls") == 1L)
    assert(rows(0).getAs[Long]("n_blocked") == 0L)
    assert(rows(0).getAs[Boolean]("keep"))
  }

  // ---- repetition stats ----------------------------------------------------

  /** Brute-force repetition stats for one text. */
  private def bruteRep(text: String): (Long, Long, Long, Long) = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val wc = toks.groupBy(identity).view.mapValues(_.length)
    val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val bc = bigrams.groupBy(identity).view.mapValues(_.length)
    (toks.length.toLong, wc.size.toLong,
      if (wc.isEmpty) 0L else wc.values.max.toLong,
      if (bc.isEmpty) 0L else bc.values.max.toLong)
  }

  private lazy val repTexts: Seq[(Long, String)] = Seq(
    10L -> "a b c d e f g",
    11L -> "spam spam spam spam spam",
    12L -> "go go go stop go go go stop",
    13L -> "one",
    14L -> "",
    15L -> "  padded   with   runs  of spaces padded with  ",
    16L -> "naïve café naïve café naïve café", // non-ascii round trip
    17L -> (1 to 20).map(i => s"word$i").mkString(" ") // long all-unique
  )

  test("graft_repstats equals brute force per doc") {
    GraftFunctions.register(spark)
    val got = repTexts.toDF("doc_id", "text")
      .select($"doc_id", call_function("graft_repstats", $"text").as("r"))
      .select($"doc_id", $"r.n_tokens", $"r.n_uniq", $"r.top_word",
        $"r.top_bigram")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    for ((id, text) <- repTexts)
      assert(got(id) == bruteRep(text), s"doc $id: '$text'")
  }

  test("graft_repstats agrees between codegen and interpreted eval") {
    GraftFunctions.register(spark)
    val df = repTexts.toDF("doc_id", "text")
    def run(): Seq[String] = df.select($"doc_id",
      call_function("graft_repstats", $"text").as("r"))
      .collect().map(_.toString).sorted.toSeq
    val withCg = run() // whole-stage codegen (default on)
    // wholeStage=false alone still compiles expressions via the codegen
    // factory; NO_CODEGEN is what actually drives nullSafeEval
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCg)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      prevFactory match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("repetition verdicts: unique text kept, spam dropped") {
    val rep = CorpusFilters.repetition(repTexts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rep(17L).getAs[Boolean]("keep")) // long all-unique text
    // short all-unique text: top_bigram_frac = 1/6 > 0.08 -> dropped (the
    // thresholds assume the corpus' doc lengths; a min-length gate is the
    // caller's composition with TextStats.quality)
    assert(!rep(10L).getAs[Boolean]("keep"))
    assert(!rep(11L).getAs[Boolean]("keep")) // one word repeated
    assert(!rep(12L).getAs[Boolean]("keep")) // dominant bigram
    assert(rep(14L).getAs[Long]("n_tokens") == 0L &&
      !rep(14L).getAs[Boolean]("keep")) // empty: fracs 0.0, uniq_frac < min
    val r10 = rep(10L)
    assert(r10.getAs[Double]("uniq_frac") == 1.0)
    assert(r10.getAs[Double]("top_word_frac") == 1.0 / 7.0)
    assert(r10.getAs[Double]("top_bigram_frac") == 1.0 / 6.0)
  }

  // ---- chunking + packing --------------------------------------------------

  test("chunk equals sliding-window brute force (incl. short docs)") {
    val docs = Seq(
      // 95 tokens: starts 0,30,60 (start 90 would re-emit tokens 91-95,
      // a strict sub-span of the start-60 window — dropped by contract)
      (0L, (1 to 95).map(i => s"t$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")), // exactly one window
      (2L, "only three tokens"),
      (3L, ""), // filtered out
      (4L, (1 to 61).map(i => s"t$i").mkString(" ")) // starts 0,30 only
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextStats.chunk(docs, size = 40, overlap = 10)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq)
      .toMap
    def brute(text: String): Seq[(String, Long)] = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      (0 until t.length by 30)
        .filter(s => s == 0 || s < t.length - 10)
        .map { s =>
          val c = t.slice(s, s + 40); (c.mkString(" "), c.length.toLong)
        }
    }
    assert(got.keySet == Set(0L, 1L, 2L, 4L))
    val local = Map(
      0L -> (1 to 95).map(i => s"t$i").mkString(" "),
      1L -> (1 to 40).map(i => s"t$i").mkString(" "),
      2L -> "only three tokens",
      4L -> (1 to 61).map(i => s"t$i").mkString(" "))
    for ((id, text) <- local)
      assert(got(id) == brute(text), s"doc $id")
    // every token is still covered: the last kept chunk reaches doc end
    assert(got(0L).last._1.endsWith("t95"))
    assert(got(4L).last._1.endsWith("t61"))
  }

  test("packSequences: per-stratum cumulative layout, exact bins") {
    val docs = Seq(
      (0L, "web", 5), (1L, "web", 10), (2L, "web", 4),
      (3L, "book", 12), (4L, "book", 3), (5L, "web", 7)
    ).map { case (id, src, n) =>
      (id, src, (1 to n).map(i => s"w$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val got = graft.pipeline.TextStats.packSequences(docs, budget = 12)
      .select("doc_id", "source", "n_tokens", "bin_id", "bin_offset")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // web layout: 0(5) 1(10) 2(4) 5(7) -> prev_cums 0,5,15,19
    // book layout: 3(12) 4(3) -> prev_cums 0,12
    val expected = Seq(
      (0L, "web", 5L, 0L, 0L),
      (1L, "web", 10L, 0L, 5L),
      (2L, "web", 4L, 1L, 3L),
      (3L, "book", 12L, 0L, 0L),
      (4L, "book", 3L, 1L, 0L),
      (5L, "web", 7L, 1L, 7L))
    assert(got == expected)
  }

  // ---- null-text rows ------------------------------------------------------

  test("null text: counting ops read an empty doc, sig/chunk ops drop the row") {
    val docs = Seq((0L, null: String), (1L, "real words here"))
      .toDF("doc_id", "text")
    val tc = TextStats.tokenCounts(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(tc(0L) == ((0L, 0L, 0L))) // NOT size(null) = -1
    val q = TextStats.quality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
          r.getAs[Boolean]("keep")))).toMap
    assert(q(0L) == ((0L, 0L, false)))
    assert(TextStats.langId(docs).filter($"doc_id" === 0L)
      .head.getAs[String]("lang_pred") == "und")
    // row-dropping ops: no output row for the null doc
    assert(TextStats.chunk(docs, 10).filter($"doc_id" === 0L).count() == 0)
    assert(graft.pipeline.Dedup.simhash(docs)
      .filter($"doc_id" === 0L).count() == 0)
    // packing: the null doc occupies zero tokens, later docs unaffected
    val pk = TextStats.packSequences(
      docs.withColumn("source", lit("s")), budget = 100).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("bin_offset")))).toMap
    assert(pk(0L) == ((0L, 0L)) && pk(1L) == ((3L, 0L)))
  }

  // ---- decontamination -----------------------------------------------------

  test("contaminationHits equals brute-force shared-shingle counts") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma completely different tail here"),
      (2L, "nothing in common with the benchmark set at all"),
      (3L, "delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "eta theta iota kappa")
    ).toDF("doc_id", "text")

    def sh(s: String): Set[String] =
      s.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val benchGrams = Set("alpha beta gamma delta epsilon", "eta theta iota kappa")
      .flatMap(sh)
    val expected = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma completely different tail here"),
      (2L, "nothing in common with the benchmark set at all"),
      (3L, "delta epsilon zeta eta theta iota"))
      .map { case (id, t) => id -> (sh(t) & benchGrams).size.toLong }
      .filter(_._2 > 0).toMap

    val got = CorpusFilters.contaminationHits(corpus, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("lmScore equals brute-force add-1 bigram LM scoring") {
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the hat"),   // in-distribution
      (2L, "zq xw vv kk pp zz qq"),     // fully OOV
      (3L, "the cat"),                  // one bigram
      (4L, "single"),                   // zero bigrams
      (5L, ""),                         // empty
      (6L, "on the mat the cat sat")    // same vocab, shuffled order
    ).toDF("doc_id", "text")
    val refIds = Set(0L, 1L)
    val ref = corpus.filter($"doc_id".isin(refIds.toSeq: _*))

    // in-memory model
    def toks(s: String): Array[String] = s.split("\\s+").filter(_.nonEmpty)
    def bgs(s: String): Seq[(String, String)] =
      toks(s).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
    val refTexts = Seq("the cat sat on the mat", "the cat sat on the hat")
    val refBgs = refTexts.flatMap(bgs)
    val c2 = refBgs.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = refBgs.groupBy(_._1).view.mapValues(_.size).toMap
    val v = refTexts.flatMap(toks).toSet.size
    def score(s: String): (Long, Long) = {
      val b = bgs(s)
      val q = b.map { g =>
        val p = (c2.getOrElse(g, 0) + 1).toDouble / (c1.getOrElse(g._1, 0) + v)
        java.math.BigDecimal.valueOf(math.log(p) * 1000000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }.sum
      (b.size.toLong, q)
    }
    val expected = Seq(
      0L -> "the cat sat on the mat", 1L -> "the cat sat on the hat",
      2L -> "zq xw vv kk pp zz qq", 3L -> "the cat", 4L -> "single",
      5L -> "", 6L -> "on the mat the cat sat")
      .map { case (id, t) => val (n, q) = score(t); (id, n, q) }

    val got = CorpusFilters.lmScore(corpus, ref)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
    // sanity on the semantics: the in-distribution doc scores strictly
    // better per gram than the OOV doc
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._3.toDouble / byId(0L)._2 >
      byId(2L)._3.toDouble / byId(2L)._2)
  }

  test("lmScore fails loudly on an empty reference slice") {
    // V = 0 would quantize ln(Inf) to Long.MaxValue per gram — silent
    // garbage; the operator must refuse the model instead
    val corpus = Seq((0L, "some text here")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      CorpusFilters.lmScore(corpus, corpus.filter($"doc_id" < 0L))
    }
    assert(ex.getMessage.contains("reference slice"))
    // all-empty texts are just as tokenless
    val blankRef = Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      CorpusFilters.lmScore(corpus, blankRef)
    }
  }

  test("lmScore plan: corpus map-side, ref tables broadcast") {
    val corpus = docs
    val ref = docs.filter($"doc_id" < 3L)
    val df = CorpusFilters.lmScore(corpus, ref)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only corpus-side exchange is the per-doc aggregate
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("contamination plan broadcasts the benchmark side") {
    val corpus = docs
    val bench = docs.filter($"doc_id" === 0L)
    val plan = CorpusFilters.contaminationHits(corpus, bench, n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }

  // ---- trained quality classifier -----------------------------------------

  /** Local replica of the classifier feature vector — the same formulas
    * `withFeatures` builds in Column space (both sides are
    * java.lang.Math, so equality is exact). */
  private def localFeatures(text: String): Array[Double] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val nChars = text.length.toDouble
    val nToks = toks.length.toDouble
    val nStop = toks.count(TextStats.Stopwords.contains).toDouble
    // the kernel's punct class is [^A-Za-z0-9\s]: ASCII-alnum-or-\s
    // excluded, everything else counted
    def asciiAlnum(c: Char): Boolean =
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9')
    def wsClass(c: Char): Boolean = " \t\n\u000B\f\r".indexOf(c.toInt) >= 0
    val nPunct = text.count(c => !asciiAlnum(c) && !wsClass(c)).toDouble
    val stopRatio = if (nToks > 0) nStop / nToks else 0.0
    val meanWl = if (nToks > 0) (nChars - (nToks - 1)) / nToks else 0.0
    Array(1.0, math.log(nChars + 1.0), math.log(nToks + 1.0),
      stopRatio, nPunct / math.max(nChars, 1.0), meanWl)
  }

  /** Labeled fixture: docs whose keep/drop signal is (noisily) linear in
    * the features — low-stopword informative text vs stopword soup. */
  private lazy val labeled: DataFrame = {
    val rnd = new scala.util.Random(11)
    val stopish = TextStats.Stopwords
    val wordsGood = Seq("kernel", "shuffle", "partition", "codegen",
      "lattice", "quantile", "spectrum", "manifold")
    (0L until 120L).map { i =>
      val good = i % 2 == 0
      val n = 8 + rnd.nextInt(8)
      val words = (0 until n).map { _ =>
        val fromGood = if (good) rnd.nextInt(10) < 9 else rnd.nextInt(10) < 2
        if (fromGood) wordsGood(rnd.nextInt(wordsGood.length))
        else stopish(rnd.nextInt(stopish.length))
      }
      (i, words.mkString(" "), if (good) 1 else 0)
    }.toDF("doc_id", "text", "label")
  }

  test("classifierScore equals the local sigmoid replica exactly") {
    val w = Array(-2.0, 0.25, 0.45, -3.0, -4.0, 0.05)
    val got = CorpusFilters.classifierScore(docs, w)
      .select("doc_id", "score_q", "keep")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val local = docs.as[(Long, String)].collect()
    local.foreach { case (id, text) =>
      val x = localFeatures(text)
      val z = (0 until CorpusFilters.ClassifierDim)
        .map(i => w(i) * x(i)).foldLeft(0.0)(_ + _)
      val q = math.round(1000000.0 / (math.exp(-z) + 1.0))
      assert(got(id)._2 == q, s"doc $id: ${got(id)._2} vs $q")
      assert(got(id)._3 == (q >= 500000), s"doc $id keep")
    }
  }

  test("trainQualityClassifier: one distributed step == local; learns") {
    // one-step parity against a local full-batch gradient from w = 0
    val oneStep = CorpusFilters.trainQualityClassifier(labeled, iters = 1,
      lr = 1.0)
    val xy = labeled.as[(Long, String, Int)].collect()
      .map { case (_, t, y) => (localFeatures(t), y.toDouble) }
    val grad = new Array[Double](CorpusFilters.ClassifierDim)
    xy.foreach { case (x, y) =>
      val p = 0.5 // sigma(0)
      (0 until CorpusFilters.ClassifierDim)
        .foreach(i => grad(i) += (p - y) * x(i))
    }
    val expected = grad.map(g => -1.0 * g / xy.length)
    oneStep.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-9, s"$a vs $e")
    }
    // trained model separates the planted classes and beats the w=0 loss
    val w = CorpusFilters.trainQualityClassifier(labeled, iters = 150,
      lr = 2.0)
    def loss(wv: Array[Double]): Double = xy.map { case (x, y) =>
      val z = (0 until CorpusFilters.ClassifierDim)
        .map(i => wv(i) * x(i)).sum
      val p = 1.0 / (1.0 + math.exp(-z))
      -(y * math.log(p + 1e-12) + (1 - y) * math.log(1 - p + 1e-12))
    }.sum / xy.length
    assert(loss(w) < loss(new Array[Double](CorpusFilters.ClassifierDim)),
      s"training did not reduce loss: ${loss(w)}")
    val acc = xy.count { case (x, y) =>
      val z = (0 until CorpusFilters.ClassifierDim)
        .map(i => w(i) * x(i)).sum
      (if (z >= 0) 1.0 else 0.0) == y
    }.toDouble / xy.length
    assert(acc >= 0.9, s"accuracy $acc on the planted linear rule")
  }
}
