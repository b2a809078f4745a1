package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, GraftSimhash, TextStats}
import graft.tokenize.GraftFunctions

/** The native one-pass SimHash expression: 31-bit mode must be
  * BIT-IDENTICAL to the per-bit aggregate-lambda column form it replaced
  * (whose arithmetic the SQL oracle restates), 64-bit mode is the scale
  * variant. */
class GraftSimhashSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val texts: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words in this one entirely"),
    (4L, "naïve café über straße"), // non-ascii code points
    (5L, "single"),
    (6L, "a b a b a b a b")
  ).toDF("doc_id", "text")

  /** The r2/r3 column-expression form (31 interpreted aggregate lambdas) —
    * kept HERE as the executable spec of the 31-bit arithmetic. */
  private def legacySimhash31(df: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    val hashes = transform(TextStats.wsTokens(col("text")),
      t => TextStats.wordHashCol(t))
    val bitSums = (0 until Dedup.SimhashBits).map { i =>
      aggregate(col("hs"), lit(0L), (acc, h) =>
        acc + when((shiftright(h, i) % 2) === 1, 1L).otherwise(-1L))
        .as(s"b$i")
    }
    val sig = (0 until Dedup.SimhashBits).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col("doc_id"), hashes.as("hs"))
      .filter(size(col("hs")) > 0)
      .select((col("doc_id") +: bitSums): _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  test("native 31-bit == legacy aggregate-lambda form") {
    val native = Dedup.simhash(texts).as[(Long, Long)].collect().toMap
    val legacy = legacySimhash31(texts).as[(Long, Long)].collect().toMap
    assert(native == legacy)
  }

  test("empty and whitespace-only texts produce no signature row") {
    val df = Seq((0L, ""), (1L, " \t "), (2L, "word")).toDF("doc_id", "text")
    assert(Dedup.simhash(df).as[(Long, Long)].collect().map(_._1).toSeq
      == Seq(2L))
  }

  test("pairs: filter-before-distinct equals the legacy distinct-then-" +
      "verify form, with no duplicate pairs") {
    // the r6 restructure: signatures ride the band join and hamming
    // filters BEFORE the candidate distinct — same rows out as the r5
    // shape (distinct candidates, then two signature joins, then filter)
    def legacyPairs(bits: Int): Set[(Long, Long, Long)] = {
      val sig = Dedup.simhash(texts, bits = bits)
      val chunks = if (bits == 64) Seq((0, 16), (16, 16), (32, 16), (48, 16))
                   else Seq((0, 8), (8, 8), (16, 8), (24, 7))
      val banded = chunks.zipWithIndex.map { case ((off, len), bi) =>
        sig.select(col("doc_id"), lit(bi).as("chunk"),
          shiftrightunsigned(col("simhash"), off)
            .bitwiseAND(lit((1L << len) - 1)).as("key"))
      }.reduce(_ unionByName _)
      val l = banded.select(col("chunk"), col("key"), col("doc_id").as("id_a"))
      val r = banded.select(col("chunk"), col("key"), col("doc_id").as("id_b"))
      val cands = l.join(r, Seq("chunk", "key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val sa = sig.select(col("doc_id").as("id_a"), col("simhash").as("sig_a"))
      val sb = sig.select(col("doc_id").as("id_b"), col("simhash").as("sig_b"))
      cands.join(sa, "id_a").join(sb, "id_b")
        .withColumn("hamming", bit_count(expr("sig_a ^ sig_b")).cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .as[(Long, Long, Long)].collect().toSet
    }
    for (bits <- Seq(31, 64)) {
      val rows = Dedup.simhashPairs(texts, maxHamming = 3, bits = bits)
        .as[(Long, Long, Long)].collect()
      assert(rows.length == rows.toSet.size, s"dup pairs at bits=$bits")
      assert(rows.toSet == legacyPairs(bits), s"bits=$bits")
    }
  }

  test("64-bit: identical texts hamming 0, found by banded pairs") {
    val pairs = Dedup.simhashPairs(texts, maxHamming = 3, bits = 64)
      .as[(Long, Long, Long)].collect()
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(exact.exists(_._3 == 0L), s"pairs: ${pairs.mkString(",")}")
    // one-word-changed doc 2 is CLOSE to 0/1 in 64-bit hamming even if
    // not necessarily <= 3 — but never paired with the unrelated doc 3
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("sig agrees between codegen and interpreted eval, both widths") {
    GraftFunctions.register(spark)
    def run(): Seq[String] = texts.select($"doc_id",
      call_function("graft_simhash", $"text", lit(31)),
      call_function("graft_simhash", $"text", lit(64)))
      .collect().map(_.toString).sorted.toSeq
    val withCg = run()
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

  test("direct eval matches a hand-rolled reference for one text") {
    import org.apache.spark.unsafe.types.UTF8String
    val t = "alpha beta alpha"
    def bitsOf(h: Long, bits: Int): Seq[Int] =
      (0 until bits).map(i => if (((h >>> i) & 1L) == 1L) 1 else -1)
    val hs = t.split(" ").toSeq.map(w =>
      graft.pipeline.GraftFpHash.hashStr(w))
    val sums = hs.map(bitsOf(_, 31)).transpose.map(_.sum)
    val expect = sums.zipWithIndex
      .collect { case (s, i) if s > 0 => 1L << i }.sum
    assert(GraftSimhash.sig(UTF8String.fromString(t), 31) == expect)
  }
}
