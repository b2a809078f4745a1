package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextStats}
import graft.tokenize.GraftFunctions

/** The native one-pass MinHash banding expression must be BIT-IDENTICAL
  * to the exploded shingle → per-shingle signature → elementwise-min form
  * it replaced (whose arithmetic the SQL oracle restates). */
class GraftMinhashSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val texts: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words in this one entirely"),
    (4L, "naïve café über straße schloß weiß"), // non-ascii code points
    (5L, "too short"),                          // below n=3 tokens
    (6L, "a b a b a b a b"),                    // duplicate shingles
    (7L, ""),
    (8L, "exactly three tokens")
  ).toDF("doc_id", "text")

  /** The r5 exploded form — kept HERE as the executable spec of the
    * banding arithmetic. */
  private def legacyBands(df: DataFrame, numHashes: Int,
      bands: Int, n: Int): DataFrame = {
    GraftFunctions.register(spark)
    val r = numHashes / bands
    def permA(i: Int): Long = ((i + 1) * 2654435761L) % Dedup.MinhashP match {
      case 0L => 1L
      case a => a
    }
    def permB(i: Int): Long = ((i + 1) * 1099511628211L) % Dedup.MinhashP
    val as = Array.tabulate(numHashes)(permA)
    val bs = Array.tabulate(numHashes)(permB)
    val sigs = df.select(col("doc_id"),
        explode(call_function("graft_shingles", col("text"), lit(n)))
          .as("shingle"))
      .select(col("doc_id").cast("long"),
        TextStats.fingerprintCol(col("shingle")))
      .as[(Long, Long)]
      .map { case (docId, s) =>
        val sig = new Array[Long](numHashes)
        var i = 0
        while (i < numHashes) {
          sig(i) = (as(i) * s + bs(i)) % Dedup.MinhashP; i += 1
        }
        (docId, sig)
      }
      .groupByKey(_._1)
      .reduceGroups { (x, y) =>
        val m = new Array[Long](numHashes)
        var i = 0
        while (i < numHashes) { m(i) = math.min(x._2(i), y._2(i)); i += 1 }
        (x._1, m)
      }
    sigs.flatMap { case (docId, (_, sig)) =>
      (0 until bands).iterator.map { b =>
        var bucket = 0L
        var i = b * r
        while (i < (b + 1) * r) {
          bucket = (bucket * 31 + sig(i)) % Dedup.MinhashP; i += 1
        }
        (docId, b, bucket)
      }
    }.toDF("doc_id", "band", "bucket")
  }

  private def asSet(df: DataFrame): Set[(Long, Int, Long)] =
    df.select(col("doc_id").cast("long"), col("band").cast("int"),
        col("bucket").cast("long"))
      .as[(Long, Int, Long)].collect().toSet

  test("kernel bands equal the exploded-form bands (64/16, n=3)") {
    val k = asSet(Dedup.minhashBands(texts, numHashes = 64, bands = 16, n = 3))
    val l = asSet(legacyBands(texts, numHashes = 64, bands = 16, n = 3))
    assert(k == l)
    // short/empty docs emit no band rows; exactly-n tokens emit bands
    assert(!k.exists(t => t._1 == 5L || t._1 == 7L))
    assert(k.exists(_._1 == 8L))
  }

  test("kernel bands equal the exploded form at other shapes") {
    for ((h, b, n) <- Seq((16, 4, 2), (32, 8, 5), (8, 8, 1))) {
      assert(asSet(Dedup.minhashBands(texts, h, b, n)) ==
        asSet(legacyBands(texts, h, b, n)), s"($h,$b,$n)")
    }
  }

  test("identical texts collide on every band; distinct texts do not") {
    val k = Dedup.minhashBands(texts, 64, 16, 3)
      .as[(Long, Int, Long)].collect()
    val byDoc = k.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(0L) == byDoc(1L))
    assert(byDoc(0L) != byDoc(3L))
  }

  test("seeded fuzz: kernel == exploded form on random docs") {
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "naïve", "œuf")
    val docs = (0L until 60L).map { i =>
      val len = rnd.nextInt(12)
      (i, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    assert(asSet(Dedup.minhashBands(docs, 64, 16, 3)) ==
      asSet(legacyBands(docs, 64, 16, 3)))
  }
}
