package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** IVF-PQ ANN ([[Similarity.pqTopK]]): recall against the exact
  * brute-force top-k on clustered synthetic embeddings, determinism, and
  * the malformed-row contract. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 16

  /** 240 vectors in 6 well-separated clusters + seeded noise — the shape
    * ANN indexes exist for; query vectors are corpus members, so their
    * true neighbors are mostly in-cluster. */
  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(6)(Array.fill(Dim)(rnd.nextDouble() * 4 - 2))
    val rows = (0 until 240).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private def asMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Long]] =
    df.collect().map { case Row(q: Long, n: Long, r: Long) => (q, r, n) }
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  test("pqTopK recall@10 >= 0.8 vs brute force on clustered data") {
    val queries = emb.filter(col("vec_id") < 12)
    val k = 10
    val exact = asMap(Similarity.bruteForceTopK(emb, queries, k))
    val pq = asMap(Similarity.pqTopK(emb, queries, k,
      nLists = 6, nProbe = 3, m = 4, ksub = 16))
    assert(pq.keySet == exact.keySet)
    val recalls = exact.map { case (q, truth) =>
      pq(q).toSet.intersect(truth.toSet).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 = $mean")
  }

  test("pqTopK with full probes and refine covers the exact top-k head") {
    // probing EVERY list makes candidate coverage exhaustive up to the
    // ADC ordering; with refineFactor widening the rerank pool, the top-1
    // exact neighbor must survive for every query
    val queries = emb.filter(col("vec_id") < 8)
    val exact = asMap(Similarity.bruteForceTopK(emb, queries, 1))
    val pq = asMap(Similarity.pqTopK(emb, queries, 10,
      nLists = 4, nProbe = 4, m = 4, ksub = 16, refineFactor = 8))
    exact.foreach { case (q, truth) =>
      assert(pq(q).contains(truth.head), s"query $q lost ${truth.head}")
    }
  }

  test("pqTopK is deterministic across runs") {
    val queries = emb.filter(col("vec_id") < 5)
    val a = Similarity.pqTopK(emb, queries, 10, nLists = 6, nProbe = 2,
      m = 4, ksub = 16).collect().toSeq.sortBy(_.toString)
    val b = Similarity.pqTopK(emb, queries, 10, nLists = 6, nProbe = 2,
      m = 4, ksub = 16).collect().toSeq.sortBy(_.toString)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("pqTopK drops malformed corpus rows instead of failing") {
    val bad = Seq(
      (1000L, null.asInstanceOf[Seq[Float]]),
      (1001L, Seq.fill(3)(0.5f)) // wrong dimension
    ).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val res = Similarity.pqTopK(emb.unionByName(bad), queries, 10,
      nLists = 6, nProbe = 3, m = 4, ksub = 16).collect()
    assert(res.nonEmpty)
    assert(!res.exists(r => r.getLong(1) >= 1000L))
  }

  test("pqTopK validates the subspace split") {
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, emb.limit(1), 5, m = 5) // 5 does not divide 16
    }
  }
}
