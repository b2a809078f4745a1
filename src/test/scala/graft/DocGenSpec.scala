package graft

import graft.fixtures.DocGen
import graft.pipeline.Dedup

/** The dedup-scale bench corpus: deterministic, planted-dup invariants,
  * and the capped-jaccard path finding every planted pair at a small n. */
class DocGenSpec extends SparkTestBase {

  private def shingleSet(s: String): Set[String] =
    s.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet
  private def jacc(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / (a | b).size

  test("generation is deterministic and distributed == local") {
    val d1 = DocGen.dataset(spark, 300).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val d2 = DocGen.dataset(spark, 300, partitions = 7).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d1 == d2)
    assert(d1(42L) == DocGen.genText(42L))
  }

  test("planted slots: exact copies exact, near-dups >= 80% jaccard") {
    for (id <- 1L until 600L) {
      if (DocGen.isExactDupSlot(id))
        assert(DocGen.genText(id) == DocGen.genText(id - 1), s"exact $id")
      else if (DocGen.isNearDupSlot(id)) {
        val j = jacc(shingleSet(DocGen.genText(id)),
          shingleSet(DocGen.genText(id - 1)))
        assert(j >= 0.80, s"near-dup $id jaccard $j")
        assert(DocGen.genText(id) != DocGen.genText(id - 1))
      }
    }
  }

  test("plantedPairs closed form matches the slot scan") {
    val n = 777L
    val brute = (1L until n).count(id =>
      DocGen.isNearDupSlot(id) || DocGen.isExactDupSlot(id))
    assert(DocGen.plantedPairs(n) == brute)
  }

  test("capped jaccard finds every planted pair on a 2k-doc corpus") {
    val n = 2000L
    val docs = DocGen.dataset(spark, n, partitions = 8)
    val cap = Some(math.max(5L, n / 100).toInt)
    val pairs = Dedup.jaccardPairs(docs, n = 3, minPct = 80,
        hotShingleCap = cap)
      .select("id_a", "id_b").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toSet
    val planted = (1L until n).filter(id =>
      DocGen.isNearDupSlot(id) || DocGen.isExactDupSlot(id))
      .map(id => (id - 1, id)).toSet
    val missed = planted -- pairs
    assert(missed.isEmpty, s"missed planted pairs: $missed")
  }
}
