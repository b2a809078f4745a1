package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic document corpus for the dedup-family scale
  * bench: ~100-token zipfian texts with PLANTED duplicates whose ids make
  * recall checkable in closed form —
  *
  *   - `docId % 50 == 1`  → near-dup of `docId-1` (one token substituted
  *     at position 50: ≥ 90% 3-gram shingle jaccard);
  *   - `docId % 101 == 100` (and not a near-dup slot) → EXACT copy of
  *     `docId-1`.
  *
  * Generation is a pure function of docId (same contract as
  * [[TranscriptGen]]): driver-local and distributed forms agree
  * byte-for-byte at any size with no driver materialization. The zipf
  * draw (`rank = vocab * u^2` on 20k words, top word ~0.7% of tokens (P(rank 0) = 1/√20000))
  * keeps shingle df statistics web-like; skew comes from the DESIGNED
  * boilerplate header on 10% of docs, whose shingles have df = n/10 and
  * force the capped-jaccard guard to engage (see [[hasBoilerplate]]).
  */
object DocGen {

  /** Bumped on any generation change — cached bench corpora key on it. */
  val Version = 2

  val VocabSize = 20000
  private def mkWord(rank: Int): String = {
    val rnd = new scala.util.Random(104729L * (rank + 1))
    val len = 4 + rnd.nextInt(7)
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(('a' + rnd.nextInt(26)).toChar); i += 1 }
    sb.toString
  }
  private lazy val vocab: Array[String] = (0 until VocabSize).map(mkWord).toArray

  private val NTokens = 100

  /** Shared boilerplate header on 10% of docs: its shingles have
    * df = n/10 ≫ any sane cap, so the capped-jaccard skew guard MUST
    * engage (uncapped, these alone would generate C(n/10, 2) candidate
    * pairs — the quadratic blowup the cap exists to prevent). */
  private val Boilerplate =
    Array("common", "header", "boilerplate", "preamble", "notice")
  def hasBoilerplate(docId: Long): Boolean = docId % 10 == 0

  private def baseTokens(docId: Long): Array[String] = {
    val rnd = new scala.util.Random(15485863L ^ docId)
    // u^2 zipf on a 20k vocabulary: top word ~0.7% of tokens (P(rank 0) = 1/√20000) — shingle
    // df statistics stay web-like (random 3-gram collisions are rare; an
    // early u^3-on-2k draft put ~8% of mass on the top word, and the
    // resulting mid-df shingles generated billions of BELOW-cap candidate
    // pairs — unrealistic for text, and a corpus of that shape needs a
    // much lower cap than n/100)
    val body = Array.fill(NTokens) {
      val u = rnd.nextDouble()
      vocab(math.min(VocabSize - 1, (VocabSize * u * u).toInt))
    }
    if (hasBoilerplate(docId)) Boilerplate ++ body else body
  }

  // shared by the Boolean slots AND the Column predicate below — a change
  // here changes both, so the bench recall filter cannot drift
  val NearDupMod = 50L
  val ExactDupMod = 101L

  def isNearDupSlot(docId: Long): Boolean = docId % NearDupMod == 1
  def isExactDupSlot(docId: Long): Boolean =
    docId % ExactDupMod == ExactDupMod - 1 && !isNearDupSlot(docId)

  /** The text of one doc — derives from the neighbor's ACTUAL text (a
    * near-dup slot's neighbor can itself be an exact-dup slot); dup slots
    * of either kind are never consecutive, so recursion depth ≤ 3. */
  def genText(docId: Long): String =
    if (isNearDupSlot(docId)) {
      val toks = genText(docId - 1).split(' ')
      toks(50) = "nd" + docId
      toks.mkString(" ")
    } else if (isExactDupSlot(docId)) genText(docId - 1)
    else baseTokens(docId).mkString(" ")

  /** Closed-form count of planted pairs (id, id+1) among docs [0, n). */
  def plantedPairs(n: Long): Long =
    (1L until n).count(id => isNearDupSlot(id) || isExactDupSlot(id))

  /** The same slot arithmetic as a Column predicate over a pair frame —
    * defined HERE so the bench's recall filter cannot drift from the
    * generator's slot definitions. */
  def isPlantedPairCol(idA: org.apache.spark.sql.Column,
      idB: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    idB === idA + 1 &&
      (idB % NearDupMod === 1 || idB % ExactDupMod === ExactDupMod - 1)

  /** Closed-form count of docs whose ENTIRE text is duplicated corpus-wide
    * (each exact-dup slot duplicates itself and its neighbor): the
    * planted ground truth for span-level dedup — a whole-doc duplicate
    * must surface as one full-length span. */
  def plantedExactDocs(n: Long): Long =
    (1L until n).count(isExactDupSlot) * 2L

  /** Same membership as a Column predicate (bench recall filter — defined
    * HERE so it cannot drift from the slot definitions). */
  def isPlantedExactDocCol(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def slot(x: org.apache.spark.sql.Column) =
      x % ExactDupMod === ExactDupMod - 1 && !(x % NearDupMod === 1)
    slot(id) || slot(id + 1)
  }

  /** Distributed corpus: (doc_id, text). */
  def dataset(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions)
               else spark.range(n)
    base.as[Long].map(id => (id, genText(id))).toDF("doc_id", "text")
  }
}
