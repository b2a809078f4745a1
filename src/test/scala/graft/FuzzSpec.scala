package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{GraftFpHash, GraftRepStats, GraftShingles, GraftSimhash, TextStats}

/** Seeded random-input properties for the native kernels and the
  * data-layout ops — several hundred adversarial strings (unicode,
  * whitespace runs, empties) checked against straightforward Scala
  * reference implementations, plus structural invariants no example test
  * pins (chunk coverage/overlap, pack bin accounting). */
class FuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)

  private def randText(): String = {
    val alphabet = Vector("alpha", "beta", "gamma", "naïve", "café", "x",
      "词", "🙂ok", "a-b", "q9", "", " ", "\t", "\n", "  ")
    val n = rnd.nextInt(30)
    (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
      .mkString(rnd.nextInt(3) match {
        case 0 => " "
        case 1 => "  "
        case _ => "\t"
      })
  }
  private val samples: Seq[String] =
    Seq("", " ", "\t\n ", "one") ++ (0 until 400).map(_ => randText())

  private def toks(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  test("graft_shingles == sliding-window reference on random strings") {
    for (s <- samples; n <- Seq(1, 2, 3)) {
      val got = GraftShingles.shingles(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val expect = toks(s).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct
      assert(got == expect, s"n=$n text='$s'")
    }
  }

  test("graft_repstats == reference counts on random strings") {
    for (s <- samples) {
      val r = GraftRepStats.stats(UTF8String.fromString(s))
      val t = toks(s)
      val wc = t.groupBy(identity).view.mapValues(_.length)
      val bc = t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
        .toSeq.groupBy(identity).view.mapValues(_.length)
      assert(r.getLong(0) == t.length.toLong, s"'$s' n_tokens")
      assert(r.getLong(1) == wc.size.toLong, s"'$s' n_uniq")
      assert(r.getLong(2) == (if (wc.isEmpty) 0L else wc.values.max.toLong))
      assert(r.getLong(3) == (if (bc.isEmpty) 0L else bc.values.max.toLong))
    }
  }

  test("graft_simhash == per-bit sign-sum reference, both widths") {
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); h ^= cp; h *= 0x100000001b3L
        i += Character.charCount(cp)
      }
      h
    }
    for (s <- samples; bits <- Seq(31, 64)) {
      val t = toks(s)
      val expect = if (t.isEmpty) 0L else {
        val sums = new Array[Int](bits)
        for (w <- t) {
          val h = if (bits == 31) GraftFpHash.hashStr(w) else fnv(w)
          for (i <- 0 until bits)
            sums(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        }
        (0 until bits).map(i => if (sums(i) > 0) 1L << i else 0L).sum
      }
      assert(GraftSimhash.sig(UTF8String.fromString(s), bits) == expect,
        s"bits=$bits text='$s'")
    }
  }

  test("chunk: full coverage, exact overlap, no contained tails") {
    val cases = (0 until 60).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(120))).map(k => s"w$k").mkString(" "))
    }
    for ((size, overlap) <- Seq((10, 0), (10, 3), (40, 10), (7, 6))) {
      val step = size - overlap
      val got = TextStats.chunk(cases.toDF("doc_id", "text"), size, overlap)
        .as[(Long, Long, String, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3.split(" ").toSeq).toSeq).toMap
      for ((id, text) <- cases) {
        val t = toks(text).toSeq
        val chunks = got(id)
        // every chunk is the exact expected window
        chunks.zipWithIndex.foreach { case (c, k) =>
          assert(c == t.slice(k * step, k * step + size),
            s"doc $id chunk $k size=$size ov=$overlap")
        }
        // coverage: last chunk reaches the doc end
        assert(chunks.nonEmpty && chunks.last.last == t.last,
          s"doc $id size=$size ov=$overlap")
        // no chunk is contained in its predecessor
        chunks.sliding(2).foreach {
          case Seq(a, b) => assert(!a.containsSlice(b) || b.length == size,
            s"doc $id contained tail size=$size ov=$overlap")
          case _ =>
        }
      }
    }
  }

  test("packSequences: bins account for every token exactly once") {
    val docs = (0 until 80).map { i =>
      (i.toLong, if (i % 4 == 0) "a" else "b",
        (1 to rnd.nextInt(40)).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val rows = TextStats.packSequences(docs, budget = 64)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    for (src <- Seq("a", "b")) {
      val in = rows.filter(_._2 == src)
      var cum = 0L
      for ((_, _, n, bin, off) <- in) {
        assert(bin == cum / 64 && off == cum % 64, s"src=$src")
        cum += n
      }
    }
  }
}
