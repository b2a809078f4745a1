package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Codec
import graft.index.Codec.Posting

/** Round-trip + block-directory property tests for the posting codec
  * (deterministic seeded generation — 200 random cases per property). */
class CodecSpec extends AnyFunSuite {

  private def randomPostings(rnd: scala.util.Random): List[Posting] = {
    val n = rnd.nextInt(2000)
    var doc = math.abs(rnd.nextLong() % (1L << 40))
    (0 until n).map { _ =>
      doc += 1 + rnd.nextInt(10000)
      Posting(doc, 1 + rnd.nextInt(500), 1 + rnd.nextInt(5000))
    }.toList
  }

  test("round-trip identity (property, 200 seeded cases)") {
    val rnd = new scala.util.Random(4242)
    val blockSizes = Array(1, 7, 128, 1000)
    for (i <- 0 until 200) {
      val ps = randomPostings(rnd)
      val bs = blockSizes(i % blockSizes.length)
      val back = Codec.decodeAll(Codec.encode(ps, bs)).toList
      assert(back == ps, s"case $i blockSize $bs n=${ps.length}")
    }
  }

  test("block directory invariants (property, 100 seeded cases)") {
    val rnd = new scala.util.Random(1337)
    for (i <- 0 until 100) {
      val ps = randomPostings(rnd)
      if (ps.nonEmpty) {
        val d = Codec.decode(Codec.encode(ps, 128))
        assert(d.count == ps.length)
        assert(d.blocks.map(_.count).sum == ps.length)
        var total = 0
        for (b <- d.blocks.indices) {
          val blk = d.block(b)
          val info = d.blocks(b)
          assert(blk.last.docId == info.lastDoc, s"case $i block $b lastDoc")
          assert(blk.map(_.tf).max == info.maxTf, s"case $i block $b maxTf")
          assert(blk.map(_.dl).min == info.minDl, s"case $i block $b minDl")
          total += blk.length
        }
        assert(total == ps.length)
      }
    }
  }

  test("empty list") {
    assert(Codec.decodeAll(Codec.encode(Nil, 128)).isEmpty)
  }

  test("compression is compact: small gaps ≈ few bytes per posting") {
    val ps = (0 until 10000).map(i => Posting(i.toLong * 2, 1, 50))
    val bytes = Codec.encode(ps, 128)
    // gap=2, tf=1, dl=50 → 3 bytes/posting + directory overhead
    assert(bytes.length < 10000 * 4)
  }
}
