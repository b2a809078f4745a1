package graft.index

import scala.collection.mutable.ArrayBuffer

/** Delta + varint block-compressed posting lists.
  *
  * Replaces the reference's fixed-width reversed/additional block chains
  * (reference: docs/Disk-Structure.md:62-88, app/Index/index_types.h:121-150)
  * with the compressed layout the north star asks for: doc-id deltas +
  * varints, grouped into fixed-size blocks with a directory carrying
  * per-block (lastDoc, maxTf, minDl) for block-max WAND skipping.
  *
  * Per posting we store (docGap, tf, dl): tf for BM25, dl inline so that
  * query-time scoring never joins postings against a norms table (the
  * (maxTf, minDl) pair per block gives a merge-proof upper bound for the
  * BM25 tf-norm regardless of the current avgdl — tf-norm is increasing in
  * tf and decreasing in dl).
  *
  * Layout (all varints unless noted):
  * {{{
  *   n               postings count
  *   firstDoc        absolute first doc id
  *   nBlocks
  *   directory * nBlocks:
  *     lastDocDelta  block's last doc minus previous block's last doc
  *                   (first block: minus firstDoc)
  *     count         postings in the block
  *     byteLen       payload byte length of the block
  *     maxTf
  *     minDl
  *   payload * nBlocks:
  *     (gap, tf, dl) * count; first gap of a block is from the previous
  *     block's last doc (first block: from firstDoc, so its first gap is 0)
  * }}}
  */
object Codec {

  final case class Posting(docId: Long, tf: Int, dl: Int)

  final case class BlockInfo(lastDoc: Long, maxTf: Int, minDl: Int,
      offset: Int, byteLen: Int, count: Int)

  /** Growable primitive byte buffer (ArrayBuffer[Byte] boxes through an
    * Array[AnyRef] — ruinous on the encode hot path). */
  final class ByteBuf(initial: Int) {
    private var arr = new Array[Byte](math.max(initial, 16))
    private var len = 0
    @inline def +=(b: Byte): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(len) = b; len += 1
    }
    def ++=(other: ByteBuf): Unit = {
      while (len + other.len > arr.length)
        arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      System.arraycopy(other.arr, 0, arr, len, other.len)
      len += other.len
    }
    def length: Int = len
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  // ---- varint ----------------------------------------------------------

  @inline private def writeVarLong(buf: ByteBuf, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  final class Reader(val bytes: Array[Byte], var pos: Int) {
    @inline def readVarLong(): Long = {
      var shift = 0; var result = 0L; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        result |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    @inline def readVarInt(): Int = readVarLong().toInt
  }

  // ---- encode ----------------------------------------------------------

  /** Encode postings (must be sorted by docId, strictly increasing). */
  def encode(postings: Iterable[Posting], blockSize: Int = 128): Array[Byte] = {
    val ps = postings.toArray
    val docs = new Array[Long](ps.length)
    val tfs = new Array[Int](ps.length)
    val dls = new Array[Int](ps.length)
    var i = 0
    while (i < ps.length) {
      docs(i) = ps(i).docId; tfs(i) = ps(i).tf; dls(i) = ps(i).dl; i += 1
    }
    encodeColumns(docs, tfs, dls, ps.length, blockSize)
  }

  /** Columnar encode — the hot-path entry: no per-posting objects. */
  def encodeColumns(docs: Array[Long], tfs: Array[Int], dls: Array[Int],
      n: Int, blockSize: Int): Array[Byte] = {
    val buf = new ByteBuf(n * 3 + 16)
    writeVarLong(buf, n.toLong)
    if (n == 0) return buf.toArray
    val firstDoc = docs(0)
    writeVarLong(buf, firstDoc)
    val nBlocks = (n + blockSize - 1) / blockSize
    writeVarLong(buf, nBlocks.toLong)

    // encode payloads per block first to learn byte lengths
    val payloads = new Array[ByteBuf](nBlocks)
    val lastDocs = new Array[Long](nBlocks)
    val maxTfs = new Array[Int](nBlocks)
    val minDls = new Array[Int](nBlocks)
    var b = 0
    var prevDoc = firstDoc
    while (b < nBlocks) {
      val from = b * blockSize
      val until = math.min(from + blockSize, n)
      val pb = new ByteBuf((until - from) * 3)
      var maxTf = 0; var minDl = Int.MaxValue
      var i = from
      while (i < until) {
        val gap = docs(i) - prevDoc
        require(gap >= 0 && (gap > 0 || i == 0),
          s"postings must be strictly increasing by docId (at $i)")
        writeVarLong(pb, gap)
        writeVarLong(pb, tfs(i).toLong)
        writeVarLong(pb, dls(i).toLong)
        if (tfs(i) > maxTf) maxTf = tfs(i)
        if (dls(i) < minDl) minDl = dls(i)
        prevDoc = docs(i)
        i += 1
      }
      payloads(b) = pb
      lastDocs(b) = prevDoc
      maxTfs(b) = maxTf
      minDls(b) = if (minDl == Int.MaxValue) 0 else minDl
      b += 1
    }
    // directory
    var prevLast = firstDoc
    b = 0
    while (b < nBlocks) {
      val count = math.min((b + 1) * blockSize, n) - b * blockSize
      writeVarLong(buf, lastDocs(b) - prevLast)
      writeVarLong(buf, count.toLong)
      writeVarLong(buf, payloads(b).length.toLong)
      writeVarLong(buf, maxTfs(b).toLong)
      writeVarLong(buf, minDls(b).toLong)
      prevLast = lastDocs(b)
      b += 1
    }
    b = 0
    while (b < nBlocks) { buf ++= payloads(b); b += 1 }
    buf.toArray
  }

  // ---- decode ----------------------------------------------------------

  final case class Decoded(count: Int, firstDoc: Long, blocks: Array[BlockInfo],
      bytes: Array[Byte]) {

    /** Decode one block's postings. */
    def block(i: Int): Array[Posting] = {
      val info = blocks(i)
      val r = new Reader(bytes, info.offset)
      var prev = if (i == 0) firstDoc else blocks(i - 1).lastDoc
      val out = new Array[Posting](info.count)
      var k = 0
      while (k < info.count) {
        prev += r.readVarLong()
        out(k) = Posting(prev, r.readVarInt(), r.readVarInt())
        k += 1
      }
      out
    }

    def iterator: Iterator[Posting] =
      (0 until blocks.length).iterator.flatMap(block(_).iterator)
  }

  def decode(bytes: Array[Byte]): Decoded = {
    val r = new Reader(bytes, 0)
    val n = r.readVarInt()
    if (n == 0) return Decoded(0, 0L, Array.empty, bytes)
    val firstDoc = r.readVarLong()
    val nBlocks = r.readVarInt()
    val blocks = new Array[BlockInfo](nBlocks)
    var prevLast = firstDoc
    var b = 0
    // read directory, then fix payload offsets
    val lens = new Array[Int](nBlocks)
    while (b < nBlocks) {
      prevLast += r.readVarLong()
      val count = r.readVarInt()
      lens(b) = r.readVarInt()
      val maxTf = r.readVarInt(); val minDl = r.readVarInt()
      blocks(b) = BlockInfo(prevLast, maxTf, minDl, -1, lens(b), count)
      b += 1
    }
    var off = r.pos
    b = 0
    while (b < nBlocks) {
      blocks(b) = blocks(b).copy(offset = off)
      off += lens(b)
      b += 1
    }
    Decoded(n, firstDoc, blocks, bytes)
  }

  /** Convenience: full decode to postings. */
  def decodeAll(bytes: Array[Byte]): Array[Posting] = {
    val d = decode(bytes)
    val out = new Array[Posting](d.count)
    var i = 0
    d.iterator.foreach { p => out(i) = p; i += 1 }
    out
  }
}
