package graft.search

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.Codec
import graft.model.EngineConf

/** Distributed block-max WAND (Ding & Suel BMW) top-k over the compressed
  * posting parts — the north star's query path.
  *
  * Sharding: the doc-id space is cut into `numShards` ranges; every matched
  * posting part is routed to the shards its [first_doc, last_doc] range
  * overlaps (block skipping makes per-shard decode proportional to the
  * shard's content, not the part size). Each shard runs BMW locally with the
  * per-block (maxTf, minDl) directory bounds — which stay valid upper bounds
  * across merges for any avgdl — and emits its local top-k; the global
  * top-k is the built-in TakeOrderedAndProject over shard candidates.
  *
  * Scoring is BM25: weight × tf(k1+1) / (tf + k1(1-b+b·dl/avgdl)) where
  * weight = idf × (number of search terms matching the word).
  */
object Wand {

  final case class ShardRow(shard: Int, word: String, weight: Double,
      first_doc: Long, bytes: Array[Byte])
  final case class Cand(doc_id: Long, score: Double)

  /** Top-k over `postings` (pass it PRE-FILTERED with the query's coarse
    * dictionary predicate — letter equality for partition pruning plus the
    * pushable equals/startsWith per search word) for the matched words.
    *
    * `weightedWords` is a DataFrame (word, weight) with weight = idf × term
    * multiplicity — it is broadcast-JOINED against the pruned postings
    * scan, so a short prefix matching 10⁴⁺ dictionary words never becomes
    * a driver-side In-list or a collected Map (r1 verdict: the driver
    * bottleneck on wide wildcards); the coarse scan predicate keeps the
    * parquet min/max file skipping an In-list used to give. */
  /** `exclude`: SORTED tombstoned doc ids skipped during scoring (the
    * Lucene live-docs check — candidates are dropped at offer time, so
    * upper bounds stay valid and live docs can never be displaced by a
    * deleted one). Bounded by deletes-since-compaction ([[graft.index
    * .IndexDeleter]] contract), so shipping it in the task closure is the
    * broadcast-small-side economy, not a corpus-sized transfer. */
  def topK(spark: SparkSession, postings: DataFrame,
      weightedWords: DataFrame, span: Long,
      avgdl: Double, conf: EngineConf, k: Int,
      numShardsOpt: Option[Int] = None,
      exclude: Array[Long] = Array.emptyLongArray): DataFrame = {
    import spark.implicits._
    if (span <= 0)
      return spark.emptyDataset[Cand].toDF()
    val numShards = numShardsOpt.getOrElse(
      math.max(spark.sparkContext.defaultParallelism, 1))
    val width = math.max(1L, (span + numShards - 1) / numShards)
    val k1 = conf.k1; val b = conf.b

    val parts = postings
      .join(org.apache.spark.sql.functions.broadcast(weightedWords),
        $"term" === $"word")
      .select($"term", $"weight", $"first_doc", $"last_doc", $"bytes")
      .as[(String, Double, Long, Long, Array[Byte])]

    val sharded = parts.flatMap { case (word, w, fd, ld, bytes) =>
      ((fd / width).toInt to (ld / width).toInt).iterator
        .map(s => ShardRow(s, word, w, fd, bytes))
    }

    val cands = sharded.groupByKey(_.shard).flatMapGroups { (shard, rows) =>
      val lo = shard.toLong * width
      val hi = math.min(lo + width, span)
      runShard(rows, lo, hi, k1, b, avgdl, k, exclude)
    }

    cands.toDF().orderBy($"score".desc, $"doc_id").limit(k)
  }

  // ---- per-shard BMW --------------------------------------------------

  private final class Cursor(val word: String, val weight: Double,
      parts: Array[Codec.Decoded], lo: Long, hi: Long,
      k1: Double, b: Double, avgdl: Double) {

    private var pi = 0 // part index
    private var bi = 0 // block index in part
    private var ei = 0 // entry index in decoded block
    private var blk: Array[Codec.Posting] = null
    var curDoc: Long = Long.MaxValue
    private var curTf = 0
    private var curDl = 0
    var exhausted = false

    /** Term upper bound within [lo, hi): from directory only, no decode. */
    val ub: Double = {
      var best = 0.0
      var p = 0
      while (p < parts.length) {
        val d = parts(p)
        var i = 0
        while (i < d.blocks.length) {
          val info = d.blocks(i)
          val blockFirst = if (i == 0) d.firstDoc else d.blocks(i - 1).lastDoc + 1
          if (info.lastDoc >= lo && blockFirst < hi) {
            val s = weight * tfNorm(info.maxTf, info.minDl)
            if (s > best) best = s
          }
          i += 1
        }
        p += 1
      }
      best
    }

    @inline private def tfNorm(tf: Int, dl: Int): Double =
      tf * (k1 + 1) / (tf + k1 * (1 - b + b * (if (avgdl == 0) 0.0 else dl / avgdl)))

    def score: Double = weight * tfNorm(curTf, curDl)

    /** Upper bound of the block the cursor currently sits in. */
    def blockBound: Double = {
      val info = parts(pi).blocks(bi)
      weight * tfNorm(info.maxTf, info.minDl)
    }

    def blockLastDoc: Long = parts(pi).blocks(bi).lastDoc

    /** Position at first posting with doc >= target (and >= lo, < hi).
      * Blocks are skipped via the directory; payloads decode lazily. */
    def advanceTo(target0: Long): Unit = {
      if (exhausted) return
      val target = math.max(target0, lo)
      while (true) {
        if (pi >= parts.length) { markDone(); return }
        val d = parts(pi)
        if (d.blocks.isEmpty || d.blocks.last.lastDoc < target) {
          pi += 1; bi = 0; ei = 0; blk = null
        } else {
          while (d.blocks(bi).lastDoc < target) { bi += 1; ei = 0; blk = null }
          if (blk == null) { blk = d.block(bi); ei = 0 }
          while (ei < blk.length && blk(ei).docId < target) ei += 1
          // block.lastDoc >= target guarantees a hit within the block
          val p = blk(ei)
          if (p.docId >= hi) markDone()
          else { curDoc = p.docId; curTf = p.tf; curDl = p.dl }
          return
        }
      }
    }

    def next(): Unit = {
      if (exhausted) return
      ei += 1
      if (blk != null && ei < blk.length) {
        val p = blk(ei)
        if (p.docId >= hi) markDone()
        else { curDoc = p.docId; curTf = p.tf; curDl = p.dl }
      } else {
        bi += 1; ei = 0; blk = null
        if (pi < parts.length && bi < parts(pi).blocks.length) {
          blk = parts(pi).block(bi)
          val p = blk(0)
          if (p.docId >= hi) markDone()
          else { curDoc = p.docId; curTf = p.tf; curDl = p.dl }
        } else {
          pi += 1; bi = 0
          advanceTo(curDoc + 1)
        }
      }
    }

    private def markDone(): Unit = { exhausted = true; curDoc = Long.MaxValue }

    def init(): this.type = { advanceTo(lo); this }
  }

  private[graft] def runShard(rows: Iterator[ShardRow], lo: Long, hi: Long,
      k1: Double, b: Double, avgdl: Double, k: Int,
      exclude: Array[Long] = Array.emptyLongArray): Iterator[Cand] = {
    @inline def isDeleted(d: Long): Boolean =
      exclude.length > 0 && java.util.Arrays.binarySearch(exclude, d) >= 0
    // cursors: one per word, chaining its parts in doc order
    val byWord = mutable.LinkedHashMap.empty[String, (Double, mutable.ArrayBuffer[(Long, Array[Byte])])]
    rows.foreach { r =>
      val e = byWord.getOrElseUpdate(r.word, (r.weight, mutable.ArrayBuffer.empty))
      e._2 += ((r.first_doc, r.bytes))
    }
    val cursors = byWord.toSeq.sortBy(_._1).map { case (w, (weight, ps)) =>
      new Cursor(w, weight, ps.sortBy(_._1).map(p => Codec.decode(p._2)).toArray,
        lo, hi, k1, b, avgdl).init()
    }.filterNot(_.exhausted).to(mutable.ArrayBuffer)
    if (cursors.isEmpty) return Iterator.empty

    // head = worst candidate: smallest score, ties broken by larger doc id
    val worstFirst: Ordering[Cand] = Ordering.by(c => (-c.score, c.doc_id))
    val heap = mutable.PriorityQueue.empty[Cand](worstFirst)
    @inline def heapFull = heap.size >= k
    @inline def beatsWorst(s: Double, d: Long): Boolean =
      !heapFull || {
        val w = heap.head
        s > w.score || (s == w.score && d < w.doc_id)
      }
    def offer(s: Double, d: Long): Unit =
      if (beatsWorst(s, d)) {
        if (heapFull) heap.dequeue()
        heap.enqueue(Cand(d, s))
      }

    var done = false
    while (!done) {
      cursors.filterInPlace(!_.exhausted)
      if (cursors.isEmpty) done = true
      else {
        cursors.sortInPlace()(Ordering.by((c: Cursor) => (c.curDoc, c.word)))
        val theta = if (heapFull) heap.head.score else Double.NegativeInfinity
        // pivot: first UB prefix that could still beat (or tie) the worst —
        // exact scoring decides ties by doc id, so >= keeps tie candidates
        var prefix = 0.0
        var pivot = -1
        var i = 0
        while (i < cursors.length && pivot < 0) {
          prefix += cursors(i).ub
          if (prefix >= theta) pivot = i
          i += 1
        }
        if (pivot < 0) done = true
        else {
          val pivotDoc = cursors(pivot).curDoc
          if (pivotDoc >= hi) done = true
          else if (cursors.head.curDoc == pivotDoc) {
            val atPivot = cursors.takeWhile(_.curDoc == pivotDoc)
            // block-max refinement: directory bound of the exact blocks
            var bm = 0.0
            atPivot.foreach(c => bm += c.blockBound)
            if (heapFull && (bm < theta ||
                (bm == theta && pivotDoc > heap.head.doc_id))) {
              // skip past the smallest block boundary among pivot cursors,
              // but not past the next cursor's current doc
              var boundary = Long.MaxValue
              atPivot.foreach(c => boundary = math.min(boundary, c.blockLastDoc))
              val nextCur = if (cursors.length > atPivot.length)
                cursors(atPivot.length).curDoc else Long.MaxValue
              val target = math.min(math.max(boundary + 1, pivotDoc + 1), nextCur)
              atPivot.foreach(_.advanceTo(target))
            } else {
              // a tombstoned pivot doc is skipped, never offered — live
              // docs below the bound still advance normally
              if (!isDeleted(pivotDoc)) {
                var s = 0.0
                atPivot.foreach { c => s += c.score }
                offer(s, pivotDoc)
              }
              atPivot.foreach(_.next())
            }
          } else {
            cursors.head.advanceTo(pivotDoc)
          }
        }
      }
    }
    heap.dequeueAll.iterator // order irrelevant downstream
  }
}
