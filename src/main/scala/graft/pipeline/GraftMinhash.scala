package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash_bands(text, numHashes, bands, n)` — the whole MinHash
  * banding signature of a document as ONE native codegen pass: per-band
  * bucket values (array of `bands` longs), where bucket_b is the rolling
  * hash of the band's r per-permutation minima over the doc's word
  * n-gram shingles. Arithmetic is BIT-IDENTICAL to the exploded form it
  * replaces ([[Dedup.minhashBands]] r5: `graft_shingles` explode →
  * per-shingle fphash → 64-long signature per shingle row → typed
  * `groupByKey.reduceGroups` elementwise min): the per-shingle hash is
  * the [[GraftFpHash]] fold over the space-joined shingle text, the
  * permutations are the same universal-hash family, and min/rolling-band
  * composition is associative-commutative integer math — so moving it
  * map-side changes no value, only the plan (the signature shuffle and
  * the per-shingle 64-long array allocation disappear; at corpus scale
  * the token stream never leaves the scan). Duplicate shingle
  * occurrences cannot move a min, so the distinct-set step of the
  * exploded form is dropped rather than replicated.
  *
  * A doc with fewer than n tokens returns an EMPTY array (posexplode
  * then emits no rows — the exploded form's no-shingles behavior). */
case class GraftMinhash(child: Expression, numHashes: Int, bands: Int,
    n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numHashes >= 1 && bands >= 1 &&
        numHashes % bands == 0 && n >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_minhash_bands requires (string, numHashes, bands, n) with " +
        s"bands | numHashes, got ${child.dataType}, $numHashes, $bands, $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    GraftMinhash.bandBuckets(input.asInstanceOf[UTF8String], numHashes,
      bands, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.GraftMinhash.bandBuckets($c, $numHashes, $bands, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftMinhash {

  /** Mersenne prime 2^31 - 1 for the universal-hash permutations — THE
    * definition ([[Dedup.MinhashP]] republishes it). */
  val P: Long = 2147483647L

  /** Permutation coefficients — one definition shared with any
    * re-derivation (the SQL oracles restate the same closed forms). */
  def permA(i: Int): Long = ((i + 1) * 2654435761L) % P match {
    case 0L => 1L
    case a => a
  }
  def permB(i: Int): Long = ((i + 1) * 1099511628211L) % P

  /** Static entry for generated code: per-band bucket values. */
  def bandBuckets(s: UTF8String, numHashes: Int, bands: Int,
      n: Int): ArrayData = {
    val toks = GraftShingles.wsSplit(s)
    if (toks.length < n)
      return new GenericArrayData(Array.emptyLongArray)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) { as(k) = permA(k); bs(k) = permB(k); k += 1 }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val mod = TextStats.FpMod
    var i = 0
    while (i <= toks.length - n) {
      // fphash of the space-joined shingle, computed without building the
      // joined string: the fold sees the same codepoint sequence
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31 + ' '.toInt) % mod
        val t = toks(i + j)
        var ci = 0
        val len = t.length
        while (ci < len) {
          val cp = t.codePointAt(ci)
          h = (h * 31 + cp) % mod
          ci += Character.charCount(cp)
        }
        j += 1
      }
      k = 0
      while (k < numHashes) {
        val v = (as(k) * h + bs(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      k = b * r
      while (k < (b + 1) * r) { bucket = (bucket * 31 + sig(k)) % P; k += 1 }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftMinhash].getName, null, "graft_minhash_bands",
    "_FUNC_(text, numHashes, bands, n) - MinHash per-band bucket values " +
      "over word n-gram shingles (empty array below n tokens).",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 4,
      "graft_minhash_bands takes (text, numHashes, bands, n)")
    def lit(i: Int, what: String): Int = {
      require(children(i).foldable,
        s"graft_minhash_bands $what must be a constant expression")
      children(i).eval() match {
        case num: java.lang.Number => num.intValue()
        case other => throw new IllegalArgumentException(
          s"graft_minhash_bands $what must be an integer literal, got $other")
      }
    }
    GraftMinhash(children.head, lit(1, "numHashes"), lit(2, "bands"),
      lit(3, "n"))
  }
}
