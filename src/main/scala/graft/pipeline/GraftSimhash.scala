package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(text, bits)` — the whole SimHash signature in ONE native
  * codegen string pass: per whitespace token compute a word hash, add ±1
  * per bit (sign sum over occurrences ≡ the tf-weighted per-word sum),
  * assemble bit i when its sum is positive. Two modes:
  *
  *   - `bits = 31`: word hash = the engine's rolling `graft_fphash`
  *     (fold (acc*31+cp) mod 2^31) — BIT-IDENTICAL to the column-expression
  *     form this replaces ([[Dedup.simhash]]'s 31 interpreted `aggregate`
  *     lambdas) and to the SQL oracle;
  *   - `bits = 64`: word hash = FNV-1a 64 over code points — the SCALE
  *     variant. On a zipfian corpus every doc's word DISTRIBUTION is
  *     similar, so 31-bit signatures concentrate near the corpus mean
  *     signature and hamming ≤ 3 of 31 floods with false positives
  *     (measured: 92k pairs / 95 s at 25k docs); 3 of 64 is a far stricter
  *     angular threshold and keeps banding selective.
  *
  * Empty-token texts return [[GraftSimhash.EmptySig]] (callers filter —
  * a no-token doc has no signature row, matching the oracle's
  * exploded-token grouping).
  */
case class GraftSimhash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires a string argument, got ${child.dataType}")
    else if (bits != 31 && bits != 64)
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash bits must be 31 or 64, got $bits")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    GraftSimhash.sig(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.GraftSimhash.sig($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftSimhash {

  /** Sentinel for texts with no tokens (callers drop these rows). A real
    * signature can also be 0 in principle (all 31/64 sums negative), so
    * this is only usable as a filter TOGETHER with a token-count check —
    * [[Dedup]] filters on `size(tokens) > 0` instead and never relies on
    * the sentinel. */
  val EmptySig = 0L

  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h ^= cp
      h *= 0x100000001b3L
      i += Character.charCount(cp)
    }
    h
  }

  /** Static entry for generated code: one pass, int[bits] sign sums. */
  def sig(s: UTF8String, bits: Int): Long = {
    val toks = GraftShingles.wsSplit(s)
    if (toks.isEmpty) return EmptySig
    val sums = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val h = if (bits == 31) GraftFpHash.hashStr(toks(t))
              else fnv1a64(toks(t))
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) {
      if (sums(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftSimhash].getName, null, "graft_simhash",
    "_FUNC_(text, bits) - SimHash signature over whitespace tokens; bits = 31 (rolling-hash, oracle-exact) or 64 (FNV-1a, scale variant).",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_simhash takes (text, bits)")
    require(children(1).foldable, "graft_simhash bits must be a constant")
    val bits = children(1).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_simhash bits must be an integer literal, got $other")
    }
    GraftSimhash(children.head, bits)
  }
}
