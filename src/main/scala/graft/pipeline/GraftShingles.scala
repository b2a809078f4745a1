package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, n)` — the DISTINCT word n-gram shingles of a text
  * as a native codegen Catalyst expression: one pass over the string, a
  * LinkedHashSet of sliding joins, no shuffle and no interpreted
  * higher-order-function lambdas (the r3 `transform(sequence, slice)`
  * rewrite eliminated the shuffles but paid ~3-5 s of non-codegen HOF
  * evaluation at sf0.1 — this closes that too; the window/distinct shape
  * before it paid two shuffles). Token split is `\s+` with empties
  * dropped, identical to [[TextStats.wsTokens]] and the SQL oracles.
  */
case class GraftShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (string, positive n), got ${child.dataType}, $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    GraftShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.GraftShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftShingles {
  // compiled once: String.split(regex) has no fast path for multi-char
  // patterns and would recompile per row on this hot path
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** THE ws-token kernel shared by the native expressions (one definition,
    * so a tokenization tweak cannot drift between kernels while the
    * DataFrame-level [[TextStats.wsTokens]] and the oracle `WsToks`
    * restate it): `\s+` split, empties dropped. */
  private[pipeline] def wsSplit(s: UTF8String): Array[String] =
    wsSplit(s.toString)

  /** String form — for kernels that already decoded the row (one
    * UTF-8 decode per row, not one per use). */
  private[pipeline] def wsSplit(str: String): Array[String] =
    Ws.split(str).filter(_.nonEmpty)

  /** Static entry for generated code: distinct n-gram shingles in
    * first-occurrence order. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = wsSplit(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftShingles].getName, null, "graft_shingles",
    "_FUNC_(text, n) - distinct word n-gram shingles (whitespace tokens).",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_shingles takes (text, n)")
    require(children(1).foldable,
      "graft_shingles n must be a constant expression")
    val n = children(1).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_shingles n must be an integer literal, got $other")
    }
    GraftShingles(children.head, n)
  }
}
