package graft.tokenize

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_near_count(text, 'worda wordb', d)` — proximity confirm: the
  * number of kept-token position pairs at which the two folded words
  * co-occur within distance `d` (|i−j| ≤ d over [[Tokenizer.tokens]]
  * positions, i ≠ j; for a repeated word, unordered pairs i < j). The
  * sibling of [[GraftPhraseCount]] — a phrase is adjacency (d exactly the
  * word offset, order fixed), NEAR is unordered bounded distance — and the
  * same execution shape: the positionless index AND-prunes candidates,
  * this kernel re-derives positions from candidate text in one map-side
  * pass. Null text → null.
  *
  * `graft_onear_count` is the ORDERED form (the commercial ONEAR/BEFORE
  * operator): pairs where wordA strictly precedes wordB, 1 ≤ j−i ≤ d.
  * A repeated word is unchanged (i < j already encodes order).
  */
case class GraftNearCount(child: Expression, wordA: String, wordB: String,
    d: Int, ordered: Boolean = false) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_near_count requires a string column, got ${child.dataType}")
    else if (wordA.isEmpty || wordB.isEmpty || d < 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_near_count requires two non-empty words and d >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String =
    if (ordered) "graft_onear_count" else "graft_near_count"

  override def nullSafeEval(input: Any): Any =
    GraftNearCount.count(input.asInstanceOf[UTF8String], wordA, wordB, d,
      ordered)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("graftNearA", wordA, "java.lang.String")
    val bRef = ctx.addReferenceObj("graftNearB", wordB, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.tokenize.GraftNearCount.count($c, $aRef, $bRef, $d, " +
        s"$ordered)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftNearCount {

  /** Static entry for generated code: co-occurrence pairs within `d`
    * (`ordered` keeps only a-before-b pairs, 1 ≤ j−i ≤ d). Token positions
    * are collected in one tokenizer pass; the pair count is a sorted
    * two-list sweep (each position list is scanned once per window edge),
    * so a stopword-soup doc costs O(n_a + n_b + pairs). */
  def count(s: UTF8String, a: String, b: String, d: Int,
      ordered: Boolean): Int = {
    val toks = Tokenizer.tokens(s.toString)
    val same = a == b
    // primitive builders: this runs per candidate row inside codegen, and
    // a stopword-soup doc has thousands of positions — no boxing
    val pa = new scala.collection.mutable.ArrayBuilder.ofInt
    val pb = new scala.collection.mutable.ArrayBuilder.ofInt
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t == a) pa += i
      if (!same && t == b) pb += i
      i += 1
    }
    val la = pa.result()
    if (same) {
      // unordered pairs i < j with j - i <= d over one position list
      var c = 0
      var x = 0
      var lo = 0
      while (x < la.length) {
        while (la(x) - la(lo) > d) lo += 1
        c += x - lo
        x += 1
      }
      c
    } else {
      val lb = pb.result()
      // sliding window over the second list per first-list position
      var c = 0
      var x = 0
      var lo = 0
      var hi = 0
      while (x < la.length) {
        val p = la(x)
        // window over b positions: [p−d, p+d] unordered, [p+1, p+d] ordered
        val low = if (ordered) p + 1 else p - d
        while (lo < lb.length && lb(lo) < low) lo += 1
        if (hi < lo) hi = lo
        while (hi < lb.length && lb(hi) <= p + d) hi += 1
        c += hi - lo
        x += 1
      }
      c
    }
  }

  private[tokenize] val info = new ExpressionInfo(
    classOf[GraftNearCount].getName, null, "graft_near_count",
    "_FUNC_(text, 'worda wordb', d) - kept-token position pairs where the " +
      "two folded words co-occur within distance d.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[tokenize] val orderedInfo = new ExpressionInfo(
    classOf[GraftNearCount].getName, null, "graft_onear_count",
    "_FUNC_(text, 'worda wordb', d) - kept-token position pairs where " +
      "worda strictly precedes wordb within distance d (1 <= j-i <= d).",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[tokenize] def builder(children: Seq[Expression]): Expression =
    build(children, ordered = false)

  private[tokenize] def orderedBuilder(children: Seq[Expression]): Expression =
    build(children, ordered = true)

  private def build(children: Seq[Expression], ordered: Boolean): Expression = {
    val name = if (ordered) "graft_onear_count" else "graft_near_count"
    require(children.length == 3, s"$name takes (text, words, d)")
    require(children(1).foldable && children(1).dataType == StringType,
      s"$name words must be a constant string expression")
    require(children(2).foldable,
      s"$name d must be a constant expression")
    val words = children(1).eval() match {
      case s: UTF8String => GraftPhraseCount.foldWords(s.toString)
      case other => throw new IllegalArgumentException(
        s"$name words must be a string literal, got $other")
    }
    require(words.length == 2,
      s"$name needs exactly two foldable words, got $words")
    val d = children(2).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"$name d must be an integer literal, got $other")
    }
    GraftNearCount(children.head, words.head, words(1), d, ordered)
  }
}
