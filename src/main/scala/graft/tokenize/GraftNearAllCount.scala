package graft.tokenize

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nearall_count(text, 'w1 w2 ... wn', d)` — n-word proximity
  * confirm with ANCHOR semantics (the classic commercial NEAR/d operator
  * generalized past two words): the count of kept-token positions `p` of
  * the FIRST word such that EVERY other distinct word occurs somewhere in
  * `[p−d, p+d]` over [[Tokenizer.tokens]] positions. The first word is
  * the anchor, so word order matters only for which occurrences are
  * counted, never for whether a doc matches; for exactly two words this
  * counts anchors where [[GraftNearCount]] counts pairs — the two
  * semantics coexist because pair counting does not generalize to n
  * lists without combinatorial blowup, anchor counting does (and is the
  * n-word slop-phrase contribution in the boolean language). Null
  * text → null.
  */
case class GraftNearAllCount(child: Expression, words: Seq[String], d: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_nearall_count requires a string column, got ${child.dataType}")
    else if (words.length < 2 || words.exists(_.isEmpty) ||
      words.distinct.length != words.length || d < 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_nearall_count requires >= 2 distinct non-empty words and d >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearall_count"

  private lazy val wordArr: Array[String] = words.toArray

  override def nullSafeEval(input: Any): Any =
    GraftNearAllCount.count(input.asInstanceOf[UTF8String], wordArr, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("graftNearAllWords", wordArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.tokenize.GraftNearAllCount.count($c, $wRef, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftNearAllCount {

  /** Static entry for generated code: anchor occurrences of `words(0)`
    * with every other word within ±d. One tokenizer pass collects the n
    * position lists; each non-anchor list is then swept by ONE forward
    * pointer across all anchors (positions are ascending), so a
    * stopword-soup doc costs O(Σ n_j), never O(n_anchor · n_j). */
  def count(s: UTF8String, words: Array[String], d: Int): Int = {
    val toks = Tokenizer.tokens(s.toString)
    val n = words.length
    val lists = new Array[scala.collection.mutable.ArrayBuilder.ofInt](n)
    var j = 0
    while (j < n) {
      lists(j) = new scala.collection.mutable.ArrayBuilder.ofInt
      j += 1
    }
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var w = 0
      // n is query-sized (a handful); a linear scan beats a map here
      while (w < n) {
        if (t == words(w)) { lists(w) += i; w = n }
        else w += 1
      }
      i += 1
    }
    val anchor = lists(0).result()
    if (anchor.isEmpty) return 0
    val others = new Array[Array[Int]](n - 1)
    j = 1
    while (j < n) {
      others(j - 1) = lists(j).result()
      if (others(j - 1).isEmpty) return 0
      j += 1
    }
    val ptr = new Array[Int](n - 1)
    var c = 0
    var x = 0
    while (x < anchor.length) {
      val p = anchor(x)
      var ok = true
      var k = 0
      while (k < others.length) {
        val l = others(k)
        var q = ptr(k)
        while (q < l.length && l(q) < p - d) q += 1
        ptr(k) = q
        if (q >= l.length || l(q) > p + d) { ok = false; k = others.length }
        else k += 1
      }
      if (ok) c += 1
      x += 1
    }
    c
  }

  private[tokenize] val info = new ExpressionInfo(
    classOf[GraftNearAllCount].getName, null, "graft_nearall_count",
    "_FUNC_(text, 'w1 w2 ... wn', d) - kept-token positions of the first " +
      "word at which every other word occurs within distance d.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[tokenize] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_nearall_count takes (text, words, d)")
    require(children(1).foldable && children(1).dataType == StringType,
      "graft_nearall_count words must be a constant string expression")
    require(children(2).foldable,
      "graft_nearall_count d must be a constant expression")
    val words = children(1).eval() match {
      case s: UTF8String => GraftPhraseCount.foldWords(s.toString).distinct
      case other => throw new IllegalArgumentException(
        s"graft_nearall_count words must be a string literal, got $other")
    }
    require(words.length >= 2,
      s"graft_nearall_count needs >= 2 distinct foldable words, got $words")
    val d = children(2).eval() match {
      case num: java.lang.Number => num.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_nearall_count d must be an integer literal, got $other")
    }
    GraftNearAllCount(children.head, words, d)
  }
}
