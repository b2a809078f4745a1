package graft.tokenize

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_phrase_count(text, phrase)` — the number of start positions at
  * which the phrase's folded word sequence occurs CONSECUTIVELY in the
  * text's kept-token stream ([[Tokenizer.tokens]]: CharFold + interior
  * 5-14 / final 4-19 length rules), as a native codegen expression.
  *
  * This is the confirm step of positional phrase search (the reference
  * index stores word sets without positions — reference
  * app/Indexer/Indexer.cpp:77 discards order — so phrase semantics are an
  * engine extension): the index AND-prunes to candidate docs, and this
  * kernel re-derives adjacency from the candidate's text in one map-side
  * pass. Adjacency is over KEPT tokens — words the tokenizer drops
  * (interior length outside 5..14) do not break a phrase, matching what a
  * positional index built from the same token stream would store.
  *
  * Occurrences may overlap (text `a a a`, phrase `a a` → 2), mirroring
  * every start position a positional index would report. The phrase
  * literal is folded and split ONCE at plan time; per row the work is the
  * tokenizer pass plus a primitive sliding compare inside whole-stage
  * codegen. Null text → null; a phrase with no foldable words is rejected
  * at build time.
  */
case class GraftPhraseCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_phrase_count requires a string column, got ${child.dataType}")
    else if (words.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "graft_phrase_count phrase must contain at least one foldable word")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_phrase_count"

  private lazy val wordArr: Array[String] = words.toArray

  override def nullSafeEval(input: Any): Any =
    GraftPhraseCount.count(input.asInstanceOf[UTF8String], wordArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("graftPhrase", wordArr, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.tokenize.GraftPhraseCount.count($c, $wordsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftPhraseCount {

  /** Static entry for generated code: overlapping occurrences of `words`
    * as a consecutive run of the kept-token stream. */
  def count(s: UTF8String, words: Array[String]): Int = {
    val toks = Tokenizer.tokens(s.toString)
    val m = words.length
    val last = toks.length - m
    var c = 0
    var i = 0
    while (i <= last) {
      var j = 0
      while (j < m && toks(i + j) == words(j)) j += 1
      if (j == m) c += 1
      i += 1
    }
    c
  }

  /** Fold a raw phrase into its word sequence: CharFold per char, split on
    * the separator, empties dropped. NO length filtering — phrase-word
    * feasibility (a word the tokenizer could never emit ⇒ zero matches
    * anywhere) is the caller's contract, decided against the 4..19 kept
    * range in [[graft.search.Searcher.searchPhrase]]. */
  def foldWords(phrase: String): Seq[String] = {
    if (phrase == null) return Nil
    val sb = new java.lang.StringBuilder(phrase.length)
    var i = 0
    while (i < phrase.length) {
      sb.append(CharFold.fold(phrase.charAt(i)))
      i += 1
    }
    sb.toString.split(CharFold.Sep).toSeq.filter(_.nonEmpty)
  }

  private[tokenize] val info = new ExpressionInfo(
    classOf[GraftPhraseCount].getName, null, "graft_phrase_count",
    "_FUNC_(text, phrase) - overlapping occurrences of the phrase's folded " +
      "word sequence as consecutive kept tokens of text.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[tokenize] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_phrase_count takes (text, phrase)")
    require(children(1).foldable && children(1).dataType == StringType,
      "graft_phrase_count phrase must be a constant string expression")
    val words = children(1).eval() match {
      case s: UTF8String => foldWords(s.toString)
      case other => throw new IllegalArgumentException(
        s"graft_phrase_count phrase must be a string literal, got $other")
    }
    GraftPhraseCount(children.head, words)
  }
}
