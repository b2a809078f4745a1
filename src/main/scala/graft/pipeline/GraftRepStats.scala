package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_repstats(text)` — per-document repetition statistics in ONE
  * string pass as a native codegen Catalyst expression:
  * `struct(n_tokens, n_uniq, top_word, top_bigram)` where `top_word` /
  * `top_bigram` are the occurrence counts of the most frequent whitespace
  * token / adjacent token pair (0 when none exists).
  *
  * This is the map-side kernel of the Gopher-style repetition quality
  * filter ([[CorpusFilters.repetition]]): the distributed alternative —
  * explode grams, `groupBy(doc, gram).count`, `groupBy(doc).max` — pays
  * two shuffles of the full token stream for a per-document bounded
  * reduction; here the whole filter stays a zero-shuffle codegen
  * projection, the same shape as the other [[TextStats]] ops. Token split
  * is `\s+` with empties dropped, identical to [[TextStats.wsTokens]] and
  * the SQL oracles.
  */
case class GraftRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_repstats requires a string argument, got ${child.dataType}")

  override def dataType: DataType = GraftRepStats.Schema
  override def prettyName: String = "graft_repstats"

  override def nullSafeEval(input: Any): Any =
    GraftRepStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GraftRepStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftRepStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_word", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))

  /** Static entry for generated code: one pass, two bounded hash maps
    * (word → count, bigram → count); memory is O(doc vocabulary), not
    * corpus vocabulary — the capacity HINT is capped so a highly
    * repetitive giant doc (vocab 1, n huge) doesn't pre-allocate an
    * O(n) bucket array (and n*2 can't overflow Int). */
  def stats(s: UTF8String): InternalRow = {
    val toks = GraftShingles.wsSplit(s)
    val n = toks.length
    val cap = math.min(n.toLong * 2L, 1L << 16).toInt.max(16)
    val words = new java.util.HashMap[String, Int](cap)
    var topWord = 0
    var i = 0
    while (i < n) {
      val c = words.merge(toks(i), 1, (a, b) => a + b)
      if (c > topWord) topWord = c
      i += 1
    }
    var topBigram = 0
    if (n >= 2) {
      val bigrams = new java.util.HashMap[String, Int](cap)
      val sb = new java.lang.StringBuilder(32)
      i = 0
      while (i < n - 1) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1))
        val c = bigrams.merge(sb.toString, 1, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, words.size.toLong,
      topWord.toLong, topBigram.toLong))
  }

  private[graft] val info = new ExpressionInfo(
    classOf[GraftRepStats].getName, null, "graft_repstats",
    "_FUNC_(text) - struct(n_tokens, n_uniq, top_word, top_bigram) repetition stats over whitespace tokens.",
    "", "", "", "", "4.1.0", "", "scala_udf")

  private[graft] def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_repstats takes exactly one argument")
    GraftRepStats(children.head)
  }
}
