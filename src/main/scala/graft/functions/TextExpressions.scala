package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram expressions — native one-pass replacements for the
  * compositional `transform(sequence(...), i -> concat_ws(' ',
  * element_at(split(text,' '), i), ...))` form (`Curation.wordGrams`).
  *
  * The compositional form is correct but pays an interpreter tax that
  * dominates curation queries: higher-order-function lambdas never enter
  * WholeStageCodegen, and each `element_at(split(text), i+k)` re-evaluates
  * the split per gram element — O(grams * n) full-text splits plus a
  * `concat_ws` allocation per gram. At corpus scale that is the difference
  * between a scan-speed projection and a GC-bound crawl.
  *
  * Token semantics are identical to `split(text, ' ')` with Java's
  * keep-empty-tokens behavior (and DuckDB's `string_split`): a token
  * boundary at EVERY single space character, empty tokens included. Because
  * every boundary is exactly one space, the n-gram
  * `concat_ws(" ", tok_i..tok_{i+n-1})` is precisely the byte slice of the
  * original text from the start of token i to the end of token i+n-1 — so
  * grams are emitted as zero-rejoin substrings. Space (0x20) is a one-byte
  * UTF-8 code point that cannot occur inside a multi-byte sequence, so the
  * byte scan is UTF-8-safe.
  */
object WordGramTokens {
  /** Byte offsets of token starts and (exclusive) ends. Returns the flat
    * array [start0, end0, start1, end1, ...]; token count = length / 2.
    */
  def tokenOffsets(bytes: Array[Byte]): Array[Int] = {
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val offs = new Array[Int]((spaces + 1) * 2)
    var t = 0
    var start = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        offs(2 * t) = start; offs(2 * t + 1) = i
        t += 1; start = i + 1
      }
      i += 1
    }
    offs(2 * t) = start; offs(2 * t + 1) = bytes.length
    offs
  }
}

/** All word n-grams of `text` (with multiplicity, or first-occurrence
  * distinct when `distinct` is set) — native form of
  * `Curation.wordGrams` / `array_distinct(Curation.wordGrams)`, proven
  * element-identical in FunctionsSpec. Empty array when the document has
  * fewer than n words.
  */
case class WordGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_grams"

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGrams.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    val offs = WordGramTokens.tokenOffsets(bytes)
    val tokens = offs.length / 2
    val count = tokens - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val s = offs(2 * i)
        out(i) = UTF8String.fromBytes(bytes, s, offs(2 * (i + n - 1) + 1) - s)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // LinkedHashSet == array_distinct's keep-first-occurrence order
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        val s = offs(2 * i)
        seen.add(UTF8String.fromBytes(bytes, s, offs(2 * (i + n - 1) + 1) - s))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }
}

/** Per-document n-gram repetition statistics in ONE pass with NO shuffle:
  * struct(n_grams, n_distinct, max_count) over the word-n-gram multiset.
  * The compositional equivalent — explode grams, groupBy (doc, gram),
  * re-aggregate per doc — shuffles a corpus x grams row set just to compute
  * a per-document-local quantity; this expression keeps the whole
  * computation inside the scan projection, which is the right shape at
  * 100 TB (the Gopher-style repetition filters are embarrassingly parallel
  * per document). All-zero struct when the document has fewer than n words.
  */
case class WordNgramStats(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  override def prettyName: String = "word_ngram_stats"

  override def nullSafeEval(input: Any): Any =
    WordNgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramStats {
  def compute(text: UTF8String, n: Int): GenericInternalRow = {
    val bytes = text.getBytes
    val offs = WordGramTokens.tokenOffsets(bytes)
    val count = offs.length / 2 - (n - 1)
    val row = new GenericInternalRow(3)
    if (count <= 0) {
      row.setLong(0, 0L); row.setLong(1, 0L); row.setLong(2, 0L)
      return row
    }
    val counts = new java.util.HashMap[UTF8String, Int](count * 2)
    var maxCount = 0
    var i = 0
    while (i < count) {
      val s = offs(2 * i)
      val g = UTF8String.fromBytes(bytes, s, offs(2 * (i + n - 1) + 1) - s)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    row.setLong(0, count.toLong)
    row.setLong(1, counts.size.toLong)
    row.setLong(2, maxCount.toLong)
    row
  }
}

/** Column-API exposure. */
object TextFunctions {
  def word_grams(text: Column, n: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n, distinct))
  def word_ngram_stats(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramStats(ColumnBridge.expression(text), n))
}
