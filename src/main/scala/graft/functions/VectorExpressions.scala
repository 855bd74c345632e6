package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.2 ➕
  * similarity search). `cosine_sim` replaces the compositional
  * `aggregate(zip_with(...))` chain with one fused loop that stays inside
  * WholeStageCodegen — no per-element lambda closures, no intermediate
  * arrays. At 100 TB of embeddings this is the difference between a scan
  * bound by SIMD-able arithmetic and one bound by allocation.
  *
  * NULL semantics mirror the compositional chain EXACTLY (which is what
  * licenses `DotProductRewrite` as a pure plan rewrite): a null input, a
  * length mismatch (zip_with null-pads the shorter array and the null
  * propagates through the lambda), or a null element all yield NULL. The
  * per-element null check is emitted only when the array type can actually
  * contain nulls, so the hot loop over `containsNull = false` embeddings
  * stays branch-free.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkDoubleArrays(prettyName, left, right)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val elemNullCheck = VectorFunctions.elemNullCheck(left, right, a, b, i, ev)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product twin of CosineSimilarity — same fused-loop codegen, same
  * lambda-chain-equivalent NULL semantics.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val elemNullCheck = VectorFunctions.elemNullCheck(left, right, a, b, i, ev)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API and SQL exposure of the native vector expressions. */
object VectorFunctions {
  /** Per-element null guard for the fused loops — emitted only when either
    * input's array type can contain nulls, so clean embedding columns pay
    * nothing.
    */
  private[functions] def elemNullCheck(
      left: Expression, right: Expression,
      a: String, b: String, i: String,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String = {
    def canBeNull(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
    if (canBeNull(left) || canBeNull(right))
      s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
    else ""
  }

  private[functions] def checkDoubleArrays(
      name: String, exprs: Expression*): TypeCheckResult = {
    if (exprs.forall(_.dataType == ArrayType(DoubleType)) ||
        exprs.forall(e => Seq(ArrayType(DoubleType), ArrayType(DoubleType, false)).contains(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> inputs, got " + exprs.map(_.dataType.sql).mkString(", "))
  }

  /** Cast any numeric array to array<double> so callers can pass
    * array<float> parquet embeddings directly.
    */
  private def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      toDoubleArray(ColumnBridge.expression(a)), toDoubleArray(ColumnBridge.expression(b))))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      toDoubleArray(ColumnBridge.expression(a)), toDoubleArray(ColumnBridge.expression(b))))
  def hyperplane_buckets(v: Column, tables: Int, bits: Int): Column =
    ColumnBridge.column(HyperplaneBuckets(
      toDoubleArray(ColumnBridge.expression(v)), tables, bits))

  /** Builders shared by ad-hoc registration and GraftExtensions injection.
    * Parameter positions that must be compile-time constants (shingle
    * width, hash counts, table/bit counts) accept foldable int literals.
    */
  private[functions] def intArg(e: Expression, what: String): Int = e match {
    case f if f.foldable => f.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an int-range literal, got $other")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  // The SQL builders apply the same toDoubleArray coercion as the Column
  // API, so `cosine_sim(embedding, ...)` works on array<float> parquet
  // columns whether the call is written in Scala or SQL.
  private[functions] val SqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(
      toDoubleArray(exprs.head), toDoubleArray(exprs(1)))),
    "dot_product" -> (exprs => DotProduct(
      toDoubleArray(exprs.head), toDoubleArray(exprs(1)))),
    "hyperplane_buckets" -> (exprs => HyperplaneBuckets(toDoubleArray(exprs.head),
      intArg(exprs(1), "tables"), intArg(exprs(2), "bits"))),
    "minhash_signature" -> (exprs => MinHashSignature(exprs.head,
      intArg(exprs(1), "n"), intArg(exprs(2), "numHashes"))),
    "minhash_band_keys" -> (exprs => MinHashBandKeys(exprs.head,
      intArg(exprs(1), "n"), intArg(exprs(2), "numHashes"), intArg(exprs(3), "bandRows"))),
    "simhash_signature" -> (exprs => SimHashSignature(exprs.head, intArg(exprs(1), "n"))),
    "shingle_hashes" -> (exprs => ShingleHashes(exprs.head, intArg(exprs(1), "n"))),
    "sorted_intersect_count" -> (exprs => SortedIntersectCount(exprs.head, exprs(1))),
    "pair_combinations" -> (exprs => PairCombinations(exprs.head)),
    "pair_combinations_keyed" -> (exprs => PairCombinationsKeyed(exprs.head, exprs(1))),
    "word_grams" -> (exprs => WordGrams(exprs.head, intArg(exprs(1), "n"),
      exprs.lift(2).exists(e => intArg(e, "distinct") != 0))),
    "word_ngram_stats" -> (exprs => WordNgramStats(exprs.head, intArg(exprs(1), "n"))))

  /** SQL-surface usage docs (`DESCRIBE FUNCTION`) — in particular the
    * sorted-distinct precondition of sorted_intersect_count.
    */
  private[functions] val SqlUsage: Map[String, String] = Map(
    "cosine_sim" -> "_FUNC_(a, b) - Cosine similarity of two numeric arrays (coerced to array<double>); NULL on length mismatch or null element.",
    "dot_product" -> "_FUNC_(a, b) - Dot product of two numeric arrays (coerced to array<double>); NULL on length mismatch or null element.",
    "hyperplane_buckets" -> "_FUNC_(v, tables, bits) - Per-table sign buckets of vector v under deterministic pseudo-random hyperplanes; tables/bits must be int literals.",
    "minhash_signature" -> "_FUNC_(text, n, numHashes) - MinHash signature (array<bigint>) of the character-n-gram shingle set of text; n/numHashes must be int literals.",
    "minhash_band_keys" -> "_FUNC_(text, n, numHashes, bandRows) - Banded xxhash64 LSH keys (array<bigint>, one per band) of the MinHash signature of text; int literals, bandRows must divide numHashes.",
    "simhash_signature" -> "_FUNC_(text, n) - 32-bit SimHash of the character-n-gram multiset of text; n must be an int literal.",
    "shingle_hashes" -> "_FUNC_(text, n) - Sorted-distinct xxhash64 hashes of the character-n-gram shingles of text (the expected input of sorted_intersect_count).",
    "sorted_intersect_count" -> "_FUNC_(a, b) - Intersection size of two array<bigint> inputs that MUST be sorted ascending with distinct elements (as produced by shingle_hashes); returns NULL if either array violates that precondition or contains a null element.",
    "pair_combinations" -> "_FUNC_(ids) - All unordered pairs of distinct values from an array<bigint>, as (id1, id2) structs with id1 < id2 (LSH bucket-member pair expansion).",
    "pair_combinations_keyed" -> "_FUNC_(ids, payloads) - All unordered pairs of distinct ids from PARALLEL array<bigint> inputs (index i of each belongs together), as (id1, p1, id2, p2) structs with id1 < id2; NULL on length mismatch or null element.",
    "word_grams" -> "_FUNC_(text, n[, distinct]) - Word n-grams of text (tokens split on single spaces, empties kept, joined with single spaces); distinct <> 0 keeps first occurrences only. n/distinct must be int literals.",
    "word_ngram_stats" -> "_FUNC_(text, n) - One-pass word-n-gram repetition stats of text: struct(n_grams, n_distinct, max_count). n must be an int literal.")

  /** Register as SQL functions on an existing session (tests / notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session-extension injection (`spark.sql.extensions=graft.functions.
  * GraftExtensions`) — the production path for making ALL of the engine's
  * native expressions (vector similarity, dedup signatures, shingle-set
  * verification) available to pure-SQL users cluster-wide, alongside the
  * dot-product optimizer rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    VectorFunctions.SqlFunctions.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
          VectorFunctions.SqlUsage.getOrElse(name, ""), ""),
        builder))
    }
  }
}
