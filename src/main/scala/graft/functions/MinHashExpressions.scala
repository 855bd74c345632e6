package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature: the full `numHashes`-long signature of a
  * document's character-`n`-gram shingle set in ONE codegen'd pass over the
  * text — the native replacement for the explode-shuffle-aggregate
  * formulation (shingle explode → per-shingle xxhash64 → `numHashes`-way
  * partial-min groupBy), which materializes corpus × shingles rows (10M+ at
  * sf0.1, row-format overhead and a full shuffle included) just to reduce
  * them straight back down to one row per document.
  *
  * Bit-compatible with that formulation by construction: shingle positions
  * are `1..greatest(len-(n-1), 1)` exactly like `Dedup.shingleArray`
  * (including the shorter-than-n clamp), the base hash is
  * `xxhash64(substr(text, i, n))` (XXH64 over the substring's UTF-8 bytes,
  * seed 42), and hash s is `xxhash64(s, base)` — XXH64's fold of an int
  * then a long from seed 42, signed-min-reduced. Signatures computed either
  * way are identical longs, so banding and recall characteristics carry
  * over unchanged.
  *
  * The reference's analog is the per-chunk in-memory aggregation loop
  * (`/root/reference/D/Program.cs:296-316`): tight per-row work with no
  * intermediate materialization — here expressed as a Catalyst expression
  * so Catalyst still owns scheduling, pruning, and the surrounding plan.
  */
case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private val BaseSeed = 42L

  /** Per-hash-function seeds: xxhash64's state after folding the function
    * index s from the base seed — exactly `xxhash64(s, ·)`'s intermediate.
    * Cached per distinct signature width (the expression is used with one
    * width per pipeline, so this is a one-element map in practice).
    */
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => Array.tabulate(kk)(s => XXH64.hashInt(s, BaseSeed)))

  /** One pass: for each shingle, one base hash + k cheap long-folds,
    * signed-min-reduced into the signature array. Called from both the
    * interpreted and the generated code path.
    */
  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val perHashSeed = seeds(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val count = math.max(text.numChars() - (n - 1), 1)
    var i = 0
    while (i < count) {
      // substringSQL is Spark's substr(text, i+1, n): the same shingle
      // bytes the compositional form hashes
      val g = text.substringSQL(i + 1, n)
      val base = XXH64.hashUTF8String(g, BaseSeed)
      var s = 0
      while (s < k) {
        val v = XXH64.hashLong(base, perHashSeed(s))
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Fused LSH band keys: the `numHashes / bandRows` banded xxhash64 keys of
  * a document's MinHash signature in ONE pass — the signature never
  * materializes as a column. Replaces the
  * `xxhash64(element_at(sig, ...) x bandRows) x numBands` expression tree
  * (126 element_at calls + 21 xxhash64 call sites of generated code per
  * row in the default 21x6 config), which dominated the dedup pipelines'
  * per-plan Janino compile time.
  *
  * Bit-identical to that compositional form: band b's key is Spark's
  * `xxhash64(sig[b*r+1], ..., sig[b*r+r])` — XXH64's left fold of the band's
  * signature longs from seed 42 — with the signature longs from
  * `MinHashSignature.compute` (itself explode+min-compatible).
  */
case class MinHashBandKeys(child: Expression, n: Int, numHashes: Int, bandRows: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")
    else if (bandRows <= 0 || numHashes % bandRows != 0) // order matters: % by 0 would throw
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a positive bandRows dividing numHashes, got $numHashes/$bandRows")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[UTF8String], n, numHashes, bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBandKeys.compute($c, $n, $numHashes, $bandRows);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandKeys {
  def compute(text: UTF8String, n: Int, numHashes: Int, bandRows: Int): ArrayData = {
    val sig = MinHashSignature.compute(text, n, numHashes)
    val bands = numHashes / bandRows
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // Spark's xxhash64(c1..cr): fold each long into the running seed
      var h = 42L
      var r = 0
      while (r < bandRows) {
        h = XXH64.hashLong(sig.getLong(b * bandRows + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-API exposure. */
object MinHashFunctions {
  def minhash_signature(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(text), n, numHashes))
  def minhash_band_keys(text: Column, n: Int, numHashes: Int, bandRows: Int): Column =
    ColumnBridge.column(MinHashBandKeys(ColumnBridge.expression(text), n, numHashes, bandRows))
  def simhash_signature(text: Column, n: Int): Column =
    ColumnBridge.column(SimHashSignature(ColumnBridge.expression(text), n))
  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def pair_combinations(ids: Column): Column =
    ColumnBridge.column(PairCombinations(ColumnBridge.expression(ids)))
  def pair_combinations_keyed(ids: Column, payloads: Column): Column =
    ColumnBridge.column(PairCombinationsKeyed(
      ColumnBridge.expression(ids), ColumnBridge.expression(payloads)))
}

/** Sorted distinct shingle-hash set of a document: all character-n-gram
  * hashes (same XXH64-seed-42 base hash as MinHashSignature, i.e.
  * `xxhash64(substr(text, i, n))`), deduplicated and sorted ascending, in
  * one pass — the verification-side companion of the MinHash signature.
  * Exact-Jaccard verification on these 8-byte longs is set-identical to
  * verification on the shingle strings themselves up to 64-bit hash
  * collisions (vanishingly unlikely; the LSH==exact spec would catch one).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val count = math.max(text.numChars() - (n - 1), 1)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      hs(i) = XXH64.hashUTF8String(text.substringSQL(i + 1, n), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted run
    var w = 0
    var r = 1
    while (r < count) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w + 1))
  }
}

/** Intersection size of two SORTED-DISTINCT long arrays (merge scan — no
  * per-row hash set, no materialized intersection array). Pairs with
  * `ShingleHashes` for exact-Jaccard verification:
  * jaccard = i / (|a| + |b| - i). A null array element yields NULL (the
  * count is undefined on a partially-known set), mirroring the null
  * semantics of the vector expressions.
  *
  * The merge scan is only meaningful on strictly-ascending input (what
  * `ShingleHashes` produces). Since the function is also exposed to SQL
  * users who may pass arbitrary arrays, a violation of that precondition
  * (out-of-order or duplicate element) returns NULL rather than a silently
  * wrong count — the check rides the null prescan, so sorted input pays
  * one extra compare per element.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        Seq(left, right).map(_.dataType.sql).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCount.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |java.lang.Long $res = graft.functions.SortedIntersectCount.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  /** Boxed so the null result survives the codegen boundary. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements(); val nb = b.numElements()
    // null prescan doubles as the sorted-distinct precondition check:
    // any non-ascending step means the merge scan would undercount
    var i = 0
    var prev = 0L
    while (i < na) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      if (i > 0 && v <= prev) return null
      prev = v; i += 1
    }
    var j0 = 0
    while (j0 < nb) {
      if (b.isNullAt(j0)) return null
      val v = b.getLong(j0)
      if (j0 > 0 && v <= prev) return null
      prev = v; j0 += 1
    }
    i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** All unordered pairs of distinct values from a bucket-member id array,
  * as value-ordered structs — the native replacement for the interpreted
  * `filter(flatten(transform(ids, a -> transform(ids, b -> ...))), p ->
  * p.id1 < p.id2)` in-bucket expansion. The lambda form materializes K^2
  * structs through the HOF interpreter (lambdas never enter
  * WholeStageCodegen); this is one tight loop emitting K*(K-1)/2 rows.
  * Set-identical output (each unordered pair of distinct values appears
  * exactly once, smaller id first; equal values yield nothing), so the
  * downstream explode + distinct pipeline is unchanged.
  */
case class PairCombinations(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id1", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id2", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pair_combinations"

  override def nullSafeEval(input: Any): Any =
    PairCombinations.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.PairCombinations.compute($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairCombinations {
  /** Null on a null element (mirrors the lambda form, where the null would
    * poison the comparison and the filter drops to an undefined set).
    */
  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    var i = 0
    while (i < n) { if (ids.isNullAt(i)) return null; i += 1 }
    val out = new java.util.ArrayList[Any](n * (n - 1) / 2)
    i = 0
    while (i < n) {
      val x = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        val y = ids.getLong(j)
        if (x != y) {
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
          if (x < y) { row.setLong(0, x); row.setLong(1, y) }
          else { row.setLong(0, y); row.setLong(1, x) }
          out.add(row)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `pair_combinations` with a payload rider: all unordered pairs of
  * distinct ids from PARALLEL (ids, payloads) arrays — the id arrays come
  * from `collect_list($"doc_id")` and the payloads from a second
  * `collect_list` over the same rows (Spark updates both aggregation
  * buffers in the same row order, so index i of each array belongs to the
  * same bucket member). Emits (id1, p1, id2, p2) structs with id1 < id2,
  * one tight loop — the native replacement for the last interpreted
  * `filter(flatten(transform(...)))` pair expansion (SimHash's, which must
  * carry each member's signature through the expansion and so couldn't use
  * the id-only `pair_combinations`).
  *
  * Null on any null element or on length-mismatched inputs (neither occurs
  * from the collect_list construction; the guard covers SQL callers).
  */
case class PairCombinationsKeyed(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id1", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("p1", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id2", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("p2", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pair_combinations_keyed"

  override def nullSafeEval(ids: Any, payloads: Any): Any =
    PairCombinationsKeyed.compute(
      ids.asInstanceOf[ArrayData], payloads.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.PairCombinationsKeyed.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PairCombinationsKeyed {
  def compute(ids: ArrayData, payloads: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (payloads.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i) || payloads.isNullAt(i)) return null
      i += 1
    }
    val out = new java.util.ArrayList[Any](n * (n - 1) / 2)
    i = 0
    while (i < n) {
      val x = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        val y = ids.getLong(j)
        if (x != y) {
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
          if (x < y) {
            row.setLong(0, x); row.setLong(1, payloads.getLong(i))
            row.setLong(2, y); row.setLong(3, payloads.getLong(j))
          } else {
            row.setLong(0, y); row.setLong(1, payloads.getLong(j))
            row.setLong(2, x); row.setLong(3, payloads.getLong(i))
          }
          out.add(row)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Fused 32-bit SimHash: the whole signature in one pass over the text —
  * native replacement for the explode + per-shingle md5-hex + 32-column
  * bit-sum aggregate, which materializes corpus×shingles rows and two
  * strings per shingle just to reduce back to one long per document.
  *
  * Bit-compatible with that formulation (and with the DuckDB oracle that
  * replicates it): shingle positions `1..greatest(len-(n-1),1)` with
  * multiplicity, and bit i's ±1 contribution is
  * `ascii(substr(md5hex, i+1, 1)) % 2 * 2 - 1` — the parity of the ASCII
  * code of the i-th hex digit, which differs between the digit ('0'-'9',
  * codes 48-57) and letter ('a'-'f', codes 97-102) ranges and is
  * reproduced nibble-exactly here.
  */
case class SimHashSignature(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(input: Any): Any =
    SimHashSignature.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSignature.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {
  /** ±1 contribution of hex nibble value 0-15: parity of its ASCII code
    * ('0'+v for digits, 'a'+v-10 for letters), matching `ascii(..) % 2`.
    */
  private val NibbleSign: Array[Int] =
    Array.tabulate(16) { v =>
      val ascii = if (v < 10) '0' + v else 'a' + (v - 10)
      ascii % 2 * 2 - 1
    }

  def compute(text: UTF8String, n: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](32)
    val count = math.max(text.numChars() - (n - 1), 1)
    var i = 0
    while (i < count) {
      md.reset()
      val dig = md.digest(text.substringSQL(i + 1, n).getBytes)
      var b = 0
      while (b < 16) {
        sums(2 * b) += NibbleSign((dig(b) >> 4) & 0xF)
        sums(2 * b + 1) += NibbleSign(dig(b) & 0xF)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** Fused random-hyperplane bucketing: the per-table sign buckets of a
  * vector under `tables`×`bits` deterministic pseudo-random hyperplanes,
  * computed in one codegen'd pass. Replaces a per-table chain of
  * interpreted `aggregate(zip_with(...))` projections (HOF lambdas never
  * enter WholeStageCodegen and pay per-row interpreter overhead ~20x the
  * arithmetic).
  *
  * Bit-compatible with `Similarity.neardupBucket`/`lshBucket`: plane
  * p = t*bits+b of the shared multiplicative-mix coef stream, coef(p, i) =
  * (((i+17)·(p+1)·104729 + p·7919) % 2001 - 1000)/1000 with 1-based
  * dimension i (the (p+1)(i+17) mixing DECORRELATES planes — the earlier
  * additive family made every plane a shifted copy of one sequence, which
  * skewed bucket occupancy and collapsed OR-amplified recall; measured in
  * Similarity.coef's scaladoc), sequential left-to-right accumulation, and
  * the same HALF_UP 6-decimal rounding before the sign test (the
  * cross-engine wobble guard), so DuckDB oracles built on the
  * compositional formula replicate these buckets exactly.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBuckets.compute($c, $tables, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Spark `round(x, 6)` on doubles: HALF_UP via BigDecimal.valueOf. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](tables)
    // a null element nullifies EVERY projection in the compositional form
    // (zip_with propagates it through the fold), and when(null > 0) takes
    // the otherwise-0 branch for every bit — so the equivalent here is
    // all-zero buckets, never a read of the null slot
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return new GenericArrayData(out)
      i += 1
    }
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val plane = t * bits + b
        var proj = 0.0
        var j = 1
        while (j <= dim) {
          val c = (((j + 17L) * ((plane + 1L) * 104729L) + plane * 7919L) % 2001L - 1000L) / 1000.0
          proj += v.getDouble(j - 1) * c
          j += 1
        }
        // Spark (and DuckDB) order NaN above every double, so the
        // compositional `round(proj, 6) > 0` is TRUE for NaN projections;
        // Java's `NaN > 0` is false — replicate the SQL ordering explicitly
        val r = round6(proj)
        if (java.lang.Double.isNaN(r) || r > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
