package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (SURVEY.md §2.2 ➕ text
  * analysis): h = fold(chars, 0, (acc, c) -> (acc * base + c) mod m).
  *
  * The definition is deliberately portable integer arithmetic — the DuckDB
  * oracle recomputes it exactly via
  * `list_reduce(list_prepend(0, [ascii(c) for c in text]), ...)` — while
  * this native expression evaluates it in one codegen'd loop over the
  * string bytes (the compositional `aggregate(split(text, ''))` form
  * allocates a per-row char array and runs interpreted lambdas).
  *
  * ASCII semantics: `c` is the character code; for the fixtures (ASCII
  * text) bytes == code points. Documented constraint, matching the
  * reference's ASCII-only I/O (`/root/reference/D/Program.cs:65`).
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash requires string, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * base + s.charAt(i)) % mod; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |final String $s = $v.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${base}L + $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingHash {
  val DefaultBase = 31L
  val DefaultMod  = 1000000007L

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), DefaultBase, DefaultMod))
}
