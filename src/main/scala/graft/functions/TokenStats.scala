package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `token_stats(text)` → STRUCT<n_tokens INT, n_distinct INT,
 * n_chars INT> in ONE pass over the string — the fused form of the
 * per-document text-statistics triple
 * (`size(tokens(text))`, `size(array_distinct(tokens(text)))`,
 * `length(text)`), which as separate Column expressions tokenizes the
 * SAME text twice and materializes the token array once more for
 * `array_distinct`'s hash pass. At 500k docs (the sf10 tier) the
 * unfused q10 ran 2.9× DuckDB's vectorized string kernels; one
 * tokenize + one hash-set membership pass per document is the fix.
 *
 * Bit-for-bit parity with the unfused expressions (the q10 oracle is
 * hash-checked):
 *  - `n_chars` = code-point count of the ORIGINAL text (Spark `length`)
 *  - trimming removes ASCII 0x20 only (Spark `trim`), NOT Java's
 *    `String.trim` ≤0x20 range
 *  - empty-after-trim → (0, 0, n_chars) (the `tokens()` empty guard)
 *  - otherwise Java `Pattern("\\s+").split(trimmed, -1)` — Spark's
 *    `split` limit −1 semantics, KEEPING the leading empty token when
 *    the trimmed text starts with non-space whitespace and trailing
 *    empties after a non-space-whitespace tail
 *  - distinct = exact string equality (a hashed sketch could collide
 *    and silently shave a count — the oracle would catch it, so don't)
 *
 * Codegen delegates the loop to [[compute]] via a reference object —
 * one virtual call per row keeps the surrounding stage inside
 * whole-stage codegen without inlining a regex engine into Janino.
 */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(u: UTF8String): InternalRow = {
    val full = u.toString
    val nChars = full.codePointCount(0, full.length)
    // Spark trim(): ASCII space only
    var b = 0
    var e = full.length
    while (b < e && full.charAt(b) == ' ') b += 1
    while (e > b && full.charAt(e - 1) == ' ') e -= 1
    if (b == e) return new GenericInternalRow(Array[Any](0, 0, nChars))
    val toks = ws.split(full.substring(b, e), -1)
    val seen = new java.util.HashSet[String](math.max(16, toks.length * 2))
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    new GenericInternalRow(Array[Any](toks.length, seen.size, nChars))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[TokenStats].getName
    val ref = ctx.addReferenceObj("tokenStats", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}
