package graft.lakehouse.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native codegen'd expression.
  *
  * Text corpora arrive in mixed normalization forms — the same visible
  * string can be composed (U+00E9) or decomposed (U+0065 U+0301), which
  * silently defeats exact dedup, tokenizer vocab lookups, and equality
  * joins. Spark ships no normalization built-in, and a Scala UDF pays
  * row-at-a-time serialization; this compiles to a tight branch inside
  * whole-stage codegen with an `isNormalized` fast path, so the common
  * already-NFC corpus never allocates.
  *
  * `form` must be one of NFC / NFD / NFKC / NFKD (validated at analysis
  * time, not deep in an executor task).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val javaForm = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, javaForm)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      // `form` is analysis-validated, so interpolating it as a Java enum
      // constant is safe; the isNormalized fast path returns the input
      // UTF8String untouched (zero-copy) for already-normalized text.
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.$form)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

object TextNormFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def graft_normalize(c: Column, form: String): Column =
    column(UnicodeNormalize(expression(c), form))
  def graft_nfc(c: Column): Column = graft_normalize(c, "NFC")
  def graft_nfkc(c: Column): Column = graft_normalize(c, "NFKC")

  /** Register for SQL use: SELECT graft_normalize(text, 'NFC'). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", exprs => {
        val form = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType) =>
            String.valueOf(v)
          case other => throw new IllegalArgumentException(
            s"graft_normalize form must be a string literal, got $other")
        }
        UnicodeNormalize(exprs(0), form)
      }, "built-in")
}
