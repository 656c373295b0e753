package graft.lakehouse.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native codegen'd vector kernels. The higher-order-function route
  * (`aggregate(zip_with(...))`) evaluates one interpreted expression tree
  * per element — fine for a demo, ruinous over 10^10 vector elements. These
  * compile to a tight fused loop inside whole-stage codegen, reading
  * ArrayData directly (no per-element boxing).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // a null ELEMENT nulls the result even when neither array column is
  // null — the default child-nullability union would let codegen assume
  // non-null and read garbage
  override def nullable: Boolean = super.nullable ||
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** dot(a, b) over array<double> columns. Length-mismatch: extra elements
  * of the longer vector are ignored (a partial dot — zip_with would
  * null-pad and poison the whole sum instead). A NULL ELEMENT anywhere
  * nulls the result: ArrayData.getDouble would silently read it as 0.0,
  * which is a wrong answer, not a missing one. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      // `ev.isNull` exists as an assignable variable ONLY when the
      // expression is statically nullable — when both inputs provably
      // contain no null elements Spark pins isNull to the literal `false`
      // and never declares it, so interpolating an assignment would emit
      // an undeclared name, fail Janino, and silently drop the whole
      // projection to interpreter mode. Skipping the check is also the
      // faster loop: no per-element branch when nulls are impossible.
      val nullCheck = if (nullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (|a| * |b|) in one fused pass (dot and both norms
  * accumulated in the same loop — one traversal, not three). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    // a zero vector has no direction: define its similarity as 0.0, never
    // NaN — Spark SQL orders NaN ABOVE every number and `NaN >= t` is
    // TRUE, so a NaN here would rank zero embeddings (a common
    // failed-embedding sentinel) as the top match of every query and make
    // threshold filters treat them as duplicates of everything
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val den = ctx.freshName("den")
      // same undeclared-isNull hazard as DotProduct: only reference
      // ev.isNull when the expression is statically nullable
      val nullCheck = if (nullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $den == 0.0 ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** popcount(a & b) summed over two array<bigint> bitmasks — the overlap
  * kernel of the bitset Jaccard plan (Dedup.bitsetJaccardPairs), fused
  * into whole-stage codegen so the all-pairs loop costs ceil(V/64) word
  * ops per pair instead of an interpreted zip_with/aggregate tree. Masks
  * may have different lengths: words past the shorter mask hold no tokens
  * and contribute nothing (the loop runs to the min length). A NULL WORD
  * likewise counts as no-tokens — masks are built dense by the caller, so
  * null never encodes "unknown" here, only absence. */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_bitand_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column-API entry points. */
  def graft_dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def graft_cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def graft_bitand_count(a: Column, b: Column): Column =
    column(BitsetIntersectCount(expression(a), expression(b)))
  def graft_topk(c: Column, k: Int): Column =
    column(DoubleTopK(expression(c), k).toAggregateExpression())
  def graft_bottomk(c: Column, k: Int): Column =
    column(LongBottomK(expression(c), k).toAggregateExpression())

  /** Register for SQL use: SELECT graft_cosine(a, b). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", DoubleTopK.fromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottomk", LongBottomK.fromExprs, "built-in")
  }
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` or
  * spark.sql.extensions=graft.lakehouse.functions.GraftExtensions gives
  * every session the native vector kernels (graft_dot / graft_cosine /
  * graft_topk) in SQL. The Scala-UDF surface (custom_initcap et al.)
  * needs a live session and registers via `Strings.registerUdfs(spark)`
  * — extensions can only inject Expression builders. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "graft_cosine"),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DoubleTopK].getName, "graft_topk"),
        DoubleTopK.fromExprs))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bottomk"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[LongBottomK].getName, "graft_bottomk"),
        LongBottomK.fromExprs))
  }
}
