package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expressions for the vector hot path — preference ladder
 * step (b) from the build plan: a codegen'd `Expression` beats a typed-map
 * kernel (stays inside whole-stage codegen, no row↔object serialization)
 * and beats any UDF (no boxing).
 *
 * Semantics match [[graft.llm.Similarity.dotKernel]] exactly: sequential
 * left-to-right IEEE-754 accumulation, so results are bit-identical across
 * the expression, kernel, and DuckDB-oracle paths.
 */
object VectorExpressions {

  /** `dot(array<double>, array<double>) → double`, null if lengths differ. */
  final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        val n = x.numElements()
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // ctx.freshName, not fixed locals: several DotProduct instances in
        // one projection (e.g. lshBucket's planes) inline into one codegen
        // scope; duplicate declarations would fail janino and silently fall
        // back to interpreted eval.
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /**
   * `cosine(array<double>, array<double>) → double` in ONE array pass: the
   * three accumulations (a·b, a·a, b·b) run in the same loop, each in the
   * same left-to-right IEEE order as the separate [[DotProduct]]/norm
   * passes — bit-identical result, one third the array traversals, and the
   * norms no longer need to be staged through a join. Division semantics
   * match the composed form (zero norms → NaN/Inf, never an error).
   */
  final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var ab = 0.0; var aa = 0.0; var bb = 0.0
        var i = 0
        while (i < n) {
          val xv = x.getDouble(i); val yv = y.getDouble(i)
          ab += xv * yv; aa += xv * xv; bb += yv * yv
          i += 1
        }
        ab / (math.sqrt(aa) * math.sqrt(bb))
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val ab = ctx.freshName("ab")
        val aa = ctx.freshName("aa")
        val bb = ctx.freshName("bb")
        val i = ctx.freshName("i")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
           |    $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
           |  }
           |  ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: dot product of two `array<double>` columns. */
  def graft_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Column API: one-pass cosine similarity of two `array<double>` columns. */
  def graft_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Column API: L2 norm via the same sequential accumulation. */
  def graft_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(graft_dot(a, a))

  /** Register `graft_dot` / `graft_cosine` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
  }
}
