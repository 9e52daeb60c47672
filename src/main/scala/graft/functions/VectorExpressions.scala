package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

  /**
   * JVM kernel for the banded sign-LSH signature — the single source of
   * truth for the signature arithmetic: [[LshSignature]]'s interpreted eval
   * delegates here, its codegen emits the same loop, and the typed
   * deep-banding path ([[graft.llm.Similarity.lshBandSignatureKernel]]) calls
   * it directly. `planes` is the flat row-major hyperplane matrix
   * (`bands × planesPerBand × dims`); accumulation order is the sequential
   * left-to-right IEEE order of [[DotProduct]], so all three paths produce
   * bit-identical buckets.
   */
  def lshSignatureKernel(v: Array[Double], planes: Array[Double],
                         planesPerBand: Int, dims: Int): Array[Long] = {
    // direct callers get loud errors, not silently wrong buckets: >64 planes
    // per band would wrap the bucket's long bit mask (1L << j is mod-64), and
    // a plane matrix not divisible into bands would drop trailing planes
    require(planesPerBand >= 1 && planesPerBand <= 64,
      s"planesPerBand must be in [1, 64], got $planesPerBand")
    require(planes.length % (planesPerBand * dims) == 0,
      s"planes length ${planes.length} is not a whole number of " +
        s"bands × $planesPerBand planes × $dims dims")
    val bands = planes.length / (planesPerBand * dims)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < planesPerBand) {
        var acc = 0.0
        val off = (b * planesPerBand + j) * dims
        var i = 0
        while (i < dims) { acc += v(i) * planes(off + i); i += 1 }
        if (acc >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  }

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

  /**
   * `l2sq(array<double>, array<double>) → double` — squared L2 distance,
   * accumulated over the SUBTRACTION form `Σ(x−y)²` left-to-right (NOT
   * the algebraic `|x|²+|y|²−2x·y`, which differs in ulps and could flip
   * near-equal centroid tie-breaks against the oracle's replay). The
   * probe-assignment kernel of the distributed kNN join: a HOF
   * `zip_with`+`aggregate` form evaluates interpreted per row — at a
   * full-table query side that is the measured ~0.5 ms/row trap.
   * Null if lengths differ.
   */
  final case class L2Sq(left: Expression, right: Expression)
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
    override def prettyName: String = "graft_l2sq"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = x.getDouble(i) - y.getDouble(i)
          acc += d * d
          i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $d = $a.getDouble($i) - $b.getDouble($i);
           |    $acc += $d * $d;
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
   * `first_match(array<long>, array<long>) → int` — 1-based index of the
   * first position where the two arrays agree, 0 if none. The LSH
   * OR-construction dedup filter: a banded candidate join emits a pair once
   * per matching band; keeping only `band == first_match(sigX, sigY)` makes
   * dedup a streamed, allocation-free filter with early exit instead of a
   * post-join `distinct` shuffle of the ~bands× blow-up (and instead of a
   * per-row `zip_with` array allocation, which measured ~7× slower at
   * sf0.1). Null if lengths differ (never happens for fixed-b signatures).
   */
  final case class FirstMatch(left: Expression, right: Expression)
    extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_first_match"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var i = 0
        while (i < n) {
          if (x.getLong(i) == y.getLong(i)) return i + 1
          i += 1
        }
        0
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val res = ctx.freshName("res")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $res = 0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.getLong($i) == $b.getLong($i)) { $res = $i + 1; break; }
           |  }
           |  ${ev.value} = $res;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /**
   * `lsh_signature(array<double>) → array<long>` — ALL banded sign-LSH
   * buckets in one fused loop: `planes` is the flat row-major hyperplane
   * matrix (`bands × planesPerBand × dims`), bucket bit j of band b is the
   * sign of the sequential dot with plane `b·r+j`. Replaces a projection of
   * `bands × planesPerBand` separate dot-product expressions, which blew
   * past janino's method budget and fell back to interpreted eval (~3 ms/row
   * — the dominant cost of every banded-LSH query). Dot accumulation order
   * is identical to [[DotProduct]], so the buckets are bit-identical to the
   * composed form. Null if the vector's length differs from `dims`.
   */
  final case class LshSignature(child: Expression, planes: Array[Double],
                                planesPerBand: Int, dims: Int)
    extends UnaryExpression {

    private val bands: Int = planes.length / (planesPerBand * dims)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_lsh_signature"

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      if (v.numElements() != dims) null
      else new GenericArrayData(
        lshSignatureKernel(v.toDoubleArray(), planes, planesPerBand, dims))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out")
        val b = ctx.freshName("b")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val off = ctx.freshName("off")
        val bucket = ctx.freshName("bucket")
        s"""
           |if ($a.numElements() != $dims) {
           |  ${ev.isNull} = true;
           |} else {
           |  long[] $out = new long[$bands];
           |  for (int $b = 0; $b < $bands; $b++) {
           |    long $bucket = 0L;
           |    for (int $j = 0; $j < $planesPerBand; $j++) {
           |      double $acc = 0.0;
           |      int $off = ($b * $planesPerBand + $j) * $dims;
           |      for (int $i = 0; $i < $dims; $i++) {
           |        $acc += $a.getDouble($i) * $planesRef[$off + $i];
           |      }
           |      if ($acc >= 0.0) $bucket |= (1L << $j);
           |    }
           |    $out[$b] = $bucket;
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: fused banded sign-LSH signature (see [[LshSignature]]). */
  def graft_lsh_signature(v: Column, planes: Array[Double],
                          planesPerBand: Int, dims: Int): Column =
    GraftColumnBridge.column(LshSignature(GraftColumnBridge.expression(v),
      planes, planesPerBand, dims))

  /** Column API: dot product of two `array<double>` columns. */
  def graft_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Column API: one-pass cosine similarity of two `array<double>` columns. */
  def graft_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Column API: squared L2 distance of two `array<double>` columns
    * (subtraction-form accumulation). */
  def graft_l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2Sq(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Column API: 1-based first agreeing index of two `array<long>` columns. */
  def graft_first_match(a: Column, b: Column): Column =
    GraftColumnBridge.column(FirstMatch(GraftColumnBridge.expression(a),
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
