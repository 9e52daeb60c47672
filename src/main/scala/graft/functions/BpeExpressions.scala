package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for BPE merge application — preference ladder
 * step (b): the merge loop is a compiled token-array scan inside
 * whole-stage codegen, not a chain of interpreted higher-order functions
 * (a 256-merge chain of `aggregate` HOFs would re-split the token string
 * once per merge in the interpreter).
 *
 * Semantics are CLASSIC token-level BPE (the reference model in LlmSpec's
 * `applyMerge`): one merge `(L, R)` rewrites the token sequence left to
 * right, replacing each non-overlapping adjacent `(L, R)` pair with `LR`
 * and continuing AFTER the merged token. This is NOT the same as a string
 * `replace` of `" L R "` with `" LR "`, which consumes the shared sentinel
 * space between consecutive occurrences (`abab` would become `[ab, a, b]`
 * instead of `[ab, ab]`) — the round-7 under-merge divergence, fixed here.
 * The DuckDB oracle mirrors this scan as a `list_reduce` fold over the
 * split tokens; a chain-merge of the fold's freshly merged tail token is
 * impossible because `LR != L` for any non-empty `R`.
 */
object BpeExpressions {

  /**
   * JVM kernel and single source of truth: apply `merges` (rank order) to
   * a sentinel-delimited token string `" t1 t2 ... "`. Interpreted eval
   * and codegen both delegate here. Cost per row is
   * `O(merges × tokens)` with no re-splitting — the split happens once.
   */
  def applyMerges(s: String, lhs: Array[String], rhs: Array[String]): String = {
    val trimmed = s.trim
    if (trimmed.isEmpty || lhs.length == 0) return s
    var toks: Array[String] = trimmed.split(" ")
    var m = 0
    while (m < lhs.length) {
      val l = lhs(m); val r = rhs(m)
      val out = new Array[String](toks.length)
      var i = 0; var o = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out(o) = l + r; i += 2
        } else { out(o) = toks(i); i += 1 }
        o += 1
      }
      if (o < toks.length) toks = java.util.Arrays.copyOf(out, o)
      else toks = out
      m += 1
    }
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(' ')
    var i = 0
    while (i < toks.length) { sb.append(toks(i)).append(' '); i += 1 }
    sb.toString
  }

  /**
   * `bpe_apply(string) → string`: apply the embedded merge list (a
   * driver-side constant — the learned merges of one or more training
   * rounds) to a sentinel token string. One expression applies a whole
   * round's batch, so an 8-round × 32-merge training plan is 8 chained
   * expressions, not 256.
   */
  final case class BpeApply(child: Expression, lhs: Seq[String], rhs: Seq[String])
    extends UnaryExpression {

    require(lhs.length == rhs.length,
      s"lhs/rhs merge lists differ in length: ${lhs.length} vs ${rhs.length}")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_bpe_apply"

    private lazy val lhsArr: Array[String] = lhs.toArray
    private lazy val rhsArr: Array[String] = rhs.toArray

    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(
        applyMerges(input.asInstanceOf[UTF8String].toString, lhsArr, rhsArr))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val lhsRef = ctx.addReferenceObj("bpeLhs", lhsArr, "java.lang.String[]")
        val rhsRef = ctx.addReferenceObj("bpeRhs", rhsArr, "java.lang.String[]")
        s"""
           |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  graft.functions.BpeExpressions.applyMerges(
           |    $c.toString(), $lhsRef, $rhsRef));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper: apply `merges` = `(lhs, rhs)` pairs in order. */
  def bpeApply(s: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeApply(GraftColumnBridge.expression(s),
      merges.map(_._1), merges.map(_._2)))
}
