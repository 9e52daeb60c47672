package graft.functions

import graft.TestSpark
import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.1, 0.2, 0.3), Seq(-1.0, 0.5, 2.0))
  ).toDF("id", "a", "b")

  test("graft_dot equals the JVM kernel bit-for-bit (codegen path)") {
    val got = df.select(col("id"), VectorExpressions.graft_dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    val expected = Seq(
      Similarity.dotKernel(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      Similarity.dotKernel(Array(0.1, 0.2, 0.3), Array(-1.0, 0.5, 2.0)))
    assert(got.toSeq == expected)
    assert(java.lang.Double.doubleToLongBits(got(1)) ==
      java.lang.Double.doubleToLongBits(expected(1)))
  }

  test("graft_dot equals the interpreted HOF fold (engine-portable form)") {
    val hof = df.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
          .as("d")).orderBy("d").collect().map(_.getDouble(0))
    val native = df.select(VectorExpressions.graft_dot(col("a"), col("b")).as("d"))
      .orderBy("d").collect().map(_.getDouble(0))
    assert(hof.toSeq == native.toSeq)
  }

  test("length mismatch yields null; nulls propagate") {
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(bad.select(VectorExpressions.graft_dot(col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(VectorExpressions.graft_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("SQL registration: graft_dot usable from spark.sql") {
    VectorExpressions.register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs WHERE id = 1").head().getDouble(0)
    assert(r == 32.0)
  }

  test("type check rejects non-double arrays") {
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      ints.select(VectorExpressions.graft_dot(col("a"), col("b"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("DATATYPE_MISMATCH") || e.getMessage.contains("graft_dot"))
  }

  test("many distinct graft_dot instances in one projection compile (fresh codegen locals)") {
    // regression: fixed Java local names collided when several non-nullable
    // DotProduct instances inlined into one codegen scope → janino failure →
    // silent interpreted fallback. fallback=false makes that failure loud.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // arrays built from a non-nullable column: children non-nullable (no
      // scoping block from nullSafeCodeGen) and not constant-foldable
      val a = array(col("id").cast("double"), lit(2.0), lit(3.0))
      val b = array(lit(4.0), col("id").cast("double"), lit(6.0))
      val r = df.where(col("id") === 1).select(
        VectorExpressions.graft_dot(a, b).as("ab"),
        VectorExpressions.graft_dot(b, a).as("ba"),
        VectorExpressions.graft_dot(a, a).as("aa"),
        VectorExpressions.graft_dot(b, b).as("bb")).head()
      assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
        ((24.0, 24.0, 14.0, 53.0)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("stays inside whole-stage codegen (no interpreted island)") {
    val plan = df.select(VectorExpressions.graft_dot(col("a"), col("b")))
      .queryExecution.executedPlan
    val codegen = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(codegen.contains("WholeStageCodegen"))
  }

  test("graft_cosine (fused one-pass) is bit-identical to the composed dot/norm form") {
    val emb = graft.queries.Tables.embeddings(spark, graft.TestSpark.sf).limit(200)
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val composed = e.as("a").crossJoin(e.as("b").limit(5))
      .select(col("a.vec_id"),
        (VectorExpressions.graft_dot(col("a.v"), col("b.v")) /
          (sqrt(VectorExpressions.graft_dot(col("a.v"), col("a.v"))) *
            sqrt(VectorExpressions.graft_dot(col("b.v"), col("b.v"))))).as("c"))
      .collect().map(_.getDouble(1))
    val fused = e.as("a").crossJoin(e.as("b").limit(5))
      .select(col("a.vec_id"),
        VectorExpressions.graft_cosine(col("a.v"), col("b.v")).as("c"))
      .collect().map(_.getDouble(1))
    assert(composed.length == fused.length && composed.length == 1000)
    composed.zip(fused).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
    }
    // codegen + SQL registration
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      VectorExpressions.register(spark)
      df.createOrReplaceTempView("vecs2")
      val r = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs2 WHERE id = 1").head().getDouble(0)
      assert(math.abs(r - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
