package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CoLocateSpec extends AnyFunSuite {
  @transient lazy val spark = TestSpark.spark

  test("bucketed join on the bucket key plans with zero Exchange") {
    val li = graft.queries.Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
    val o = graft.queries.Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    CoLocate.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    CoLocate.writeBucketed(o, "b_orders", "l_orderkey", 8)
    // disable auto-broadcast so the bucketed path (not broadcast) is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = CoLocate.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed equi-join must not shuffle\n" + plan)
      assert(joined.count() > 0)
      // and aggregation on the bucket key also avoids the exchange
      val agg = spark.table("b_lineitem").groupBy("l_orderkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
