package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the Exchange from every subsequent join on that key — the
  * cluster-scale strategy for repeated fact⋈dim joins (SURVEY.md
  * "Partitioning & shuffle"). Verified by plan inspection: same join
  * shuffles unbucketed, does not shuffle bucketed. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment")

    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val bucketed = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val unbucketed = orders.join(customer, col("o_custkey") === col("c_custkey"))

      // executedPlan (post-EnsureRequirements) is where Exchanges appear
      assert(!bucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed join must not shuffle")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "unbucketed join shuffles (sanity)")
      // identical results either way
      assert(bucketed.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
