package graft

import org.apache.spark.sql.functions._

/** Catalog DDL parity (SURVEY §2.1 S5): the reference's idempotent
  * `CREATE SCHEMA/TABLE IF NOT EXISTS ... PARTITIONED BY` cells expressed via
  * Spark SQL DDL + the session catalog, with an insert + re-create proving
  * idempotence.
  */
class CatalogSpec extends SparkTestBase {

  test("co-bucketed tables join and aggregate with zero exchanges") {
    // clear both the catalog entries AND any stale managed locations a
    // previously aborted run left behind (saveAsTable refuses to reuse them)
    for (t <- Seq("bkt_orders", "bkt_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + t)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    val orders = Tables(spark, sf(), "orders")
    val lineitem = Tables(spark, sf(), "lineitem")
    graft.etl.Writer.writeBucketed(
      orders, "bkt_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
    graft.etl.Writer.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bkt_lineitem", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
    val joined = spark.table("bkt_orders")
      .join(spark.table("bkt_lineitem"), "o_orderkey")
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    // force the join away from broadcast so the bucket layout is what
    // removes the shuffle, then assert NO Exchange anywhere in the plan:
    // the join consumes the bucket-pruned scans directly and the final
    // aggregation reuses the same clustering
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // expected from the plain (unbucketed) join: same rows, shuffled plan
      val expected = orders
        .join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .select("o_orderkey").distinct().count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
  }

  test("idempotent schema/table DDL + partitioned insert") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh")
    spark.sql("CREATE DATABASE IF NOT EXISTS rdv_test")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS rdv_test.ventas (
         |  pais STRING, mto DECIMAL(21,2), fecha_proceso DATE)
         |USING parquet
         |PARTITIONED BY (fecha_proceso)
         |LOCATION '$wh/ventas'""".stripMargin)
    // idempotent: second create is a no-op, not an error
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS rdv_test.ventas (
         |  pais STRING, mto DECIMAL(21,2), fecha_proceso DATE)
         |USING parquet
         |PARTITIONED BY (fecha_proceso)
         |LOCATION '$wh/ventas'""".stripMargin)
    assert(spark.catalog.tableExists("rdv_test.ventas"))

    import spark.implicits._
    Seq(("EC", BigDecimal("10.50"), "2025-01-01"), ("PE", BigDecimal("3.25"), "2025-01-02"))
      .toDF("pais", "mto", "fecha_str")
      .select(col("pais"), col("mto").cast("decimal(21,2)").as("mto"),
        to_date(col("fecha_str")).as("fecha_proceso"))
      .write.mode("overwrite").insertInto("rdv_test.ventas")

    val back = spark.read.table("rdv_test.ventas")
    assert(back.count() == 2)
    // partition pruning works through the catalog
    assert(back.filter(col("fecha_proceso") === "2025-01-01").count() == 1)
    spark.sql("DROP TABLE rdv_test.ventas")
    spark.sql("DROP DATABASE rdv_test")
  }
}
