package graft

import org.apache.spark.sql.functions._

/** Catalog DDL parity (SURVEY §2.1 S5): the reference's idempotent
  * `CREATE SCHEMA/TABLE IF NOT EXISTS ... PARTITIONED BY` cells expressed via
  * Spark SQL DDL + the session catalog, with an insert + re-create proving
  * idempotence.
  */
class CatalogSpec extends SparkTestBase {

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
