package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Writer

class WriterSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: Seq[(String, String, Double)]) =
    rows.toDF("pais", "d", "v")
      .select(col("pais"), to_date(col("d")).as("fecha_proceso"), col("v"))

  test("partition-aligned replaceWhere: rewrites slice, drops stale partitions, keeps other countries") {
    val dir = Files.createTempDirectory("graft-w").toString + "/t"
    // initial state: EC on two dates, PE on one shared date
    Writer.replaceCountryRangePartitioned(
      mk(Seq(("EC", "2025-01-01", 1.0), ("EC", "2025-01-02", 2.0))),
      dir, "fecha_proceso", "pais", "EC", "2025-01-01", "2025-01-31")
    Writer.replaceCountryRangePartitioned(
      mk(Seq(("PE", "2025-01-02", 9.0))),
      dir, "fecha_proceso", "pais", "PE", "2025-01-01", "2025-01-31")
    assert(spark.read.parquet(dir).count() == 3)

    // rerun EC with 2025-01-02 gone from the source and 01-01 updated:
    // replace semantics must update 01-01, DELETE the stale EC 01-02
    // partition, and leave PE untouched.
    Writer.replaceCountryRangePartitioned(
      mk(Seq(("EC", "2025-01-01", 5.0))),
      dir, "fecha_proceso", "pais", "EC", "2025-01-01", "2025-01-31")
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.filter(col("pais") === "EC").count() == 1)
    assert(back.filter(col("pais") === "EC").collect().head.getAs[Double]("v") == 5.0)
    assert(back.filter(col("pais") === "PE").count() == 1)

    // out-of-range partitions are never touched
    Writer.replaceCountryRangePartitioned(
      mk(Seq(("EC", "2025-02-10", 7.0))),
      dir, "fecha_proceso", "pais", "EC", "2025-02-01", "2025-02-28")
    assert(spark.read.parquet(dir).count() == 3)
  }
}
