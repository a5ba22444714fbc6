package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The operator library is source-format agnostic: the same aggregation gives
  * identical results whether the table arrives as parquet, ORC, JSON lines,
  * or headered CSV (the reference's own ingest format).
  */
class SourceFormatsSpec extends SparkTestBase {

  test("identical aggregates over parquet, orc, json, and csv sources") {
    val li = Tables(spark, sf(), "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
    val dir = Files.createTempDirectory("graft-fmt").toString

    li.write.mode("overwrite").orc(s"$dir/orc")
    li.write.mode("overwrite").json(s"$dir/json")
    li.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect()
        .map(_.toSeq)

    val base = agg(li)
    assert(agg(spark.read.orc(s"$dir/orc")).sameElements(base), "orc differs")
    // json/csv lose static types: re-apply the schema on read, as an engine
    // ingesting semi-structured sources must
    val typedJson = spark.read.schema(li.schema).json(s"$dir/json")
    assert(agg(typedJson).sameElements(base), "json differs")
    val typedCsv = spark.read.schema(li.schema).option("header", "true").csv(s"$dir/csv")
    assert(agg(typedCsv).sameElements(base), "csv differs")
  }
}
