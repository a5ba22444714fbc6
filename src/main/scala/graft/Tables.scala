package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver's TPC-H-ish parquet dirs (TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      // events.parquet stores ts as INT64 TIMESTAMP(NANOS) which the vectorized
      // parquet reader rejects; read nanos as long and convert to micros
      // (lossless here — the generator emits microsecond-grained values).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
