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
    // idempotent, but skip the 7 registry writes on the hot path
    if (!spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_long_dot")))
      graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      // events.parquet stores ts as INT64 TIMESTAMP(NANOS) which the vectorized
      // parquet reader rejects; read nanos as long and convert to micros
      // (lossless here — the generator emits microsecond-grained values).
      // The legacy conf is restored afterwards so other readers of genuine
      // nano-timestamp files in the same session keep their semantics (the
      // scan resolves its schema eagerly here, so the window is safe).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try spark.read
        .parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
