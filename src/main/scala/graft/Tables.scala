package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

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
      // The generator has shipped events.ts under two physical encodings:
      // INT64 TIMESTAMP(NANOS) (which the vectorized reader rejects without
      // the nanos-as-long legacy conf) and plain TIMESTAMP(MICROS) (read as
      // TIMESTAMP_NTZ under Spark 4's NTZ inference). Normalize both to the
      // session-TZ TIMESTAMP the whole registry was gated against: with the
      // session pinned to UTC, NTZ -> LTZ is wall-clock-identical, and
      // nanos -> micros is lossless (the generator emits micro-grained values).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try normalizeEventsTs(spark.read.parquet(s"$sfDir/$name.parquet"))
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Rewrite an events frame's `ts` to session-TZ TIMESTAMP whatever the
    * physical encoding delivered (see [[apply]]).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    val conv: Option[Column] = df.schema("ts").dataType match {
      case LongType => Some(expr("timestamp_micros(ts div 1000)")) // nanos-as-long
      case TimestampNTZType => Some(col("ts").cast(TimestampType)) // UTC session: same wall clock
      case _ => None
    }
    conv.fold(df)(c => df.withColumn("ts", c))
  }

  /** Streaming read of the documents table (file source over the single
    * parquet under the scale-factor dir; schema from the footer). The feed
    * for the streaming dedup/near-dup operators.
    */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema: StructType = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
  }

  /** Streaming read of the events table with the same `ts` normalization as
    * the batch path. The file source needs a user schema, so the parquet
    * footer is read (cheap, schema-only) to match whichever encoding this
    * testdata drop uses. For the legacy nanos encoding the nanos-as-long conf
    * must still be set when micro-batches EXECUTE, so it is left set in that
    * case (harmless: nothing else in the engine reads nano-timestamp files).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    val legacyNanos = schema("ts").dataType == LongType
    if (!legacyNanos) prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    normalizeEventsTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
  }
}
