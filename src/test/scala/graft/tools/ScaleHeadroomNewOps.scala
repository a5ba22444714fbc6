package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Relational}

/** Headroom measurement for the round-4 sixth-session flagships: the 2-D
  * skyline and the FastSS edit-distance-1 join, each at 1× and 10× input,
  * with the structural counters that distinguish linear candidate growth
  * from quadratic (the ScaleHeadroom discipline; results in SURVEY §8.5).
  *
  * - skyline2D: 10× synthetic points with deterministic hash-derived
  *   (price, size) — input grows 10×, the dominance-test volume must stay
  *   one window pass per row (no pair joins anywhere in the plan).
  * - editDistance1Pairs: 10× the customer-name population by extending the
  *   id range under the SAME name format (zero-padded digits), so near-
  *   neighbor density per name stays constant — true pairs and candidate
  *   keys should both grow ~10× where all-pairs grows 100×.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroomNewOps"
  */
object ScaleHeadroomNewOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    // --- skyline ---
    def skyPoints(n: Long): DataFrame =
      spark.range(n).select(col("id"),
        pmod(xxhash64(col("id")), lit(1000000L)).as("x"),
        pmod(xxhash64(col("id") + 1000000000L), lit(1000000L)).as("y"))
    for (factor <- Seq(1L, 10L)) {
      val pts = skyPoints(200000L * factor).localCheckpoint(true)
      val t0 = System.nanoTime()
      val k = Relational.skyline2D(pts, "x", "y").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"skyline ${factor}x: n=${200000L * factor} frontier=$k wall=$dt%.1fs")
    }

    // --- FastSS ---
    def names(n: Long): DataFrame =
      spark.range(n).select(col("id"),
        concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0")).as("name"))
    for (factor <- Seq(1L, 10L)) {
      val cust = names(15000L * factor).localCheckpoint(true)
      val t0 = System.nanoTime()
      val pairs = Dedup.editDistance1Pairs(cust, "id", "name").count()
      val dt = (System.nanoTime() - t0) / 1e9
      val allPairs = (15000L * factor) * (15000L * factor - 1) / 2
      println(f"fastss ${factor}x: n=${15000L * factor} pairs=$pairs " +
        f"all_pairs=$allPairs wall=$dt%.1fs")
    }
    spark.stop()
  }
}
