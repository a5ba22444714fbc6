package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for q309_stream_neardup's 14.9 s bench cost at sf0.1:
  * (a) streaming bucket-index build (minhash + transformWithState/RocksDB),
  * (b) batch pair expansion self-join + distinct,
  * (c) hashedWordSets materialization,
  * (d) exact verify (size prefilter + sorted-merge Jaccard).
  * Also re-times q307_coreness solo for the in-sweep vs solo gap.
  *
  * Run: sbt "Test/runMain graft.tools.Q309Phases"
  */
object Q309Phases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm the JIT/readers on sf0.001 once, untimed
    graft.SparkEntry.queries("q309_stream_neardup")(spark, "/root/testdata/sf0.001").count()

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("q309 end-to-end") {
        println("  rows: " + graft.SparkEntry.queries("q309_stream_neardup")(spark, dir).count())
      }
    }

    // q307 solo for comparison with the 14.2 s in-sweep number
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q307_coreness")(spark, dir).count()
      println(f"[q307 solo pass $pass] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
