package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the co-supply edge build (the shared prefix of every graph query):
  * current form (shuffle semi join + self join) vs broadcast-urgent +
  * groupBy/pairs-explode form. Run: sbt "Test/runMain graft.tools.EdgeBuildBench"
  *
  * MEASURED (sf0.1, 2026-08-14): steady state is a WASH — current
  * 1.09/1.57 s vs bcast 1.13/1.25 s over two post-warm passes each (the
  * broadcast only wins the cold first pass, 7.8 → 3.2 s, which min-of-two
  * benching already excludes). The shuffle form also remains the correct
  * 100 TB plan: the urgent-order keylist scales WITH the fact table
  * (~300M keys at 100 TB — far past any broadcast budget), so the
  * broadcast variant would hit a cliff exactly where scale begins. Verdict:
  * keep the shuffle semi join; no code change.
  */
object EdgeBuildBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def current(): DataFrame = {
      val urgent = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"))
      val op = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(urgent, Seq("l_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_partkey"))
        .distinct()
      op.as("a")
        .join(op.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
    }

    def bcast(): DataFrame = {
      val urgent = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"))
      val op = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(broadcast(urgent), Seq("l_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_partkey"))
      op.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .select(explode(expr(
          "flatten(transform(parts, (x, i) -> transform(slice(parts, i + 2, size(parts) - i - 1), y -> struct(x AS u, y AS v))))"))
          .as("p"))
        .select(col("p.u"), col("p.v"))
        .distinct()
    }

    def timed(name: String)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = body.count()
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm
    timed("current-warm")(current()); timed("bcast-warm")(bcast())
    timed("current-1")(current()); timed("bcast-1")(bcast())
    timed("current-2")(current()); timed("bcast-2")(bcast())
    spark.stop()
  }
}
