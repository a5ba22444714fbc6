package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of registered queries to files — the
  * round-11 optimization round's plan evidence (`plans/r11/<q>_<tag>.txt`).
  * Runs under Bench's exact session settings so the dumped plan is the
  * plan the bench times (initial plan, `isFinalPlan=false` under AQE).
  *
  * Note for queries whose builder EXECUTES work before returning the final
  * frame (streaming restarts, staged layouts): the dump shows the final
  * batch plan; the executed prefix is attributed by QueryLedger instead.
  *
  * Run: sbt "Test/runMain graft.tools.PlanDump <tag> q307_coreness [q...]"
  *   → writes plans/r11/q307_coreness_<tag>.txt
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <query> [query ...]")
    val tag = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.cache.maxEntries", "10000") // match Bench (round-11)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r11")
    outDir.mkdirs()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, "/root/testdata/sf0.1")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.writeString(f.toPath, txt)
      println(s"[plandump] wrote ${f.getPath} (${txt.length} chars)")
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
