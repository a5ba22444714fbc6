package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Does localCheckpoint preserve outputPartitioning? Prints the physical
  * plan of a window-by-key over a key-repartitioned checkpoint: an Exchange
  * above the LogicalRDD means NO.
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 37, i.toLong)).toDF("k", "v")
      .repartition(4, col("k")).localCheckpoint(true)
    val win = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))))
    println(win.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
