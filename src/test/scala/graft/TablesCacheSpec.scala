package graft

import org.apache.spark.sql.functions._

/** Pins the round-11 footer-schema cache's SAFETY claim (Tables.apply):
  * the cached schema is keyed to the file's IDENTITY (path + size +
  * mtime), so a rewritten file at the same path must be re-inferred —
  * a plain path-keyed cache would silently serve the old schema and
  * corrupt every read after a testdata regeneration.
  */
class TablesCacheSpec extends SparkTestBase {

  private def writeAt(dir: java.io.File, cols: Seq[(String, String)],
                      mtime: Long): Unit = {
    val tmp = new java.io.File(dir, ".tmp")
    val df = cols.foldLeft(spark.range(3).toDF()) { case (d, (n, t)) =>
      d.withColumn(n, col("id").cast(t))
    }.drop("id")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file"))
    val dst = new java.io.File(dir, "lineitem.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(dst.setLastModified(mtime))
    tmp.listFiles().foreach(_.delete()); tmp.delete()
  }

  test("footer-schema cache re-infers when the file identity changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tcache").toFile
    try {
      writeAt(dir, Seq("a" -> "long", "b" -> "double"), 1700000000000L)
      val s1 = Tables(spark, dir.toString, "lineitem").schema
      assert(s1.fieldNames.toSeq == Seq("a", "b"))
      // same identity -> served from cache, same schema
      val s2 = Tables(spark, dir.toString, "lineitem").schema
      assert(s2 == s1)
      // rewritten file at the SAME path (different schema, different
      // size/mtime) -> the identity key changes and the cache must miss
      writeAt(dir, Seq("a" -> "long", "b" -> "double", "c" -> "string"),
        1700000001000L)
      val s3 = Tables(spark, dir.toString, "lineitem").schema
      assert(s3.fieldNames.toSeq == Seq("a", "b", "c"),
        s"stale cached schema served after rewrite: $s3")
      // and the frame actually reads with the new schema
      assert(Tables(spark, dir.toString, "lineitem").count() == 3L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}
