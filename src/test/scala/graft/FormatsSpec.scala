package graft

import org.apache.spark.sql.functions._

/** Format round-trips (round-10): the ORC sink/source pair must prune
  * partitions at the listing grain, and the JSONL pair must survive the
  * characters that break naive line-delimited JSON (embedded newlines,
  * quotes, backslashes, non-BMP unicode).
  */
class FormatsSpec extends SparkTestBase {

  test("ORC read back equals the parquet source; partition filter prunes dirs") {
    val root = Tables.orcLayout(spark, sf())
    val orc = spark.read.orc(root)
    val src = Tables(spark, sf(), "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus")
    assert(orc.count() == src.count())
    // value fidelity through the format, not just cardinality
    val a = orc.agg(sum(col("l_quantity").cast("decimal(18,2)")),
      sum(col("l_orderkey"))).head()
    val b = src.agg(sum(col("l_quantity").cast("decimal(18,2)")),
      sum(col("l_orderkey"))).head()
    assert(a == b)
    // the partition filter must reach the scan as a PARTITION filter —
    // measured at the executed-plan grain (Dataset.inputFiles ignores
    // filters, so the numFiles metric is the honest probe); AQE off so
    // the FileSourceScanExec sits in the plain executed plan
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val filtered = spark.read.orc(root).filter(col("l_returnflag") === "A")
      filtered.count()
      val scans = filtered.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected an ORC file scan in the executed plan")
      val numFiles = scans.map(_.metrics("numFiles").value).sum
      val allFiles = orc.inputFiles.length
      assert(numFiles < allFiles,
        s"partition pruning must drop dirs: read $numFiles of $allFiles files")
      assert(scans.head.toString.contains("PartitionFilters"),
        "l_returnflag filter must be a partition filter")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("JSONL round-trip is byte-faithful for hostile strings") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line1\nline2\ttab"), // newline + tab
      (2L, """quote " backslash \ slash /"""),
      (3L, "unicode: café 中文 😀"), // café 中文 😀 (non-BMP)
      (4L, ""), // empty string stays empty, not null
      (5L, null.asInstanceOf[String])) // null stays null
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    dir.deleteOnExit()
    nasty.write.mode("overwrite").json(dir.toString)
    val back = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, text STRING"))
      .json(dir.toString)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val want = nasty.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back == want, "every hostile string must round-trip exactly")
  }

  test("q364/q365 run and return rows at sf0.001") {
    assert(SparkEntry.queries("q364_orc_roundtrip")(spark, sf()).count() > 0)
    assert(SparkEntry.queries("q365_jsonl_roundtrip")(spark, sf()).count() > 0)
  }

  test("XML round-trip is byte-faithful for hostile strings") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "entities < > & \" ' must encode"),
      (2L, "line1\nline2\ttab"),
      (3L, "cdata-breaker ]]> mid-string"),
      (4L, "unicode: café 中文 😀"), // non-BMP surrogate pair
      (5L, null.asInstanceOf[String])) // absent element stays null
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlrt").toFile
    dir.deleteOnExit()
    nasty.write.mode("overwrite").option("rowTag", "doc")
      .format("xml").save(dir.toString)
    val back = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, text STRING"))
      .option("rowTag", "doc").format("xml").load(dir.toString)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val want = nasty.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back == want, "every hostile string must round-trip exactly")
  }

  test("XML partition filter prunes lang dirs at the executed-plan grain") {
    val root = Tables.xmlLayout(spark, sf())
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT, lang STRING")
    val all = spark.read.schema(schema).option("rowTag", "doc")
      .format("xml").load(root)
    assert(all.count() == Tables(spark, sf(), "documents").count())
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val one = spark.read.schema(schema).option("rowTag", "doc")
        .format("xml").load(root).filter(col("lang") === "de")
      one.count()
      val scans = one.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected an XML file scan in the executed plan")
      val numFiles = scans.map(_.metrics("numFiles").value).sum
      assert(numFiles < all.inputFiles.length,
        s"partition pruning must drop dirs: read $numFiles of ${all.inputFiles.length}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("CSV round-trip is byte-faithful; quoted-CRLF normalization pinned") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "comma, inside"),
      (2L, "quote \" and backslash \\ inside"),
      (3L, "line1\nline2 (quoted newline, needs multiLine)"),
      (4L, "unicode: café 中文 😀"),
      (5L, null.asInstanceOf[String]),
      (6L, "")) // lossy by default — pinned below, excluded by csvLayout
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-csvrt").toFile
    dir.deleteOnExit()
    nasty.write.mode("overwrite").option("header", "false").csv(dir.toString)
    def readBack(d: String): Map[Long, Option[String]] = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, text STRING"))
      .option("multiLine", "true").option("header", "false").csv(d)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val want = nasty.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val got = readBack(dir.toString)
    assert((got - 6L) == (want - 6L),
      "every hostile string must round-trip exactly")
    // documented divergence #2 (why csvLayout also requires no empty
    // strings): the reader's nullValue default ("") swallows both the
    // written null AND the written empty string — "" comes back null.
    assert(got(6L).isEmpty, "empty-string collapse to null is the pinned default")

    // the ONE documented divergence (why csvLayout requires a CR-free
    // corpus): the multiLine parser normalizes CRLF INSIDE a quoted field
    // to the detected line ending. Pin the behavior so a parser change
    // that silently widens or fixes it surfaces here.
    val crDir = java.nio.file.Files.createTempDirectory("graft-csvcr").toFile
    crDir.deleteOnExit()
    Seq((1L, "a\r\nb"), (2L, "plain")).toDF("id", "text")
      .coalesce(1) // one file, so line-ending detection sees both rows
      .write.mode("overwrite").option("header", "false").csv(crDir.toString)
    val cr = readBack(crDir.toString)(1L).get
    assert(cr == "a\nb" || cr == "a\r\nb",
      s"quoted CRLF must round-trip or LF-normalize, got ${cr.map(_.toInt).mkString(",")}")
  }

  test("q366/q367 run and return rows at sf0.001") {
    assert(SparkEntry.queries("q366_xml_roundtrip")(spark, sf()).count() > 0)
    assert(SparkEntry.queries("q367_csv_roundtrip")(spark, sf()).count() > 0)
  }
}
