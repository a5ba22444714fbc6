package graft

/** The driver contract itself: a typo'd or missing oracle key silently
  * downgrades that query to a rows-only check at the gate — this spec makes
  * key drift a test failure instead.
  */
class ContractSpec extends SparkTestBase {

  test("every registered query has exactly one oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the qNNN_name convention with unique numbers") {
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = SparkEntry.queries.keySet.toSeq.map {
      case pat(n) => n.toInt
      case bad => fail(s"query name breaks convention: $bad")
    }
    val dups = nums.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query numbers: $dups")
  }

  test("CATALOG.md stays in sync with the registry") {
    // the user-facing catalog is generated (scripts/gen_catalog.py); a new
    // query without a regen — or a hand edit that drops a row — fails here
    val f = new java.io.File("CATALOG.md")
    assert(f.isFile, "CATALOG.md missing — run scripts/gen_catalog.py")
    // explicit charset: the catalog carries UTF-8 em-dashes from the
    // contract comments, and the CI JVM's default charset is POSIX/ASCII
    val rows = scala.io.Source.fromFile(f, "UTF-8")
    val listed =
      try rows.getLines().collect {
        case l if l.startsWith("| q") && !l.startsWith("| query") =>
          l.drop(2).takeWhile(_ != ' ')
      }.toSet
      finally rows.close()
    val q = SparkEntry.queries.keySet
    assert((q -- listed).isEmpty,
      s"queries missing from CATALOG.md (run scripts/gen_catalog.py): ${(q -- listed).toSeq.sorted}")
    assert((listed -- q).isEmpty,
      s"CATALOG.md rows with no registered query: ${(listed -- q).toSeq.sorted}")
  }

  test("entry() produces rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** The driver hash gate rejects any final DecimalType column even when
    * values are cell-exact (proven in rounds 2 and 4 — six r4 queries
    * shipped DECIMAL(38,0) surfaces and went hash-red). Decimal is fine as
    * an INTERNAL accumulator; the surface must be BIGINT/DOUBLE/STRING —
    * wide exact sums go out as (hi, lo) BIGINT pairs via
    * [[graft.ops.Sketches.surfaceHiLo]]. Schema-only: analysis, no job run.
    */
  test("no registered query surfaces a DecimalType column") {
    import org.apache.spark.sql.types._
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sf()).schema.fields.filter(f => hasDecimal(f.dataType))
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"final DecimalType surfaces (driver gate rejects these):\n${offenders.mkString("\n")}")
  }
}
