package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate-scoped idempotent overwrite ("replaceWhere" emulation).
  *
  * The reference writes all three sinks with Delta's
  * `mode("overwrite").option("replaceWhere", country ∧ date∈[s,e])`
  * (`/root/reference/notebooks/ETL_Entregas_Base.ipynb:502-507,639-644,672-677`):
  * atomically replace exactly the rows matching the predicate, preserving
  * everything else. Delta is not on this classpath, so this is the one piece of
  * genuinely custom machinery (SURVEY §7.3). It lives entirely in the writer —
  * no Catalyst surgery.
  *
  * Two paths:
  *   - '''partition-aligned fast path''' ([[overwritePartitions]]): when the
  *     predicate exactly covers whole partitions of the partition column,
  *     dynamic partition overwrite rewrites only the partitions present in the
  *     incoming data — no read of existing data, no shuffle. This is the path a
  *     100 TB table needs: cost ∝ new slice, not table size.
  *   - '''general path''' ([[replaceWhere]]): read-keep-union-rewrite — keep
  *     `existing.filter(!predicate)`, union the new slice, write to a temp dir,
  *     atomic directory swap. Cost ∝ table size; only correct fallback for
  *     predicates that cut inside partitions. Single-writer rename-swap is
  *     safe on rename-atomic stores (local/HDFS); on object stores rename is
  *     copy+delete — real Delta would give transactional atomicity there.
  *     Documented divergence.
  *
  * All filesystem metadata operations go through the Hadoop FileSystem
  * resolved from the path (NOT java.nio), so the same code works on
  * local/HDFS/object-store URIs.
  */
object Writer {

  /** Fast path: dynamic partition overwrite — only partitions present in
    * `df` are replaced. The mode is pinned per-write (writer option) rather
    * than relying on the session conf: under the default STATIC mode an
    * `overwrite` would silently wipe every other partition of the table.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** General path: replace exactly the rows matching `predicate`, keep the rest.
    *
    * The kept set is read with the *existing* table's schema; the caller must
    * ensure `df` is union-compatible (the pipeline always is — fixed DDL).
    */
  def replaceWhere(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      predicate: Column
  ): Unit = {
    val target = new HPath(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new HPath(path + ".old")
    // crash recovery: a previous run that died between the two renames left
    // the whole table at .old and nothing at the target — restore it rather
    // than silently rebuilding the table from this run's slice alone.
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
    if (!fs.exists(target)) {
      overwritePartitions(df, path, partitionCols)
      return
    }
    val existing = spark.read.parquet(path)
    // NULL-safe keep: rows where the predicate is NULL are kept too (Delta
    // replaceWhere deletes only rows where the predicate evaluates to true).
    val kept = existing.filter(!coalesce(predicate, lit(false)))
    val merged = kept.unionByName(df.select(existing.columns.map(col).toIndexedSeq: _*))

    val tmp = new HPath(path + ".inprogress")
    fs.delete(tmp, true)
    merged.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(tmp.toString)
    // swap: move old out, new in, drop old — last-moment non-atomicity is the
    // price of no transaction log (recovered on the next run, see above);
    // single-writer assumption documented above.
    fs.delete(old, true)
    fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
    ()
  }

  /** The pipeline's standard sink: country+date-range predicate, partitioned by
    * the process-date column. The predicate never cuts inside a date partition,
    * but it DOES cut inside on country (two countries share a date) — so the
    * fast path applies only when the caller guarantees one country per run
    * shares no partition with another. The reference's semantics replace
    * (country ∧ range), so we use the general path whenever the target exists
    * and may hold other countries' rows for the same dates.
    */
  def replaceCountryRange(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      partitionCol: String,
      countryCol: String,
      country: String,
      startDate: String,
      endDate: String,
      dateAsString: Boolean = false
  ): Unit = {
    // Quarantine stores fec_proceso as STRING; its replaceWhere compares
    // lexicographically — correct only because ISO yyyy-MM-dd sorts like dates
    // (`ETL_Entregas_Base.ipynb:675`; SURVEY EP2.4). Preserve carefully.
    // A string date column must NOT become a partition directory either:
    // partition-column type inference would hand every reader a DATE-typed
    // column, breaking the all-STRING quarantine contract — so dateAsString
    // tables are stored unpartitioned (they hold only the reject stream).
    val rangePred =
      if (dateAsString)
        col(partitionCol) >= lit(startDate) && col(partitionCol) <= lit(endDate)
      else
        col(partitionCol).between(to_date(lit(startDate)), to_date(lit(endDate)))
    replaceWhere(
      spark,
      df,
      path,
      if (dateAsString) Seq.empty else Seq(partitionCol),
      col(countryCol) === country && rangePred
    )
  }

  /** Partition-aligned replaceWhere — the 100 TB path. The table is
    * partitioned by (dateCol, countryCol), so the predicate
    * `country ∧ date∈[s,e]` exactly covers whole partitions:
    *
    *  1. dynamic partition overwrite rewrites only the (date, country)
    *     partitions present in `df` — cost ∝ the new slice;
    *  2. partitions matching the predicate that received NO new rows are
    *     stale under replace semantics (their source rows disappeared) and
    *     are deleted by directory listing — cost ∝ partition count, not data.
    *
    * Compared with [[replaceWhere]]'s read-keep-union-rewrite (cost ∝ table
    * size), this touches only the affected slice. Requires
    * `spark.sql.sources.partitionOverwriteMode=dynamic` (set in
    * [[Schemas.session]]).
    */
  def replaceCountryRangePartitioned(
      df: DataFrame,
      path: String,
      dateCol: String,
      countryCol: String,
      country: String,
      startDate: String,
      endDate: String
  ): Unit = {
    // enforce the declared contract: rows outside (country ∧ range) must not
    // ride along — dynamic overwrite would replace THEIR partitions too, and
    // the stale-partition cleanup could not account for them.
    val bounded = df.filter(
      col(countryCol) === country &&
        col(dateCol).cast("string") >= startDate && col(dateCol).cast("string") <= endDate)
    // two actions read the frame (distinct dates + the write): persist so the
    // upstream (e.g. the raw CSV parse) is computed once, not twice.
    bounded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // distinct partition values in the incoming slice (bounded by the range
      // length × 1 country — tiny)
      val newDates: Set[String] =
        bounded.select(col(dateCol).cast("string")).distinct().collect().map(_.getString(0)).toSet

      // cluster by the partition columns before writing: without this every
      // task writes a sliver into every partition directory (tasks × dates
      // small files — the classic small-file explosion); with it each
      // partition gets one well-sized file. AQE rebalances if a date is huge.
      // partitionOverwriteMode pinned per-write: STATIC would wipe the table.
      bounded.repartition(col(dateCol), col(countryCol))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(dateCol, countryCol).mode("overwrite").parquet(path)
      cleanupStale(bounded.sparkSession, path, dateCol, countryCol, country,
        startDate, endDate, newDates)
    } finally { bounded.unpersist(); () }
  }

  private def cleanupStale(
      spark: SparkSession,
      path: String,
      dateCol: String,
      countryCol: String,
      country: String,
      startDate: String,
      endDate: String,
      newDates: Set[String]
  ): Unit = {
    // drop stale partitions: predicate-matching dirs that got no new data.
    // ISO yyyy-MM-dd compares lexicographically, which is what makes the
    // string range test below correct for both DATE and STRING date columns.
    // Hadoop FS listing/deletion so the same code runs on any store; cost ∝
    // number of date partitions, not data size.
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith(s"$dateCol=")) {
          val dateVal = name.substring(dateCol.length + 1)
          if (dateVal >= startDate && dateVal <= endDate && !newDates.contains(dateVal)) {
            fs.delete(new HPath(st.getPath, s"$countryCol=$country"), true)
            // remove the date dir too if now empty
            if (fs.exists(st.getPath) && fs.listStatus(st.getPath).isEmpty)
              fs.delete(st.getPath, true)
            ()
          }
        }
      }
    }
  }
}
