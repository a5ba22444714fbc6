package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Parallelism spreading for CPU-heavy stages. */
object Par {

  /** Hash-repartition by `c` to the session's configured shuffle parallelism
    * with an EXPLICIT partition count. `repartition(col)` alone is advisory:
    * AQE coalesces small-BYTE shuffles toward its 64 MB advisory target, which
    * is right for IO-bound plans but collapses a CPU-bound stage (n-gram
    * explosion, pair-quadratic similarity scoring, signature hashing) onto one
    * core — bytes ≠ cost there. The explicit count pins the exchange so the
    * per-row work after it actually uses the cluster.
    */
  def spread(df: DataFrame, c: Column): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, c)

  /** The rows-per-partition knob behind this library's ITERATIVE round
    * sizing, previously an assorted per-operator `/100000` constant. */
  val RoundRowsPerPartitionConf = "spark.graft.round.rowsPerPartition"

  /** Partition count for one round of an iterative loop over `nRows`
    * measured rows: ceil(nRows / rowsPerPartition), clamped to
    * [1, spark.sql.shuffle.partitions]. The default 100k rows/partition is
    * the measured local[32] sweet spot — per-round frames are narrow
    * (two/three longs), so the binding constraint is STAGE overhead, not
    * memory, and narrow rounds beat wide ones until real per-round work
    * appears (§8.6#3 lineage). At cluster scale against 100 TB the ambient
    * `spark.sql.shuffle.partitions` is the dominant clamp (set it to the
    * cluster's core count as usual); raise
    * `spark.graft.round.rowsPerPartition` only if round frames grow wide
    * enough (arrays, long strings) that 100k rows outgrow an executor's
    * per-task memory share.
    */
  def roundParts(sess: SparkSession, nRows: Long): Int = {
    val per = math.max(1L,
      sess.conf.get(RoundRowsPerPartitionConf, "100000").toLong)
    math.max(1, math.min(
      sess.sessionState.conf.numShufflePartitions, (nRows / per).toInt + 1))
  }
}
