package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

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
}
