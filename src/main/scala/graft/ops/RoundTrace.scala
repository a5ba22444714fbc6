package graft.ops

/** Witness for the iterative operators' round counts — the
  * `lastRunBatches` device applied to graph loops. Each observe-fused loop
  * records how many rounds it actually executed, so a spec can pin the
  * ONE-JOB-PER-ROUND property as a contract (count Spark jobs around two
  * runs whose round counts differ; the job-count delta must equal the
  * round-count delta — setup jobs cancel out) instead of leaving it as
  * measured prose a refactor could silently regress.
  */
object RoundTrace {
  @volatile private var rounds: Map[String, Int] = Map.empty

  private[ops] def record(op: String, n: Int): Unit =
    synchronized { rounds = rounds + (op -> n) }

  /** Rounds of the last `op` run in this JVM, or -1 if it never ran. */
  def apply(op: String): Int = rounds.getOrElse(op, -1)
}
