package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE ladder's replica-inflation construction, shared by every scale
  * tool and probe (it was copy-pasted six times before round-10's review
  * pass — a drifted copy would silently break the proportionality
  * invariant the tools exist to measure).
  *
  * Inflates `baseDocs` (doc_id, text) by factor `f` into f DISJOINT-TOKEN
  * replicas: replica i's doc_ids are `doc_id·f + i` (order-preserving —
  * probe tooling like Q85LostPairProbe maps base pairs to replica pairs
  * by the same transform) and every token gets the `_i` suffix, so token
  * spaces never overlap across replicas. Consequences the ladders
  * assert: per-token document frequencies are replica-invariant, no
  * candidate/verified pair can cross replicas, and every deterministic
  * output count MUST scale exactly ×f — drift is a correctness bug (this
  * invariant is what caught the round-10 MinHash coefficient bug that
  * every oracle gate missed).
  */
object ReplicaInflation {
  def docsAt(baseDocs: DataFrame, f: Int): DataFrame =
    baseDocs.crossJoin(baseDocs.sparkSession.range(f.toLong).toDF("i"))
      .select((col("doc_id") * f + col("i")).as("doc_id"),
        array_join(transform(
          filter(split(trim(col("text")), "\\s+"), x => x =!= ""),
          x => concat(x, lit("_"), col("i"))), " ").as("text"))
}
