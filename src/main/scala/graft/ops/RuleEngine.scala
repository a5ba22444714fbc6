package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalization of the reference's data-quality rule engine
  * (`/root/reference/notebooks/ETL_Entregas_Base.ipynb:566-576,632`):
  * N declarative rules, each `when(cond, code)`, folded by `concat_ws("|")`
  * (which skips NULLs) into a single reason string in declaration order;
  * a row is quarantined iff ≥1 rule fires.
  *
  * Pure column expressions — constant-folded, codegen'd, zero shuffles. At
  * 100 TB this is a single map-side pass over the scan; the split below reuses
  * one cached/persisted upstream rather than scanning twice.
  */
object RuleEngine {

  final case class Rule(code: String, fires: Column)

  /** Pipe-joined fired-rule codes; NULL when no rule fires (= row is clean). */
  def reasons(rules: Seq[Rule]): Column = {
    val folded =
      concat_ws("|", rules.map(r => when(r.fires, lit(r.code))): _*)
    when(length(folded) === 0, lit(null)).otherwise(folded)
  }

  /** Annotate with a reason column. */
  def annotate(df: DataFrame, rules: Seq[Rule], reasonCol: String = "motivo_obs"): DataFrame =
    df.withColumn(reasonCol, reasons(rules))

  /** Split into (clean, quarantined). Callers fanning out to multiple sinks
    * should persist the annotated frame first (one scan, two filters).
    */
  def split(df: DataFrame, rules: Seq[Rule], reasonCol: String = "motivo_obs")
      : (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules, reasonCol)
    (annotated.filter(col(reasonCol).isNull).drop(reasonCol),
     annotated.filter(col(reasonCol).isNotNull))
  }
}
