package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-extension registration for the graft engine: the installable form
  * of [[GraftFunctions.register]] plus a small optimizer rule, so a cluster
  * can enable everything with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (no driver-side code required). The runtime `register` path stays for
  * programmatic sessions; both routes produce identical functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams", "space-joined word n-grams of a token array"),
      (exprs: Seq[Expression]) => TokenNGrams(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_long_dot"),
      info("graft_long_dot", "exact int64 dot product of two long arrays"),
      (exprs: Seq[Expression]) => LongArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sq_norm"),
      info("graft_sq_norm", "exact int64 squared norm of a long array"),
      (exprs: Seq[Expression]) => LongArraySqNorm(exprs(0), exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_jaccard"),
      info("graft_sorted_jaccard", "jaccard of two sorted distinct string arrays"),
      (exprs: Seq[Expression]) => SortedStringArrayJaccard(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect", "intersection count of two sorted distinct string arrays"),
      (exprs: Seq[Expression]) => SortedStringArrayIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_long_intersect"),
      info("graft_sorted_long_intersect", "intersection count of two sorted distinct long arrays"),
      (exprs: Seq[Expression]) => SortedLongArrayIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_long_jaccard"),
      info("graft_sorted_long_jaccard", "jaccard of two sorted distinct long arrays"),
      (exprs: Seq[Expression]) => SortedLongArrayJaccard(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_count_in_set"),
      info("graft_count_in_set", "count of array elements in a constant set"),
      (exprs: Seq[Expression]) => CountInSet(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "one-pass minhash signature of a string array"),
      SketchFunctions.minHashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_projbits"),
      info("graft_projbits", "random-hyperplane sign bits of a long vector"),
      SketchFunctions.projBitsBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "one-pass 64-bit simhash of a string array"),
      SketchFunctions.simHashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "rolling min-window fingerprint of a token array"),
      SketchFunctions.fingerprintBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_char_ngrams"),
      info("graft_char_ngrams", "character n-grams of a string"),
      (exprs: Seq[Expression]) => CharNGrams(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "Unicode NFC canonical composition of a string"),
      (exprs: Seq[Expression]) => UnicodeNfc(exprs.head)))
    e.injectOptimizerRule(_ => SimplifySelfSimilarity)
    e.injectOptimizerRule(_ => graft.plans.RewriteMarkedTopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

/** Optimizer rule: similarity of an expression with itself is statically
  * known — `graft_long_dot(x, x)` ⇒ `graft_sq_norm(x)` (half the loads) and
  * `graft_*_jaccard(x, x)` ⇒ 1.0 for non-null inputs. A tiny demonstration of
  * `Rule[LogicalPlan]` injection; semantics-preserving because the
  * expressions are deterministic and null-intolerant (binary null-safe eval:
  * both rewrites preserve NULL-in → NULL-out via the surviving child).
  */
object SimplifySelfSimilarity extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LongArrayDot(a, b) if a.deterministic && a.semanticEquals(b) =>
        LongArraySqNorm(a, a)
      case SortedStringArrayJaccard(a, b) if a.deterministic && a.semanticEquals(b) =>
        jaccardOne(a)
      case SortedLongArrayJaccard(a, b) if a.deterministic && a.semanticEquals(b) =>
        jaccardOne(a)
    }

  /** 1.0 unless the input is NULL (preserve null-in → null-out). */
  private def jaccardOne(a: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.If(
      org.apache.spark.sql.catalyst.expressions.IsNull(a),
      Literal.create(null, org.apache.spark.sql.types.DoubleType),
      Literal(1.0))
}
