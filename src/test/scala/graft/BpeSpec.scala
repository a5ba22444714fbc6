package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** The classic Sennrich-style toy corpus: merges must follow frequency
  * order with the deterministic (count desc, lexicographic) tie-break, and
  * the rewrite fold must implement greedy non-overlapping left-to-right.
  */
class BpeSpec extends SparkTestBase {

  test("trainMerges: toy dictionary follows the frequency order") {
    import spark.implicits._
    // es: 6+3=9; then est: 9; then lo: 5+2=7 ...
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("token", "cnt")
      .select(Bpe.charSeq(col("token")).as("seq"), col("cnt"))
    val got = Bpe.trainMerges(words, "seq", "cnt", rounds = 3)
      .orderBy(col("round"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)), got.toSeq)
  }

  test("trainMerges: greedy non-overlapping left-to-right on self-pairs") {
    import spark.implicits._
    // "a a a a a" with pair (a,a): L2R merges positions (1,2) and (3,4),
    // leaving [aa, aa, a] — round 2's pair table then has (aa,aa):1 (x7)
    // and (aa,a):1 (x7); tie broken lexicographically to (aa, a).
    val words = Seq(("aaaaa", 7L)).toDF("token", "cnt")
      .select(Bpe.charSeq(col("token")).as("seq"), col("cnt"))
    val got = Bpe.trainMerges(words, "seq", "cnt", rounds = 2)
      .orderBy(col("round"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 28L), (2, "aa", "a", 7L)), got.toSeq)
  }

  test("trainMerges: runs out of pairs -> later rounds contribute no rows") {
    import spark.implicits._
    val words = Seq(("ab", 3L)).toDF("token", "cnt")
      .select(Bpe.charSeq(col("token")).as("seq"), col("cnt"))
    val got = Bpe.trainMerges(words, "seq", "cnt", rounds = 3)
      .orderBy(col("round"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1, "a", "b")), got.toSeq)
  }
}
