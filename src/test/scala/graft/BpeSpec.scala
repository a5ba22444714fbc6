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

  // ------------------------------------------------------ encode (round 11)

  test("encode: hand-checked merges on seen AND unseen tokens") {
    import spark.implicits._
    // merges learned elsewhere: (e,s) then (es,t) then (l,o)
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val toks = Seq("newest", "lowest", "lotto", "x", "es")
      .toDF("token")
    val got = Bpe.encode(toks, "token", merges)
      .select(col("token"), col("seq"), col("n_sym"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got("newest") == (("n e w est", 4L)), got("newest"))
    // 'lowest' was never a training word; the merges still apply
    assert(got("lowest") == (("lo w est", 3L)), got("lowest"))
    // greedy L2R: 'lotto' -> lo t t o (the second 'o' has no 'l' before it)
    assert(got("lotto") == (("lo t t o", 4L)), got("lotto"))
    assert(got("x") == (("x", 1L)), "single char is its own symbol")
    assert(got("es") == (("es", 1L)), "exact pair merges to one symbol")
  }

  test("encode with zero merges degrades to the character-level start state") {
    import spark.implicits._
    val got = Bpe.encode(Seq("abc").toDF("token"), "token", Seq.empty)
      .select(col("seq"), col("n_sym")).collect().head
    assert(got.getString(0) == "a b c" && got.getLong(1) == 3L)
  }

  test("encode of the training corpus reproduces the training state exactly") {
    import spark.implicits._
    // differential: applying collectMerges' round-ordered list to the raw
    // tokens must land on trainMergesWithState's final word state — the
    // two folds implement the same greedy semantics by construction, and
    // this pins it (a wrong merge ORDER breaks 'est' vs 'e st')
    val raw = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("aaaaa", 4L), ("tesst", 1L))
    val words = raw.toDF("token", "cnt")
      .select(Bpe.charSeq(col("token")).as("seq"), col("cnt"))
    val (mergesDf, state) = Bpe.trainMergesWithState(words, "seq", "cnt", rounds = 5)
    val merges = Bpe.collectMerges(mergesDf)
    assert(merges.size == 5)
    val viaState = state
      .select(regexp_replace(col("seq"), " ", "").as("token"), col("seq"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val viaEncode = Bpe.encode(raw.map(_._1).toDF("token"), "token", merges)
      .collect().map(r => (r.getAs[String]("token"), r.getAs[String]("seq"))).toMap
    assert(viaEncode == viaState,
      s"encode and training state disagree:\n$viaEncode\nvs\n$viaState")
  }
}
