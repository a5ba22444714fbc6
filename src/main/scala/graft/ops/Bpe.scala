package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-training core of an
  * LLM data pipeline, run the way reference BPE actually trains: over the
  * WORD-FREQUENCY DICTIONARY (vocabulary-sized, bounded by Heaps' law),
  * never over raw corpus positions. Each round counts adjacent symbol
  * pairs weighted by word frequency, picks the most frequent pair
  * (deterministic tie-break: count desc, then lexicographic), and rewrites
  * every word by merging that pair's non-overlapping occurrences left to
  * right.
  *
  * Scale shape per round: one groupBy shuffle over the vocabulary-sized
  * pair table, two scalar-sized aggregates for the argmax, one broadcast of
  * the single best pair, one row-local rewrite pass. No quadratic join, no
  * driver-side loop over data — the Scala loop iterates ROUNDS (a constant),
  * each iteration pure DataFrame ops, lineage cut per round.
  *
  * The rewrite is a left fold over the symbol list (`aggregate` here,
  * `list_reduce` in the DuckDB oracle): merge when the accumulated string's
  * LAST symbol equals the pair's left and the incoming symbol equals its
  * right — string-suffix test `acc = L OR endswith(acc, ' ' || L)` is exact
  * because symbols never contain spaces. The fold reproduces greedy
  * non-overlapping left-to-right semantics ("a a a" + pair (a,a) → "aa a"):
  * a just-merged symbol L||R can never re-match as L (that would need R
  * empty), so no occurrence is double-consumed.
  */
object Bpe {

  /** "abc" → "a b c": the character-level start state. Mirrored in SQL as
    * `trim(regexp_replace(token, '(.)', '\1 ', 'g'))` — byte-identical for
    * the ASCII corpus contract.
    */
  def charSeq(token: Column): Column =
    trim(regexp_replace(token, "(.)", "$1 "))

  /** Train `rounds` merges over (seq, cnt) word rows; returns one row per
    * round: (round, left_sym, right_sym, pair_count). A round with no
    * remaining pairs contributes no row (and all later rounds go empty) —
    * same behavior as the oracle's LIMIT-1-on-empty.
    */
  def trainMerges(
      words: DataFrame,
      seqCol: String,
      cntCol: String,
      rounds: Int
  ): DataFrame = trainMergesWithState(words, seqCol, cntCol, rounds)._1

  /** [[trainMerges]] plus the post-training word state: (merges, final
    * (seq, cnt) rows). The final seq IS the word's encoding under the
    * learned merges — its space count is the symbol count, and stripping
    * spaces reconstructs the original token (symbols are concatenations of
    * its chars), so the state doubles as the token → encoding dictionary
    * for the ENCODE half of the tokenizer loop.
    */
  def trainMergesWithState(
      words: DataFrame,
      seqCol: String,
      cntCol: String,
      rounds: Int
  ): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    var w = words.select(col(seqCol).as("seq"), col(cntCol).as("cnt"))
      .localCheckpoint() // rounds chain on it; cut the upstream lineage once
    val merges = ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val syms = w.select(col("cnt"), split(col("seq"), " ").as("s"))
        .filter(size(col("s")) >= 2) // sequence(1,0) would DESCEND, not empty
      val pc = syms.select(col("cnt"), explode(expr(
          "transform(sequence(1, size(s) - 1)," +
            " i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pc"))
        .localCheckpoint() // two consumers: the max scalar + the argmax filter
      val mx = pc.agg(max(col("pc")).as("mx"))
      val best = pc.join(broadcast(mx), col("pc") === col("mx"))
        .agg(min(struct(col("a"), col("b"))).as("ab"), max(col("pc")).as("bpc"))
        .where(col("ab").isNotNull) // empty pair table → no merge row
        .select(col("ab.a").as("ba"), col("ab.b").as("bb"), col("bpc"))
        .localCheckpoint() // two consumers: the merge row + the word rewrite
      merges += best.select(lit(r).as("round"), col("ba").as("left_sym"),
        col("bb").as("right_sym"), col("bpc").as("pair_count"))
      w = w.crossJoin(broadcast(best))
        .select(expr(
          """aggregate(
            |  slice(split(seq, ' '), 2, size(split(seq, ' '))),
            |  element_at(split(seq, ' '), 1),
            |  (acc, x) -> CASE
            |    WHEN (acc = ba OR endswith(acc, concat(' ', ba))) AND x = bb
            |    THEN concat(acc, bb) ELSE concat(acc, ' ', x) END)""".stripMargin)
          .as("seq"), col("cnt"))
        .localCheckpoint() // cut the per-round lineage (rounds compound)
    }
    (merges.reduce(_ unionByName _), w)
  }
}
