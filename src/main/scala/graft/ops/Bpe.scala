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

  // ------------------------------------------------------------- encode

  /** ENCODE half of the tokenizer loop: apply trained merges, in round
    * order, to an ARBITRARY token — including tokens never seen during
    * training, which the final training state cannot answer for. One
    * row-local expression: an outer fold over the (constant-sized) merge
    * list whose step is the training rewrite's inner fold over the
    * current symbol sequence — identical greedy non-overlapping
    * left-to-right semantics, so encoding the training corpus reproduces
    * the training state exactly (spec-pinned differential).
    */
  def applyMerges(token: Column, merges: Seq[(String, String)]): Column = {
    if (merges.isEmpty) return charSeq(token)
    val arr = array(merges.map { case (a, b) =>
      struct(lit(a).as("ba"), lit(b).as("bb"))
    }: _*)
    aggregate(arr, charSeq(token), (acc, m) => {
      val syms = split(acc, " ")
      val ba = m.getField("ba")
      val bb = m.getField("bb")
      aggregate(
        slice(syms, lit(2), size(syms)),
        element_at(syms, 1),
        (a2, x) =>
          when((a2 === ba || a2.endsWith(concat(lit(" "), ba))) && x === bb,
            concat(a2, bb))
            .otherwise(concat(a2, lit(" "), x)))
    })
  }

  /** Trained-merge rows → driver-side (left, right) list in round order.
    * Bounded by the training round count (a constant), never by data.
    */
  def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.select(col("round"), col("left_sym"), col("right_sym"))
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq

  /** Encode a token stream under trained merges: build the DISTINCT token
    * dictionary (vocabulary-bounded by Heaps' law — the same scale shape
    * as training), apply the merges once per dictionary entry, and join
    * the (seq, n_sym) encoding back onto the stream. The expensive fold
    * runs |vocabulary| times, not |corpus| times; the join is a plain
    * equi-join Catalyst/AQE is free to broadcast when the dictionary fits.
    */
  def encode(tokens: DataFrame, tokenCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val dict = tokens.select(col(tokenCol).as("__tok")).distinct()
      .select(col("__tok"), applyMerges(col("__tok"), merges).as("seq"))
      .withColumn("n_sym", size(split(col("seq"), " ")).cast("long"))
    tokens.join(dict, col(tokenCol) === col("__tok")).drop("__tok")
  }
}
