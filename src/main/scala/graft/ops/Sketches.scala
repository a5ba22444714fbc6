package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based operators built on Spark's internal Bloom-filter expressions
  * (the machinery behind runtime row-group filters), registered as
  * `graft_bloom_agg` / `graft_might_contain` in
  * [[graft.functions.GraftFunctions]].
  *
  * The 100 TB use: semi-join PRUNING. Joining a huge fact table against a
  * selective dimension normally shuffles every fact row; a Bloom filter of
  * the dimension keys broadcast to the fact scan drops non-matching rows
  * map-side first, so only ~matching rows (plus the false-positive ε) reach
  * the shuffle. The exact join afterwards removes false positives — results
  * are identical to the plain join, only cheaper.
  */
object Sketches {

  /** Rows of `facts` whose `factKey` is possibly in `dimKeys` (Bloom
    * membership; false positives allowed, false negatives impossible).
    */
  def bloomPrefilter(
      facts: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Long = -1L,
      numBits: Long = -1L
  ): DataFrame = {
    graft.functions.GraftFunctions.register(facts.sparkSession)
    // size the filter to the dimension (a saturated bloom prunes nothing but
    // still costs a probe per fact row): ~10 bits/item ≈ 1% false positives.
    val items =
      if (expectedItems > 0) expectedItems else math.max(dim.count(), 1L)
    val bits =
      if (numBits > 0) numBits
      else math.min(math.max(items * 10L, 1L << 16), 1L << 27)
    // `might_contain` requires a CONSTANT bloom binary: aggregate the dim
    // keys into one blob (a single-row action, ~numBits/8 bytes) and inject
    // it as a literal — the same materialize-then-inject shape Spark's own
    // runtime filters use.
    val bloomBytes: Array[Byte] = dim
      .agg(call_function("graft_bloom_agg", xxhash64(dimKey), lit(items), lit(bits))
        .as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    facts.filter(call_function("graft_might_contain", lit(bloomBytes), xxhash64(factKey)))
  }

  /** Exact semi join accelerated by a Bloom pre-filter: same result as
    * `facts.join(dim, key, "left_semi")`, but non-matching fact rows are
    * dropped before the shuffle.
    */
  def bloomSemiJoin(
      facts: DataFrame,
      factKeyName: String,
      dim: DataFrame,
      dimKeyName: String,
      expectedItems: Long = -1L,
      numBits: Long = -1L
  ): DataFrame = {
    // dim is consumed three times in the default path: the sizing count()
    // and the bloom-build collect() (both EAGER, here), then the semi join
    // at the caller's action. Persist across the two eager actions and
    // release before returning — the join then reads dim from source once.
    val d = dim.persist()
    try {
      val pruned =
        bloomPrefilter(facts, col(factKeyName), d, col(dimKeyName), expectedItems, numBits)
      pruned.join(
        dim.select(col(dimKeyName).as(factKeyName)).distinct(),
        Seq(factKeyName),
        "left_semi")
    } finally { d.unpersist(); () }
  }
}
