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

  /** Default sizing when the caller has no cardinality estimate: 128k items
    * at ~10 bits/item (≈1% FPP, 160 KB blob — the blob rides in the fact
    * scan's task binary, so oversizing taxes every task of the big side; a
    * 1M-item default measured +0.3 s on q65 from the 1.3 MB broadcast alone).
    * A smaller dim just gets a lower FPP; a larger one triggers the one-time
    * saturation rebuild below — two passes over the (small) dim, the same
    * cost the explicit pre-count always paid.
    */
  private val DefaultExpectedItems = 1L << 17

  private def sizeBits(items: Long): Long =
    math.min(math.max(items * 10L, 1L << 16), 1L << 27)

  /** Rows of `facts` whose `factKey` is possibly in `dimKeys` (Bloom
    * membership; false positives allowed, false negatives impossible).
    *
    * Sizing without a separate `count()` action: the exact dim count rides
    * along in the SAME single-row collect that builds the bloom (~10 bits/
    * item ≈ 1% false positives — a saturated bloom prunes nothing but still
    * costs a probe per fact row). Only if the caller gave no estimate AND the
    * actual count blew past the default sizing is the bloom rebuilt once at
    * the true cardinality — the rare path; the common path is ONE pass over
    * dim before the join.
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
    // `might_contain` requires a CONSTANT bloom binary: aggregate the dim
    // keys into one blob (a single-row action, ~numBits/8 bytes) and inject
    // it as a literal — the same materialize-then-inject shape Spark's own
    // runtime filters use.
    def build(items: Long, bits: Long): (Array[Byte], Long) = {
      val row = dim
        .agg(
          call_function("graft_bloom_agg", xxhash64(dimKey), lit(items), lit(bits)).as("bf"),
          count(lit(1)).as("n"))
        .collect()(0)
      (row.getAs[Array[Byte]]("bf"), row.getAs[Long]("n"))
    }
    val items0 = if (expectedItems > 0) expectedItems else DefaultExpectedItems
    val bits0 = if (numBits > 0) numBits else sizeBits(items0)
    val (bf0, n) = build(items0, bits0)
    // rebuild whenever the caller gave no cardinality and the default guess
    // undershot — INCLUDING the numBits-only case: the hash-function count is
    // sized from `items`, so keeping the 128k default for a much larger dim
    // would saturate the (caller-sized) bitmap and prune nothing. The
    // caller's explicit numBits is preserved; only `items` is corrected.
    val bf =
      if (expectedItems <= 0 && n > items0)
        build(n, if (numBits > 0) numBits else sizeBits(n))._1
      else bf0
    facts.filter(call_function("graft_might_contain", lit(bf), xxhash64(factKey)))
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
    // dim is consumed twice — the bloom-build collect (EAGER, inside
    // bloomPrefilter) and the semi join at the caller's action — but the two
    // never overlap in time, so a persist would only add a cache write: the
    // common path is exactly one eager pass over dim, then the join re-reads
    // it from source (filter-pushed) at action time.
    val pruned =
      bloomPrefilter(facts, col(factKeyName), dim, col(dimKeyName), expectedItems, numBits)
    pruned.join(
      dim.select(col(dimKeyName).as(factKeyName)).distinct(),
      Seq(factKeyName),
      "left_semi")
  }

  /** Cross-engine 64-bit row hash: the big-endian parse of the LOW half of
    * the md5 hex digest of a canonical row string. md5 renders identical
    * lowercase hex everywhere, and the hex→integer parse is pinned to one
    * byte order on both sides (`conv(substr(hex,17,16),16,10)` here;
    * `('0x'||substring(md5,17,16))::UBIGINT` in DuckDB) — unlike xxhash64 /
    * DuckDB `hash()`, which are engine-private. DECIMAL(38,0) because the
    * value is unsigned 64-bit.
    *
    * The canonical string is the caller's contract: build it from integer /
    * string renderings only (cents-cast doubles, ISO-cast dates) — raw
    * double→string rendering differs across engines.
    */
  def rowHash64(canonical: Column): Column =
    conv(substring(md5(canonical), 17, 16), 16, 10).cast("decimal(38,0)")

  /** 10^18: the largest power of ten whose remainder always fits a signed
    * 64-bit long, used by [[surfaceHiLo]] to split wide exact integers.
    */
  val HiLoBase = 1000000000000000000L

  /** Surface NONNEGATIVE exact DECIMAL(38,0) columns as (hi, lo) BIGINT
    * pairs: `x = hi·10^18 + lo`, both exact. Decimal accumulators are the
    * right internal type for sums that exceed 2^53 (64-bit row hashes × 10^11
    * rows; cents × 10^6 credits), but a final DecimalType column is not
    * hash-stable across engines' canonicalizations — BIGINT is. The DuckDB
    * mirror is `CAST(CAST(x AS HUGEINT) // 10^18 AS BIGINT)` /
    * `... % ... AS BIGINT` (the HUGEINT hop matters: DuckDB's `//` on
    * DECIMAL routes through DOUBLE and rounds the quotient).
    *
    * Spark's `DIV` (IntegralDivide) returns BIGINT and truncates toward
    * zero; DuckDB's integer `//` floors — identical on the nonnegative
    * domain this helper is contracted to.
    */
  def surfaceHiLo(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_hi", expr(s"$c DIV $HiLoBase"))
        .withColumn(s"${c}_lo", expr(s"CAST($c % $HiLoBase AS BIGINT)"))
        .drop(c)
    }

  /** Order-free table fingerprint per group: COUNT plus SUM / MIN / MAX of
    * the 64-bit row hash. Commutative aggregates make the fingerprint
    * independent of partitioning, task order, and file layout — the
    * anti-entropy primitive for verifying a 100 TB table copy (or two
    * engines' views of one) without moving rows: compare a handful of
    * numbers per group. SUM is duplicate-sensitive where XOR would cancel
    * pairs; MIN/MAX catch single-row corruption that offsetting edits could
    * hide from SUM.
    *
    * The u64 hash and its sum don't fit a signed BIGINT, so each of
    * sum/min/max is surfaced as an exact (hi, lo) pair via [[surfaceHiLo]] —
    * six BIGINTs, engine-stable, instead of three DECIMAL(38,0)s the driver
    * hash gate rejects.
    */
  def fingerprint(df: DataFrame, groupCols: Seq[Column], canonical: Column): DataFrame = {
    val h = rowHash64(canonical)
    val agg = df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(h).as("fp_sum"), min(h).as("fp_min"), max(h).as("fp_max"))
    surfaceHiLo(agg, "fp_sum", "fp_min", "fp_max")
  }

  /** Two-level Merkle manifest per group: rows hash into `buckets` leaves by
    * id, each leaf digests its SORTED row hashes, the root digests the leaf
    * digests in bucket order. Complements [[fingerprint]]'s flat commutative
    * digest: when two table versions disagree, the per-leaf digests LOCALIZE
    * the difference to ~1/`buckets` of the data instead of "somewhere" — the
    * dataset-versioning / anti-entropy-repair primitive.
    *
    * Scale shape: one shuffle on (group, bucket), one on group. The only
    * collected state is per-leaf row-hash lists — size `rows/buckets` per
    * group, so `buckets` must scale with the table (rows ÷ target leaf size;
    * a manifest job knows its row count). Within-leaf sorting makes each leaf
    * digest independent of partitioning and arrival order; leaf digests
    * concatenate in bucket-id order, so the root is fully deterministic.
    */
  def merkleManifest(
      df: DataFrame,
      groupCols: Seq[Column],
      idCol: Column,
      canonical: Column,
      buckets: Int = 64
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val leaves = df
      .select(groupCols :+ pmod(idCol, lit(buckets)).as("bucket") :+ md5(canonical).as("rh"): _*)
      .groupBy(groupCols :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n_rows"),
        md5(concat_ws("", array_sort(collect_list(col("rh"))))).as("leaf_hash"))
    leaves
      .groupBy(groupCols: _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        count(lit(1)).as("n_leaves"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("bucket"), col("leaf_hash")))),
            x => x("leaf_hash")),
          "")).as("merkle_root"))
  }
}
