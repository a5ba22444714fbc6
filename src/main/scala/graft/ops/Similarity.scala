package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Determinism-by-construction: floats are scaled to exact 64-bit fixed-point
  * integers (×10⁶, verified boundary-safe for this data), dot products and
  * norms are integer sums (order-independent, overflow-safe for 64-dim ×10⁶
  * scale), and the final cosine is a single IEEE double expression over those
  * exact integers — bit-identical on any engine, so cosine scores can be
  * hash-compared against a SQL oracle. A float-double accumulation would be
  * associativity-dependent and engine-specific.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and scans
  * the corpus once — the right baseline at any corpus size when |queries| is
  * bounded. The LSH path buckets by random-hyperplane signs so each query
  * only compares within its bucket — the 100 TB path when |queries| is large.
  */
object Similarity {

  private val Scale = 1000000L

  /** Hash-repartition a (small-row) stream by `c` to the session's shuffle
    * parallelism before per-row-heavy or pair-quadratic work. The testdata
    * tables arrive as ONE parquet split, so without this every dot-product /
    * bucket join here would run on a single core no matter the cluster size;
    * on a real cluster the scalar shuffle is negligible next to the O(pairs)
    * work it parallelizes — and it doubles as a skew spreader.
    */
  private def spread(df: DataFrame, c: Column): DataFrame = Par.spread(df, c)

  /** Exact fixed-point int64 form of a float embedding. */
  def fixedPoint(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * Scale).cast("long"))

  /** ∑ x², exact integer (native expression — see [[graft.functions.LongArraySqNorm]]). */
  def sqNorm(iv: Column): Column = call_function("graft_sq_norm", iv)

  /** Exact integer dot product of two fixed-point vectors (native expression —
    * the `aggregate(zip_with(...))` form is ~20× slower at millions of pairs).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_long_dot", a, b)

  /** Cosine from exact integer dot/norms (single deterministic double expr). */
  def cosineFromFixed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  private def withFixed(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), fixedPoint(col(embCol)).as("iv"))
      .withColumn("nrm", sqNorm(col("iv")))

  /** Brute-force cosine top-k: for each query vector (bounded set), the k
    * nearest corpus vectors (self excluded), ranked (cos desc, id asc).
    * Query side is broadcast; corpus scanned once; one shuffle on query id
    * for the window.
    */
  /** Cap on the collected query panel: the panel rides as a literal into
    * [[graft.functions.LongArrayPanelDots]] (the §8.6#10 join-free shape),
    * so it must stay task-binary-sized — same bound as the PQ codebook.
    */
  private val MaxPanel = 4096

  /** Greedy k-center coreset (farthest-point traversal, Gonzalez 1985 —
    * the 2-approximation that underpins diversity/coverage selection of
    * training data): seed with the MINIMUM id, then k−1 times pick the
    * point FARTHEST from its nearest chosen center (ties → min id).
    * Distances are exact integers on the fixed-point vectors
    * (d² = |a|² + |b|² − 2a·b via the native dot/norm expressions), so
    * every comparison — and therefore the whole selection trajectory — is
    * engine-exact and hash-gateable against a k-unrolled SQL oracle; no
    * doubles anywhere.
    *
    * Scale shape: the canonical k-pass sweep — per round ONE map-only scan
    * updates the running min-distance against just the NEWEST center (a
    * 64-long literal in the task binary, not a join) and one partial-
    * aggregated arg-max picks the next center; the corpus never shuffles.
    * Driver-side state is k rows of (id, vector) — bounded and documented,
    * like the panel literal. Rounds localCheckpoint with eager release of
    * the previous round's blocks. Output: (pick_rank, vec_id, d2) where d2
    * is the selection-time distance to the nearest earlier center (NULL
    * for the seed) — the coverage-radius sequence.
    */
  def kCenterCoreset(df: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64]: $k")
    val sess = df.sparkSession
    graft.functions.GraftFunctions.register(sess)
    val seedChain = new Graph.RoundChain(sess.sparkContext)
    val fixed = seedChain.ckpt(withFixed(spread(df, col(idCol)), idCol, embCol))
    val seed = fixed.orderBy(col("id")).limit(1).collect()(0)
    var centers = List[(Int, Long, Option[Long])]((1, seed.getLong(0), None))
    var cVec = seed.getSeq[Long](1).toArray
    var cNrm = seed.getLong(2)
    def d2ToCenter: Column =
      col("nrm") + lit(cNrm) - lit(2L) * dot(col("iv"), typedLit(cVec))
    val chain = new Graph.RoundChain(sess.sparkContext)
    var cur = chain.ckpt(fixed.filter(col("id") =!= seed.getLong(0))
      .withColumn("dmin", d2ToCenter))
    seedChain.free()
    (2 to k).foreach { r =>
      if (!cur.isEmpty) {
        val top = cur
          .agg(max_by(
            struct(col("id"), col("iv"), col("nrm"), col("dmin")),
            struct(col("dmin"), -col("id"))).as("t"))
          .select(col("t.*")).collect()(0)
        centers ::= ((r, top.getLong(0), Some(top.getLong(3))))
        cVec = top.getSeq[Long](1).toArray
        cNrm = top.getLong(2)
        cur = chain.ckpt(cur.filter(col("id") =!= top.getLong(0))
          .withColumn("dmin", least(col("dmin"), d2ToCenter)))
      }
    }
    chain.free()
    import sess.implicits._
    centers.reverse.toDF("pick_rank", "vec_id", "d2")
  }

  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = spread(withFixed(corpus, idCol, embCol), col("id"))
    // bounded panel as ONE nested-array literal: each corpus row computes
    // every panel dot in a single native call — no join in the plan, no
    // per-joined-row interpreted dispatch (measured 36× at 500k corpus
    // vectors on the maxsim twin)
    val qRows = withFixed(queries, idCol, embCol)
      .orderBy(col("id")).select(col("id"), col("iv"), col("nrm")).collect()
    require(qRows.length <= MaxPanel, s"query panel ${qRows.length} exceeds $MaxPanel")
    val qids = qRows.map(_.getLong(0)).toIndexedSeq
    val qivs = qRows.map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    val qnrms = qRows.map(_.getLong(2)).toIndexedSeq
    val scored = c
      .select(col("id"), col("nrm"),
        posexplode(call_function("graft_panel_dots", col("iv"), typedlit(qivs))))
      .toDF("id", "nrm", "pi", "dot")
      .withColumn("query_id", element_at(typedlit(qids), col("pi") + 1))
      .withColumn("qnrm", element_at(typedlit(qnrms), col("pi") + 1))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", cosineFromFixed(col("dot"), col("qnrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("dot"), col("cosine"), col("rank"))
  }

  /** FILTERED vector search: [[bruteForceTopK]] restricted to corpus
    * vectors sharing the query's `filterCol` value — the metadata-
    * constrained top-k every production vector store serves ("nearest
    * within this tenant/language/label"). Pre-filtering is the exact form:
    * the predicate joins BEFORE ranking, so k survivors are guaranteed
    * (post-filtering an unfiltered top-k can come up short). Same scale
    * shape as the unfiltered arm — bounded query panel broadcast, corpus
    * scanned once; the ANN twins take the same predicate as a bucket-side
    * pre-filter.
    */
  def filteredTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      filterCol: String,
      k: Int
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def fixed(df: DataFrame) = withFixed(df, idCol, embCol)
      .join(df.select(col(idCol).as("id"), col(filterCol).as("tag")), Seq("id"))
    val c = spread(fixed(corpus), col("id"))
    // same panel-literal shape as [[bruteForceTopK]]; the metadata predicate
    // applies right after the explode (dots for non-matching tags are a few
    // wasted longs, far cheaper than reintroducing the join)
    val qRows = fixed(queries)
      .orderBy(col("id")).select(col("id"), col("iv"), col("nrm"), col("tag")).collect()
    require(qRows.length <= MaxPanel, s"query panel ${qRows.length} exceeds $MaxPanel")
    val qids = qRows.map(_.getLong(0)).toIndexedSeq
    val qivs = qRows.map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    val qnrms = qRows.map(_.getLong(2)).toIndexedSeq
    val qtags = qRows.map(r => Option(r.get(3)).map(_.toString).orNull).toIndexedSeq
    val scored = c
      .select(col("id"), col("nrm"), col("tag"),
        posexplode(call_function("graft_panel_dots", col("iv"), typedlit(qivs))))
      .toDF("id", "nrm", "tag", "pi", "dot")
      .withColumn("query_id", element_at(typedlit(qids), col("pi") + 1))
      .withColumn("qnrm", element_at(typedlit(qnrms), col("pi") + 1))
      .withColumn("qtag", element_at(typedlit(qtags), col("pi") + 1))
      .filter(col("query_id") =!= col("id") && col("qtag") <=> col("tag").cast("string"))
      .withColumn("cosine", cosineFromFixed(col("dot"), col("qnrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("tag"), col("id").as("neighbor_id"),
        col("dot"), col("cosine"), col("rank"))
  }

  /** Matryoshka-style prefix-dimension audit: per query, how many of the
    * full-dimension top-k survive when ranking by the FIRST `prefixDims`
    * dimensions only — the measurement that justifies (or kills) serving a
    * truncated-embedding index. Both rankings run from the same scored
    * join; exact integer dots, deterministic (cosine desc, id asc) order.
    * overlap_at_k = k means the prefix index loses nothing at this k.
    */
  def prefixDimAudit(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      prefixDims: Int,
      k: Int
  ): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def fixed(df: DataFrame) = withFixed(df, idCol, embCol)
      .withColumn("ivp", slice(col("iv"), 1, prefixDims))
      .withColumn("nrmp", sqNorm(col("ivp")))
    val c = spread(fixed(corpus), col("id"))
    // both rankings ride the same join-free panel-literal shape as
    // [[bruteForceTopK]] — full-dim and prefix-dim panels are two literals
    val qRows = fixed(queries)
      .orderBy(col("id"))
      .select(col("id"), col("iv"), col("nrm"), col("ivp"), col("nrmp")).collect()
    require(qRows.length <= MaxPanel, s"query panel ${qRows.length} exceeds $MaxPanel")
    val qids = qRows.map(_.getLong(0)).toIndexedSeq
    val qivs = qRows.map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    val qnrms = qRows.map(_.getLong(2)).toIndexedSeq
    val qivps = qRows.map(_.getSeq[Long](3).toIndexedSeq).toIndexedSeq
    val qnrmps = qRows.map(_.getLong(4)).toIndexedSeq
    val scored = c
      .select(col("id"), col("nrm"), col("nrmp"),
        posexplode(arrays_zip(
          call_function("graft_panel_dots", col("iv"), typedlit(qivs)),
          call_function("graft_panel_dots", col("ivp"), typedlit(qivps)))))
      .toDF("id", "nrm", "nrmp", "pi", "dots")
      .select(col("id"), col("nrm"), col("nrmp"), col("pi"),
        col("dots.0").as("dot_full"), col("dots.1").as("dot_pre"))
      .withColumn("query_id", element_at(typedlit(qids), col("pi") + 1))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos_full", cosineFromFixed(col("dot_full"),
        element_at(typedlit(qnrms), col("pi") + 1), col("nrm")))
      .withColumn("cos_pre", cosineFromFixed(col("dot_pre"),
        element_at(typedlit(qnrmps), col("pi") + 1), col("nrmp")))
    val wF = Window.partitionBy(col("query_id")).orderBy(col("cos_full").desc, col("id").asc)
    val wP = Window.partitionBy(col("query_id")).orderBy(col("cos_pre").desc, col("id").asc)
    scored
      .withColumn("rk_full", row_number().over(wF))
      .withColumn("rk_pre", row_number().over(wP))
      .groupBy(col("query_id"))
      .agg(sum(when(col("rk_full") <= k && col("rk_pre") <= k, 1L).otherwise(0L))
        .as("overlap_at_k"))
  }

  /** Dominant direction of an embedding collection by two exact fixed-point
    * power-iteration steps — the anisotropy / representation-collapse audit
    * (Ethayarajh 2019 shape): embeddings whose mass concentrates on one
    * direction carry far less usable signal than their dimension suggests,
    * and the dominant direction is what "all vectors look alike" looks like.
    *
    * Never materializes the d×d Gram matrix: (G·v)ᵢ = Σ_rows qᵣᵢ·(qᵣ·v), so
    * each step is one row-local dot (against the broadcast 64-row previous
    * vector) plus one shuffle keyed on dim — O(rows·d) work, d-sized state.
    * Between steps the vector renormalizes to ±10⁶ fixed-point by INTEGER
    * division of nonnegative operands (sign split off first — Spark `DIV`
    * truncates where DuckDB `//` floors, they agree only ≥ 0), so every
    * intermediate stays exact and the next step's products fit DECIMAL(38,0)
    * at any corpus size. Output: one row per dimension with the normalized
    * direction component — exact BIGINTs, engine-stable.
    */
  /** Late-interaction (ColBERT-style) maxsim scores: multi-vector docs
    * (`slotsPerDoc` embedding rows per doc id), score(q, d) = Σ_qslot
    * max_dslot ⟨qᵥ, dᵥ⟩ over exact fixed-point integer dots, for every
    * (query doc < `panelDocs`, corpus doc) pair. Input contract: columns
    * (docv, slot, iv) with dense slots 0..slotsPerDoc−1 per doc.
    *
    * The whole query panel travels as ONE nested-array literal into the
    * native [[graft.functions.LongArrayPanelDots]] expression — each corpus
    * vector computes all panel dots in a single call, so the plan has NO
    * join before aggregation and the panel×corpus fanout materializes only
    * output longs (the broadcast-join-plus-interpreted-dot form measured
    * ~5× slower at 500k vectors from per-joined-row dispatch + GC). The
    * panel collect is `panelDocs × slotsPerDoc` rows — bounded, the
    * IVF-codebook precedent.
    */
  def maxSimScores(fixed: DataFrame, panelDocs: Long, slotsPerDoc: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(fixed.sparkSession)
    val panel = fixed.filter(col("docv") < panelDocs)
      .orderBy(col("docv"), col("slot"))
      .select(col("iv")).collect()
      .map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    require(panel.length == panelDocs * slotsPerDoc,
      s"panel expects dense slots: got ${panel.length} vectors for $panelDocs docs")
    val dots = Par.spread(fixed, col("docv"))
      .select(col("docv"),
        posexplode(call_function("graft_panel_dots", col("iv"), typedlit(panel))))
      .toDF("docv", "pi", "dot")
      .withColumn("qdoc", expr(s"pi DIV $slotsPerDoc"))
      .withColumn("qslot", expr(s"pi % $slotsPerDoc"))
      .filter(col("qdoc") =!= col("docv"))
    dots.groupBy(col("qdoc"), col("docv"), col("qslot"))
      .agg(max(col("dot")).as("m"))
      .groupBy(col("qdoc"), col("docv"))
      .agg(sum(col("m")).as("maxsim"))
  }

  def dominantDirection(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int = 64
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // never explodes to (row, dim) — the 64x row blowup plus its data-sized
    // joins measured 15x per 10x; this shape is two SINGLE-PASS aggregates
    // of `dims` decimal sums over row-local products (row sum and row·v are
    // per-row array ops), with only dims-sized state ever leaving the
    // executors (the IVF-codebook bounded-collect precedent)
    val fixed = df
      .select(fixedPoint(col(embCol)).as("iv"))
      .withColumn("s", expr("aggregate(iv, 0L, (a, x) -> a + x)"))
      .localCheckpoint() // both power steps share the fixed-point scan
    def collectVec(weight: Column): Array[BigInt] = {
      val row = fixed.agg(
        sum(expr("CAST(iv[0] AS DECIMAL(38,0))") * weight).as("v0"),
        (1 until dims).map(i =>
          sum(expr(s"CAST(iv[$i] AS DECIMAL(38,0))") * weight).as(s"v$i")): _*).head()
      Array.tabulate(dims)(i =>
        Option(row.getDecimal(i)).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0)))
    }
    def normalized(v: Array[BigInt]): Array[Long] = {
      val m = v.map(_.abs).max
      // BigInt / truncates toward zero on the nonnegative abs — the same
      // floor DuckDB's HUGEINT // computes there
      if (m == 0) Array.fill(dims)(0L)
      else v.map(x => (BigInt(x.signum) * (x.abs * 1000000 / m)).toLong)
    }
    // step 1: v1 = G·1 — the row weight is the row SUM
    val u1 = normalized(collectVec(col("s").cast("decimal(38,0)")))
    // step 2: weight t_r = q_r · u1, a row-local native dot against the
    // broadcast-literal direction
    val u1Col = array(u1.toIndexedSeq.map(lit): _*)
    val t = call_function("graft_long_dot", col("iv"), u1Col).cast("decimal(38,0)")
    val v2 = normalized(collectVec(t))
    val spark = df.sparkSession
    import spark.implicits._
    v2.zipWithIndex.map { case (u, i) => (i, u) }.toSeq
      .toDF("dim", "direction_fixed")
  }

  /** k-NN label audit (the confident-learning move, Northcutt 2021): for
    * each query vector, the label histogram of its k nearest neighbors;
    * a vector whose own label disagrees with the neighborhood majority is
    * a suspected LABEL ERROR — the single highest-yield filter on noisy
    * supervised/preference data. Majority ties break by (votes desc,
    * label asc) — deterministic. Built on the exact [[bruteForceTopK]]
    * arm over a bounded query panel (the oracle-gateable form); at corpus
    * scale swap in [[annTopK]]/[[ivfTopK]] for the neighbor stage and
    * audit shards of queries — the vote/majority tail is unchanged (one
    * groupBy + one k-bounded window + one key join, all on query_id).
    */
  def knnLabelAudit(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int,
      maxQueryId: Long
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val labels = emb.select(col(idCol).as("neighbor_id"), col(labelCol).as("nb_label"))
    val nn = bruteForceTopK(emb, emb.filter(col(idCol) < maxQueryId), idCol, embCol, k)
    val votes = nn
      .join(labels, "neighbor_id")
      .groupBy(col("query_id"), col("nb_label"))
      .agg(count(lit(1)).as("votes"))
    val wMaj = Window.partitionBy(col("query_id")).orderBy(col("votes").desc, col("nb_label").asc)
    val maj = votes
      .withColumn("rn", row_number().over(wMaj))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("nb_label").as("majority_label"),
        col("votes").as("majority_votes"))
    emb.filter(col(idCol) < maxQueryId)
      .select(col(idCol).as("query_id"), col(labelCol).as("label"))
      .join(maj, "query_id")
      .withColumn("agree_frac", col("majority_votes").cast("double") / lit(k).cast("double"))
      .withColumn("suspect", col("majority_label") =!= col("label"))
  }

  /** All pairs with cosine ≥ threshold (id_a < id_b). Brute-force form for
    * BOUNDED corpora / oracle verification ONLY: the non-equi condition forces
    * a nested-loop join, and `forceBroadcast` (default) ships the whole right
    * side to every task — an executor-memory hazard on an unbounded corpus.
    * Pass `forceBroadcast = false` above broadcast scale (the join then runs
    * as a partitioned nested loop); the SCALABLE near-dup path is
    * [[verifiedNearDups]]/[[annTopK]], which bucket with [[lshBuckets]] first
    * and never go all-pairs.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      forceBroadcast: Boolean = true
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val v = withFixed(df, idCol, embCol)
    val a = spread(v, col("id"))
      .withColumnsRenamed(Map("id" -> "id_a", "iv" -> "iv_a", "nrm" -> "nrm_a"))
    val b = v.withColumnsRenamed(Map("id" -> "id_b", "iv" -> "iv_b", "nrm" -> "nrm_b"))
    a.join(if (forceBroadcast) broadcast(b) else b, col("id_a") < col("id_b"))
      .withColumn("dot", dot(col("iv_a"), col("iv_b")))
      .withColumn("cosine", cosineFromFixed(col("dot"), col("nrm_a"), col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("dot"), col("cosine"))
  }

  /** Random-hyperplane LSH bucket id: `planes` pseudo-hyperplanes whose
    * components derive deterministically from (seed, plane, dim) hashes; the
    * bucket is the sign-bit string. Row-local; equal vectors always share a
    * bucket; near vectors share with probability 1−θ/π per plane.
    */
  def lshBuckets(embedding: Column, planes: Int, seed: Long = 7L): Column =
    // native one-pass expression over the fixed-point vector
    // (graft.functions.RandomProjectionBits)
    call_function("graft_projbits", fixedPoint(embedding), lit(planes), lit(seed))

  /** Approximate nearest neighbors via multi-table random-hyperplane LSH
    * (OR-amplification), optionally multi-probe (Lv et al., VLDB'07): each
    * vector is INDEXED once per table but PROBES its own bucket plus every
    * bucket at Hamming distance ≤ `probeBits` (bit-flips of the signature).
    * Two vectors are candidates if a probe of one hits the index bucket of
    * the other in any table. Cost is a tables×docs(×probes) shuffle of small
    * keys plus per-bucket dot products — never the O(n²) cross product.
    *
    * Multi-probe is the scale lever: more planes ⇒ exponentially smaller
    * buckets (candidate volume ∝ n²·tables/2^planes), while probing flipped
    * buckets recovers the recall that narrow buckets lose — per-table
    * collision rises from p^planes to p^planes + Σ flips·p^(planes−1)(1−p).
    * Measured on the sf0.1 embeddings, recall vs brute force over 200
    * queries: 4 planes / 8 tables / probe-0 → 0.73; 6 / 8 / probe-1 → 0.92
    * at ~6× fewer candidates; 8 planes / 10 tables / probe-≤2 (all 1-bit
    * and 2-bit flips) → 0.989 at another ~2.7× less work — each probing
    * depth pays for one-to-two more planes of bucket narrowing.
    */
  def annTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      planes: Int = 4,
      numTables: Int = 8,
      seed: Long = 7L,
      probeBits: Int = 0,
      broadcastAttach: Boolean = true
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    require(probeBits >= 0 && probeBits <= 2, "probeBits ∈ {0, 1, 2} supported")
    // vectors computed once; the LSH join shuffles ONLY (id, table, bucket)
    // small keys — arrays are attached to the (distinct) candidate pairs
    // afterwards, so vector bytes never multiply by numTables.
    // materialized once: BOTH candidate-pair broadcasts below would
    // otherwise re-run the scan + fixed-point conversion independently
    // (bounded: one row per vector — this is the scoring side of the index)
    val v = df
      .select(col(idCol).as("id"), fixedPoint(col(embCol)).as("iv"))
      .withColumn("nrm", sqNorm(col("iv")))
      .localCheckpoint()
    // bucket construction READS THE CHECKPOINTED v — deriving from raw df
    // would re-run the scan + interpreted fixed-point transform a third
    // time; the native one-pass projbits runs per table over the long array.
    val buckets = spread(v.select(col("id"), col("iv")), col("id"))
      .select(
        col("id"),
        explode(array((0 until numTables).map { tbl =>
          struct(lit(tbl).as("tbl"),
            call_function("graft_projbits", col("iv"), lit(planes), lit(seed + tbl * 1013L)).as("bkt"))
        }: _*)).as("tb")
      )
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
      // the bucket table IS the LSH index — materialize it once (tables×docs
      // scalar rows): it feeds both the probe stream and the index side of
      // the candidate join, and its lineage (scan + interpreted fixed-point
      // + projbits×tables) is the expensive part of the whole operator
      .localCheckpoint()
    // probe side: the exact bucket + (optionally) all 1-bit flips of it.
    // Asymmetric probing (index once, probe many) keeps the index shuffle at
    // tables×docs rows; only the probe stream multiplies by planes+1.
    val flips: Seq[Column] =
      (if (probeBits >= 1) (0 until planes).map(b => col("bkt").bitwiseXOR(lit(1L << b)))
       else Nil) ++
      (if (probeBits >= 2)
         for { i <- 0 until planes; j <- (i + 1) until planes }
           yield col("bkt").bitwiseXOR(lit((1L << i) | (1L << j)))
       else Nil)
    val probes =
      if (probeBits == 0) buckets
      else buckets.select(
        col("id"), col("tbl"),
        explode(array(col("bkt") +: flips: _*)).as("bkt"))
    // candidate pairs are two-long scalar rows, kept UNORDERED (a < b) and
    // deduped BEFORE attaching vectors: each pair's dot product is computed
    // exactly once (cross-table / cross-probe / mirror-direction collisions
    // would otherwise multiply the scoring work); the arrays then attach
    // map-side via broadcast. probe(a)∋bucket(b) ∨ probe(b)∋bucket(a) keeps
    // recall symmetric under the a<b canonicalization.
    val cands = probes.as("x")
      .join(buckets.as("y"), col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt")
        && col("x.id") =!= col("y.id"))
      .select(
        least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
      .distinct()
    // attach joins: broadcast while the vector table fits in an executor;
    // `broadcastAttach = false` is the corpus-scale form — plain equi-joins
    // on id (shuffled by key under AQE), so no task holds every vector
    def attach(side: DataFrame): DataFrame =
      if (broadcastAttach) broadcast(side) else side
    val pairScores = cands
      .join(attach(v.withColumnsRenamed(Map("id" -> "id_a", "iv" -> "iv_a", "nrm" -> "nrm_a"))), "id_a")
      .join(attach(v.withColumnsRenamed(Map("id" -> "id_b", "iv" -> "iv_b", "nrm" -> "nrm_b"))), "id_b")
      .withColumn("dot", dot(col("iv_a"), col("iv_b")))
      .withColumn("cosine", cosineFromFixed(col("dot"), col("nrm_a"), col("nrm_b")))
      .select(col("id_a"), col("id_b"), col("dot"), col("cosine"))
    // mirror each scored pair into both query directions (dot is symmetric)
    val scored = pairScores
      .select(col("id_a").as("query_id"), col("id_b").as("id"), col("dot"), col("cosine"))
      .unionAll(pairScores
        .select(col("id_b").as("query_id"), col("id_a").as("id"), col("dot"), col("cosine")))
    // native heap top-k: per-query k smallest without sorting every scored
    // candidate of a shuffle partition (id closes the ordering — total)
    Relational
      .topKPerGroupNative(scored, Seq(col("query_id")),
        Seq(col("cosine").desc, col("id").asc), k, rankCol = "rank")
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Product-quantization encoding (the FAISS-style compression path):
    * split each fixed-point vector into `subspaces` contiguous subvectors,
    * learn a `codebookSize`-centroid codebook per subspace by integer-
    * arithmetic Lloyd iterations over a deterministic hash-ordered sample
    * (codebook training on a bounded sample is standard practice — the
    * sample collect is index-build metadata), then encode every vector
    * partition-parallel as its per-subspace nearest-centroid codes. Output
    * carries both the compact `codes` (the stored form: subspaces ×
    * log2(codebookSize) bits per vector) and the decoded `recon`struction
    * the asymmetric-distance scorer consumes.
    *
    * Determinism: sample selection by (xxhash64(id), id); centroid updates
    * are exact integer sums with floor division; argmin ties break toward
    * the lowest code — identical codebooks and codes on any partitioning.
    */
  def pqEncode(
      df: DataFrame,
      idCol: String,
      embCol: String,
      subspaces: Int = 8,
      codebookSize: Int = 16,
      iters: Int = 5,
      sampleSize: Int = 4096
  ): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // materialized once: the codebook sample collect below and the encode
    // pass of the returned plan otherwise each replay scan + fixed-point
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val sample: Array[Array[Long]] = v
      .select(col("id"), col("iv"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    require(sample.nonEmpty, "pqEncode: empty input")
    val dims = sample(0).length
    require(dims % subspaces == 0, s"dims $dims must divide into $subspaces subspaces")
    val subDim = dims / subspaces
    val codebooks = pqTrain(sample, subspaces, codebookSize, iters)

    val inSchema = v.schema
    val outSchema = org.apache.spark.sql.types.StructType(inSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)),
      org.apache.spark.sql.types.StructField("recon",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val ivIdx = inSchema.fieldIndex("iv")
    v.mapPartitions { rows =>
      rows.map { r =>
        val iv = r.getSeq[Long](ivIdx).toArray
        val codes = new Array[Int](subspaces)
        val recon = new Array[Long](dims)
        var s = 0
        while (s < subspaces) {
          val sub = java.util.Arrays.copyOfRange(iv, s * subDim, (s + 1) * subDim)
          val c = nearestCode(sub, codebooks(s))
          codes(s) = c
          System.arraycopy(codebooks(s)(c), 0, recon, s * subDim, subDim)
          s += 1
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(codes.toSeq, recon.toSeq))
      }
    }(enc)
  }

  /** Per-subspace Lloyd codebook training on a bounded sample, all integer
    * arithmetic (exact sums, floor division, argmin ties toward the lowest
    * code) — shared by [[pqEncode]] and [[ivfPqTopK]].
    */
  private def pqTrain(sample: Array[Array[Long]], subspaces: Int,
      codebookSize: Int, iters: Int): Array[Array[Array[Long]]] = {
    val dims = sample(0).length
    val subDim = dims / subspaces
    Array.tabulate(subspaces) { s =>
      val subs = sample.map(fullV => java.util.Arrays.copyOfRange(fullV, s * subDim, (s + 1) * subDim))
      var cents = subs.take(codebookSize).map(_.clone())
      // pad degenerate samples (< codebookSize points) by repeating
      while (cents.length < codebookSize) cents = cents ++ cents.take(codebookSize - cents.length)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(codebookSize, subDim)(0L)
        val counts = new Array[Long](codebookSize)
        subs.foreach { x =>
          val c = nearestCode(x, cents)
          counts(c) += 1
          var d = 0
          while (d < subDim) { sums(c)(d) += x(d); d += 1 }
        }
        cents = Array.tabulate(codebookSize) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(subDim)(d => java.lang.Math.floorDiv(sums(c)(d), counts(c)))
        }
        it += 1
      }
      cents
    }
  }

  /** Squared-L2 argmin over centroids, ties toward the lowest code. */
  private def nearestCode(x: Array[Long], cents: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0L
      var i = 0
      val ct = cents(c)
      while (i < x.length) { val diff = x(i) - ct(i); d += diff * diff; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Approximate top-k by asymmetric distance over PQ codes: the query keeps
    * its exact vector, the corpus side is scored through its quantized
    * reconstruction — dot(q, recon(x)) ≈ dot(q, x) at (subspaces ×
    * log₂ codebookSize) bits per stored vector instead of dims × 32. The
    * compression path that pairs with IVF cell pruning at corpus scale.
    */
  def pqTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      queryMaxId: Long,
      subspaces: Int = 8,
      codebookSize: Int = 16
  ): DataFrame = {
    val encoded = pqEncode(df, idCol, embCol, subspaces, codebookSize)
      .withColumn("rnrm", sqNorm(col("recon")))
      // an all-zero reconstruction (possible when every subspace floors to a
      // zero centroid) carries no signal AND would make the cosine 0/0 = NaN,
      // which Spark sorts ABOVE every real score — drop it, don't rank it
      .filter(col("rnrm") > 0)
    val q = withFixed(df.filter(col(idCol) < queryMaxId), idCol, embCol)
      .withColumnsRenamed(Map("id" -> "query_id", "iv" -> "qiv", "nrm" -> "qnrm"))
    val scored = encoded
      .join(broadcast(q), col("query_id") =!= col("id"))
      .withColumn("adot", dot(col("qiv"), col("recon")))
      .withColumn("acos", cosineFromFixed(col("adot"), col("qnrm"), col("rnrm")))
    // native heap top-k: per-query k best without sorting every scored row
    Relational
      .topKPerGroupNative(scored, Seq(col("query_id")),
        Seq(col("acos").desc, col("id").asc), k, rankCol = "rank")
      .select(col("query_id"), col("id").as("neighbor_id"), col("acos"), col("rank"))
  }

  /** IVF (inverted-file) approximate nearest neighbors — the scale path for
    * CLUSTERED embedding spaces, complementing the data-independent LSH of
    * [[annTopK]]: a spherical k-means coarse quantizer partitions the corpus
    * into `nlist` cells; each query scores only the members of its `nprobe`
    * closest cells, so scored pairs ≈ n²·nprobe/nlist instead of n².
    *
    * Determinism by construction (same rules as the rest of this module):
    * centroid seeds are the `nlist` vectors with the smallest xxhash64(id);
    * Lloyd updates use exact integer component sums (order-independent,
    * unlike float accumulation) with floor division; assignments break
    * cosine ties by cell id. Identical inputs give identical centroids on
    * any partitioning or cluster size.
    *
    * The per-iteration centroid collect is nlist×dims longs — index-build
    * metadata, same shape Spark's own runtime filters materialize. At corpus
    * scale, fit the quantizer on a deterministic sample (hash-order limit)
    * and assign the full corpus once.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int = 32,
      nprobe: Int = 8,
      iters: Int = 2,
      probeFilter: Column = lit(true)
  ): DataFrame = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // localCheckpoint, not persist+unpersist: the materialized blocks serve
    // the 2·iters+1 eager index-build passes AND the returned plan's two
    // uses (member assignment + probe side) — the previous unpersist-in-
    // finally made the final action recompute the scan + fixed-point twice
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(v, nlist, iters)
    searchIvf(v, cents, k, nprobe, probeFilter)
  }

  /** The IVF search path over an already-fixed corpus `v` and trained
    * centroids — shared by [[ivfTopK]] (train-on-self) and
    * [[ivfAppendTopK]] (train-on-old, search old ∪ new).
    */
  private def searchIvf(v: DataFrame, cents: Array[(Int, Array[Long])],
      k: Int, nprobe: Int, probeFilter: Column): DataFrame = {
    val spark = v.sparkSession
    val members = assignCells(v, cents)
    // each vector as query: rank cells, probe the top nprobe — through the
    // native heap top-k (no per-query sort of the nlist-wide cell scores)
    val probes = Relational.topKPerGroupNative(
        v.select(col("id").as("qid"), col("iv").as("qiv"), col("nrm").as("qnrm"))
          .filter(probeFilter)
          .crossJoin(broadcast(centDf(spark, cents)))
          .withColumn("ccos",
            cosineFromFixed(dot(col("qiv"), col("civ")), col("qnrm"), col("cnrm"))),
        Seq(col("qid")), Seq(col("ccos").desc, col("cell").asc), nprobe)
      .select(col("qid"), col("cell"), col("qiv"), col("qnrm"))
    val scored = probes
      .join(members, "cell")
      .filter(col("qid") =!= col("id"))
      .withColumn("dot", dot(col("qiv"), col("iv")))
      .withColumn("cosine", cosineFromFixed(col("dot"), col("qnrm"), col("nrm")))
    Relational
      .topKPerGroupNative(scored, Seq(col("qid")),
        Seq(col("cosine").desc, col("id").asc), k, rankCol = "rank")
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** INCREMENTAL IVF maintenance — the production append path: new vectors
    * are assigned into the EXISTING coarse quantizer (trained on the old
    * corpus only) and searched together with the old members; nothing is
    * re-trained and no old assignment moves. Rebuilding the quantizer on
    * every ingest would re-shuffle every cell (and at 100 TB re-encode the
    * corpus); appending costs exactly one assignment pass over the NEW
    * rows — the FAISS `add()` contract. Because [[trainIvf]] is
    * deterministic and cell assignment is a pure row-local function of
    * (vector, centroids), the append-built index is IDENTICAL to
    * re-assigning the merged corpus against the same old-trained centroids
    * — the invariant [[ivfAssign]] lets gates check rather than trust.
    * Recall on the merged corpus degrades only as far as the old-trained
    * centroids misfit the new distribution — the drift signal that tells a
    * production pipeline when a re-train is due (gated minima: q351).
    */
  def ivfAppendTopK(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int = 32,
      nprobe: Int = 8,
      iters: Int = 2,
      probeFilter: Column = lit(true)
  ): DataFrame = {
    val spark = oldDf.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val vOld = spread(withFixed(oldDf, idCol, embCol), col("id")).localCheckpoint()
    val vNew = spread(withFixed(newDf, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(vOld, nlist, iters)
    searchIvf(vOld.unionAll(vNew), cents, k, nprobe, probeFilter)
  }

  /** INCREMENTAL IVF maintenance, delete path — the tombstone contract
    * (FAISS `remove_ids`): removed vectors leave the posting lists (an
    * anti-join before search) and stop being queries, but the coarse
    * quantizer is NOT retrained — retraining on every delete would
    * re-shuffle every cell and re-assign the corpus, and (the subtler bug)
    * would silently MOVE surviving vectors between cells, invalidating any
    * cached assignment. Because centroids come from the full pre-removal
    * corpus and assignment is a pure row-local function, every surviving
    * vector keeps exactly the cell it had before the delete — the
    * invariant [[ivfRemoveAssign]] lets gates check cell-for-cell (q351's
    * device, pointed at deletes). Physical cleanup is a separate,
    * semantics-free step a pipeline schedules off [[ivfCellOccupancy]]'s
    * compaction flags.
    */
  def ivfRemoveTopK(
      df: DataFrame,
      removedIds: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int = 32,
      nprobe: Int = 8,
      iters: Int = 2,
      probeFilter: Column = lit(true)
  ): DataFrame = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(v, nlist, iters) // full-corpus quantizer: no retrain
    searchIvf(liveRows(v, removedIds), cents, k, nprobe, probeFilter)
  }

  /** The assignments [[ivfRemoveTopK]] actually searches: LIVE rows under
    * the FULL-corpus quantizer. A gate joins this against the pre-removal
    * assignments ([[ivfAssign]] self-trained) and asserts zero moved cells
    * — the check that fails loudly if the delete path ever starts
    * retraining on the survivor set.
    */
  def ivfRemoveAssign(
      df: DataFrame,
      removedIds: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = 32,
      iters: Int = 2
  ): DataFrame = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(v, nlist, iters)
    assignCells(liveRows(v, removedIds), cents).select(col("id"), col("cell"))
  }

  /** Per-cell occupancy accounting under tombstones: (cell, total, live,
    * live_frac, compact) with `compact` = live fraction below
    * `liveThreshold` — the trigger a production pipeline uses to schedule
    * the physical posting-list rewrite (compaction rewrites bytes, never
    * results: searches already exclude tombstones). Cells whose members
    * were ALL removed still appear (live = 0) — those are the first to
    * compact away.
    */
  def ivfCellOccupancy(
      df: DataFrame,
      removedIds: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = 32,
      iters: Int = 2,
      liveThreshold: Double = 0.5
  ): DataFrame = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(v, nlist, iters)
    // distinct: a tombstone FEED can log the same delete twice (re-deletes
    // are legal — the search path's left_anti is dup-safe), but a dup here
    // would multiply the joined row and overcount `total` while `live`
    // counts only rid-null rows — live_frac goes wrong and a cell can
    // cross the compaction threshold spuriously
    val rem = removedIds.select(col(removedIds.columns.head).cast("long").as("rid"))
      .distinct()
    assignCells(v, cents)
      .join(rem, col("id") === col("rid"), "left")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("total"),
        count(when(col("rid").isNull, 1)).as("live"))
      .withColumn("live_frac", col("live").cast("double") / col("total"))
      .withColumn("compact", col("live_frac") < lit(liveThreshold))
  }

  private def liveRows(v: DataFrame, removedIds: DataFrame): DataFrame = {
    val rem = removedIds.select(col(removedIds.columns.head).cast("long").as("id"))
    v.join(rem, Seq("id"), "left_anti")
  }

  /** Every surface the tombstone-delete gate audits, from ONE trained
    * quantizer: (top-k over the live corpus, pre-removal assignments of
    * ALL rows, post-removal assignments of the survivors, per-cell
    * occupancy). Semantically identical to calling [[ivfRemoveTopK]] +
    * [[ivfAssign]] + [[ivfRemoveAssign]] + [[ivfCellOccupancy]] — those
    * each train the SAME full-corpus quantizer (deterministic in
    * (corpus, nlist, iters)), so a gate that wants several surfaces paid
    * the identical k-means three or four times over (the round-9 review
    * finding); here the spread + checkpoint + train happen once.
    */
  def ivfRemoveAudit(
      df: DataFrame,
      removedIds: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int = 32,
      nprobe: Int = 8,
      iters: Int = 2,
      liveThreshold: Double = 0.5
  ): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(v, nlist, iters) // full-corpus quantizer: no retrain
    val live = liveRows(v, removedIds)
    val pre = assignCells(v, cents).select(col("id"), col("cell"))
    val post = assignCells(live, cents).select(col("id"), col("cell"))
    val rem = removedIds.select(col(removedIds.columns.head).cast("long").as("rid"))
      .distinct()
    val occupancy = assignCells(v, cents)
      .join(rem, col("id") === col("rid"), "left")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("total"),
        count(when(col("rid").isNull, 1)).as("live"))
      .withColumn("live_frac", col("live").cast("double") / col("total"))
      .withColumn("compact", col("live_frac") < lit(liveThreshold))
    (searchIvf(live, cents, k, nprobe, lit(true)), pre, post, occupancy)
  }

  /** Cell assignments of `assignDf` under a quantizer trained on `trainDf`
    * — (id, cell), the auditable surface of the IVF index. Lets a gate
    * state the append invariant as data: assignments of the old corpus are
    * bit-identical whether the index was built old-only or old-then-append
    * (same centroids, same pure assignment function).
    */
  def ivfAssign(
      trainDf: DataFrame,
      assignDf: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = 32,
      iters: Int = 2
  ): DataFrame = {
    val spark = trainDf.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val vT = spread(withFixed(trainDf, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(vT, nlist, iters)
    assignCells(spread(withFixed(assignDf, idCol, embCol), col("id")), cents)
      .select(col("id"), col("cell"))
  }

  private def centDf(spark: org.apache.spark.sql.SparkSession,
      cs: Array[(Int, Array[Long])]): DataFrame = {
    import spark.implicits._
    cs.map { case (c, arr) => (c, arr) }.toSeq.toDF("cell", "civ")
      .withColumn("cnrm", sqNorm(col("civ")))
  }

  /** Nearest-cell assignment under the cosine metric, argmax via max_by on
    * (ccos, −cell) — partial-aggregates map-side, ties toward the smallest
    * cell id. Shared by [[ivfTopK]] and [[ivfPqTopK]].
    */
  private def assignCells(v: DataFrame, cs: Array[(Int, Array[Long])]): DataFrame =
    v.crossJoin(broadcast(centDf(v.sparkSession, cs)))
      .withColumn("ccos", cosineFromFixed(dot(col("iv"), col("civ")), col("nrm"), col("cnrm")))
      .groupBy(col("id"))
      .agg(
        max_by(col("cell"), struct(col("ccos"), -col("cell"))).as("cell"),
        first(col("iv")).as("iv"),
        first(col("nrm")).as("nrm"))
      .select(col("id"), col("cell"), col("iv"), col("nrm"))

  /** Deterministic integer-Lloyd coarse quantizer: seeds are the `nlist`
    * vectors with the smallest (xxhash64(id), id); updates are exact
    * integer component sums with floor division (order-independent).
    * The per-iteration collect is nlist×dims longs — index-build metadata.
    */
  private def trainIvf(v: DataFrame, nlist: Int, iters: Int): Array[(Int, Array[Long])] = {
    var cents: Array[(Int, Array[Long])] = v
      .select(col("id"), col("iv"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(nlist)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toArray) }
    var it = 0
    while (it < iters) {
      val sums = assignCells(v, cents)
        .select(col("cell"), posexplode(col("iv")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.map { case (c, old) =>
        byCell.get(c) match {
          case Some(rows) =>
            val arr = old.clone()
            rows.foreach { r =>
              arr(r.getInt(1)) = java.lang.Math.floorDiv(r.getLong(2), r.getLong(3))
            }
            (c, arr)
          case None => (c, old) // empty cell keeps its centroid
        }
      }
      it += 1
    }
    cents
  }

  /** IVF-PQ composed ANN — the standard production index shape (Jégou,
    * Douze & Schmid, TPAMI 2011): the [[ivfTopK]] coarse quantizer prunes
    * the corpus to `nprobe` of `nlist` cells per query, and the stored
    * side inside each cell is compressed by [[pqEncode]]'s product
    * quantizer trained on the RESIDUALS x − centroid(cell(x)) — residuals
    * concentrate around 0, so the same codebook budget quantizes them with
    * far less error than raw vectors, which is why the composition (not
    * either half alone) is what FAISS ships as `IndexIVFPQ`. Scoring is
    * asymmetric: the query keeps its exact vector and meets the
    * reconstruction x̂ = centroid + recon(residual).
    *
    * Determinism: both trainers are the shared deterministic integer-Lloyd
    * helpers ([[trainIvf]], [[pqTrain]] on a (xxhash64(id), id)-ordered
    * sample); reconstruction sums are exact longs; ties break toward the
    * smallest id. Scale shape: the only collects are the codebooks
    * (bounded index-build metadata); the corpus is encoded
    * partition-parallel; per-query work is cells/nlist·nprobe of the
    * corpus through the native heap top-k. All-zero reconstructions are
    * dropped, not ranked (NaN cosine — the [[pqTopK]] rule).
    */
  def ivfPqTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      queryMaxId: Long,
      nlist: Int = 32,
      nprobe: Int = 8,
      ivfIters: Int = 1,
      subspaces: Int = 8,
      codebookSize: Int = 16,
      pqIters: Int = 5,
      sampleSize: Int = 4096
  ): DataFrame = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val v = spread(withFixed(df, idCol, embCol), col("id")).localCheckpoint()
    val cents = trainIvf(v, nlist, ivfIters)
    // residual per member: x − centroid(cell(x)) — exact long subtraction
    val withRes = assignCells(v, cents)
      .join(broadcast(centDf(spark, cents)), Seq("cell"))
      .select(col("id"), col("cell"), col("nrm"),
        zip_with(col("iv"), col("civ"), (a, b) => a - b).as("resid"), col("civ"))
      // the codebook sample collect and the encode pass both read it
      .localCheckpoint()
    val sample: Array[Array[Long]] = withRes
      .select(col("id"), col("resid"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    require(sample.nonEmpty, "ivfPqTopK: empty input")
    val dims = sample(0).length
    require(dims % subspaces == 0, s"dims $dims must divide into $subspaces subspaces")
    val subDim = dims / subspaces
    val codebooks = pqTrain(sample, subspaces, codebookSize, pqIters)
    // encode residuals + reconstruct x̂ = centroid + recon(residual),
    // partition-parallel (the pqEncode shape)
    val inSchema = withRes.schema
    val outSchema = org.apache.spark.sql.types.StructType(inSchema.fields :+
      org.apache.spark.sql.types.StructField("xhat",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val residIdx = inSchema.fieldIndex("resid")
    val civIdx = inSchema.fieldIndex("civ")
    val encoded = withRes.mapPartitions { rows =>
      rows.map { r =>
        val resid = r.getSeq[Long](residIdx).toArray
        val civ = r.getSeq[Long](civIdx).toArray
        val xhat = new Array[Long](dims)
        var s = 0
        while (s < subspaces) {
          val sub = java.util.Arrays.copyOfRange(resid, s * subDim, (s + 1) * subDim)
          val c = nearestCode(sub, codebooks(s))
          var d = 0
          while (d < subDim) {
            xhat(s * subDim + d) = civ(s * subDim + d) + codebooks(s)(c)(d)
            d += 1
          }
          s += 1
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ xhat.toSeq)
      }
    }(enc)
      .select(col("id"), col("cell"), col("xhat"))
      .withColumn("rnrm", sqNorm(col("xhat")))
      .filter(col("rnrm") > 0)
    // query side: exact vectors, IVF cell pruning, asymmetric cosine
    val probes = Relational.topKPerGroupNative(
        v.filter(col("id") < queryMaxId)
          .select(col("id").as("qid"), col("iv").as("qiv"), col("nrm").as("qnrm"))
          .crossJoin(broadcast(centDf(spark, cents)))
          .withColumn("ccos",
            cosineFromFixed(dot(col("qiv"), col("civ")), col("qnrm"), col("cnrm"))),
        Seq(col("qid")), Seq(col("ccos").desc, col("cell").asc), nprobe)
      .select(col("qid"), col("cell"), col("qiv"), col("qnrm"))
    val scored = probes
      .join(encoded, "cell")
      .filter(col("qid") =!= col("id"))
      .withColumn("adot", dot(col("qiv"), col("xhat")))
      .withColumn("acos", cosineFromFixed(col("adot"), col("qnrm"), col("rnrm")))
    Relational
      .topKPerGroupNative(scored, Seq(col("qid")),
        Seq(col("acos").desc, col("id").asc), k, rankCol = "rank")
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"), col("acos"), col("rank"))
  }
}
