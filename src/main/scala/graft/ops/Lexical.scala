package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted index for lexical (BM25) retrieval — the production
  * form of q358's corpus-scan scorer (round-10 task 5). A hybrid
  * retrieval arm over a 100 TB corpus does not re-tokenize the corpus per
  * query; it queries a PRE-BUILT index:
  *
  *  - '''postings''' — one row per (term, doc): `(bucket, tok, doc_id,
  *    tf, dl)`, stored `partitionBy(bucket)` with `bucket =
  *    crc32(tok) % B`. The bucket directory is the shard unit: a query
  *    filters `bucket IN (...)` (computed driver-side with the same
  *    CRC), so Spark's partition pruning drops every unqueried shard
  *    BEFORE listing files — at B=64 a 6-term query plans ≤6/64 of the
  *    index. Within a shard, rows are sorted by `tok`, so the `tok IN`
  *    predicate prunes row groups off parquet min/max stats and the
  *    residual scan is the queried terms' postings, nothing else.
  *    Document length `dl` is DENORMALIZED into each posting (the
  *    classic norm-carrying posting-list layout): scoring then needs NO
  *    join against a doc-length table — the only shuffle in a query is
  *    the final per-doc score aggregation over the matched postings.
  *  - '''totals''' — one row: `(t, n)` = corpus token and document
  *    counts, broadcast into the scorer.
  *
  * Scoring reproduces q358's exact scaled-integer BM25 (k1=1.2, b=0.75,
  * log-free Robertson odds idf) — every intermediate an exact BIGINT, so
  * the index path is gated by the property that it hash-matches the
  * corpus-scan form cell for cell (q360 vs the shared oracle). Term
  * document frequencies are derived from the filtered postings
  * themselves (a posting list IS the term's document set), not a stored
  * side table that could drift from it.
  *
  * Maintenance at scale: buckets are independent — [[appendToIndex]]
  * writes only the buckets the new terms hash into (the
  * [[graft.etl.Skipping.updateManifest]] discipline applied per-bucket)
  * and advances `totals` by the delta; gated by q375 (appended index
  * hash-matches a full rebuild) and the LexicalSpec touched-bucket count.
  * Index build is one tokenize + one groupBy + one bucket-partitioned
  * write: cost ∝ corpus, paid once, amortized over every query.
  */
object Lexical {

  val DefaultBuckets = 64
  private val MetaName = "_graft_lexmeta.json"

  /** The index records its OWN bucket count (round-11 review): an append
    * or query run with a mismatched `buckets` argument would hash terms
    * into shards the other side never reads — silently wrong scores, no
    * error anywhere (the same caller-drift class BloomIndex.bitsPerItem
    * closed). Writers stamp it; appenders and scorers prefer it over
    * their argument. Pre-meta indexes fall back to the caller's value.
    */
  private def hfs(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeMeta(spark: SparkSession, root: String, buckets: Int): Unit = {
    val (fs, p) = hfs(spark, root)
    fs.mkdirs(p)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, MetaName), true)
    try out.write(s"""{"buckets":$buckets}""".getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def readMeta(spark: SparkSession, root: String): Option[Int] = {
    val (fs, p) = hfs(spark, root)
    val mp = new org.apache.hadoop.fs.Path(p, MetaName)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      val txt = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
      "\"buckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    }
  }

  /** The bucket count THIS index was built with; the caller's argument
    * only applies to pre-meta indexes.
    */
  private def effectiveBuckets(spark: SparkSession, root: String, arg: Int): Int =
    readMeta(spark, root).getOrElse(arg)

  /** Tokenize `docs` and write the postings + totals tables under
    * `root`. One shuffle for the (doc, term) tf aggregation, one for the
    * per-doc length (reused via the join), one bucket-clustered write —
    * each bucket directory gets ONE well-sized file (repartition by
    * bucket), sorted by `tok` for row-group pruning.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                 root: String, buckets: Int = DefaultBuckets): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val postings = toks
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .withColumn("bucket", pmod(crc32(col("tok")), lit(buckets.toLong)).cast("int"))
    postings
      .repartition(col("bucket"))
      // bucket LEADS the sort: partitionBy requires ordering on the
      // partition column, and a (tok, doc_id)-only sort would make the
      // writer insert its OWN sort on bucket — a second full sort whose
      // stability the within-shard tok order (the row-group pruning
      // property) would silently depend on
      .sortWithinPartitions(col("bucket"), col("tok"), col("doc_id"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$root/postings")
    toks.agg(count(lit(1)).as("t"))
      .crossJoin(docs.agg(count(lit(1)).as("n")))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/totals")
    writeMeta(docs.sparkSession, root, buckets)
    ()
  }

  /** Incremental postings maintenance (round 11, the
    * [[graft.etl.Skipping.updateManifest]] discipline applied per
    * bucket): append NEW documents to an existing index, touching ONLY
    * the bucket directories their terms hash into. New postings land as
    * one additional tok-sorted file per touched bucket (cheaper even
    * than a rewrite — buckets are term-disjoint shards, so correctness
    * needs no merge with the resident file; per-file row-group pruning
    * still holds because every file is individually tok-sorted), and
    * `totals` is advanced by the delta. Untouched shards are never
    * listed, read, or written — cost ∝ the appended slice, the property
    * the spec proves by diffing bucket-directory file lists.
    *
    * Contract (same as the IVF index's append): `docs` carries FRESH
    * doc_ids — re-appending an indexed document would double its
    * postings, because a posting list is the term's document set.
    * Crash window, documented not hidden: postings commit before the
    * totals rewrite, so a crash between them leaves scores computed
    * against slightly-stale corpus totals until the append is re-run on
    * a fresh id range or the index rebuilt; it never loses or
    * duplicates postings that both steps committed.
    *
    * Returns the number of bucket directories written (< `buckets` for
    * any small append — the spec's proof of sub-linear maintenance).
    */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
                    root: String, buckets: Int = DefaultBuckets): Int = {
    val spark = docs.sparkSession
    // the INDEX's recorded layout wins over the argument: appending under
    // a different modulus would strand postings in shards queries never
    // read (silently wrong scores, the caller-drift class)
    val b = effectiveBuckets(spark, root, buckets)
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val postings = toks
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .withColumn("bucket", pmod(crc32(col("tok")), lit(b.toLong)).cast("int"))
      .localCheckpoint() // three consumers: write, touched set, token delta
    val touched = postings.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by `buckets`, never by data
    if (touched.nonEmpty) {
      postings
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket"), col("tok"), col("doc_id"))
        .write.partitionBy("bucket").mode("append").parquet(s"$root/postings")
    }
    // advance totals by the delta: token count from the appended postings
    // (Σ tf ≡ the slice's token count), doc count over ALL appended docs —
    // token-less documents still count toward n, as in buildIndex
    val deltaT = postings.agg(coalesce(sum(col("tf")), lit(0L))).head.getLong(0)
    val deltaN = docs.count()
    val old = spark.read.parquet(s"$root/totals").select(col("t"), col("n")).head
    import spark.implicits._
    Seq((old.getLong(0) + deltaT, old.getLong(1) + deltaN)).toDF("t", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/totals")
    touched.size
  }

  /** The driver-side twin of the build's `crc32(tok) % buckets` —
    * java.util.zip.CRC32 and Spark's `crc32` share the polynomial and
    * the UTF-8 byte view, so the shard set can be computed without a
    * Spark job (and without scanning any unqueried shard).
    */
  private[graft] def bucketOf(term: String, buckets: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (c.getValue % buckets).toInt
  }

  /** Score `terms` against the index at `root`: shard-pruned postings
    * read → broadcast df/totals → exact-integer BM25 → top-k via
    * orderBy+limit (TakeOrderedAndProject — distributed, no
    * single-reducer window over the score table). Integer arithmetic
    * identical to the q358 scan form; see that site for the (t, N)
    * validity bound.
    */
  def scoreBM25(spark: SparkSession, root: String, terms: Seq[String],
                k: Int, buckets: Int = DefaultBuckets): DataFrame = {
    val shardIds = terms.map(bucketOf(_, effectiveBuckets(spark, root, buckets))).distinct
    val post = spark.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(shardIds: _*) && col("tok").isin(terms: _*))
    val dfreq = post.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val totals = spark.read.parquet(s"$root/totals")
    post
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(totals))
      .withColumn("w_scaled",
        expr("(22 * tf * t * 1000) DIV (10 * t * tf + 3 * t + 9 * dl * n)"))
      .withColumn("idf_scaled",
        expr("((2 * (n - df) + 1) * 1000) DIV (2 * df + 1)"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("idf_scaled * w_scaled")).as("score"),
        count(lit(1)).as("n_hit"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("n_hit"), col("score"), col("rank"))
      .orderBy(col("rank"))
  }

  /** Length-normalized TF-IDF (vector-space model) scoring over the SAME
    * persisted index — the second arm of hybrid retrieval. One index
    * serves both ranking models: postings already carry (tf, dl), df is
    * the posting-list length, so the VSM arm costs the same shard-pruned
    * read plus its own integer arithmetic. Unlike BM25 there is no tf
    * saturation and idf is the plain log-free `N/df` ratio, so the two
    * models genuinely disagree on ordering — which is what makes fusing
    * them ([[graft.ops.Relational.rrfFuse]], the q363 gate) informative.
    *
    * All-integer: `idf_scaled = (n·1000) DIV df`,
    * `w = (tf · idf_scaled · 1000) DIV dl`, score = Σw. Bounds: tf ≤ dl,
    * idf_scaled ≤ n·1000, so each term ≤ tf·n·10⁶ — safe in BIGINT to
    * n·tf ~ 10¹², far past any ladder rung.
    */
  def scoreTfIdfNorm(spark: SparkSession, root: String, terms: Seq[String],
                     k: Int, buckets: Int = DefaultBuckets): DataFrame = {
    val shardIds = terms.map(bucketOf(_, effectiveBuckets(spark, root, buckets))).distinct
    val post = spark.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(shardIds: _*) && col("tok").isin(terms: _*))
    val dfreq = post.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val totals = spark.read.parquet(s"$root/totals").select(col("n"))
    post
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(totals))
      .withColumn("w", expr("(tf * ((n * 1000) DIV df) * 1000) DIV dl"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_hit"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("n_hit"), col("score"), col("rank"))
      .orderBy(col("rank"))
  }
}
