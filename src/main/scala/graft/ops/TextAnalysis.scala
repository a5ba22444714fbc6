package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, and document
  * fingerprinting. All pure `Column` expression trees (no UDFs) — row-local,
  * shuffle-free, and safe to run as a single map pass over a 100 TB corpus.
  *
  * Determinism notes (for the DuckDB oracle): counts are exact integers;
  * ratios are single IEEE double divisions of those integers — bit-identical
  * across engines. Regex classes are written in the ASCII subset that RE2
  * (DuckDB) and java.util.regex (Spark) interpret identically.
  */
object TextAnalysis {

  /** Whitespace tokens of a trimmed text; empty OR NULL text → empty array
    * (never NULL — under the pinned ANSI-off sessions `size(NULL)` is -1,
    * which would poison every downstream count/ratio/jaccard). Empty-string
    * tokens are filtered out: trim strips only 0x20, so text bracketed by
    * other whitespace (e.g. a trailing "\t") yields boundary empties — Spark's
    * `split` uses limit -1, which KEEPS trailing empties (it is Java's
    * default-limit split that drops them), and DuckDB's string_split_regex
    * keeps them too, so the filter (mirrored as list_filter in every oracle)
    * pins identical treatment of leading AND trailing empties on both
    * engines.
    */
  def tokens(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(filter(split(trim(text), "\\s+"), t => t =!= ""))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric glyphs — the usual byte-pair-encoding pre-split shape.
    * ASCII classes only so Spark and RE2 agree.
    */
  def bpeishTokens(text: Column): Column =
    when(text.isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"), lit(0)))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** ASCII punctuation count (by deletion length — avoids regex count
    * function dialect differences).
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  /** Number of tokens that appear in `words` (duplicates counted — this is a
    * per-token membership filter, not a set intersection). Native hash-set
    * expression (graft_count_in_set).
    */
  def wordHits(text: Column, words: Seq[String]): Column =
    wordHitsTokens(tokens(text), words)

  /** [[wordHits]] over an existing token-array column. */
  def wordHitsTokens(toks: Column, words: Seq[String]): Column =
    call_function("graft_count_in_set", toks, array(words.map(lit): _*))

  val EnStopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for")
  val EsStopwords = Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por")
  val DeStopwords = Seq("der", "die", "das", "und", "ist", "von", "ein", "mit", "zu", "den")
  val FrStopwords = Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "que")

  /** Length/punctuation/stopword quality heuristics, as (name, column)
    * pairs: char/token counts plus punctuation ratio, stopword ratio, and
    * mean word length (higher stopword ratio + moderate word length =
    * more natural-language-like).
    */
  def stats(text: Column): Seq[(String, Column)] = statsTokens(text, tokens(text))

  /** [[stats]] with a shared token-array column. Reference the token array
    * from a PRIOR projection (multi-referenced non-trivial aliases are not
    * inlined by CollapseProject), so the tokenization runs once per row, not
    * once per stat.
    */
  def statsTokens(text: Column, toks: Column): Seq[(String, Column)] = {
    val nTok = size(toks)
    val nChar = length(text)
    val nCharNoWs = length(regexp_replace(text, "[ \\t\\n\\r]+", ""))
    val nPunct = punctCount(text)
    val nStop = wordHitsTokens(toks, EnStopwords)
    Seq(
      "n_chars" -> nChar,
      "n_tokens" -> nTok,
      "punct_ratio" -> when(nChar > 0, nPunct.cast("double") / nChar.cast("double")).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nTok > 0, nStop.cast("double") / nTok.cast("double")).otherwise(lit(0.0)),
      "mean_word_len" -> when(nTok > 0, nCharNoWs.cast("double") / nTok.cast("double")).otherwise(lit(0.0))
    )
  }

  /** Heuristic language ID: CJK characters ⇒ zh, else argmax of per-language
    * stopword hits with a fixed tie-break priority (en > es > de > fr, then
    * und for all-zero). Deterministic cascade — the oracle mirrors it exactly.
    */
  def langId(text: Column): Column = langIdTokens(text, tokens(text))

  /** [[langId]] with a shared token-array column (see [[statsTokens]]). */
  def langIdTokens(text: Column, toks: Column): Column = {
    val cjk = length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))
    val en = wordHitsTokens(toks, EnStopwords)
    val es = wordHitsTokens(toks, EsStopwords)
    val de = wordHitsTokens(toks, DeStopwords)
    val fr = wordHitsTokens(toks, FrStopwords)
    when(cjk > 0, lit("zh"))
      .when(en >= es && en >= de && en >= fr && en > 0, lit("en"))
      .when(es >= de && es >= fr && es > 0, lit("es"))
      .when(de >= fr && de > 0, lit("de"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("und"))
  }

  /** Within-document n-gram repetition: 1 − distinct(n-grams)/total(n-grams).
    * High values flag the repetitive boilerplate/spam that training pipelines
    * filter out. Row-local; exact int counts → deterministic double ratio.
    */
  /** Space-joined token n-grams of a text column (empty array when the text
    * has fewer than n tokens). The shared shingle primitive for repetition
    * scoring, cross-document boilerplate mining, and contamination checks.
    * Column-level helper — requires graft function registration on the
    * session (`GraftFunctions.register(spark)` or the GraftExtensions conf);
    * DataFrame-level ops (Dedup/Similarity/Sketches) register it themselves,
    * but a bare `df.select(TextAnalysis.ngrams(...))` on a fresh session
    * resolves only after registration.
    */
  def ngrams(text: Column, n: Int): Column =
    // native one-pass gram construction (graft.functions.TokenNGrams): the
    // HOF form (transform over a sequence of slice+array_join) pays a lambda
    // dispatch + array copy per gram and dominated every shingle query
    call_function("graft_ngrams", tokens(text), lit(n))

  /** Character n-grams of a text column (empty array below n chars) — the
    * char-mode sibling of [[ngrams]], same registration caveat. Native
    * one-pass construction (graft.functions.CharNGrams); the HOF
    * `transform(sequence(...), i -> substring(s, i, n))` shape is banned
    * from hot loops by measurement (§8.4#6, re-measured on q345).
    */
  def charNgrams(text: Column, n: Int): Column =
    call_function("graft_char_ngrams", text, lit(n))

  def ngramRepetition(text: Column, n: Int = 2): Column = {
    val grams = ngrams(text, n)
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** PII redaction: mask email addresses, bare URLs, and long digit runs
    * (phone/account numbers) with type tags. ASCII regexes that RE2 and Java
    * interpret identically; chained `regexp_replace` — one codegen'd pass.
    */
  def redactPII(text: Column): Column = {
    val email = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^ \\t\\n\\r]+", "<URL>")
    regexp_replace(url, "[0-9][0-9 ()+.-]{6,}[0-9]", "<NUMBER>")
  }

  /** Rolling polynomial hash fingerprint: hash every `k`-token window with a
    * Rabin-Karp polynomial over per-token MD5-derived hashes mod 2³¹−1, keep
    * the minimum (winnowing-lite). Identical token sequences ⇒ identical
    * fingerprints; row-local, no shuffle. Native one-pass O(1)-roll
    * expression ([[graft.functions.RollingFingerprint]]) — the HOF
    * transform-over-slices form it replaced re-folded every window from
    * scratch. MD5 hash basis ⇒ the exact value is recomputable in DuckDB
    * SQL, which is what gates q26. Requires graft function registration
    * (GraftFunctions.register or the GraftExtensions conf).
    */
  def rollingFingerprint(text: Column, k: Int = 4): Column =
    call_function("graft_fingerprint", tokens(text), lit(k))

  /** Char-TRIGRAM language identification (Cavnar & Trenkle 1994's
    * out-of-place rank distance), the profile-based upgrade over
    * [[langId]]'s stopword panel — trigram statistics survive short
    * strings, misspellings, and missing function words. Training and
    * classification both run inside this operator from the corpus's own
    * labels: an 80/20 md5-bucket split (engine-neutral — the q44 device)
    * trains per-language profiles (top `profileSize` trigrams ranked by
    * (count DESC, trigram ASC)) and classifies the held-out docs by
    * arg-min over Σ out-of-place distances (|doc rank − profile rank|,
    * missing → `profileSize` penalty; ties → language ASC). Everything is
    * exact integer counts and ranks, so the full prediction table
    * hash-gates against a DuckDB twin.
    *
    * Scale shape: trigram extraction is a row-local explode; doc-level
    * counts are one (doc, trigram) groupBy with map-side combine; the
    * per-doc top-`docTop` goes through the native heap top-k (no per-doc
    * window sort); profiles are dictionary-bounded (languages ×
    * ≤ profileSize rows — the ≤27³ trigram space caps the train groupBy)
    * and BROADCAST into the distance join, so the only corpus-scaled
    * shuffles are the two counting aggregates.
    *
    * Output: (doc_id, actual, pred) for every held-out doc; docs with no
    * trigrams (or an empty profile table) predict "und".
    */
  def trigramLangId(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, profileSize: Int = 200, docTop: Int = 50): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      coalesce(col(langCol), lit("und")).as("lang"),
      regexp_replace(lower(col(textCol)), "[^a-z ]", "").as("s"),
      (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 5).as("bucket"))
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tris = base.select(col("doc_id"), col("lang"), col("bucket"),
      explode(charNgrams(col("s"), 3)).as("tri"))
    val wProf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("c").desc, col("tri").asc)
    val prof = tris.filter(col("bucket") < 4)
      .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("c"))
      .withColumn("pr", row_number().over(wProf))
      .filter(col("pr") <= profileSize)
      .select(col("lang"), col("tri"), col("pr"))
      // dictionary-bounded (languages × profileSize): the distance join and
      // the language list both read it
      .localCheckpoint()
    val dtop = Relational.topKPerGroupNative(
        tris.filter(col("bucket") === 4)
          .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("c")),
        Seq(col("doc_id")), Seq(col("c").desc, col("tri").asc), docTop, rankCol = "dr")
      .select(col("doc_id"), col("tri"), col("dr"))
    val langs = prof.select(col("lang")).distinct()
    val dist = dtop
      .crossJoin(broadcast(langs))
      .join(broadcast(prof.withColumnsRenamed(Map("lang" -> "plang", "tri" -> "ptri"))),
        col("plang") === col("lang") && col("ptri") === col("tri"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(coalesce(abs(col("dr") - col("pr")),
        lit(profileSize.toLong))).as("dist"))
    val pred = dist.groupBy(col("doc_id"))
      .agg(min_by(col("lang"), struct(col("dist"), col("lang"))).as("pred"))
    base.filter(col("bucket") === 4)
      .select(col("doc_id"), col("lang").as("actual"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"), col("actual"), coalesce(col("pred"), lit("und")).as("pred"))
  }
}
