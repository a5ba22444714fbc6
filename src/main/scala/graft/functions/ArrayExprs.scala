package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot inner loops of the similarity and
  * dedup operators. The composable `aggregate`/`zip_with` higher-order
  * function forms are semantically identical but evaluate one lambda call per
  * element per row — at millions of candidate pairs × 64 dims that interpreter
  * overhead dominates the query. These expressions run the loop in one tight
  * JVM method per row instead (≈20× faster in the q24/q28/q29 benches).
  *
  * Registered under `graft_*` SQL names via [[GraftFunctions.register]]; use
  * the `Column` helpers below from the DataFrame API.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // can return NULL on mismatched dims even for non-null inputs — without
  // this override NullPropagation would constant-fold IsNull checks away
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // mismatched dims → NULL, never a silently-truncated plausible dot product
    // (a single malformed embedding row would otherwise skew top-k results)
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All dot products of one fixed-point vector against a PANEL of vectors in
  * a single call: returns `array<long>` aligned with the panel index.
  * Replaces a panel-sized broadcast join plus one interpreted dot per joined
  * row — the panel×dims loop runs inside one JVM call per corpus row, and
  * the join fanout materializes only the output longs, never copies of the
  * input arrays. The panel side is a constant literal in every intended use,
  * so its nested ArrayData unwraps ONCE per task (lazy cache) instead of per
  * row. NULL on any dim mismatch (same contract as [[LongArrayDot]]).
  */
case class LongArrayPanelDots(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val cachedPanel: Array[Array[Long]] = {
    val pd = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(pd.numElements())(j => pd.getArray(j).toLongArray())
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val panel =
      if (right.foldable) cachedPanel
      else {
        val pd = b.asInstanceOf[ArrayData]
        Array.tabulate(pd.numElements())(j => pd.getArray(j).toLongArray())
      }
    val out = new Array[Long](panel.length)
    var j = 0
    while (j < panel.length) {
      val q = panel(j)
      if (q.length != x.length) return null
      var acc = 0L
      var i = 0
      while (i < x.length) { acc += x(i) * q(i); i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class LongArraySqNorm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  // right is ignored (kept binary for registry simplicity when unused) —
  // see GraftFunctions.sq_norm which passes the same child twice.
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getLong(i); acc += v * v; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared trim + linear-merge kernels for the sorted-distinct-array
  * expressions below: one implementation of the null-trim and merge logic
  * per element type, so a fix applies everywhere at once. Each returns
  * (intersection, trimmed |x|, trimmed |y|).
  */
private[functions] object SortedMerge {
  def stringMerge(x: ArrayData, y: ArrayData): (Int, Int, Int) = {
    var nx = x.numElements()
    var ny = y.numElements()
    // null elements sort to the end under array_sort - trim them off
    while (nx > 0 && x.isNullAt(nx - 1)) nx -= 1
    while (ny > 0 && y.isNullAt(ny - 1)) ny -= 1
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    (inter, nx, ny)
  }

  def longMerge(x: ArrayData, y: ArrayData): (Int, Int, Int) = {
    var nx = x.numElements()
    var ny = y.numElements()
    while (nx > 0 && x.isNullAt(nx - 1)) nx -= 1
    while (ny > 0 && y.isNullAt(ny - 1)) ny -= 1
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    (inter, nx, ny)
  }

  def jaccard(inter: Int, nx: Int, ny: Int): Double = {
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }
}

/** Jaccard similarity of two SORTED, DISTINCT string arrays via linear merge —
  * no per-element set allocation, no lambda dispatch. NULL elements (which
  * `array_sort` places last) are ignored on both sides.
  */
case class SortedStringArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (inter, nx, ny) =
      SortedMerge.stringMerge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    SortedMerge.jaccard(inter, nx, ny)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaccard similarity of two SORTED, DISTINCT long arrays via linear merge.
  * Used with per-token 64-bit hashes: jaccard over token hashes equals
  * jaccard over tokens unless xxh64 collides (negligible), and the long merge
  * is ~10× cheaper than UTF8 comparisons at millions of candidate pairs.
  */
case class SortedLongArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (inter, nx, ny) =
      SortedMerge.longMerge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    SortedMerge.jaccard(inter, nx, ny)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Intersection cardinality of two SORTED, DISTINCT long arrays via linear
  * merge — the hashed-shingle fast path of containment scoring (pair with
  * xxhash64-mapped shingles the way [[SortedLongArrayJaccard]] is used:
  * long compares are ~10× cheaper than UTF8 compares at millions of pairs).
  */
case class SortedLongArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedMerge.longMerge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])._1
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Intersection cardinality of two SORTED, DISTINCT string arrays via linear
  * merge — the building block of ASYMMETRIC containment scoring
  * (|A∩B|/|A|, Broder's containment), which detects a document embedded
  * inside a larger one where symmetric Jaccard scores low. NULL elements
  * (sorted last) are ignored on both sides.
  */
case class SortedStringArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedMerge.stringMerge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])._1
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Count of elements of a string array contained in a constant string set.
  * The right child must be foldable (an array literal); it is evaluated once
  * and cached as a hash set — the `size(filter(toks, array_contains(...)))`
  * form pays a lambda dispatch per token instead.
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "the second argument of graft_count_in_set must be a constant array " +
          "(it is evaluated once and cached as a hash set)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var i = 0
    var n = 0
    while (i < x.numElements()) {
      if (set.contains(x.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Word n-grams of a token array in one pass: n consecutive tokens joined by
  * a single space, `size - n + 1` grams (empty array when the text is too
  * short). Equals `transform(sequence(1, size-n+1), i -> array_join(slice(
  * toks, i, n), ' '))` but without the per-gram lambda dispatch, sequence
  * materialization, and slice copies — the gram construction is the hot loop
  * of every shingle-based query (boilerplate mining, contamination, shingle
  * jaccard, bigram LM).
  */
case class TokenNGrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
    left.dataType match {
      case ArrayType(StringType, _) =>
        if (right.dataType != IntegerType || !right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "the second argument of graft_ngrams must be a constant INT n")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"the first argument of graft_ngrams must be array<string>, got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = b.asInstanceOf[Int]
    val m = toks.numElements()
    if (n <= 0 || m < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Character n-grams of a string as a native expression — the char-mode
  * sibling of [[TokenNGrams]]. The HOF form
  * `transform(sequence(1, length(s)-2), i -> substring(s, i, 3))` pays a
  * lambda dispatch + codepoint re-scan per gram (the exact shape the repo's
  * §8.4#6 rule bans from hot loops, measured 2–5× slower); this computes
  * the grams in one pass: one scan records each character's byte offset,
  * then every gram is a zero-rescan byte-slice. Codepoint-indexed like SQL
  * `substring`, so multi-byte text grams identically to the HOF form.
  * NULL-propagating; empty array when the string has fewer than n chars.
  */
case class CharNGrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{IntegerType, StringType}
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"the first argument of graft_char_ngrams must be string, got ${left.dataType}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "the second argument of graft_char_ngrams must be a constant INT n")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val n = b.asInstanceOf[Int]
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes
    val nBytes = bytes.length
    // one pass over the bytes: offs(c) = byte offset of the c-th character
    val offs = new Array[Int](nBytes + 1)
    var i = 0
    var c = 0
    while (i < nBytes) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(c) = nBytes
    if (c < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c - n + 1)
    var k = 0
    while (k <= c - n) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + n) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unicode NFC normalization (canonical composition) as a native
  * expression — Spark has no built-in normalizer, and a corpus-quality
  * pipeline needs one: decomposed sequences (e + COMBINING ACUTE) and
  * their precomposed forms (é) are byte-different but canonically equal,
  * which silently splits token statistics, dedup grams, and tokenizer
  * vocabularies. Wraps `java.text.Normalizer` (ICU-equivalent for NFC);
  * `text = graft_nfc(text)` is the standard "is already normalized"
  * audit. Row-local, NULL-propagating.
  */
case class UnicodeNfc(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GraftFunctions {

  /** Idempotently register the graft_* functions on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_ngrams", exprs => TokenNGrams(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_long_dot", exprs => LongArrayDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sq_norm", exprs => LongArraySqNorm(exprs(0), exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_panel_dots", exprs => LongArrayPanelDots(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sorted_jaccard", exprs => SortedStringArrayJaccard(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sorted_intersect",
      exprs => SortedStringArrayIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sorted_long_intersect",
      exprs => SortedLongArrayIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_count_in_set", exprs => CountInSet(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sorted_long_jaccard", exprs => SortedLongArrayJaccard(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_char_ngrams", exprs => CharNGrams(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nfc", exprs => UnicodeNfc(exprs(0)), "built-in")
    // Spark's internal Bloom-filter expressions (runtime-filter machinery),
    // exposed for sketch-based semi-join pruning (ops.Sketches)
    reg.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    SketchFunctions.register(spark)
  }

  def longDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_long_dot", a, b)
  }
  def sqNorm(spark: SparkSession, a: Column): Column = {
    register(spark); call_function("graft_sq_norm", a)
  }
  def sortedJaccard(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_sorted_jaccard", a, b)
  }
}
