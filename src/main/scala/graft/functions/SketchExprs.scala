package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions: one tight loop per row instead of
  * `numHashes × tokens` interpreted lambda calls (the higher-order-function
  * forms cost ~10 s for 5k docs × 96 hashes at sf0.1; these run in ~0.3 s).
  */

/** MinHash signature of a string array: for each of `numHashes` functions
  * h_i(t) = (a_i·(xxh64(t) mod p) + b_i) mod p with p = 2³¹−1, the minimum
  * over the array. The mod-p reduction is load-bearing: WITHOUT it every
  * lane is a monotone function of the same token hash, all lanes share one
  * argmin token, and the "independent" signature degenerates to a single
  * min-hash (collision probability J instead of the banding S-curve).
  * Token hash is computed once per token, all lanes updated in one pass.
  * NULL array elements are skipped. Matches
  * [[graft.ops.Dedup.minHashSignature]] semantics.
  *
  * The (a_i, b_i) MUST be strong pseudo-random draws (SplitMix64 below),
  * not a cheap sequence. Round-10 post-mortem: the original
  * `a_i = 2(seed+i)+1` gave 96 lanes the CONSECUTIVE ODD multipliers
  * 85..275 — so small that `a_i·x mod p` barely wraps for small token
  * hashes and the lanes largely shared one argmin token, i.e. partially
  * the very degeneracy the mod-p reduction exists to prevent. Every
  * gate stayed green (the exact verify hides candidate-recall holes
  * whenever recall HAPPENS to be 1.0 at the tested corpus), but the
  * scale ladder's replica-proportionality invariant caught it: at 100×
  * inflation, 25 true ≥0.95 pairs went un-candidated, ALL clustered in
  * two replicas (correlated lanes miss together, per-corpus, not
  * per-pair) — components/replica drifted 2822.00 → 2822.12 → 2822.47
  * across 30×/100×/300×. With SplitMix64 coefficients the miss rate is
  * the textbook (1−s^r)^b ≈ 6e-10 per pair at s = 0.95 and the drift is
  * gone (re-measured at 100×: 204 900 = 2049×100 edges exactly).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = 2147483647L // 2^31 - 1, prime
  // SplitMix64 — the standard 64-bit finalizer-style PRNG; deterministic
  // in (seed, lane), full-avalanche, so lane coefficients are independent
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  // a_i ∈ [1, P-1]: a zero multiplier would make that lane a constant
  private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(mix64(seed * 0x632BE59BD9B4E019L + 2L * i), P - 1) + 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(mix64(seed * 0x632BE59BD9B4E019L + 2L * i + 1L), P))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h31 = java.lang.Math.floorMod(h, P)
        var i = 0
        while (i < numHashes) {
          val cand = java.lang.Math.floorMod(as(i) * h31 + bs(i), P)
          if (cand < mins(i)) mins(i) = cand
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane sign bits of a fixed-point long vector: bit p of the
  * result is the sign of ∑_d ±iv[d], with the ± per (plane, dim) derived from
  * xxh64. One pass over the vector per row for all planes.
  */
case class RandomProjectionBits(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 64, s"planes must be in [1, 64], got $planes")

  override def dataType: DataType = LongType

  // the ±1 sign matrix depends only on (planes, seed, dim) — cache it per
  // executor instead of recomputing planes×dims hashes on every row.
  // @volatile: the reference write publishes the filled arrays to any other
  // thread evaluating this (deserialized) instance concurrently.
  @transient @volatile private var signs: Array[Array[Boolean]] = _

  private def signMatrix(dims: Int): Array[Array[Boolean]] = {
    if (signs == null || signs(0).length < dims) {
      signs = Array.tabulate(planes) { p =>
        Array.tabulate(dims) { d =>
          (XXH64.hashLong((p.toLong << 32) | (d.toLong & 0xffffffffL), seed) & 1L) == 1L
        }
      }
    }
    signs
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = signMatrix(n)
    val acc = new Array[Long](planes)
    var d = 0
    while (d < n) {
      val x = arr.getLong(d)
      var p = 0
      while (p < planes) {
        if (m(p)(d)) acc(p) += x else acc(p) -= x
        p += 1
      }
      d += 1
    }
    var bits = 0L
    var p = 0
    while (p < planes) {
      if (acc(p) >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cross-engine per-token hash: bytes 8..15 of the MD5 digest, big-endian.
  * MD5 is the ONE hash both Spark and DuckDB expose with identical results
  * (`md5()` hex strings match byte for byte), which makes every sketch built
  * on it expressible as a DuckDB oracle — the hex-string slice
  * `substr(md5(t), 17, 16)` parses to exactly this value. xxhash64 (Spark's
  * native choice) has no DuckDB counterpart, which is what kept the
  * simhash/fingerprint queries un-gateable in rounds 1–3.
  */
private[functions] object Md5TokenHash {
  // MessageDigest is stateful and not thread-safe; in local[n] the same
  // (deserialized) expression instance can be evaluated by many task threads
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Big-endian long from digest bytes 8..15 of md5(UTF-8 bytes). */
  def low64(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 8
    while (i < 16) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Digest bytes 12..15 big-endian as an UNSIGNED 32-bit value in a long —
    * always non-negative, so `% p` agrees with DuckDB's
    * `('0x' || substr(md5(t), 25, 8))::BIGINT % p` (a signed-64 floorMod of
    * [[low64]] would not: 2⁶⁴ is not a multiple of p).
    */
  def low32(s: UTF8String): Long = low64(s) & 0xffffffffL
}

/** 64-bit SimHash of a string-array token bag in one pass: per token
  * occurrence, bit i votes +1/−1 by bit i of the token's [[Md5TokenHash]];
  * output bit i is set iff its vote sum is strictly positive. Bag semantics
  * (multiplicities vote), order-independent. The MD5 hash basis makes the
  * whole sketch DuckDB-expressible, so q25 hash-matches a SQL oracle that
  * recomputes it from scratch. NULL tokens are skipped (no vote); a NULL
  * array sketches to 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = Md5TokenHash.low64(arr.getUTF8String(t))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) bits |= (1L << i)
      i += 1
    }
    bits
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Rolling (Rabin–Karp) fingerprint of a token array: every `k`-token window
  * is hashed with the polynomial H = Σ h(tᵢ)·B^(k-1-i) mod p (B = 31,
  * p = 2³¹−1, h = [[Md5TokenHash.low32]] mod p) and the MINIMUM window hash is the
  * fingerprint (winnowing-lite — identical token sequences fingerprint
  * identically, and any shared k-window bounds the min). Arrays shorter than
  * `k` hash their full token list; empty/NULL → 0L.
  *
  * Genuinely rolling: each window derives from the previous in O(1) via
  * H' = (H − h(t_out)·B^(k-1))·B + h(t_in) mod p — one pass over the tokens,
  * unlike the HOF `transform(sequence, i -> aggregate(slice(...)))` form this
  * replaces, which re-folded every window from scratch (O(n·k) lambda
  * dispatches per row). Mod-p arithmetic (not mod 2⁶⁴) keeps every
  * intermediate < 2³⁶, so the SAME computation runs in DuckDB SQL
  * (list_reduce over md5-derived hashes) — the q26 oracle.
  */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"window must be >= 1 token, got $k")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private val P = 2147483647L // 2^31 − 1, prime
  private val B = 31L
  // B^(k-1) mod p, for the O(1) roll-out of the leaving token
  private lazy val Bk: Long = {
    var r = 1L
    var i = 1
    while (i < k) { r = r * B % P; i += 1 }
    r
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = if (arr.isNullAt(i)) 0L
        else Md5TokenHash.low32(arr.getUTF8String(i)) % P
      i += 1
    }
    val w = math.min(k, n)
    // first window: plain left fold
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + hs(i)) % P; i += 1 }
    var min = h
    // roll: drop hs(j-w), admit hs(j)
    var j = w
    while (j < n) {
      h = java.lang.Math.floorMod((h - hs(j - w) * Bk % P) * B + hs(j), P)
      if (h < min) min = h
      j += 1
    }
    min
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SketchFunctions {

  /** Expression builders shared by the runtime-registry and
    * SparkSessionExtensions registration routes.
    */
  val minHashBuilder: Seq[Expression] => Expression =
    exprs => MinHashSignature(exprs(0), intLit(exprs(1), "numHashes"), longLit(exprs(2), "seed"))
  val projBitsBuilder: Seq[Expression] => Expression =
    exprs => RandomProjectionBits(exprs(0), intLit(exprs(1), "planes"), longLit(exprs(2), "seed"))
  val simHashBuilder: Seq[Expression] => Expression =
    exprs => SimHash64(exprs(0))
  val fingerprintBuilder: Seq[Expression] => Expression =
    exprs => RollingFingerprint(exprs(0), intLit(exprs(1), "k"))

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }

  /** Registered from [[GraftFunctions.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash", minHashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_projbits", projBitsBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_simhash", simHashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint", fingerprintBuilder, "built-in")
  }
}
