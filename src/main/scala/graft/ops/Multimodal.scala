package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, exactly like a production
  * training-data pipeline stores them next to text. The Spark-side machinery
  * (schema, batch shape, partition-parallel decode) is real and tested, and
  * [[decodeMedia]] is a REAL dependency-free header decoder for BMP and WAV
  * payloads — richer codecs (JPEG/PNG/MP4 via JNI or javax.imageio) slot into
  * the same `mapPartitions` shape without touching the plumbing.
  */
object Multimodal {

  /** Schema of the decoded-metadata struct [[decodeMedia]] produces. Fields
    * not applicable to a format (e.g. sample_rate for an image) are NULL.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bpp", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType)
  ))

  /** Wrap any blob column with standard media metadata (content hash, size,
    * declared mime) — the cheap, expression-only pass that runs at ingest.
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(binCol)).as("n_bytes"),
      sha2(col(binCol), 256).as("sha256"),
      lit("application/octet-stream").as("mime")
    ))

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Parse one payload's container header. Returns a [[mediaSchema]]-shaped
    * Row; malformed/truncated/unknown payloads decode as format "unknown"
    * with NULL fields (never throws — corrupt blobs are data, not errors).
    */
  private[ops] def parseHeader(bytes: Array[Byte]): Row = {
    def unknown = Row("unknown", null, null, null, null, null, null)
    if (bytes == null || bytes.length < 12) unknown
    // BMP: "BM", BITMAPINFOHEADER at offset 14 (size 40): width LE32 @18,
    // height LE32 @22 (signed — negative means top-down row order), planes
    // @26, bits-per-pixel LE16 @28
    else if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 30 && le32(bytes, 14) >= 40)
      Row("bmp", le32(bytes, 18), le32(bytes, 22), le16(bytes, 28), null, null, null)
    // WAV: RIFF container with form type WAVE; scan chunks for "fmt " —
    // its body holds channels @2 (LE16), sample rate @4 (LE32), bits per
    // sample @14 (LE16). Chunk scan (not a fixed 44-byte layout) so files
    // with LIST/fact chunks before fmt still decode; odd-sized chunks pad
    // to even per the RIFF spec.
    // PNG: 8-byte signature, then the IHDR chunk MUST come first (spec):
    // length BE32 (13) + "IHDR" + width BE32 @16, height BE32 @20, bit
    // depth @24, color type @25. Channels per color type: 0 gray→1,
    // 2 truecolor→3, 3 palette→1, 4 gray+alpha→2, 6 RGBA→4; bpp =
    // bit depth × channels (the bits that matter for a training-data
    // size/shape audit).
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N'
      && bytes(3) == 'G' && (bytes(4) & 0xff) == 0x0d && (bytes(5) & 0xff) == 0x0a
      && (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0x0a) {
      if (bytes.length < 26 || be32(bytes, 8) != 13 ||
        bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R') unknown
      else {
        val depth = bytes(24) & 0xff
        val channels = (bytes(25) & 0xff) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => -1
        }
        if (channels < 0) unknown
        else Row("png", be32(bytes, 16), be32(bytes, 20), depth * channels,
          channels, null, null)
      }
    }
    // JPEG: SOI (FF D8), then marker segments each FF + marker + BE16
    // length (length includes its own two bytes). Walk to the first
    // start-of-frame SOFn (C0–CF except C4 DHT / C8 JPG-ext / CC DAC):
    // precision @+4, height BE16 @+5, width BE16 @+7, components @+9.
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var off = 2
      while (off + 4 <= bytes.length && (bytes(off) & 0xff) == 0xff) {
        // FF fill bytes are legal padding between segments (ITU T.81
        // §B.1.1.2): skip runs of them rather than reading the next FF as
        // a marker's length field
        if ((bytes(off + 1) & 0xff) == 0xff) { off += 1 }
        else {
        val marker = bytes(off + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf
          && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (off + 10 <= bytes.length) {
            val precision = bytes(off + 4) & 0xff
            val h = be16(bytes, off + 5)
            val w = be16(bytes, off + 7)
            val ncomp = bytes(off + 9) & 0xff
            Row("jpeg", w, h, precision * ncomp, ncomp, null, null)
          } else unknown
        }
        if (marker == 0xd9 || marker == 0xda) return unknown // EOI / SOS before any SOF
        // standalone markers carry NO length field (TEM 0x01, RST0–7
        // 0xD0–0xD7): advance past the 2-byte marker itself, or the walk
        // would read arbitrary entropy bytes as a BE16 length and could
        // land on a garbage SOF and report wrong dimensions
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) off += 2
        else {
          val segLen = be16(bytes, off + 2)
          if (segLen < 2) return unknown // corrupt length — stop scanning
          off += 2 + segLen
        }
        }
      }
      unknown
    }
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'
      && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      var off = 12
      while (off + 8 <= bytes.length) {
        val size = le32(bytes, off + 4)
        if (bytes(off) == 'f' && bytes(off + 1) == 'm' && bytes(off + 2) == 't'
          && bytes(off + 3) == ' ') {
          return if (size >= 16 && off + 8 + 16 <= bytes.length)
            Row("wav", null, null, null,
              le16(bytes, off + 10), le32(bytes, off + 12), le16(bytes, off + 22))
          else unknown
        }
        if (size < 0) return unknown // corrupt size — stop scanning
        off += 8 + size + (size & 1)
      }
      unknown
    } else unknown
  }

  /** Decode container headers of a binary payload column — image dimensions
    * for BMP, channel/rate/width for WAV; "unknown" otherwise. Real pipeline
    * shape: `mapPartitions` so a heavier codec amortizes native init per
    * partition (the Scala analogue of `mapInPandas` batching), one output
    * row per input row, typed Row output with [[mediaSchema]].
    */
  def decodeMedia(df: DataFrame, binCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("decoded", mediaSchema))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // a native codec would initialize its context HERE, once per partition
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ parseHeader(r.getAs[Array[Byte]](binIdx)))
      }
    }(enc)
  }

  /** Perceptual average-hash of 24bpp BMP payloads — REAL pixel decode, the
    * image near-dup signature (aHash: bit i = "pixel i brighter than the
    * image mean"). Byte-level contract a wrong parser cannot fake past the
    * oracle: pixel array at the LE32 offset @10, rows stored BOTTOM-UP
    * (logical row r reads stored row h−1−r), stride padded to 4 bytes,
    * gray taken from the blue channel (synthetic grayscale: B=G=R). The
    * mean compare is exact integer cross-multiplication (n·v > Σv — no
    * float mean), bits pack row-major into two 32-pixel halves carried as
    * nonnegative LONGs (bit i of the logical image is bit i%32 of half
    * i/32 — no sign-bit trap at pixel 63).
    *
    * Scale shape: row-local map (mapPartitions, one output row per input
    * row) — the signature stage of an image-dedup pipeline; pair-finding
    * happens downstream on the 64-bit hash (banding + hamming verify),
    * never on pixels.
    */
  def aHash(df: DataFrame, binCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("ahash_lo", LongType), StructField("ahash_hi", LongType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](binIdx)
        val hash: Seq[Any] =
          if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M' ||
            le16(b, 28) != 24) Seq(null, null)
          else {
            val off = le32(b, 10)
            val w = le32(b, 18)
            val h = le32(b, 22)
            val stride = ((w * 3 + 3) / 4) * 4
            if (w <= 0 || h <= 0 || w.toLong * h > 64 ||
              off.toLong + h.toLong * stride > b.length) Seq(null, null)
            else {
              val n = w * h
              val v = new Array[Int](n)
              var i = 0
              while (i < n) {
                val row = i / w; val colI = i % w
                v(i) = b(off + (h - 1 - row) * stride + colI * 3) & 0xff
                i += 1
              }
              var sum = 0L
              v.foreach(sum += _)
              var lo = 0L; var hi = 0L
              i = 0
              while (i < n) {
                if (n.toLong * v(i) > sum) {
                  if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                }
                i += 1
              }
              Seq(lo, hi)
            }
          }
        Row.fromSeq(r.toSeq ++ hash)
      }
    }(enc)
  }

  /** Block-mean RESIZE of 24bpp BMP payloads — the downsampling verb of the
    * image pipeline, on the same byte-level decode contract as [[aHash]]
    * (pixel array at LE32 @10, rows bottom-up, stride padded to 4, gray =
    * blue channel). Each `factor`×`factor` block of the logical image
    * becomes one output cell carrying EXACT integers — pixel count and
    * gray sum — plus the mean as one double division at the surface, so a
    * SQL oracle regenerating the pixels arithmetically matches
    * cell-for-cell (float resampling kernels could never hash-gate).
    * Ragged edges are real cells with smaller counts, not dropped. The
    * thumbnail grid this emits is what feeds [[aHash]]-style signatures
    * at production sizes (hash the 8×8 resize of a megapixel image, not
    * the image).
    *
    * Scale shape: row-local flatMap (mapPartitions, ⌈w/f⌉·⌈h/f⌉ output
    * rows per image) — no shuffle; malformed/non-BMP payloads yield no
    * rows (corrupt blobs are data, not errors).
    */
  def blockMeanResize(df: DataFrame, binCol: String, factor: Int,
                      maxPixels: Long = 1 << 22): DataFrame = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("cy", IntegerType), StructField("cx", IntegerType),
      StructField("n_px", LongType), StructField("sum_gray", LongType),
      StructField("mean_gray", DoubleType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.getAs[Array[Byte]](binIdx)
        if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M' ||
          le16(b, 28) != 24) Iterator.empty
        else {
          val off = le32(b, 10)
          val w = le32(b, 18)
          val h = le32(b, 22)
          val stride = ((w * 3 + 3) / 4) * 4
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels ||
            off.toLong + h.toLong * stride > b.length) Iterator.empty
          else {
            val cw = (w + factor - 1) / factor
            val ch = (h + factor - 1) / factor
            val cnt = new Array[Long](cw * ch)
            val sum = new Array[Long](cw * ch)
            var row = 0
            while (row < h) {
              var colI = 0
              val base = off + (h - 1 - row) * stride
              val cellRow = (row / factor) * cw
              while (colI < w) {
                val c = cellRow + colI / factor
                cnt(c) += 1L
                sum(c) += (b(base + colI * 3) & 0xff).toLong
                colI += 1
              }
              row += 1
            }
            (0 until cw * ch).iterator.map { c =>
              // Seq[Any]: a plain Seq would numerically WIDEN the Int cell
              // coords to Double to unify with mean_gray
              Row.fromSeq(r.toSeq ++ Seq[Any](c / cw, c % cw, cnt(c), sum(c),
                sum(c).toDouble / cnt(c).toDouble))
            }
          }
        }
      }
    }(enc)
  }

  /** Grayscale-8 PNG pixel decode (round-8): the one honest step beyond
    * header parsing available dependency-free — IDAT is a zlib stream and
    * `java.util.zip.Inflater` IS zlib, so the full decode chain (chunk
    * walk → IDAT concat → inflate with Adler-32 verified → per-row
    * unfilter, all five filter types 0–4) runs row-local with no library
    * beyond the JDK. Scope is bit-depth 8, color type 0 (grayscale),
    * non-interlaced — the thumbnail/signature shape the [[aHash]] /
    * [[blockMeanResize]] pipeline consumes; anything else returns None
    * (corrupt blobs are data, not errors). Chunk CRC-32s are NOT verified
    * (documented divergence, same contract as [[parseHeader]]'s
    * "CRC unchecked" — the zlib Adler-32 over the decompressed stream is
    * verified by the Inflater, which is the integrity check that guards
    * the PIXELS).
    */
  private[ops] def pngGray8Pixels(
      b: Array[Byte], maxPixels: Long): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 45) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    var i = 0
    while (i < 8) { if (b(i) != sig(i)) return None; i += 1 }
    if (be32(b, 8) != 13 ||
      b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val depth = b(24) & 0xff
    val ctype = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > maxPixels ||
      depth != 8 || ctype != 0 || interlace != 0) return None
    // chunk walk: concatenate every IDAT's data (a PNG may split the zlib
    // stream across chunks at arbitrary byte boundaries)
    var off = 8 + 25 // signature + IHDR chunk (len+type+13+crc)
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && off + 8 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12L + len > b.length) return None
      if (b(off + 4) == 'I' && b(off + 5) == 'D' && b(off + 6) == 'A' && b(off + 7) == 'T')
        idat.write(b, off + 8, len)
      else if (b(off + 4) == 'I' && b(off + 5) == 'E' && b(off + 6) == 'N' && b(off + 7) == 'D')
        ended = true
      off += 12 + len
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return None
    // inflate exactly h·(1+w) bytes: one filter byte + w gray bytes per row.
    // Sized in Long first: maxPixels bounds w·h but NOT h·(1+w), so a
    // caller-supplied bound near 2^31 could overflow the Int product into a
    // negative array size — that's a corrupt-input-shaped failure, and the
    // contract for those is None, not NegativeArraySizeException.
    val rawLen = h.toLong * (1L + w)
    if (rawLen > Int.MaxValue - 8) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater() // zlib mode: Adler-32 verified at finish
    try {
      inf.setInput(comp)
      var got = 0
      while (got < raw.length) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0) return None // truncated / needs-dictionary / corrupt
        got += n
      }
      // drain to the end of the zlib stream so the Adler check actually runs
      val sink = new Array[Byte](64)
      while (!inf.finished() && inf.inflate(sink) > 0) ()
      if (!inf.finished()) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter (bpp = 1 for gray-8): RFC 2083 §6, all five filter types
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val rb = row * (1 + w)
      val f = raw(rb) & 0xff
      var x = 0
      while (x < w) {
        val cur = raw(rb + 1 + x) & 0xff
        val left = if (x > 0) out(row * w + x - 1) else 0
        val up = if (row > 0) out((row - 1) * w + x) else 0
        val ul = if (x > 0 && row > 0) out((row - 1) * w + x - 1) else 0
        val rec = f match {
          case 0 => cur
          case 1 => (cur + left) & 0xff
          case 2 => (cur + up) & 0xff
          case 3 => (cur + ((left + up) >> 1)) & 0xff
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            (cur + pred) & 0xff
          case _ => return None
        }
        out(row * w + x) = rec
        x += 1
      }
      row += 1
    }
    Some((w, h, out))
  }

  /** [[blockMeanResize]] over REAL PNG payloads: gray-8 PNG pixels via
    * [[pngGray8Pixels]] (Inflater decode, filters unapplied), then the
    * same exact-integer block-mean cells — (cy, cx, n_px, sum_gray,
    * mean_gray), ragged edges as real smaller cells. PNG rows are
    * TOP-DOWN (no BMP bottom-up flip). Row-local flatMap, no shuffle;
    * non-PNG / non-gray8 / corrupt payloads yield no rows.
    */
  def pngBlockMean(df: DataFrame, binCol: String, factor: Int,
                   maxPixels: Long = 1 << 22): DataFrame = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("cy", IntegerType), StructField("cx", IntegerType),
      StructField("n_px", LongType), StructField("sum_gray", LongType),
      StructField("mean_gray", DoubleType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        pngGray8Pixels(r.getAs[Array[Byte]](binIdx), maxPixels) match {
          case None => Iterator.empty
          case Some((w, h, px)) =>
            val cw = (w + factor - 1) / factor
            val ch = (h + factor - 1) / factor
            val cnt = new Array[Long](cw * ch)
            val sum = new Array[Long](cw * ch)
            var row = 0
            while (row < h) {
              var colI = 0
              val cellRow = (row / factor) * cw
              while (colI < w) {
                val c = cellRow + colI / factor
                cnt(c) += 1L
                sum(c) += px(row * w + colI).toLong
                colI += 1
              }
              row += 1
            }
            (0 until cw * ch).iterator.map { c =>
              Row.fromSeq(r.toSeq ++ Seq[Any](c / cw, c % cw, cnt(c), sum(c),
                sum(c).toDouble / cnt(c).toDouble))
            }
        }
      }
    }(enc)
  }

  /** REAL PCM WAV sample decode + per-frame signal statistics — the audio
    * half of the multimodal decode story (the image half is [[aHash]]).
    * Walks the RIFF chunk list (not fixed offsets: fmt/data located by
    * chunk id, odd-size padding honored), requires uncompressed mono
    * 16-bit PCM, decodes the data chunk as little-endian SIGNED int16,
    * splits into frames of `frameSamples`, and emits per frame the exact
    * integer statistics a VAD/segmentation pipeline starts from:
    * energy = Σs² (long), peak = max|s|, zero_crossings = #{i : sᵢ₋₁·sᵢ<0
    * within the frame}. All-integer outputs, so the DuckDB oracle can
    * regenerate the same samples arithmetically and the byte round-trip
    * (formula → LE bytes → chunk walk → int16 decode → stats) is what the
    * hash gate actually tests. Malformed/non-PCM payloads yield no rows
    * (corrupt blobs are data, not errors).
    *
    * Scale shape: row-local map (mapPartitions, ≤ samples/frameSamples + 1
    * output rows per input row) — no shuffle; downstream aggregation
    * happens on the small per-frame stats, never on raw samples.
    */
  def pcmFrames(df: DataFrame, binCol: String, frameSamples: Int = 16): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive, got $frameSamples")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("energy", LongType),
      StructField("peak", IntegerType),
      StructField("zero_crossings", IntegerType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.getAs[Array[Byte]](binIdx)
        val frames: Seq[Seq[Any]] =
          if (b == null || b.length < 12 ||
            !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
            !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) Nil
          else {
            // chunk walk: [id:4][size:LE32][payload:size][pad to even]
            var off = 12
            var fmtOk = false
            var dataOff = -1
            var dataLen = 0
            while (off + 8 <= b.length) {
              val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
              val size = le32(b, off + 4)
              if (size < 0 || off + 8 + size > b.length) { off = b.length }
              else {
                if (id == "fmt " && size >= 16)
                  fmtOk = le16(b, off + 8) == 1 && le16(b, off + 10) == 1 &&
                    le16(b, off + 22) == 16
                else if (id == "data") { dataOff = off + 8; dataLen = size }
                off += 8 + size + (size & 1)
              }
            }
            if (!fmtOk || dataOff < 0) Nil
            else {
              val n = dataLen / 2
              val s = new Array[Int](n)
              var i = 0
              while (i < n) {
                s(i) = (((b(dataOff + 2 * i + 1) & 0xff) << 8) |
                  (b(dataOff + 2 * i) & 0xff)).toShort.toInt
                i += 1
              }
              (0 until n by frameSamples).map { start =>
                val end = math.min(start + frameSamples, n)
                var energy = 0L; var peak = 0; var zcr = 0
                var j = start
                while (j < end) {
                  val v = s(j)
                  energy += v.toLong * v
                  if (math.abs(v) > peak) peak = math.abs(v)
                  if (j > start && s(j - 1).toLong * v < 0) zcr += 1
                  j += 1
                }
                // Seq[Any] annotation is load-bearing: an unannotated Seq
                // of mixed Int/Long elements infers Seq[Long] (numeric
                // widening to the LUB), which boxes the INT fields as
                // java.lang.Long and fails the Row encoder
                Seq[Any](start / frameSamples, end - start, energy, peak, zcr)
              }
            }
          }
        frames.map(f => Row.fromSeq(r.toSeq ++ f))
      }
    }(enc)
  }

  /** Exact floor integer square root for any non-negative long —
    * delegated to BigInteger.sqrt (round-11 review: the previous
    * double-seed ±1 correction loop overflowed `(k+1)²` within ~6e9 of
    * Long.MaxValue and spun ~1e9 iterations to a wrong root). The
    * oracle SQL's floor(sqrt(double)) + ±1 CASE correction computes the
    * same floor root, so fixed-point RMS values still hash-match.
    */
  private[graft] def isqrt(v: Long): Long =
    if (v <= 0L) 0L else java.math.BigInteger.valueOf(v).sqrt().longValue()

  /** Overflow-safe `isqrt(energy·10⁶ / n)`: the long product wraps for
    * blocks past ~8 590 full-scale 16-bit frames (review finding —
    * isqrt of the wrapped negative silently reported digital silence
    * for the loudest possible block). The result always fits a long
    * (RMS of int16 ≤ 32 768 000 milli-units).
    */
  private def rmsMilli(energy: Long, n: Int): Long =
    java.math.BigInteger.valueOf(energy)
      .multiply(java.math.BigInteger.valueOf(1000000L))
      .divide(java.math.BigInteger.valueOf(n.toLong))
      .sqrt().longValueExact()

  /** MULTI-CHANNEL PCM block statistics — [[pcmFrames]] generalized from
    * mono framing to the per-channel block RMS/peak a loudness/silence
    * gate runs on. Same RIFF chunk walk; `fmt ` must declare
    * uncompressed 16-bit PCM but ANY channel count ≥ 1 — samples are
    * interleaved per frame, deinterleaved here. Per block of
    * `blockFrames` frames and per channel: `n_frames`, exact
    * `energy = Σs²` (long), `peak = max|s|`, and fixed-point
    * `rms_milli = isqrt(energy·10⁶ / n_frames)` (RMS scaled ×1000,
    * exact integer — see [[isqrt]]). Malformed/non-PCM payloads yield
    * no rows (corrupt blobs are data, not errors).
    *
    * Scale shape: row-local map, ≤ channels·(frames/blockFrames + 1)
    * output rows per input row, no shuffle — aggregation downstream
    * happens on block stats, never raw samples.
    */
  def pcmBlockStats(df: DataFrame, binCol: String,
                    blockFrames: Int = 16): DataFrame = {
    require(blockFrames > 0, s"blockFrames must be positive, got $blockFrames")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("block_idx", IntegerType),
      StructField("channel", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("energy", LongType),
      StructField("peak", IntegerType),
      StructField("rms_milli", LongType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.getAs[Array[Byte]](binIdx)
        val blocks: Seq[Seq[Any]] =
          if (b == null || b.length < 12 ||
            !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
            !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) Nil
          else {
            var off = 12
            var channels = 0
            var dataOff = -1
            var dataLen = 0
            while (off + 8 <= b.length) {
              val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
              val size = le32(b, off + 4)
              if (size < 0 || off + 8 + size > b.length) { off = b.length }
              else {
                if (id == "fmt " && size >= 16) {
                  val ch = le16(b, off + 10)
                  if (le16(b, off + 8) == 1 && le16(b, off + 22) == 16 && ch >= 1)
                    channels = ch
                } else if (id == "data") { dataOff = off + 8; dataLen = size }
                off += 8 + size + (size & 1)
              }
            }
            if (channels < 1 || dataOff < 0) Nil
            else {
              val nFrames = dataLen / (2 * channels)
              (0 until nFrames by blockFrames).flatMap { start =>
                val end = math.min(start + blockFrames, nFrames)
                (0 until channels).map { c =>
                  var energy = 0L; var peak = 0
                  var f = start
                  while (f < end) {
                    val o = dataOff + 2 * (f * channels + c)
                    val v = (((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)).toShort.toInt
                    energy += v.toLong * v
                    if (math.abs(v) > peak) peak = math.abs(v)
                    f += 1
                  }
                  val n = end - start
                  Seq[Any](start / blockFrames, c, n, energy, peak,
                    rmsMilli(energy, n))
                }
              }
            }
          }
        blocks.map(f => Row.fromSeq(r.toSeq ++ f))
      }
    }(enc)
  }

  /** REAL MP4/ISO-BMFF box walk — the video third of the decode story
    * (image = [[aHash]], audio = [[pcmFrames]]). ISO boxes are
    * [size:BE32][type:4][payload], NESTED (moov contains mvhd) and
    * BIG-endian — deliberately the opposite endianness of the RIFF/WAV
    * walk, so both byte orders are exercised against the oracle. Walks the
    * top-level box list, descends into `moov`, parses `mvhd` v0
    * (timescale BE32 @12, duration BE32 @16 of the payload) and reports
    * (major_brand, n_top_boxes, timescale, duration, duration_s) with
    * duration_s the single double division at the surface. Unknown boxes
    * are skipped by size — the defining property of the format; malformed
    * payloads yield NULL fields.
    *
    * Scale shape: row-local map, no shuffle — container metadata
    * extraction at ingest.
    */
  def mp4Meta(df: DataFrame, binCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("major_brand", StringType),
      StructField("n_top_boxes", IntegerType),
      StructField("timescale", LongType),
      StructField("duration", LongType),
      StructField("duration_s", DoubleType)))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](binIdx)
        var brand: String = null
        var nTop = 0
        var ts: java.lang.Long = null
        var dur: java.lang.Long = null
        if (b != null && b.length >= 8) {
          var off = 0
          var ok = true
          while (ok && off + 8 <= b.length) {
            val size = be32(b, off)
            val tpe = new String(b, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
            if (size < 8 || off + size > b.length) ok = false
            else {
              nTop += 1
              if (tpe == "ftyp" && size >= 16)
                brand = new String(b, off + 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
              else if (tpe == "moov") {
                // child walk inside moov's payload
                var c = off + 8
                val end = off + size.toInt
                while (c + 8 <= end) {
                  val cs = be32(b, c)
                  val ct = new String(b, c + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
                  if (cs < 8 || c + cs > end) { c = end }
                  else {
                    // mvhd v0 payload: ver/flags(4) ctime(4) mtime(4)
                    // timescale(4) duration(4)
                    if (ct == "mvhd" && cs >= 28 && b(c + 8) == 0) {
                      ts = be32(b, c + 20)
                      dur = be32(b, c + 24)
                    }
                    c += cs.toInt
                  }
                }
              }
              off += size.toInt
            }
          }
        }
        val durS: java.lang.Double =
          if (ts != null && dur != null && ts.longValue() != 0L)
            dur.doubleValue() / ts.doubleValue()
          else null
        Row.fromSeq(r.toSeq ++ Seq(brand, nTop, ts, dur, durS))
      }
    }(enc)
  }

  /** Deterministic frame sampling over chunked payloads: split the binary
    * into fixed-size chunks, keep every `stride`-th chunk ("frame"), and
    * attach a content signature per sampled frame — the shape a video/audio
    * pipeline uses to bound decode cost (sample frames, THEN run the heavy
    * decoder on the sample). Pure expressions: explode over a computed
    * offset sequence, byte-exact slices, md5 signature.
    */
  def sampleChunks(
      df: DataFrame,
      binCol: String,
      chunkBytes: Int = 100,
      stride: Int = 5
  ): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val nBytes = length(col(binCol))
    df
      .filter(nBytes > 0)
      // stepped sequence: generate ONLY the sampled indices — exploding every
      // chunk and filtering (stride-1)/stride of them away would materialize
      // stride× the rows in the pass whose whole point is bounding decode cost
      .withColumn("chunk_idx",
        explode(sequence(lit(0), ((nBytes - 1) / chunkBytes).cast("int"), lit(stride))))
      .withColumn("frame",
        substring(col(binCol), col("chunk_idx") * chunkBytes + 1, lit(chunkBytes)))
      .withColumn("frame_sig", md5(col("frame")))
      .withColumn("frame_bytes", length(col("frame")))
      .drop("frame")
  }
}
