package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, exactly like a production
  * training-data pipeline stores them next to text. The Spark-side machinery
  * (schema, batch shape, partition-parallel decode) is real and tested; the
  * actual codec is STUBBED with a deterministic fake because no image/audio
  * libraries exist in this container — swap [[decodeStub]]'s body for a real
  * decoder (JNI/javax.imageio/ffmpeg) without touching the plumbing.
  */
object Multimodal {

  /** Schema of the extracted-feature struct a real decoder would produce. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))
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

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Real pipeline shape: `mapPartitions` so a real codec amortizes native
    * init per partition (the Scala analogue of `mapInPandas` batching), one
    * output row per input row, typed Row output with [[featureSchema]].
    */
  def decodeStub(df: DataFrame, binCol: String, featureDim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("decoded", featureSchema))
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // real decoder: initialize native codec context HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val n = if (bytes == null) 0 else bytes.length
        // ??? real decode goes here; deterministic fake below
        val fake = Row(
          (n % 640) + 1,
          (n % 480) + 1,
          1,
          Array.tabulate(featureDim)(i =>
            ((util.hashing.MurmurHash3.bytesHash(if (bytes == null) Array.emptyByteArray else bytes, i) % 1000) / 1000.0f))
        )
        Row.fromSeq(r.toSeq :+ fake)
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
