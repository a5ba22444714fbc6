package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, Sketches}

/** 10x headroom runs for the round-5 additions: Merkle manifest (q257),
  * maxsim late-interaction retrieval (q268), aHash band-join pair discovery
  * (q261), and the no-Gram dominant-direction power step (q259). Each should
  * scale ~linearly: the manifest's collected state is leaf-sized (buckets
  * scale with rows so leaves stay ~1k rows); maxsim is corpus x fixed-panel;
  * the band join's candidate set is pair-bounded by construction (planted
  * groups of 4 + rare 16-bit band collisions); the power step is two
  * row-local dots plus dim-keyed shuffles. Results recorded in SURVEY §8.6.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroomR5b"
  */
object ScaleHeadroomR5b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // ---- merkle manifest: rows/buckets held at ~1k rows per leaf
    def merkleRun(n: Long): Double = {
      val df = spark.range(n).select(col("id"),
        (col("id") % 16).cast("string").as("g"),
        concat(lit("payload-"), col("id")).as("s"))
      val dt = timed {
        Sketches.merkleManifest(df, Seq(col("g")), col("id"),
            concat_ws("|", col("id"), col("s")), buckets = (n / 16000L).toInt.max(64))
          .agg(count(lit(1))).collect()
      }
      drop(); dt
    }

    // ---- maxsim: synthetic 64-dim fixed-point vectors, fixed 40-vector
    // panel, through the native panel-dots expression (join-free plan)
    def maxsimRun(n: Long): Double = {
      val fixed = spark.range(n).select(
        expr("id DIV 4").as("docv"), (col("id") % 4).as("slot"),
        expr("transform(sequence(0, 63), d -> pmod(xxhash64(id * 64 + d), 2000) - 1000)")
          .as("iv"))
      val dt = timed {
        Similarity.maxSimScores(fixed, panelDocs = 10)
          .agg(sum(col("maxsim"))).collect()
      }
      drop(); dt
    }

    // ---- aHash band join: planted groups of 4 sharing a base hash with
    // <=2 perturbed low bits, 4x16-bit bands, hamming verify
    def bandRun(n: Long): Double = {
      val hashed = spark.range(n).select(col("id"),
        expr("abs(pmod(xxhash64(id DIV 4), 4294967296))" +
          " ^ (CASE WHEN id % 4 > 0 THEN shiftleft(1L, CAST(id % 31 AS INT)) ELSE 0L END)")
          .as("ahash_lo"),
        expr("abs(pmod(xxhash64(id DIV 4 + 77), 4294967296))").as("ahash_hi"))
        .localCheckpoint()
      val dt = timed {
        val bands = hashed.select(col("id"), col("ahash_lo"), col("ahash_hi"),
          explode(array(
            struct(lit(0).as("band"), expr("ahash_lo % 65536").as("key")),
            struct(lit(1).as("band"), expr("ahash_lo DIV 65536").as("key")),
            struct(lit(2).as("band"), expr("ahash_hi % 65536").as("key")),
            struct(lit(3).as("band"), expr("ahash_hi DIV 65536").as("key")))).as("b"))
          .select(col("id"), col("ahash_lo"), col("ahash_hi"),
            col("b.band").as("band"), col("b.key").as("key"))
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key")
              && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.ahash_lo").as("loa"), col("a.ahash_hi").as("hia"),
            col("b.ahash_lo").as("lob"), col("b.ahash_hi").as("hib"))
          .distinct()
          .filter(expr("bit_count(loa ^ lob) + bit_count(hia ^ hib) <= 3"))
          .agg(count(lit(1))).collect()
      }
      drop(); dt
    }

    // ---- dominant direction over synthetic 64-dim vectors
    def directionRun(n: Long): Double = {
      val df = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d ->" +
          " CAST(pmod(xxhash64(id * 64 + d), 1000) AS FLOAT) / 1000.0)").as("embedding"))
      val dt = timed {
        Similarity.dominantDirection(df, "vec_id", "embedding")
          .agg(sum(abs(col("direction_fixed")))).collect()
      }
      // the result frame is driver-local (64 rows); the timed body above
      // already forced both aggregate passes
      drop(); dt
    }

    // warm-up: JIT + codegen caches, so size pairs compare steady-state
    merkleRun(200000L); maxsimRun(20000L); bandRun(20000L); directionRun(20000L)
    println(f"merkle 2M:   ${merkleRun(2000000L)}%.2f s")
    println(f"merkle 20M:  ${merkleRun(20000000L)}%.2f s")
    println(f"maxsim 50k:  ${maxsimRun(50000L)}%.2f s")
    println(f"maxsim 500k: ${maxsimRun(500000L)}%.2f s")
    println(f"bands 100k:  ${bandRun(100000L)}%.2f s")
    println(f"bands 1M:    ${bandRun(1000000L)}%.2f s")
    println(f"direction 50k:  ${directionRun(50000L)}%.2f s")
    println(f"direction 500k: ${directionRun(500000L)}%.2f s")
    spark.stop()
  }
}
