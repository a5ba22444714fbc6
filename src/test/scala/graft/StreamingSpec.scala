package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

/** Streaming twins produce the same answers as the batch operators when fed
  * the same (bounded) input — the property that makes them "the same engine".
  */
class StreamingSpec extends SparkTestBase {

  private def eventsDir: String = {
    // stage events as a file-source stream input (micro-batch over parquet);
    // rewrite ts from nanos to micros first (same conversion Tables does).
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("multi-batch feeds: every gated streaming query crosses >= 3 microbatches") {
    // the round-8 honesty gate: the registry's streaming queries no longer
    // run on a single-microbatch feed — each one's input arrives as 3
    // deterministic microbatches (time-split for event-time ops, md5-mod-3
    // for running-state ops), so state handoff, watermark advance, and
    // timer firing all cross batch boundaries. Witness: the data-batch
    // count of each run, plus direct handoff evidence (a key emitting in
    // more than one batch) for the running-state machines.
    def batches(): Long = StreamOps.lastRunBatches

    // running totals (q118's machine): hash feed, users span batches
    val evHash = Tables.eventsStreamBatched(spark, sf(), mode = "hash")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("cents"))
    val totals = StreamOps.runToMemory(spark,
      StreamOps.runningUserTotalsExact(spark, evHash), "mb_totals", OutputMode.Append)
    assert(batches() >= 3, s"q118 feed ran ${batches()} data batches")
    val multiEmit = totals.groupBy(col("user_id")).count().filter(col("count") > 1).count()
    assert(multiEmit > 0, "no user emitted in more than one batch — handoff not exercised")
    // final state (max n_events per user) equals the batch aggregate
    val finalTotals = totals.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max_by(col("cents"), col("n_events")).as("c"))
    val batchTotals = Tables(spark, sf(), "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("bn"),
        sum(round(col("value") * 100).cast("long")).as("bc"))
    assert(finalTotals.join(batchTotals, Seq("user_id"))
      .filter(col("n") =!= col("bn") || col("c") =!= col("bc")).count() == 0)

    // event-time sessions (q92's op): time feed, watermark advances between
    // batches and the emitted set equals the single-batch deterministic subset
    val evTime = Tables.eventsStreamBatched(spark, sf(), mode = "time")
    val mbSessions = StreamOps.runToMemory(spark,
      StreamOps.sessionCounts(evTime, "30 minutes", watermark = "0 seconds"),
      "mb_sessions", OutputMode.Append)
    assert(batches() >= 3, s"q92 feed ran ${batches()} data batches")
    val sbSessions = StreamOps.runToMemory(spark,
      StreamOps.sessionCounts(
        spark.readStream.schema(StreamOps.eventSchema).parquet(eventsDir),
        "30 minutes", watermark = "0 seconds"),
      "sb_sessions", OutputMode.Append)
    assert(mbSessions.count() == sbSessions.count() &&
      mbSessions.exceptAll(sbSessions).count() == 0,
      "multi-batch session set must equal the single-batch deterministic subset")

    // v2 timers (q304's machine): time feed — timers registered in batch k
    // fire when batch k+1 advances the watermark
    StreamOps.sessionsV2(spark, evTime, gapMinutes = 30, watermark = "0 seconds")
    assert(batches() >= 3, s"q304 feed ran ${batches()} data batches")

    // v2 MapState counts (q303), ListState first-k (q305), initial-state
    // balances (q306): hash feed, handoff evidence via repeated emissions
    val evHashRaw = Tables.eventsStreamBatched(spark, sf(), mode = "hash")
    val tc = StreamOps.typeCountsV2(spark, evHashRaw)
    assert(batches() >= 3, s"q303 feed ran ${batches()} data batches")
    assert(tc.groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1).count() > 0)
    val fk = StreamOps.firstKV2(spark, evHashRaw, k = 3)
    assert(batches() >= 3, s"q305 feed ran ${batches()} data batches")
    assert(fk.select(col("user_id"), col("n_seen")).distinct()
      .groupBy(col("user_id")).count().filter(col("count") > 1).count() > 0)
    StreamOps.balancesV2(spark, evHashRaw,
      Tables(spark, sf(), "customer").select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("start_cents")))
    assert(batches() >= 3, s"q306 feed ran ${batches()} data batches")

    // streaming LSH index (q309's machine): hash feed over documents;
    // growing buckets collapse to their latest membership before expansion
    StreamOps.streamingNearDupIndex(spark,
      Tables.documentsStreamBatched(spark, sf(), mode = "hash"), "doc_id", "text")
    assert(batches() >= 3, s"q309 feed ran ${batches()} data batches")

    // stream-stream join (q273/q300/q313's op): cross-batch matches — a
    // view in one batch joined to a purchase in a later one — prove the
    // join state itself crosses the boundary; the multi-batch match set
    // equals the single-batch one
    def sides(src: org.apache.spark.sql.DataFrame) = (
      src.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id")),
      src.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id").as("purchase_id")))
    val (vM, pM) = sides(evTime)
    val mbJoin = StreamOps.runToMemory(spark,
      StreamOps.streamStreamJoin(vM, pM, key = "user_id", leftTs = "ts",
        rightTs = "pts", skew = "30 minutes", watermark = "0 seconds")
        .select(col("view_id"), col("purchase_id")), "mb_ssjoin")
    assert(batches() >= 3, s"join feed ran ${batches()} data batches")
    val (vS, pS) = sides(
      spark.readStream.schema(StreamOps.eventSchema).parquet(eventsDir))
    val sbJoin = StreamOps.runToMemory(spark,
      StreamOps.streamStreamJoin(vS, pS, key = "user_id", leftTs = "ts",
        rightTs = "pts", skew = "30 minutes", watermark = "0 seconds")
        .select(col("view_id"), col("purchase_id")), "sb_ssjoin")
    assert(mbJoin.count() == sbJoin.count() &&
      mbJoin.exceptAll(sbJoin).count() == 0,
      "multi-batch stream-stream match set must equal the single-batch one")

    // watermark dedup (q272's op) and the LogLog sketch (q336's): batch
    // counts witnessed; loglog's internal final-state selection returns
    // one row per type whatever the batch count
    StreamOps.runToMemory(spark,
      StreamOps.dedupEvents(evTime.select(col("event_id"), col("event_type"),
        col("ts")), "event_id"), "mb_dedup")
    assert(batches() >= 3, s"q272 feed ran ${batches()} data batches")
    val ll = StreamOps.streamingLogLog(spark,
      Tables.eventsStreamBatched(spark, sf(), mode = "hash"))
    assert(batches() >= 3, s"q336 feed ran ${batches()} data batches")
    assert(ll.groupBy(col("event_type")).count().filter(col("count") > 1).count() == 0,
      "loglog must collapse to one final summary per type")
  }

  test("stateful-v2 RocksDB state survives a query RESTART from its checkpoint") {
    // the production failure path the multi-batch gates don't cover: state
    // restored across a query RESTART, not just across batches within one
    // run. Run 1 processes two of three input files against a checkpoint;
    // a brand-new query over the same checkpoint then sees only the third
    // file — its emissions must carry counts INCLUDING the first two
    // batches, which is only possible if the RocksDB snapshots (and the
    // source's processed-file log) were restored.
    val dir = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    val ev = Tables(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    def writeSplit(k: Int): Unit = {
      ev.filter(pmod(col("event_id"), lit(3)) === k).coalesce(1)
        .write.parquet(s"$dir/f$k.parquet")
      ()
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft-restart-out").toString
    writeSplit(0); writeSplit(1)
    def stream = spark.readStream.schema(StreamOps.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val b1 = StreamOps.typeCountsV2ToParquet(spark, stream, outDir, ckpt)
    assert(b1 >= 2, s"run 1 must process both staged files, ran $b1")
    // simulate the restart: a NEW query, same checkpoint, third file landed
    writeSplit(2)
    val b2 = StreamOps.typeCountsV2ToParquet(spark, stream, outDir, ckpt)
    assert(b2 == 1,
      s"run 2 must process ONLY the new file (processed-file log restored), ran $b2")
    // counts are monotone per (user, type), so the final state in the
    // accumulated output is the max emission; for every (user, type)
    // touched by file 2 it must equal the ALL-FILES batch twin — possible
    // only if run 2 started from the restored RocksDB state
    val finalCounts = spark.read.parquet(outDir)
      .groupBy(col("user_id"), col("event_type")).agg(max(col("n")).as("n"))
    val twin = Tables(spark, sf(), "events")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("tn"))
    val touched = ev.filter(pmod(col("event_id"), lit(3)) === 2)
      .select(col("user_id"), col("event_type")).distinct()
    val checked = finalCounts.join(touched, Seq("user_id", "event_type"))
      .join(twin, Seq("user_id", "event_type"))
    assert(checked.count() == touched.count(),
      "every touched (user, type) must appear in the accumulated output")
    assert(checked.filter(col("n") =!= col("tn")).count() == 0,
      "post-restart counts must include the pre-restart batches (state restored)")
  }

  test("streaming hourly counts == batch hourly counts") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps
      .runToMemory(spark, StreamOps.hourlyCounts(stream), "hourly", OutputMode.Append)
    val want = Tables(spark, sf(), "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"), col("sum_value"))
    // append mode emits only watermark-closed windows; every emitted row must
    // match batch exactly, and most windows must have closed.
    val joined = got.join(want, Seq("hour_start", "event_type"), "inner")
      .filter(got("n_events") === want("n_events") &&
        abs(got("sum_value") - want("sum_value")) < 1e-6)
    assert(got.count() > 0)
    assert(joined.count() == got.count(), "every emitted window must match batch")
  }

  test("streaming session counts per user ≈ batch sessionize") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps
      .runToMemory(spark, StreamOps.sessionCounts(stream, "30 minutes"), "sessions", OutputMode.Append)
      .groupBy(col("user_id")).agg(sum(col("n_events")).as("n_events_sessions"))
    val batch = graft.ops.Relational
      .sessionize(Tables(spark, sf(), "events"), col("user_id"), col("ts"), 1800)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events_batch"))
    val j = got.join(batch, Seq("user_id"))
    // watermark-closed sessions only: emitted events ≤ batch events, > 0
    assert(got.count() > 0)
    assert(j.filter(col("n_events_sessions") > col("n_events_batch")).count() == 0)
  }

  test("streaming sessions with 0s watermark == batch sessions closed before max-ts - gap") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps
      .runToMemory(spark,
        StreamOps.sessionCounts(stream, "30 minutes", watermark = "0 seconds"),
        "sessions_closed", OutputMode.Append)
    val ev = Tables(spark, sf(), "events")
    val gmax = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val batchClosed = graft.ops.Relational
      .sessionize(ev, col("user_id"), col("ts"), 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_batch"))
      .filter(col("session_end") + expr("INTERVAL 30 MINUTES") <= lit(gmax))
      .select(col("user_id"), col("session_start"), col("n_batch"))
    // exact set + count equality: the emitted set IS the closed-session set
    assert(got.count() == batchClosed.count())
    val j = got.join(batchClosed, Seq("user_id", "session_start"))
    assert(j.count() == got.count(), "every emitted session matches a closed batch session")
    assert(j.filter(col("n_events") =!= col("n_batch")).count() == 0)
  }

  test("streaming entregas ingest: same clean/quarantine split as the batch pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sing")
    val csv = dir.resolve("in")
    java.nio.file.Files.createDirectories(csv)
    java.nio.file.Files.writeString(
      csv.resolve("part1.csv"),
      """pais,fecha_proceso,transporte,ruta,tipo_entrega,material,precio,cantidad,unidad
        |EC,20250110,T1,R1,ZPRE,M1,100.0,2.0,CS
        |EC,20250111,T1,R1,ZZZ,M2,50.0,1.0,ST
        |EC,20250112,T1,R1,ZPRE,,10.0,1.0,ST
        |""".stripMargin)
    val cfg = graft.config.EtlConfig(
      rawCsv = csv.toString, outputRoot = s"$dir/out",
      params = List(graft.config.CountryParam("EC", "2025-01-01", "2025-06-30", process = false)),
      routineTypes = List("ZPRE", "ZVE1"), bonusTypes = List("Z04", "Z05"),
      unitFactors = Map("CS" -> 20.0, "ST" -> 1.0))
    val q = StreamOps.entregasIngest(spark, cfg, csv.toString, s"$dir/out")
    try q.processAllAvailable()
    finally q.stop()
    val clean = spark.read.parquet(s"$dir/out/depurado")
    val obs = spark.read.parquet(s"$dir/out/obs")
    assert(clean.count() == 1 && clean.collect().head.getAs[String]("cod_material") == "M1")
    assert(obs.count() == 2)
    val reasons = obs.select("motivo_obs").collect().map(_.getString(0)).sorted
    assert(reasons.sameElements(Array(
      "ERR_SIN_MATERIAL_CONOCIDO", "ERR_TIPO_ENTREGA_NO_CONSIDERADA")))
  }

  test("stream-static join and streaming dedup") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val users = Tables(spark, sf(), "customer")
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))
    val enriched = StreamOps.enrichWithStatic(stream, users, "user_id", "user_key")
    val got = StreamOps.runToMemory(spark, enriched, "enriched")
    assert(got.count() == Tables(spark, sf(), "events").count())
    assert(got.filter(col("c_mktsegment").isNotNull).count() > 0)

    // duplicate the input with JITTERED timestamps (the at-least-once
    // re-delivery case) → streaming dedup must still collapse on event_id
    val dupDir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    val ev = Tables(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val jittered = ev.withColumn("ts", col("ts") + expr("INTERVAL 5 SECONDS"))
    ev.unionAll(jittered).write.mode("overwrite").parquet(dupDir)
    val dedup = StreamOps.dedupEvents(
      spark.readStream.schema(StreamOps.eventSchema).parquet(dupDir), "event_id")
    val got2 = StreamOps.runToMemory(spark, dedup, "deduped")
    assert(got2.count() == ev.count(), s"expected ${ev.count()} got ${got2.count()}")
  }

  test("streaming content dedup collapses re-crawled documents to batch survivor count") {
    import spark.implicits._
    // re-crawl scenario: same documents re-delivered under NEW doc ids with
    // later timestamps — id-dedup can't catch these, content dedup must
    val docs = Tables(spark, sf(), "documents").select(col("doc_id"), col("text"))
    val base = docs.withColumn("ts", expr("timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"))
    val recrawl = base
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("ts", col("ts") + expr("INTERVAL 10 SECONDS"))
    val dupDir = java.nio.file.Files.createTempDirectory("graft-recrawl").toString
    base.unionAll(recrawl).write.mode("overwrite").parquet(dupDir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string").add("ts", "timestamp")
    val dedup = StreamOps.dedupDocsByContent(
      spark.readStream.schema(schema).parquet(dupDir), "text", "ts")
    val got = StreamOps.runToMemory(spark, dedup, "content_dedup")
    // batch oracle: distinct word-set signatures in the original corpus
    val want = docs.select(graft.ops.Dedup.wordSetSignature(col("text"))).distinct().count()
    assert(got.count() == want, s"expected $want got ${got.count()}")
  }

  test("stream-stream join: views matched to purchases within the skew window") {
    val dir = eventsDir
    def stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val views = stream.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val joined = StreamOps.streamStreamJoin(
      views, purchases, key = "user_id", leftTs = "ts", rightTs = "pts",
      skew = "30 minutes")
      .select(col("view_id"), col("purchase_id"))
    val got = StreamOps.runToMemory(spark, joined, "vp")
    // batch equivalent on the same input
    val ev = Tables(spark, sf(), "events")
    val bviews = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val bpurch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val want = bviews.join(bpurch,
      col("user_id") === col("u2") &&
        col("pts").between(col("ts"), col("ts") + expr("INTERVAL 30 MINUTES")))
      .select(col("view_id"), col("purchase_id"))
    assert(got.count() == want.count(), s"stream ${got.count()} vs batch ${want.count()}")
    assert(got.except(want).count() == 0)
  }

  test("stream-stream LEFT OUTER join: nulls for closed windows, tail held back") {
    val dir = eventsDir
    def stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val views = stream.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val joined = StreamOps.streamStreamJoin(
      views, purchases, key = "user_id", leftTs = "ts", rightTs = "pts",
      skew = "30 minutes", watermark = "0 seconds", joinType = "left_outer")
      .select(col("view_id"), col("purchase_id"))
    val got = StreamOps.runToMemory(spark, joined, "vp_outer")

    // batch reference: matched rows always; unmatched views only when the
    // end-of-input watermark (min of the two streams' max ts) closed their
    // 30-minute window
    val ev = Tables(spark, sf(), "events")
    val bviews = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val bpurch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val wm = math.min(
      bviews.agg(max(unix_micros(col("ts")))).head().getLong(0),
      bpurch.agg(max(unix_micros(col("pts")))).head().getLong(0))
    val want = bviews.join(bpurch,
        col("user_id") === col("u2") &&
          col("pts").between(col("ts"), col("ts") + expr("INTERVAL 30 MINUTES")),
        "left")
      .filter(col("purchase_id").isNotNull
        || unix_micros(col("ts")) + 1800000000L < wm)
      .select(col("view_id"), col("purchase_id"))
    assert(got.count() == want.count(), s"stream ${got.count()} vs batch ${want.count()}")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // the outer form must emit strictly more rows than the inner (the nulls)
    val inner = want.filter(col("purchase_id").isNotNull).count()
    assert(got.count() > inner, "no null rows emitted - outer semantics missing")
  }

  test("stream-stream FULL OUTER join: both null arms on their own watermark boundaries") {
    val dir = eventsDir
    def stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val views = stream.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val joined = StreamOps.streamStreamJoin(
      views, purchases, key = "user_id", leftTs = "ts", rightTs = "pts",
      skew = "30 minutes", watermark = "0 seconds", joinType = "full_outer")
      .select(col("view_id"), col("purchase_id"))
    val got = StreamOps.runToMemory(spark, joined, "vp_full_outer")

    // batch reference: matched always; unmatched views when the watermark
    // passed vus+skew; unmatched purchases when it passed their own ts
    val ev = Tables(spark, sf(), "events")
    val bviews = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val bpurch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val wm = math.min(
      bviews.agg(max(unix_micros(col("ts")))).head().getLong(0),
      bpurch.agg(max(unix_micros(col("pts")))).head().getLong(0))
    val want = bviews.join(bpurch,
        col("user_id") === col("u2") &&
          col("pts").between(col("ts"), col("ts") + expr("INTERVAL 30 MINUTES")),
        "full")
      .filter((col("view_id").isNotNull && col("purchase_id").isNotNull)
        || (col("purchase_id").isNull && unix_micros(col("ts")) + 1800000000L < wm)
        || (col("view_id").isNull && unix_micros(col("pts")) < wm))
      .select(col("view_id"), col("purchase_id"))
    assert(got.count() == want.count(), s"stream ${got.count()} vs batch ${want.count()}")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // both null arms must be present
    assert(got.filter(col("purchase_id").isNull).count() > 0, "no unmatched views")
    assert(got.filter(col("view_id").isNull).count() > 0, "no unmatched purchases")
  }

  test("transformWithState (stateful v2) type counts equal the batch GROUP BY twin") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.get(confKey)
    val got = StreamOps.typeCountsV2(spark, stream)
    // the RocksDB provider conf is scoped to the call and restored
    assert(spark.conf.get(confKey) == before, "state store provider conf leaked")
    val ev = Tables(spark, sf(), "events")
    val counts = ev.groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
    val types = counts.groupBy(col("user_id")).agg(count(lit(1)).as("n_types"))
    val want = counts.join(types, Seq("user_id"))
      .select(col("user_id"), col("event_type"), col("n"), col("n_types"))
    assert(got.count() == want.count(), s"stream ${got.count()} vs batch ${want.count()}")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("streaming LogLog registers accumulate across micro-batches") {
    // two parquet files + maxFilesPerTrigger=1 -> two micro-batches; the
    // processor emits one sketch summary per (type, batch). Whatever the
    // file order, the FINAL emission per type must equal the all-data batch
    // twin (registers accumulated across batches), and no emission may
    // exceed it (max-folds are monotone in the touched-bucket count).
    val dir = java.nio.file.Files.createTempDirectory("graft-loglog").toString
    val ev = Tables(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/f0.parquet")
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/f1.parquet")
    val stream = spark.readStream.schema(StreamOps.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val got = StreamOps.streamingLogLog(spark, stream)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    // batch twin: the q329 register derivation per event_type
    val twin = ev.select(col("event_type"),
        conv(substring(md5(concat(lit("hll:"),
          col("user_id").cast("string"))), 1, 8), 16, 10).cast("long").as("h"))
      .select(col("event_type"), expr("h DIV 4194304").as("b"),
        pmod(col("h"), lit(4194304L)).as("w"))
      .withColumn("rho", when(col("w") === 0, lit(23))
        .otherwise(expr("instr(lpad(bin(w), 22, '0'), '1')")).cast("int"))
      .groupBy(col("event_type"), col("b")).agg(max(col("rho")).as("mrho"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"), sum(expr("CAST(shiftleft(1, 25 - mrho) AS BIGINT)")).as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // streamingLogLog now collapses to the FINAL (max-n_seen) summary per
    // type (the r8 multi-batch contract): exactly one row per type, equal
    // to the all-data batch twin — which can only hold if the registers
    // really accumulated across both micro-batches
    val byType = got.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byType.keySet == twin.keySet)
    for ((t, emissions) <- byType) {
      assert(emissions.size == 1, s"$t: expected one final summary, got $emissions")
      assert(emissions.head == twin(t),
        s"$t: final sketch ${emissions.head} != batch twin ${twin(t)}")
    }
  }

  test("transformWithState event-time timers: sessions match the batch sessionize gate") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps.sessionsV2(spark, stream, gapMinutes = 30, watermark = "0 seconds")
    // batch twin: lag+running-sum sessionize, emitted iff end+gap <= max ts
    val ev = Tables(spark, sf(), "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull
          || col("us") - lag(col("us"), 1).over(w) >= 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val want = sess.filter(col("end_us") + 1800L * 1000000L <= maxUs)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    assert(got.count() == want.count(), s"stream ${got.count()} vs batch ${want.count()}")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // the timer path must have fired: some sessions are single-user tails
    // closed only by the watermark, not by a successor event — those have
    // no later event from the same user inside the batch
    assert(got.count() > 0)
  }

  test("transformWithState ListState first-k equals the batch ROW_NUMBER()<=k twin") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps.firstKV2(spark, stream, k = 3).drop("n_seen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val want = Tables(spark, sf(), "events")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("user_id"), col("rank"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    assert(got.count() == want.count(), s"stream ${got.count()} vs batch ${want.count()}")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("transformWithState initial state: snapshot seeds the fold, absent users start at 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warm").toString
    // users 1,2 purchase; user 3 only views (never emits); user 2 missing
    // from the snapshot (starts at 0); snapshot user 9 has no stream rows
    Seq(
      (1L, "2024-01-01 00:00:00.000001", 1L, "purchase", 2.5),
      (2L, "2024-01-01 00:10:00.000001", 1L, "purchase", 1.0),
      (3L, "2024-01-01 00:20:00.000001", 2L, "purchase", 10.0),
      (4L, "2024-01-01 00:30:00.000001", 3L, "view", 99.0)
    ).toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(dir)
    val snapshot = Seq((1L, 100L), (9L, 500L)).toDF("user_id", "start_cents")
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps.balancesV2(spark, stream, snapshot)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 100L + 350L, 2L), (2L, 0L, 1000L, 1L)), s"$got")
  }

  test("streaming LSH index finds the near-dup pair and skips the dissimilar doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val near = (1 to 19).map(i => s"tok$i").mkString(" ") // J = 19/20 = 0.95
    val far = (100 to 120).map(i => s"w$i").mkString(" ")
    Seq((1L, base), (2L, near), (3L, far), (4L, base))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .parquet(dir)
    val cand = StreamOps.streamingNearDupCandidates(spark, stream, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // exact dups (1,4) and the J=0.95 pair collide; doc 3 shares no band
    assert(cand.contains((1L, 4L)) && cand.contains((1L, 2L)), s"$cand")
    assert(!cand.exists(p => p._1 == 3L || p._2 == 3L), s"doc 3 must not collide: $cand")

    // fused stream→verify path: only the pairs with true J ≥ 0.95 survive
    // ((1,2) J=0.95 boundary-inclusive, (1,4)/(2,4)... (2,4): J=19/20=0.95
    // via exact-dup 4≡1; (3,*) never verified)
    val stream2 = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .parquet(dir)
    val batch = spark.read.parquet(dir)
    val ver = StreamOps.streamingVerifiedNearDups(
        spark, stream2, batch, "doc_id", "text", threshold = 0.95)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(ver == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"$ver")
  }

  test("flatMapGroupsWithState running totals reach the batch totals") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val got = StreamOps
      .runToMemory(spark, StreamOps.runningUserTotals(spark, stream), "totals", OutputMode.Append)
    // last emitted state per user == batch aggregate
    val latest = got.groupBy(col("user_id")).agg(max(col("n_events")).as("n_events"))
    val batch = Tables(spark, sf(), "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_batch"))
    val j = latest.join(batch, Seq("user_id"))
    assert(j.count() > 0)
    assert(j.filter(col("n_events") =!= col("n_batch")).count() == 0)
  }

  test("streaming CDC latest-state == batch latest-wins, any arrival order") {
    import spark.implicits._
    val changes = Seq(
      // key 7: three versions, deliberately NOT in version order in the
      // input — max-version selection must not care
      StreamOps.CdcChange(7L, "v2", 200L, 2L, "U"),
      StreamOps.CdcChange(7L, "v3", 300L, 3L, "U"),
      StreamOps.CdcChange(7L, "v1", 100L, 1L, "I"),
      // key 8: delete wins as the latest
      StreamOps.CdcChange(8L, "x", 10L, 1L, "U"),
      StreamOps.CdcChange(8L, "gone", 0L, 2L, "D"),
      // key 9: single insert
      StreamOps.CdcChange(9L, "only", 55L, 1L, "I"))
    val dir = java.nio.file.Files.createTempDirectory("cdcstream").toString
    changes.toDF().repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(changes.toDF().schema)
      .parquet(dir)
    val got = StreamOps
      .runToMemory(spark, StreamOps.cdcLatest(spark, stream), "cdc_latest", OutputMode.Append)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got == Map(
      7L -> (("v3", 300L, 3L, "U")),
      8L -> (("gone", 0L, 2L, "D")),
      9L -> (("only", 55L, 1L, "I"))), s"cdc state: $got")
  }

  // ------------------------------------------------------------------
  // round-9: RESTART recovery for the remaining stateful shapes. q353
  // proved the single-MapState machine; these prove the two state-store
  // layouts it does not cover — stream-stream join state (BOTH sides) and
  // the session window's parked open-session state + event-time timer.

  /** Stage `rows` (event_id, minuteOffset, user_id, event_type, value) as
    * one parquet file per group with ascending mtimes, so the file source
    * replays them as deterministic ordered microbatches.
    */
  private def stagedEventFiles(tag: String,
                               files: Seq[Seq[(Long, Int, Long, String, Double)]]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    files.zipWithIndex.foreach { case (rows, k) =>
      val tmp = new java.io.File(dir, s".tmp-$k")
      rows.map { case (id, minute, uid, typ, v) =>
        (id, java.sql.Timestamp.from(base.plusSeconds(minute * 60L)), uid, typ, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"b$k%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1600000000000L + k * 600000L)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    dir.toString
  }

  private def fileStream(dir: String) = spark.readStream
    .schema(StreamOps.eventSchema)
    .option("maxFilesPerTrigger", "1")
    .option("pathGlobFilter", "b*.parquet")
    .parquet(dir)

  test("stream-stream join state (BOTH sides) survives a query RESTART") {
    // purchases for users 5..9 land ONLY after the restart; their views
    // arrived ONLY before it. The pairs can appear in the final output
    // only if run 2 restored the left join state from the checkpoint.
    val views = (0L to 9L).map(u => (u, u.toInt, u, "view", 1.0))
    val earlyPurch = (0L to 4L).map(u => (100L + u, u.toInt + 10, u, "purchase", 1.0))
    val latePurch = (5L to 9L).map(u => (100L + u, u.toInt + 20, u, "purchase", 1.0))
    val in = stagedEventFiles("ssj-restart", Seq(views, earlyPurch, latePurch))
    val out = java.nio.file.Files.createTempDirectory("ssj-out").toString
    val ck = java.nio.file.Files.createTempDirectory("ssj-ck").toString
    def joined = {
      val v = fileStream(in).filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      val p = fileStream(in).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id").as("purchase_id"))
      StreamOps.streamStreamJoin(v, p, key = "user_id",
        leftTs = "ts", rightTs = "pts", skew = "30 minutes")
        .select(col("view_id"), col("purchase_id"))
    }
    // run 1 sees files 0+1 (views + early purchases); file 2 is hidden
    // behind a glob-invisible name until the "restart"
    val late = new java.io.File(in, "b002.parquet")
    val hidden = new java.io.File(in, "_late.parquet")
    val mtime = late.lastModified()
    assert(late.renameTo(hidden))
    val b1 = StreamOps.runToParquet(spark, joined, out, ck)
    assert(b1 >= 2, s"run 1 must process the two staged files, ran $b1")
    assert(hidden.renameTo(late)); late.setLastModified(mtime)
    val b2 = StreamOps.runToParquet(spark, joined, out, ck)
    assert(b2 == 1, s"run 2 must process ONLY the late file, ran $b2")
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L to 9L).map(u => (u, 100L + u)).toSet
    assert(got == expected, s"join results: $got")
    // the cross-restart rows specifically (pre-restart view, post-restart
    // purchase) — the both-sides state-restoration evidence
    assert((5L to 9L).forall(u => got((u, 100L + u))),
      "post-restart purchases must match pre-restart views")
  }

  test("session-window state (parked open session + event-time timer) survives a RESTART") {
    // user 1's session is OPEN at the restart (events at minutes
    // 0,5,10,15,20 across runs 1's two batches); post-restart minute 25
    // extends it — only possible from restored ValueState — and the
    // minute-200 row advances the watermark past end+gap so the restored
    // TIMER fires and the session closes as ONE row spanning the restart.
    val f0 = Seq((1L, 0, 1L, "view", 1.0), (2L, 5, 1L, "view", 1.0),
      (3L, 10, 1L, "view", 1.0))
    val f1 = Seq((4L, 15, 1L, "view", 1.0), (5L, 20, 1L, "view", 1.0),
      (6L, 18, 2L, "view", 1.0))
    val f2 = Seq((7L, 25, 1L, "view", 1.0), (8L, 200, 3L, "view", 1.0))
    val in = stagedEventFiles("sess-restart", Seq(f0, f1, f2))
    val out = java.nio.file.Files.createTempDirectory("sess-out").toString
    val ck = java.nio.file.Files.createTempDirectory("sess-ck").toString
    def sessions = StreamOps.sessionsV2Stream(spark, fileStream(in), gapMinutes = 30)
    val late = new java.io.File(in, "b002.parquet")
    val hidden = new java.io.File(in, "_late.parquet")
    val mtime = late.lastModified()
    assert(late.renameTo(hidden))
    val b1 = StreamOps.runToParquet(spark, sessions, out, ck)
    assert(b1 >= 2, s"run 1 must process the two staged files, ran $b1")
    assert(hidden.renameTo(late)); late.setLastModified(mtime)
    val b2 = StreamOps.runToParquet(spark, sessions, out, ck)
    assert(b2 == 1, s"run 2 must process ONLY the late file, ran $b2")
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    def us(minute: Int) = base + minute * 60000000L
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // user 3's minute-200 session is the held-back tail (nothing advanced
    // the watermark past ITS end+gap) — deterministic, excluded
    assert(got == Set(
      (1L, us(0), us(25), 6L), // ONE session spanning the restart
      (2L, us(18), us(18), 1L)), s"sessions: $got")
  }

  test("SMJ-regime pair expansion adds NO exchange beyond the index collapse") {
    // round-9 task 3b: past the broadcast cell bound, the expansion
    // self-join must inherit the collapse groupBy's (band, bhash) hash
    // partitioning through explode + rename on BOTH sides — exchange reuse
    // then executes that one shuffle once, and EnsureRequirements adds
    // nothing at the join. The r8 4.76× shuffle slope was a coalesce
    // destroying this; pin the property so it can't silently return.
    import spark.implicits._
    val index = Seq(
      // 4-clique bucket; distinct fsigs so all 6 pairs expand here
      (0, 11L, Seq(1L, 2L, 3L, 4L), Seq(901L, 902L, 903L, 904L), Seq(5, 5, 5, 5)),
      // non-zero band with an equal-fsig pair (5,6): suppressed by the
      // band-0-only rule; (5,7) and (6,7) survive
      (3, 22L, Seq(5L, 6L, 7L), Seq(902L, 902L, 907L), Seq(5, 6, 7)),
      (0, 33L, Seq(8L, 9L), Seq(908L, 909L), Seq(4, 4))
    ).toDF("band", "bhash", "members", "fsigs", "szs")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = pairs(StreamOps.expandBucketPairsRaw(index, None)) // broadcast regime
    assert(expected.size == 9 && !expected.contains((5L, 6L)), s"ground truth: $expected")

    val savedThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqeThresh = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    sys.props("graft.expand.cellBound") = "0"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = StreamOps.expandBucketPairsRaw(index, None) // runs the cells probe
      val shuffleWrites = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten > 0) {
            shuffleWrites.incrementAndGet(); ()
          }
      }
      spark.sparkContext.addSparkListener(l)
      val got = try {
        val g = pairs(df)
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        g
      } finally spark.sparkContext.removeSparkListener(l)
      assert(got == expected, s"SMJ-regime pairs diverged: $got")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"regime pin failed — expected a sort-merge join:\n$plan")
      assert(shuffleWrites.get == 1,
        s"expansion must shuffle exactly ONCE (the index collapse); " +
          s"saw ${shuffleWrites.get} shuffle-writing stages:\n$plan")
    } finally {
      sys.props.remove("graft.expand.cellBound")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
      savedAqeThresh match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
