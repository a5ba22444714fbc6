package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 coreness plan lab — measures step-form variants on the sf0.1
  * co-supply graph, all REQUIRED to reach the identical fixed point. Lives
  * in `package graft.ops` (test sources) to reach the private round
  * machinery. The winner ships as `Graph.coreness`'s plan; the ledger goes
  * to SURVEY §8.8.
  *
  * Run: sbt "Test/runMain graft.ops.CorenessLab"
  */
object CorenessLab {

  /** The loop, parameterized by step form. Forms:
    *  - ranked:      row_number over raw votes (round-6 shipped)
    *  - rankedPre:   ranked + adjacency pre-partitioned/sorted by src
    *  - hist:        capped-vote (dst,v) pre-agg + tiny window (2 exch)
    *  - histPre:     hist + pre-partitioned adjacency
    *  - histRepart:  repartition(dst) first, agg+window exchange-free
    */
  def run(edges: DataFrame, form: String, maxRounds: Int = 64,
          stepsPerCheckpoint0: Int = 4): DataFrame = {
    val stepsPerCheckpoint = if (form.endsWith("8")) 8 else stepsPerCheckpoint0
    val sess = edges.sparkSession
    val adjChain = new Graph.RoundChain(sess.sparkContext)
    val symRaw = edges
      .select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    val pre = form.endsWith("Pre")
    val bcast = form.startsWith("bcast")
    val inConf = form.contains("In") // sym ckpt'd INSIDE withRoundConf (AQE
    // off ⇒ localCheckpoint preserves the dst partitioning — measured: with
    // AQE on the executed plan reports UnknownPartitioning and the ckpt
    // loses it, re-inserting an Exchange above every window)
    val nEdgesRaw = symRaw.count()
    val roundParts = math.max(1, math.min(
      sess.sessionState.conf.numShufflePartitions, (nEdgesRaw / 100000L).toInt + 1))
    // scope AQE OFF around a checkpoint so the LogicalRDD keeps the child's
    // HashPartitioning (with AQE on, the adaptive plan reports
    // UnknownPartitioning at checkpoint-build time and the partitioning is
    // lost — measured: every downstream window then re-exchanges)
    def ckptKeepPart(c: Graph.RoundChain, df: DataFrame): DataFrame = {
      val k = "spark.sql.adaptive.enabled"
      val prev = sess.conf.get(k)
      sess.conf.set(k, "false")
      try c.ckpt(df) finally sess.conf.set(k, prev)
    }
    def mkSym(): DataFrame =
      if (pre) adjChain.ckpt(symRaw.repartition(roundParts, col("src")).sortWithinPartitions("src"))
      else if (form.startsWith("bcastP"))
        ckptKeepPart(adjChain, symRaw.repartition(col("dst")))
      else if (bcast) adjChain.ckpt(symRaw.repartition(roundParts, col("dst")))
      else adjChain.ckpt(symRaw)
    var sym: DataFrame = if (inConf) null else mkSym()
    val nEdges = nEdgesRaw
    val chain = new Graph.RoundChain(sess.sparkContext)
    var cur: DataFrame = null
    def witness(d: DataFrame): (Long, java.math.BigDecimal) = {
      val r = d.agg(count(lit(1)), sum(col("c").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val wPerNode = Window.partitionBy(col("dst")).orderBy(col("cval").desc)
    def hinted(df: DataFrame, rows: Long): DataFrame =
      if (rows <= 4000000L) broadcast(df) else df
    def stepRanked(l: DataFrame): DataFrame =
      sym.join(l, sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .withColumn("rn", row_number().over(wPerNode))
        .groupBy(col("dst").as("node"))
        .agg(max(least(col("cval"), col("rn"))).as("c"))
    def stepHist(cap: DataFrame, capRows: Long)(l: DataFrame): DataFrame =
      sym.join(l, sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .join(hinted(cap.select(col("node").as("cnode"), col("c").as("cap")), capRows),
          col("dst") === col("cnode"))
        .groupBy(col("dst"), least(col("cval"), col("cap")).as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt"))
          .over(Window.partitionBy(col("dst")).orderBy(col("v").desc)))
        .groupBy(col("dst").as("node"))
        .agg(max(least(col("v"), col("cum"))).as("c"))
    // h-index via per-node sorted array + codegen'd zip_with max(min(v, i)):
    // ONE exchange, no partition-wide window sort — each node sorts only its
    // own votes (Σ d log d < N log N), and the rank bookkeeping is a
    // collection expression inside whole-stage codegen
    def stepArr(l: DataFrame): DataFrame =
      sym.join(l, sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .groupBy(col("dst").as("node"))
        .agg(reverse(array_sort(collect_list(col("cval")))).as("vs"))
        .select(col("node"),
          array_max(zip_with(col("vs"),
            sequence(lit(1L), size(col("vs")).cast("long")),
            (v, i) => least(v, i))).as("c"))
    // EXCHANGE-FREE step: sym pre-partitioned by dst; the node frame is
    // broadcast at EVERY chained step (node count is fixed and measured
    // once), so the join is BHJ preserving sym's partitioning and the
    // window + groupBy run in the same stage with a within-partition sort
    // only. Per chained step the only job is the broadcast build, which is
    // linear (each BroadcastExchange in the nested plan materializes once).
    def stepBcast(l: DataFrame): DataFrame =
      sym.join(broadcast(l), sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .withColumn("rn", row_number().over(wPerNode))
        .groupBy(col("dst").as("node"))
        .agg(max(least(col("cval"), col("rn"))).as("c"))
    def stepBcastArr(l: DataFrame): DataFrame =
      sym.join(broadcast(l), sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .groupBy(col("dst").as("node"))
        .agg(reverse(array_sort(collect_list(col("cval")))).as("vs"))
        .select(col("node"),
          array_max(zip_with(col("vs"),
            sequence(lit(1L), size(col("vs")).cast("long")),
            (v, i) => least(v, i))).as("c"))
    // exchange-free capped histogram: with sym partitioned by dst,
    // HashPartitioning(dst) satisfies the (dst, v) grouping, the tiny
    // window, and the final agg — zero exchanges, and the per-hub work is
    // an O(d) hash-agg instead of an O(d log d) single-task sort
    def stepBcastHist(cap: DataFrame)(l: DataFrame): DataFrame =
      sym.join(broadcast(l), sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .join(broadcast(cap.select(col("node").as("cnode"), col("c").as("cap"))),
          col("dst") === col("cnode"))
        .groupBy(col("dst"), least(col("cval"), col("cap")).as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt"))
          .over(Window.partitionBy(col("dst")).orderBy(col("v").desc)))
        .groupBy(col("dst").as("node"))
        .agg(max(least(col("v"), col("cum"))).as("c"))
    def stepHistRepart(cap: DataFrame, capRows: Long)(l: DataFrame): DataFrame =
      sym.join(l, sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .join(hinted(cap.select(col("node").as("cnode"), col("c").as("cap")), capRows),
          col("dst") === col("cnode"))
        .repartition(col("dst"))
        .groupBy(col("dst"), least(col("cval"), col("cap")).as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt"))
          .over(Window.partitionBy(col("dst")).orderBy(col("v").desc)))
        .groupBy(col("dst").as("node"))
        .agg(max(least(col("v"), col("cum"))).as("c"))
    Graph.withRoundConf(sess, nEdges) {
      if (inConf) sym = mkSym()
      cur = chain.ckpt(sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("c")))
      var w0 = witness(cur)
      var converged = false
      var rounds = 0
      while (!converged && rounds < maxRounds) {
        val step: DataFrame => DataFrame = form match {
          case "ranked" | "rankedPre"            => stepRanked
          case "hist" | "histPre"                => stepHist(cur, w0._1)
          case "histRepart"                      => stepHistRepart(cur, w0._1)
          case "arr" | "arrPre"                  => stepArr
          case "bcast" | "bcast8" | "bcastIn" | "bcastIn8" | "bcastP" | "bcastP8" => stepBcast
          case "bcastArr" | "bcastInArr" | "bcastPArr" => stepBcastArr
          case "bcastPHist"                      => stepBcastHist(cur)
        }
        val t0 = System.nanoTime()
        val chained = (1 to stepsPerCheckpoint).foldLeft(hinted(cur, w0._1))((d, _) => step(d))
        if (rounds == stepsPerCheckpoint && sys.props.contains("coreness.lab.explain")) {
          val p = chained.queryExecution.executedPlan.toString
          println(s"--- $form block-1 plan: exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size} bcasts=${"BroadcastExchange".r.findAllIn(p).size} sorts=${"Sort \\[".r.findAllIn(p).size}")
          if (sys.props.contains("coreness.lab.fullplan")) println(p)
        }
        val next = chain.ckpt(chained)
        val t1 = System.nanoTime()
        val w1 = witness(next)
        val t2 = System.nanoTime()
        if (sys.props.contains("coreness.lab.trace"))
          println(f"  block@$rounds%2d ckpt=${(t1 - t0) / 1e9}%.2f wit=${(t2 - t1) / 1e9}%.2f")
        cur = next
        converged = w1 == w0
        w0 = w1
        rounds += stepsPerCheckpoint
      }
      require(converged, s"not converged in $maxRounds")
    }
    adjChain.free()
    chain.keep()
    cur.select(col("node"), col("c").as("coreness"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(urgent, Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().localCheckpoint()
    println(s"edges: ${edges.count()}")

    def fp(df: DataFrame): String =
      df.orderBy("node")
        .select(md5(concat_ws(":", col("node"), col("coreness"))).as("h"))
        .agg(md5(concat_ws("", collect_list(col("h"))))).head().getString(0)

    val forms = if (args.nonEmpty) args.toSeq
                else Seq("ranked", "rankedPre", "hist", "histPre", "histRepart")
    // fingerprint check (also warms)
    val fps = forms.map(f => f -> fp(run(edges, f)))
    println(fps.map { case (f, h) => s"$f=$h" }.mkString("  "))
    require(fps.map(_._2).distinct.size == 1, "fixed points differ!")

    def timeIt(f: String): Double = {
      val t0 = System.nanoTime()
      run(edges, f).count()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach { _ =>
      forms.foreach(f => println(f"[$f%-10s] ${timeIt(f)}%.2f s"))
    }
    spark.stop()
  }
}
