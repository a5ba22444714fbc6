package graft.util

/** The ONE heap-derived broadcast bound (round-10: the formula had been
  * copy-pasted into `Graph.BcastRows`, `Dedup.bcastLabelBound` and
  * `StreamOps.broadcastCellBound`, each with its own doc — three
  * derivations that could silently drift apart at the next
  * recalibration; the r9 ADVICE finding).
  *
  * Derivation (round-9, measured at the 300× ladder rung): a broadcast
  * row/cell in the families that gate on this bound is a small UnsafeRow
  * (~48 B payload — two longs for a graph node frame, five fields for an
  * LSH probe cell); the `HashedRelation` holding it costs ~128 B all-in
  * (map + key overhead, a conservative ~2.7× of the payload). Budget:
  * 1/8 of max heap — local mode holds ONE copy of the broadcast (driver
  * = executor JVM) and 32 concurrent tasks share it. Capped at 32M rows
  * (≈4 GB relation), clear of Spark's 8 GB broadcast hard limit. Past
  * the bound every caller falls back to its plain shuffle plan — the
  * correct 100 TB shape; the fixed 4M constant this replaced pushed the
  * 300× graph rung (6M nodes on an 80 g heap) into per-round full
  * shuffles a decade before memory ran out (LPA shuffle 32.7× for 3×
  * data at that cliff).
  *
  * `prop` (sys prop) and optionally `env` (environment variable, for
  * forked ladder JVMs) pin the bound for regime-pinned measurement; the
  * per-site override names are unchanged so existing specs and ladder
  * recipes keep working.
  */
object HeapBounds {
  val BytesPerRow = 128L
  val HeapFraction = 8L
  val CapRows = 32_000_000L

  def broadcastRowBound(prop: String, env: Option[String] = None): Long =
    sys.props.get(prop)
      .orElse(env.flatMap(sys.env.get))
      .map(_.toLong)
      .getOrElse(math.min(
        Runtime.getRuntime.maxMemory() / HeapFraction / BytesPerRow, CapRows))
}
