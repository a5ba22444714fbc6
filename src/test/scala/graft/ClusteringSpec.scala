package graft

import graft.ops.Clustering

class ClusteringSpec extends SparkTestBase {

  test("gridDbscan: two clusters, deterministic border assignment, noise") {
    import spark.implicits._
    // cluster A: 3x2 block of points at (0..2, 0..1) — ids 1..6
    val a = for { x <- 0L to 2L; y <- 0L to 1L } yield (x * 2 + y + 1, x, y)
    // cluster B: 3x2 block at (10..12, 0..1) — ids 11..16
    val b = for { x <- 10L to 12L; y <- 0L to 1L } yield ((x - 10) * 2 + y + 11, x, y)
    // border candidate: (4, 0) — within eps of A's (3?, no): make it (3, 0),
    // adjacent to A's rightmost column but with a too-small own neighborhood
    val border = Seq((99L, 3L, 0L))
    // noise: far from everything
    val noise = Seq((100L, 50L, 50L))
    val pts = (a ++ b ++ border ++ noise).toDF("id", "x", "y")
    val got = Clustering.gridDbscan(pts, eps = 1L, minPts = 4L)
      .collect().map(r => (r.getLong(0),
        (r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap

    // every A point sees >= 4 points incl. self (a 3x2 block corner has
    // exactly {self, right, diag, up} = 4) -> core, cluster = min A id = 1
    for (id <- 1L to 6L) assert(got(id) == ("core", 1L), s"A $id: ${got(id)}")
    // every B point -> core, cluster = min id of B = 11
    for (id <- 11L to 16L) assert(got(id) == ("core", 11L), s"B $id: ${got(id)}")
    // (3,0) has neighbors {(2,0),(2,1),self} = 3 < 4 -> not core, but core
    // neighbors exist -> border, joins A's cluster (its only core component)
    assert(got(99L) == ("border", 1L), s"border: ${got(99L)}")
    // far point: noise, NULL cluster
    assert(got(100L) == ("noise", -1L), s"noise: ${got(100L)}")
  }

  test("gridDbscan: border between two clusters joins the MINIMUM component") {
    import spark.implicits._
    // two 5-point plus-shaped dense cores whose centers are 4 apart, and a
    // point exactly between them adjacent to both clusters' rims
    def plus(cx: Long, cy: Long, base: Long) = Seq(
      (base, cx, cy), (base + 1, cx - 1, cy), (base + 2, cx + 1, cy),
      (base + 3, cx, cy - 1), (base + 4, cx, cy + 1))
    val left = plus(0, 0, 1)   // ids 1..5, rim at x=1
    val right = plus(4, 0, 21) // ids 21..25, rim at x=3
    val mid = Seq((50L, 2L, 0L)) // adjacent to (1,0) [id 3] and (3,0) [id 22]
    val pts = (left ++ right ++ mid).toDF("id", "x", "y")
    val got = Clustering.gridDbscan(pts, eps = 1L, minPts = 4L)
      .collect().map(r => (r.getLong(0),
        (r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // the rim points (1,0) and (3,0): neighborhoods {center, 2 arms?} —
    // (1,0) sees (0,0),(0,1),(0,-1),(2,0) + self = 5 >= 4 -> core
    assert(got(3L)._1 == "core" && got(3L)._2 == 1L, s"left rim: ${got(3L)}")
    assert(got(22L)._1 == "core" && got(22L)._2 == 21L, s"right rim: ${got(22L)}")
    // the midpoint sees (1,0),(3,0) + self = 3 < 4 -> border; its core
    // neighbors are in components 1 and 21 -> joins MIN = 1, always
    assert(got(50L) == ("border", 1L), s"mid: ${got(50L)}")
  }
}
