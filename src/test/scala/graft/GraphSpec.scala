package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** PageRank + degree report over join-derived edge lists. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetric ring is uniform, mass conserved") {
    // 0-1-2-3-4-0 ring, symmetrized: every vertex identical by symmetry
    val ring = (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong))
    val edges = (ring ++ ring.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 5)
    r.values.foreach(v => assert(math.abs(v - 0.2) < 1e-9, s"not uniform: $r"))
  }

  test("pagerank: star center outranks leaves; no-dangling mass conserved") {
    // undirected star: center 0, leaves 1..6
    val spokes = (1 to 6).map(i => (0L, i.toLong))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val leaves = (1 to 6).map(i => r(i.toLong))
    assert(leaves.forall(v => r(0L) > 2 * v), s"center not dominant: $r")
    // symmetrized graph has no sinks: total mass stays ~1
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass leaked: ${r.values.sum}")
    // leaves are symmetric
    assert(leaves.distinct.size == 1, s"leaves differ: $r")
  }

  test("pagerank: plain-sum fold agrees with deterministic fold") {
    val spokes = (1 to 6).map(i => (0L, i.toLong)) ++ Seq((1L, 2L), (3L, 4L))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val det = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val fast = GraphOps.pageRank(edges, "src", "dst", iters = 5,
        deterministicFold = false)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    det.foreach { case (k, v) => assert(math.abs(fast(k) - v) < 1e-9) }
  }

  test("personalized pagerank: seeds keep restart mass, relevance decays with distance") {
    // path graph 0-1-2-3-4-5 symmetrized, seed {0}: rank must decay
    // monotonically away from the seed, and the seed must keep its
    // restart mass even in round 1 when its only in-neighbor (vertex 1)
    // still has zero rank — the vanishing-seed regression case
    val path = (0 until 5).map(i => (i.toLong, (i + 1).toLong))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    // enough rounds to pass the path's parity-oscillation transient
    val r = GraphOps.personalizedPageRank(edges, "src", "dst",
        seedIds = Seq(0L), iters = 30)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 6)
    assert(r(0L) >= 0.15 - 1e-9, s"seed lost restart mass: $r")
    // the seed's only neighbor legitimately tops the seed (it receives
    // the seed's ENTIRE outflow, the seed only half of its neighbor's);
    // beyond it relevance decays monotonically with distance
    (1 until 5).foreach(i =>
      assert(r(i.toLong) > r(i.toLong + 1), s"no distance decay: $r"))
    assert(r(0L) > r(2L), s"seed outranked by non-neighbor: $r")
    // seeds not in the graph are rejected
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(edges, "src", "dst", Seq(99L))
    }
  }

  test("degrees: in/out/total over a digraph") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val d = GraphOps.degrees(edges, "src", "dst")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d(0L) == ((2L, 0L, 2L)))
    assert(d(1L) == ((1L, 1L, 2L)))
    assert(d(2L) == ((0L, 2L, 2L)))
  }

  test("triangleCounts: K4 gives 3 per node; direction and duplicates don't double-count") {
    // K4 has 4 triangles; each node sits on 3 of them. Reversed and
    // duplicated edges must collapse in the canonicalization.
    val k4 = (for {
      a <- 0L to 3L; b <- 0L to 3L if a != b
    } yield (a, b)).toDF("src", "dst")
    val t = GraphOps.triangleCounts(k4, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), t.toString)
    // a path graph has no triangles -> empty result, not zeros
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(GraphOps.triangleCounts(path, "src", "dst").count() == 0L)
  }
}
