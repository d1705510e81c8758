package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixture for the directed motif census (the oracle pins
  * engine-equivalence on the slice; this pins the SEMANTICS — both
  * engines computing the wrong motif identically would still
  * hash-match).
  *
  * Fixture: 1→2, 2→3, 1→3, 3→1, 2→1.
  *  - node 1: paths a→1→c (a≠c): 2→1→3, 3→1→2 → n_path2 = 2
  *            (= in 2 · out 2 − mutual 2); ffl anchored at 1:
  *            (1→2, 2→3, 1→3) → 1; cycle rotation at 1: 1→2→3→1 → 1.
  *  - node 2: n_path2 = 1 (1→2→3; 1→2→1 is the mutual degenerate),
  *            ffl = 2 ((2→1, 1→3, 2→3) and (2→3, 3→1, 2→1)),
  *            cyc = 1 (2→3→1→2).
  *  - node 3: n_path2 = 1 (2→3→1), ffl = 0, cyc = 1 (3→1→2→3).
  */
class MotifSpec extends AnyFunSuite {

  lazy val spark: SparkSession = core.Sessions.local(4, "graft-motif-test")

  test("motif census matches the hand-computed fixture") {
    import spark.implicits._
    val nodes = Seq("1", "2", "3").toDF("node")
    val edges = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("3", "1"),
      ("2", "1")).toDF("src", "dst")
    val got = algo.Motifs.counts(nodes, edges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      "1" -> ((2L, 1L, 1L)),
      "2" -> ((1L, 2L, 1L)),
      "3" -> ((1L, 0L, 1L))))
  }

  test("self-loops and isolated nodes: dropped / zero-filled") {
    import spark.implicits._
    val nodes = Seq("1", "2", "9").toDF("node")
    val edges = Seq(("1", "1"), ("1", "2")).toDF("src", "dst")
    val got = algo.Motifs.counts(nodes, edges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      "1" -> ((0L, 0L, 0L)),
      "2" -> ((0L, 0L, 0L)),
      "9" -> ((0L, 0L, 0L))))
  }
}
