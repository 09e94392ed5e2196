package graft

import org.apache.spark.sql.functions._
import graft.ops.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, "u1", 100L), // after right@50 and right@100 → inclusive tie picks 100
      (2L, "u1", 99L),  // between 50 and 100 → 50
      (3L, "u1", 10L),  // before any right row → null
      (4L, "u2", 500L), // other key: only u2's rows are visible → 400
      (5L, "u3", 500L)  // key with no right rows at all → null
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u1", 50L, "a"), ("u1", 100L, "b"), ("u1", 200L, "c"),
      ("u2", 400L, "x")
    ).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out == Map(1L -> "b", 2L -> "a", 3L -> null, 4L -> "x", 5L -> null))
  }

  test("asofJoin carries multiple right value columns and keeps the left payload") {
    val left = Seq((1L, "u", 10L, "keep")).toDF("id", "k", "ts", "payload")
    val right = Seq(("u", 5L, 42L, 3.5)).toDF("k", "ts", "rid", "score")
    val row = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("rid", "score")).head()
    assert(row.getAs[String]("payload") == "keep")
    assert(row.getAs[Long]("rid") == 42L && row.getAs[Double]("score") == 3.5)
  }

  test("asofJoin carries the latest right ROW even when its values are null") {
    // DuckDB ASOF semantics: the ts=50 row matches; its NULL value must be
    // returned, not the older non-null from ts=10 — and both value columns
    // must come from the SAME right row
    val left = Seq((1L, "u", 100L)).toDF("id", "k", "ts")
    val right = Seq(
      ("u", 10L, Some("a"), Some(1L)),
      ("u", 50L, None: Option[String], Some(2L))
    ).toDF("k", "ts", "v", "n")
    val row = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v", "n")).head()
    assert(row.getAs[String]("v") == null)
    assert(row.getAs[Long]("n") == 2L)
  }

  test("asofJoin rejects rightVals that collide with left columns") {
    val left = Seq((1L, "u", 10L)).toDF("id", "k", "ts")
    val right = Seq(("u", 5L, "x")).toDF("k", "ts", "id")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("id"))
    }
  }

  test("rangeJoin matches [start, end) exactly once per containing interval") {
    val points = Seq(10L, 100L, 199L, 200L, 250L).map(Tuple1(_)).toDF("t")
    val intervals = Seq(
      (1L, 100L, 200L),  // catches 100 (inclusive start), 199; NOT 200 (exclusive end)
      (2L, 150L, 260L),  // overlaps interval 1: 199 pairs with both; 200, 250
      (3L, 300L, 300L),  // empty — dropped
      (4L, 0L, 1000L)    // longer than maxLen: still catches everything
    ).toDF("iid", "s", "e")
    val pairs = Temporal.rangeJoin(points, intervals, "t", "s", "e", maxLen = 100L)
      .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set(
      (1L, 100L), (1L, 199L),
      (2L, 199L), (2L, 200L), (2L, 250L),
      (4L, 10L), (4L, 100L), (4L, 199L), (4L, 200L), (4L, 250L)))
    // exactly-once: no (point, interval) pair duplicated by the bucket explode
    val all = Temporal.rangeJoin(points, intervals, "t", "s", "e", maxLen = 100L)
      .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all.size == all.distinct.size)
  }

  test("overlapJoin pairs overlapping intervals exactly once; touching is not overlap") {
    // key k: L1=[0,200) overlaps R1=[50,350) — they SHARE buckets {0,1} at
    // maxLen=100, so the canonical-bucket filter must collapse the two
    // join hits to exactly one pair; L1 touches R2=[200,300) end-to-start
    // → NO pair; L2=[500,510) ⊂ R3=[400,600); other-key intervals never
    // pair; the empty interval R4=[700,700) matches nothing and must not
    // crash the bucket sequence
    val left = Seq(("k", 1L, 0L, 200L), ("k", 2L, 500L, 510L), ("z", 3L, 0L, 200L))
      .toDF("key", "lid", "ls", "le")
    val right = Seq(("k", 10L, 50L, 350L), ("k", 11L, 200L, 300L),
      ("k", 12L, 400L, 600L), ("k", 13L, 700L, 700L))
      .toDF("key", "rid", "rs", "re")
    val out = Temporal.overlapJoin(left, right, "key", "ls", "le", "rs", "re", maxLen = 100L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out == Seq((1L, 10L), (2L, 12L)), s"got $out")
  }
}
