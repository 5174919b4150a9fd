package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Round-7 units: as-of join null semantics (struct payload carry), the
  * connected-components convergence contract, and the disk-index append
  * paths.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ===== as-of join null semantics =========================================

  test("asof: a matched right row's NULL payload value stays null (no stale carry)") {
    val left = Seq((1L, "k", 10L), (2L, "k", 20L)).toDF("id", "key", "ts")
    // right row at ts=5 has value 100; the later row at ts=15 has a NULL
    // value — the ts=20 left row matched ts=15 and must report null, not 100
    val right = Seq((5L, "k", Some(100)), (15L, "k", None))
      .toDF("rts", "key", "value")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .orderBy("id").collect()
    assert(out(0).getInt(3) == 100)
    assert(out(1).isNullAt(3), s"ts=20 matched the ts=15 row whose value IS null; got ${out(1)}")
  }

  test("asof: multi-column payload comes from ONE right row, never mixed") {
    val left = Seq((1L, "k", 20L)).toDF("id", "key", "ts")
    // latest match is ts=15 with (a=null, b=2); per-column carry would
    // resurrect a=1 from ts=5 while taking b=2 from ts=15
    val right = Seq((5L, "k", Some(1), Some(1)), (15L, "k", None, Some(2)))
      .toDF("rts", "key", "a", "b")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("a", "b"))
      .collect()(0)
    assert(out.isNullAt(3), s"a must be the matched row's null, got $out")
    assert(out.getInt(4) == 2)
  }

  test("asof: NULL keys and NULL timestamps never match") {
    val left = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null, 5L), Row(2L, "k", null), Row(3L, "k", 5L))),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long", false).add("key", "string", true).add("ts", "long", true))
    val right = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(5L, null, 100), Row(5L, "k", 200), Row(null, "k", 300))),
      new org.apache.spark.sql.types.StructType()
        .add("rts", "long", true).add("key", "string", true).add("value", "integer", true))
    // backward: null-key left row (1) and null-ts left row (2) match nothing;
    // row 3 (ts=5) matches the (5,k,200) right row inclusively in BOTH
    // directions — the null-key and null-ts right rows are invisible
    val back = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .orderBy("id").collect()
    assert(back(0).isNullAt(3) && back(1).isNullAt(3))
    assert(back(2).getInt(3) == 200)
    // forward (descending scan, where nulls would otherwise sort into a
    // carried payload): same three verdicts
    val fwd = AsofJoin.forward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .orderBy("id").collect()
    assert(fwd(0).isNullAt(3) && fwd(1).isNullAt(3))
    assert(fwd(2).getInt(3) == 200)
  }

  test("asof: unmatched left rows still get null payload (left-outer)") {
    val left = Seq((1L, "k", 3L)).toDF("id", "key", "ts")
    val right = Seq((5L, "k", 100)).toDF("rts", "key", "value")
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "rts", Seq("value"))
      .collect()(0)
    assert(out.isNullAt(3))
  }

  // ===== connected-components convergence contract =========================

  test("connectedComponents fails loudly when maxRounds is exhausted") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      graft.data.Dedup.connectedComponents(verts, pairs, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and the default cap converges on the same chain
    val ok = graft.data.Dedup.connectedComponents(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L))
  }
}
