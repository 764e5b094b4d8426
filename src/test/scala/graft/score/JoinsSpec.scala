package graft.score

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** JoinUtil-semantics joins (reference: SearchBucket.java:226-312,
  * 602-614) and the joined-fetch cap (Lucene.java:869-901). */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val turns = Seq(
    (0L, "c0", 1.0f), (1L, "c0", 3.0f), (2L, "c1", 2.0f), (3L, "c2", 5.0f)
  ).toDF("docId", "conv", "score")
  private lazy val convs = Seq("c0", "c1", "c3").toDF("conv_id")

  test("ScoreMode.None semi-join keeps only matching keys") {
    val got = Joins.semiJoin(convs, "conv_id", turns.filter($"score" > 1.5f), "conv")
      .collect().map(_.getString(0)).sorted
    assert(got === Array("c0", "c1"))
  }

  test("anti join removes matching keys") {
    val got = Joins.antiJoin(convs, "conv_id", turns, "conv")
      .collect().map(_.getString(0)).sorted
    assert(got === Array("c3"))
  }

  test("ScoreMode.Avg join carries the average from-side score") {
    val got = Joins.avgScoreJoin(convs, "conv_id", turns, "conv")
      .select("conv_id", "joinScore").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got("c0") === 2.0) // avg(1, 3)
    assert(got("c1") === 2.0)
    assert(!got.contains("c3")) // inner: non-matching convs drop out
  }

  test("two-hop semi-join chains key sets") {
    val bridge = Seq(("c0", "g0"), ("c1", "g1"), ("c3", "g2")).toDF("conv", "grp")
    val groups = Seq("g0", "g2").toDF("grp_id")
    val got = Joins.semiJoin2(groups, "grp_id", bridge, "conv", "grp",
      turns.filter($"score" > 1.5f), "conv")
      .collect().map(_.getString(0)).sorted
    assert(got === Array("g0")) // c0 matches -> g0; c3 has no scored turn
  }

  test("joinedFetch caps related rows per hit, ordered by id") {
    val related = (0 until 250).map(i => ("c0", i.toLong)).toDF("conv", "rid")
    val hits = Seq("c0").toDF("conv_id")
    val got = Joins.joinedFetch(hits, "conv_id", related, "conv", "rid", limit = 100)
    assert(got.count() === 100)
    assert(got.agg(max($"rid")).collect()(0).getLong(0) === 99L)
  }
}
