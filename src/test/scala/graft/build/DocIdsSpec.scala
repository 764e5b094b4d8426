package graft.build

import graft.SparkSuite
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.functions._

/** DocIds.assign: dense ordering invariant under BOTH execution paths —
  * the presorted no-shuffle fast path (sorted inputs, verified by a scan,
  * never assumed) and the repartitionByRange fallback. */
class DocIdsSpec extends SparkSuite {
  import spark.implicits._

  /** ids must be exactly the dense rank of (conv_id, turn_idx). */
  private def assertDense(assigned: org.apache.spark.sql.DataFrame): Unit = {
    val rows = assigned.select("docId", "conv_id", "turn_idx")
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2))))
    val byId = rows.sortBy(_._1)
    assert(byId.map(_._1).toSeq === byId.indices.map(_.toLong), "ids not dense from 0")
    assert(byId.map(_._2).toSeq === rows.map(_._2).sortBy(identity).toSeq,
      "id order is not the key order")
  }

  test("sorted multi-partition input takes the fast path and mints key-ordered ids") {
    // generated turns are globally sorted by (conv_id, turn_idx) across
    // range partitions — the fast path must detect that
    val turns = TranscriptGen.generate(spark, 40).toDF()
    val cached = turns.persist()
    try {
      assert(DocIds.sortedOffsets(cached, Seq("conv_id", "turn_idx")).isDefined,
        "generated corpus should verify as globally sorted")
      assertDense(DocIds.assign(cached, Seq("conv_id", "turn_idx")))
    } finally { cached.unpersist(); () }
  }

  test("unsorted input is detected and falls back to the shuffle path") {
    val turns = TranscriptGen.generate(spark, 20).toDF()
      .orderBy(col("text")) // scrambles the key order deterministically
      .persist()
    try {
      assert(DocIds.sortedOffsets(turns, Seq("conv_id", "turn_idx")).isEmpty,
        "text-ordered corpus must NOT verify as key-sorted")
      assertDense(DocIds.assign(turns, Seq("conv_id", "turn_idx")))
    } finally { turns.unpersist(); () }
  }

  test("sorted-within but misordered ACROSS partitions is rejected") {
    // two single-partition frames unioned in reverse key order: each
    // partition is internally sorted, the boundary check must fail
    val ts = new java.sql.Timestamp(0L)
    def part(convs: Seq[String]) = convs.zipWithIndex
      .map { case (c, i) => graft.model.Turn(c, i, "user", s"text $c", None, ts) }
      .toDS().toDF().coalesce(1)
    val rev = part(Seq("zz", "zz")).union(part(Seq("aa", "aa"))).persist()
    try {
      assert(DocIds.sortedOffsets(rev, Seq("conv_id", "turn_idx")).isEmpty)
      assertDense(DocIds.assign(rev, Seq("conv_id", "turn_idx")))
    } finally { rev.unpersist(); () }
  }

  test("equal keys on a partition boundary still verify (order among equals is free)") {
    val ts = new java.sql.Timestamp(0L)
    def one(conv: String, idx: Int) =
      Seq(graft.model.Turn(conv, idx, "user", "x", None, ts)).toDS().toDF().coalesce(1)
    val dup = one("c1", 0).union(one("c1", 0)).union(one("c2", 1)).persist()
    try {
      assert(DocIds.sortedOffsets(dup, Seq("conv_id", "turn_idx")).isDefined)
      val ids = DocIds.assign(dup, Seq("conv_id", "turn_idx"))
        .select("docId").as[Long].collect().sorted.toSeq
      assert(ids === Seq(0L, 1L, 2L))
    } finally { dup.unpersist(); () }
  }

  test("a caller-cached input survives assign (its cache is not dropped)") {
    val turns = TranscriptGen.generate(spark, 10).toDF().persist()
    try {
      turns.count()
      DocIds.assign(turns, Seq("conv_id", "turn_idx"))
      assert(turns.storageLevel !== org.apache.spark.storage.StorageLevel.NONE,
        "assign must not unpersist the caller's cache")
    } finally { turns.unpersist(); () }
  }

  test("assignLazy mints the same dense ids as assign on a caller-cached input") {
    val turns = TranscriptGen.generate(spark, 25).toDF().persist()
    try {
      turns.count()
      val lazyIds = DocIds.assignLazy(turns, Seq("conv_id", "turn_idx"))
      // the caller's first action materializes (here: the assertion scan)
      assertDense(lazyIds)
      val eager = DocIds.assign(turns, Seq("conv_id", "turn_idx"))
      assert(lazyIds.select("docId", "conv_id", "turn_idx").collect().map(_.toSeq).sortBy(_.toString)
        === eager.select("docId", "conv_id", "turn_idx").collect().map(_.toSeq).sortBy(_.toString))
      lazyIds.unpersist(); eager.unpersist()
    } finally { turns.unpersist(); () }
  }

  test("assignLazy on an UNcached input stays eager (shuffle-path safety)") {
    // uncached sorted input: ownCache=true ⇒ the deferral must NOT be
    // taken (src cache is dropped on return), so ids still mint eagerly
    val turns = TranscriptGen.generate(spark, 15).toDF()
    assertDense(DocIds.assignLazy(turns, Seq("conv_id", "turn_idx")))
  }

  test("both paths agree: same ids for the same logical corpus") {
    val sortedIn = TranscriptGen.generate(spark, 30).toDF()
    val scrambled = sortedIn.orderBy(col("text"))
    val a = DocIds.assign(sortedIn, Seq("conv_id", "turn_idx"))
      .select("docId", "conv_id", "turn_idx", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).sorted.toSeq
    val b = DocIds.assign(scrambled, Seq("conv_id", "turn_idx"))
      .select("docId", "conv_id", "turn_idx", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).sorted.toSeq
    assert(a === b)
  }
}
