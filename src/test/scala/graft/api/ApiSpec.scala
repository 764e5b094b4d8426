package graft.api

import graft.SparkSuite
import graft.analysis.Analyzers
import graft.build.Maintenance
import graft.corpus.TranscriptGen
import graft.model._
import graft.score.QueryExec

/** JSON surface, facet response shape, maintenance ops, streaming batch
  * transform. */
class ApiSpec extends SparkSuite {

  private lazy val engine = SearchEngine.build(TranscriptGen.tiny(spark), Analyzers.Icat)

  test("JSON request parse mirrors the reference shape") {
    val req = Json.parseRequest(
      """{"query":{"text":"needle_3 detector","lower":"202601010000",
        |"upper":"202601312359","filter":{"role":"assistant","tool":["bash","search"]}},
        |"sort":"{\"ts\":\"desc\"}","maxResults":7,
        |"search_after":"{\"doc\":42,\"score\":1.5}"}""".stripMargin)
    assert(req.text === Some("needle_3 detector"))
    assert(req.lower === Some("202601010000"))
    assert(req.filter("role") === Seq("assistant"))
    assert(req.filter("tool") === Seq("bash", "search"))
    assert(req.sort === SortSpec(Seq(("ts", false))))
    assert(req.maxResults === 7)
    assert(req.searchAfter === Some(AfterToken(42L, Some(1.5f), Nil)))
  }

  test("end-to-end JSON search round trip") {
    val req = Json.parseRequest("""{"query":{"text":"needle_3"},"maxResults":3}""")
    val resp = engine.search(req)
    val json = Json.renderResponse(resp)
    assert(json.startsWith("""{"results":["""))
    assert(json.contains(""""search_after":{"doc":"""))
    // token of last hit chains to the next page
    val page2 = engine.search(req.copy(searchAfter = resp.searchAfter))
    assert((resp.hits.map(_.docId).toSet intersect page2.hits.map(_.docId).toSet).isEmpty)
  }

  test("maintenance chain keeps ONE index generation cached") {
    import org.apache.spark.storage.StorageLevel
    val base = SearchEngine.build(TranscriptGen.tiny(spark), Analyzers.Icat).index
    assert(base.postings.storageLevel !== StorageLevel.NONE)
    val g1 = Maintenance.deleteDocs(base, Seq(0L))
    assert(base.postings.storageLevel === StorageLevel.NONE)
    assert(base.termStats.storageLevel === StorageLevel.NONE)
    assert(g1.postings.storageLevel !== StorageLevel.NONE)
    val g2 = Maintenance.deleteDocs(g1, Seq(1L))
    assert(g1.postings.storageLevel === StorageLevel.NONE)
    assert(g1.termStats.storageLevel === StorageLevel.NONE)
    assert(g2.postings.storageLevel !== StorageLevel.NONE)
    // superseded generations stay queryable — they recompute from lineage
    assert(g1.postings.filter(org.apache.spark.sql.functions.col("docId") === 2L).count() > 0)
    assert(g2.stats.docCount === base.stats.docCount - 2)
  }

  test("joinFetch round trip: ≤limit related docs per hit, inline in JSON") {
    val req = Json.parseRequest(
      """{"query":{"text":"needle_3"},"maxResults":3,
        |"joinFetch":{"key":"conv_id","limit":2}}""".stripMargin)
    assert(req.joinFetch === Some(JoinFetchSpec("conv_id", 2)))
    val resp = engine.search(req)
    assert(resp.hits.nonEmpty)
    resp.hits.foreach { h =>
      val rel = resp.joined.getOrElse(h.docId, Nil)
      assert(rel.nonEmpty) // the hit's own conversation always has rows
      assert(rel.size <= 2)
      assert(rel.forall(_.conv_id == h.conv_id))
      assert(rel.map(_.docId) === rel.map(_.docId).sorted) // docId asc
    }
    assert(Json.renderResponse(resp).contains(""","joined":[{"id":"""))
    // no joinFetch → no joined map, JSON unchanged
    val plain = engine.search(req.copy(joinFetch = None))
    assert(plain.joined.isEmpty)
    assert(!Json.renderResponse(plain).contains(""""joined""""))
  }

  test("single-pass facetStrings equals the per-dim variant and scans once") {
    val req = SearchRequest(text = Some("ambiguous"))
    val dims = Seq("role", "tool")
    assert(engine.facetStrings(req, dims) === engine.facetStringsPerDim(req, dims))
    // a MatchAll request isolates the facet aggregation in the plan:
    // ONE explode (Generate) + ONE aggregation (partial+final pair) for
    // ALL dims, instead of one aggregation job per dim
    val plan = engine.facetFrame(SearchRequest(), Seq("role", "tool", "conv_id"), 10)
      .queryExecution.executedPlan.toString
    def occurrences(s: String, sub: String): Int = s.sliding(sub.length).count(_ == sub)
    assert(occurrences(plan, "Generate explode") === 1, plan.take(800))
    assert(occurrences(plan, "HashAggregate") === 2, plan.take(800))
  }

  test("sparse-facet default: empty dimensions facet every facetable field") {
    val req = SearchRequest(text = Some("ambiguous"))
    // corpus string columns minus text/conv_id — role + tool here
    assert(engine.facetableFields.sorted === Seq("role", "tool"))
    val sparse = engine.facetStrings(req, Nil)
    assert(sparse.keySet === Set("role", "tool"))
    assert(sparse === engine.facetStrings(req, Seq("role", "tool")))
  }

  test("facet JSON mirrors the reference aggregation shape") {
    val json = engine.facetJson(SearchRequest(text = Some("ambiguous")), Seq("role"))
    assert(json.startsWith("""{"aggregations":{"role":{"buckets":{"""))
    assert(json.contains("doc_count"))
  }

  test("facet request wire shape: dimensions array with ranges parses like the reference") {
    // SearchBucket.java:687-747: 'dimension' required, missing from/to →
    // Long.MIN/MAX, default label "<from>-<to>", 'key' overrides
    val (dims, rangeDims) = Json.parseDimensions(
      """{"dimensions":[
        |  {"dimension":"role"},
        |  {"dimension":"tool"},
        |  {"dimension":"ts","ranges":[
        |     {"from":100,"to":200,"key":"early"},
        |     {"from":200},
        |     {"to":100}]}]}""".stripMargin)
    assert(dims === Seq("role", "tool"))
    assert(rangeDims === Seq("ts" -> Seq(
      ("early", 100L, 200L),
      (s"200-${Long.MaxValue}", 200L, Long.MaxValue),
      (s"${Long.MinValue}-100", Long.MinValue, 100L))))
    // no dimensions key → empty (the endpoint then string-facets sparsely)
    assert(Json.parseDimensions("""{"query":{"text":"x"}}""") === ((Nil, Nil)))
    // a missing 'dimension' key is a request error, like the reference's 400
    intercept[RuntimeException](Json.parseDimensions("""{"dimensions":[{"ranges":[]}]}"""))
  }

  test("facet JSON: range buckets carry from/to keys in request order") {
    val t0 = 1767225600000L
    val ranges = Seq(("early", 0L, t0 + 3600000L), ("late", t0 + 3600000L, Long.MaxValue / 2))
    val req = SearchRequest(text = Some("ambiguous"))
    val json = engine.facetJson(req, Nil, rangeDims = Seq("ts" -> ranges))
    val counts = engine.facetRanges(req, "ts", ranges).toMap
    // exact reference wire shape (FacetedDimension.java:70-88: doc_count
    // first, then the LongRange's min/max as from/to), buckets in request
    // order, no string dims mixed in when none were requested
    assert(json ===
      s"""{"aggregations":{"ts":{"buckets":{""" +
      s""""early":{"doc_count":${counts("early")},"from":0,"to":${t0 + 3600000L}},""" +
      s""""late":{"doc_count":${counts("late")},"from":${t0 + 3600000L},"to":${Long.MaxValue / 2}}}}}}""")
    assert(counts.values.sum > 0)
    // string + range dims combine under one aggregations object
    val both = engine.facetJson(req, Seq("role"), rangeDims = Seq("ts" -> ranges))
    assert(both.contains(""""role":{"buckets":{"""))
    assert(both.contains(""""ts":{"buckets":{"early":{"doc_count":"""))
  }

  test("maintenance: delete removes docs from results and stats") {
    val before = engine.search(SearchRequest(text = Some("needle_3"), maxResults = 5))
    val victim = before.hits.head.docId
    val after = new SearchEngine(Maintenance.deleteDocs(engine.index, Seq(victim)))
    val res = after.search(SearchRequest(text = Some("needle_3"), maxResults = 5))
    assert(!res.hits.map(_.docId).contains(victim))
    assert(after.index.stats.docCount === engine.index.stats.docCount - 1)
  }

  test("maintenance: update changes a doc's text and scores reflect it") {
    val victim = engine.index.corpus.limit(1).collect()(0)
    import org.apache.spark.sql.functions._
    val updated = engine.index.corpus
      .filter(col("docId") === victim.getAs[Long]("docId"))
      .withColumn("text", lit("zzzuniqueterm zzzuniqueterm"))
    val idx2 = Maintenance.updateDocs(engine.index, updated, Analyzers.Icat)
    val hits = new QueryExec(idx2).topK(TermQuery("zzzuniqueterm"), Nil, 5).collect()
    assert(hits.map(_.getLong(0)).toSeq === Seq(victim.getAs[Long]("docId")))
  }

  test("updateByRelation rewrites denormalized columns from a changed dimension") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq((0L, "c0", "oldA"), (1L, "c0", "oldA"), (2L, "c1", "oldB"))
      .toDF("docId", "conv_id", "convTitle")
    val dim = Seq(("c0", "newA")).toDF("conv_id", "convTitle")
    val got = Maintenance.updateByRelation(corpus, dim, "conv_id", Seq("convTitle"))
      .orderBy("docId").collect().map(_.getString(2)).toSeq
    assert(got === Seq("newA", "newA", "oldB"))
  }

  test("searchWithTimeout returns results within budget") {
    val r = engine.searchWithTimeout(SearchRequest(text = Some("needle_3"), maxResults = 3), 60)
    assert(r.isRight)
    assert(r.toOption.get.hits.nonEmpty)
  }

  test("searchWithTimeout actually cancels the underlying Spark jobs") {
    import org.apache.spark.sql.functions._
    // a corpus whose scan sleeps per row: full scan ≥ (turns × 150ms)/4
    // cores ≫ the 2 s budget, so without real cancellation the group's
    // jobs would stay RUNNING long after the 504
    val slow = udf { (_: Long) => Thread.sleep(150); true }
    val slowIdx = engine.index.copy(corpus = engine.index.corpus.filter(slow(col("docId"))))
    val slowEngine = new SearchEngine(slowIdx)
    val group = "graft-test-cancel"
    val t0 = System.nanoTime()
    val r = slowEngine.searchWithTimeout(SearchRequest(maxResults = 3), 2, Some(group))
    assert(r.isLeft, "slow search must time out")
    val sc = spark.sparkContext
    def groupRunning: Boolean = sc.statusTracker.getJobIdsForGroup(group)
      .flatMap(id => sc.statusTracker.getJobInfo(id))
      .exists(_.status() == org.apache.spark.JobExecutionStatus.RUNNING)
    val deadline = System.currentTimeMillis() + 10000
    while (groupRunning && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(!groupRunning, "cancelJobGroup must stop the timed-out query's jobs")
    // the cancelled work never ran anywhere near to completion
    assert((System.nanoTime() - t0) / 1e9 < 15.0)
  }

  test("facetRanges: single-pass counts match per-bucket filters incl. overlap") {
    import org.apache.spark.sql.functions._
    val ranges = Seq(
      ("early", 0L, 1767225600000L + 3600000L),
      ("all", 0L, Long.MaxValue / 2),
      ("overlap", 1767225600000L, 1767225600000L + 7200000L))
    val req = SearchRequest(text = Some("ambiguous"))
    val got = engine.facetRanges(req, "ts", ranges).toMap
    // naive per-bucket recount over the same matches
    val (q, filters) = engine.plan(req)
    val m = new QueryExec(engine.index).matches(q, filters).select("docId")
    val joined = engine.index.corpus.join(m, "docId")
      .select((col("ts").cast("double") * 1000.0).as("ms")).collect().map(_.getDouble(0))
    ranges.foreach { case (label, lo, hi) =>
      assert(got(label) === joined.count(v => v >= lo && v < hi).toLong, label)
    }
  }

  test("pruneFields nulls targeted docs' fields; updateFields replaces them") {
    import org.apache.spark.sql.functions._
    val corpus = engine.index.corpus
    val victim = corpus.select("docId").head().getLong(0)
    val pruned = Maintenance.pruneFields(corpus, Seq(victim), Seq("tool", "role"))
    val r = pruned.filter(col("docId") === victim).select("tool", "role").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(pruned.filter(col("role").isNotNull).count() === corpus.count() - 1)
    val updated = Maintenance.updateFields(corpus, Seq(victim), Map("role" -> "system"))
    assert(updated.filter(col("docId") === victim).select("role").head().getString(0) === "system")
    assert(updated.filter(col("role") === "system").count() ===
      corpus.filter(col("role") === "system").count() + 1)
  }

  test("rollup aggregates per parent like aggregateFiles") {
    import org.apache.spark.sql.functions._
    val got = Maintenance.rollup(engine.index.corpus, "conv_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = engine.index.corpus
      .groupBy("conv_id")
      .agg(count(lit(1)), sum(length(col("text"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("SI unit conversion matches the reference's enabled conversions") {
    import graft.build.Units
    assert(Units.convertValueToSiUnits(1.0, "eV") ===
      Some(Units.SiValue("J", 1.602176634e-19)))
    assert(Units.convertValueToSiUnits(25.0, "celsius") ===
      Some(Units.SiValue("K", 298.15)))
    assert(Units.convertValueToSiUnits(25.0, "degC") ===
      Some(Units.SiValue("K", 298.15)))
    assert(Units.convertValueToSiUnits(5.0, "kelvin") === Some(Units.SiValue("K", 5.0)))
    assert(Units.convertValueToSiUnits(5.0, "furlong") === None)
    // column path: shadow fields appear, unknown units give nulls
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2.0, "eV"), (2L, 0.0, "celsius"), (3L, 1.0, "furlong"))
      .toDF("id", "value", "unit")
    val out = Units.withSiColumns(df, "unit", Seq("value")).orderBy("id").collect()
    assert(out(0).getString(3) === "J")
    assert(math.abs(out(0).getDouble(4) - 2 * 1.602176634e-19) < 1e-30)
    assert(out(1).getDouble(4) === 273.15)
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("index registry: named indexes resolve independently, drop/clear work") {
    import org.apache.spark.sql.functions._
    val reg = new IndexRegistry(spark)
    reg.register("conversations", engine.index)
    val tiny2 = TranscriptGen.generate(spark, 3)
    reg.build("sidecar", tiny2, Analyzers.Simple)
    assert(reg.names === Seq("conversations", "sidecar"))
    // the two engines answer from different corpora and analyzers
    val convHits = reg.engine("conversations")
      .search(SearchRequest(text = Some("needle_3"), maxResults = 3)).hits
    assert(convHits.nonEmpty)
    assert(reg.get("sidecar").get.analyzerName === "simple")
    assert(reg.get("sidecar").get.stats.docCount ===
      reg.get("sidecar").get.corpus.filter(length(col("text")) > 0).count())
    intercept[NoSuchElementException](reg.engine("nope"))
    reg.drop("sidecar")
    assert(reg.names === Seq("conversations"))
    reg.clear()
    assert(reg.names.isEmpty)
  }

  test("streaming surrogate docIds survive >256-turn conversations without collision") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ts = new java.sql.Timestamp(1767225600000L)
    // conv "a" with 300 turns (incl. turn_idx 300-adjacent range) + a
    // second conversation: packed (hash<<8 | turn) schemes bleed here
    val turns = ((0 until 300).map(i => ("conva", i, "user", s"text $i", None: Option[String], ts)) ++
      (0 until 5).map(i => ("convb", i, "user", s"other $i", None: Option[String], ts)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val postings = graft.streaming.StreamingIndex.postingsFor(turns, Analyzers.Icat)
    val perDoc = postings.select("docId", "conv_id", "turn_idx").distinct()
    assert(perDoc.count() === 305L)
    assert(perDoc.select("docId").distinct().count() === 305L,
      "docId must be unique per (conv_id, turn_idx)")
    // key columns ride along for compaction re-keying
    assert(postings.columns.contains("conv_id") && postings.columns.contains("turn_idx"))
  }

  test("streaming batch transform emits the same postings as the batch builder") {
    import org.apache.spark.sql.functions._
    val turns = TranscriptGen.tiny(spark).toDF()
    val streamed = graft.streaming.StreamingIndex.postingsFor(turns, Analyzers.Icat)
    // same (term, tf) multiset per (conv_id-derived doc); compare totals
    val a = streamed.agg(sum(col("tf")), count(lit(1))).collect()(0)
    val b = engine.index.postings.agg(sum(col("tf")), count(lit(1))).collect()(0)
    assert(a.getLong(0) === b.getLong(0))
    assert(a.getLong(1) === b.getLong(1))
  }
}
