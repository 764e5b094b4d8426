package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit checks for the curation operators (decontamination, quality
  * filter, PII masking) on hand-built frames plus the driver's sf0.001
  * documents — behaviors the DuckDB gate can't probe directly (config
  * overrides, empty benchmark, placement of the mask). */
class CurationSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = df(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten",
      3L -> "tiny")
    val bench = df(10L -> "xx alpha beta gamma delta epsilon zeta eta theta yy")
    val out = Curation.decontaminate(corpus, bench, n = 8).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> true, 2L -> false)) // doc 3 has < 8 tokens → no row
    // empty benchmark → nothing contaminated, every eligible doc still reported
    val clean = Curation.decontaminate(corpus, bench.limit(0), n = 8)
    assert(clean.filter(col("contaminated")).count() === 0)
    assert(clean.count() === 2)
  }

  test("decontaminate contam_frac counts distinct overlapping shingles") {
    val corpus = df(1L -> "a b c d e a b c d e a b c d e")
    val bench = df(10L -> "a b c d e a b c d e")
    val row = Curation.decontaminate(corpus, bench, n = 5).head()
    // 15 tokens, 11 windows but only 5 DISTINCT 5-gram rotations; all 5 hit
    assert(row.getLong(1) === 5L && row.getLong(2) === 5L)
    assert(row.getDouble(3) === 1.0)
  }

  test("qualityFilter applies each rule with its reason in fixed order") {
    val many = ("tok " * 60).trim                      // 60 tokens, all same
    val out = Curation.qualityFilter(
      df(1L -> "short text", 2L -> many),
      Curation.QualityConfig(minTokens = 5)).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    // doc 1: 2 tokens, each unique → top word frac 0.5 > 0.10 fires too
    assert(out(1L) === "too_few_tokens,low_stopword,top_word_rep")
    // doc 2: 60 identical 3-char tokens → top_word_rep AND dup_tokens, rule order preserved
    assert(out(2L) === "low_stopword,top_word_rep,dup_tokens")
  }

  test("qualityFilter config overrides move the thresholds") {
    val text = "the cat sat on the mat and the dog ran to the big red barn " * 4
    // mean word length of this text is 2.93 — relax the floor too
    val relaxed = Curation.qualityFilter(df(1L -> text.trim),
      Curation.QualityConfig(minTokens = 1, minMeanWordLen = 2.0,
        maxTopWordFrac = 1.0, maxDupFrac = 1.0)).head()
    assert(relaxed.getBoolean(6), relaxed.getString(7))
    val strict = Curation.qualityFilter(df(1L -> text.trim),
      Curation.QualityConfig(minTokens = 1000)).head()
    assert(!strict.getBoolean(6))
    assert(strict.getString(7).contains("too_few_tokens"))
  }

  test("maskPii masks all four shapes and counts each once") {
    val out = Curation.maskPii(df(
      1L -> "mail a.b+c@ex-ample.org then 192.168.0.1 ssn 123-45-6789 tel 555-123-4567",
      2L -> "clean text with no pii at all")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L)._1 === "mail <EMAIL> then <IP> ssn <SSN> tel <PHONE>")
    assert(out(1L)._2 === 4L)
    assert(out(2L) === (("clean text with no pii at all", 0L)))
  }

  test("maskPii: IP inside an email is masked (and counted) once, as email") {
    val out = Curation.maskPii(df(1L -> "x 10.0.0.7@example.com y")).head()
    assert(out.getString(1) === "x <EMAIL> y")
    assert(out.getLong(2) === 1L)
  }

  test("stratifiedSample is deterministic, rate-accurate, and default-rate-backed") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val sampled = Curation.stratifiedSample(rows, "lang", Map("en" -> 0.5), defaultRate = 0.0)
    val kept = sampled.collect().map(r => (r.getLong(0), r.getString(1)))
    // default rate 0 → no xx rows at all
    assert(kept.forall(_._2 == "en"))
    // ~50% of the 1000 en rows (hash-uniform; generous tolerance)
    assert(kept.length > 350 && kept.length < 650, s"kept=${kept.length}")
    // identical row SET on a rerun (determinism, not just the count)
    val again = Curation.stratifiedSample(rows, "lang", Map("en" -> 0.5), defaultRate = 0.0)
      .collect().map(r => r.getLong(0)).toSet
    assert(again === kept.map(_._1).toSet)
    // a row's keep decision is independent of the other rows present
    val subset = Curation.stratifiedSample(rows.filter(col("doc_id") < 100), "lang",
      Map("en" -> 0.5), defaultRate = 0.0).collect().map(_.getLong(0)).toSet
    assert(subset === kept.map(_._1).filter(_ < 100).toSet)
  }

  test("stratifiedSample thresholds are exact at 10^-6 for rates like 0.29") {
    import spark.implicits._
    val rows = (0L until 3000L).map(i => (i, "en")).toDF("doc_id", "lang")
    val kept = Curation.stratifiedSample(rows, "lang", Map("en" -> 0.29))
      .collect().map(_.getLong(0)).toSet
    // replicate the keep rule with the EXACT threshold 290000 (a binary
    // double product truncates to 289999 — rows whose bucket is exactly
    // 289999 would flip); assert the row SET, not just the count
    val expect = (0L until 3000L).filter { i =>
      java.lang.Long.remainderUnsigned(Dedup.fnv1a64(s"ss-42-$i"), 1000000L) < 290000L
    }.toSet
    assert(kept === expect)
    // the boundary bucket is only meaningful if some row lands near it —
    // sanity: the kept fraction is within 5pp of the rate
    assert(math.abs(kept.size / 3000.0 - 0.29) < 0.05)
  }

  test("pipeline: end-to-end composition equals the stage-by-stage operators") {
    val dd = docs
    val cfg = Curation.CurationConfig(
      quality = Curation.QualityConfig(minTokens = 10),
      rates = Map("en" -> 0.5, "fr" -> 0.25), defaultRate = 0.1)
    val res = Curation.pipeline(dd, cfg)
    // reference composition: each operator independently
    val qIds = Curation.qualityFilter(dd, cfg.quality).filter(col("pass")).select("doc_id")
    val qdocs = dd.join(qIds, "doc_id")
    val clusters = Dedup.dedupClusters(Dedup.ngramJaccardPairs(qdocs, 5, 0.8))
    val expect = Curation.stratifiedSample(
      Dedup.applyDedup(qdocs, clusters), "lang", cfg.rates, cfg.defaultRate)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(res.kept.select("doc_id").collect().map(_.getLong(0)).toSet === expect)
    // the kept frame keeps the ORIGINAL columns (no __w token cache leak)
    assert(res.kept.columns.toSeq === dd.columns.toSeq)
    // per-stage accounting is consistent and complete
    val c = res.counts
    assert(c.input === dd.count())
    assert(c.contaminated === 0L)
    assert(c.input - c.qualityFailed - c.dupDropped - c.sampledOut === c.kept)
    assert(c.dupDropped === clusters.filter(!col("is_kept")).count())
    res.kept.unpersist()
  }

  test("pipeline: decontamination stage drops benchmark-overlapping docs first") {
    // benchmark = the doc_id%25==0 slice (the decontam gate's convention)
    val bench = docs.filter(col("doc_id") % 25 === 0)
    val corpus = docs.filter(col("doc_id") % 25 =!= 0)
    val cfg = Curation.CurationConfig(
      quality = Curation.QualityConfig(minTokens = 10))
    val res = Curation.pipeline(corpus, cfg, benchmark = Some(bench))
    val contamIds = Curation.decontaminate(corpus, bench)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(res.counts.contaminated === contamIds.size)
    val keptIds = res.kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(contamIds).isEmpty)
    // no sampling configured → kept = input − contaminated − quality − dup
    assert(res.counts.sampledOut === 0L)
    res.kept.unpersist()
  }

  test("curation runs over the sf0.001 corpus without shuffle surprises") {
    val q = Curation.qualityFilter(docs)
    assert(q.count() === docs.count())
    // pure column math → no exchange anywhere in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val m = Curation.maskPii(docs)
    assert(!m.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(m.count() === docs.count())
  }

  test("mixToBudget: FNV-ordered greedy fill matches a driver replay; prefix property") {
    val out = Curation.mixToBudget(docs,
      Map("src0" -> 300L, "src1" -> 0L, "src2" -> Long.MaxValue))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // driver-side replay: same hash, same order, same fill rule
    val base = docs.filter(col("source").isin("src0", "src1", "src2"))
      .select(col("doc_id"), col("source"),
        coalesce(size(TextAnalysis.simpleToks(col("text"))), lit(0)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = base.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val budget = Map("src0" -> 300L, "src1" -> 0L, "src2" -> Long.MaxValue)(src)
      val ordered = ds.sortBy(d => (Dedup.fnv1a64(s"mix-42-${d._1}"), d._1))
      ordered.scanLeft(0L)(_ + _._3).init.zip(ordered)
        .collect { case (before, (id, s, n)) if before < budget =>
          (id, s, n, before + n) }
    }.toSet
    assert(rows.toSet === expected)
    assert(!rows.exists(_._2 == "src1")) // zero budget → nothing kept
    // src2 unbounded → the whole source survives
    assert(rows.count(_._2 == "src2") === base.count(_._2 == "src2"))
    // prefix property: a bigger budget only ADDS docs
    val biggerDf = Curation.mixToBudget(docs, Map("src0" -> 600L))
    val bigger = biggerDf.collect().map(_.getLong(0)).toSet
    val smaller = rows.filter(_._2 == "src0").map(_._1).toSet
    assert(smaller.subsetOf(bigger))
    biggerDf.unpersist() // caller-owned persisted return (see scaladoc)
    out.unpersist()
  }
}
