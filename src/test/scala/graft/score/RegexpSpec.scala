package graft.score

import graft.SparkSuite
import graft.analysis.Analyzers
import graft.api.SearchEngine
import graft.model._

/** Regexp-query semantics (graft.model.RegexpQuery — Lucene RegexpQuery
  * through the slash syntax of the query parser): anchored constant-score
  * dictionary expansion, fielded keyword variant, parser forms. */
class RegexpSpec extends SparkSuite {

  private def mkTurns(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      Turn("conv-0", i, if (i % 2 == 0) "user" else "helper", t, None,
        new java.sql.Timestamp(1767225600000L + i * 60000L))
    }.toDS()
  }

  private val texts = Seq(
    "spark scans the table",     // spark, scans, the, table
    "scan results arrived",      // scan
    "sort then merge",           // sort
    "rows of the stream",        // rows, stream
    "plain words only")
  private lazy val engine = SearchEngine.build(mkTurns(texts), Analyzers.Simple)
  private lazy val exec = new QueryExec(engine.index)
  private lazy val oracle = NaiveOracle.fromTurns(
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Turn("conv-0", i, if (i % 2 == 0) "user" else "helper", t,
        None, new java.sql.Timestamp(1767225600000L + i * 60000L)))
    }, Analyzers.Simple)

  private def ids(q: Query): Seq[Long] =
    exec.topK(q, Nil, 100).collect().map(_.getLong(0)).toSeq.sorted

  test("anchored dictionary expansion, constant score — oracle parity") {
    // s.a(n|ns|rk): scan, scans, spark — NOT sort/stream (anchored)
    val q = RegexpQuery("s.a(n|ns|rk)")
    assert(ids(q) === Seq(0L, 1L))
    val got = exec.topK(q, Nil, 100)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(got.forall(_._2 === 1.0f))
    assert(got.map(_._1).sorted === oracle.topK(q, Nil, 100).map(_._1).sorted)
    // pattern is lowercased like wildcards
    assert(ids(RegexpQuery("SORT|ROWS")) === Seq(2L, 3L))
    // unanchored substring does NOT match (whole-term semantics)
    assert(ids(RegexpQuery("can")) === Seq.empty)
    assert(ids(RegexpQuery("s.an.*")) === Seq(0L, 1L)) // scan, scans
  }

  test("fielded regexp on keyword attributes") {
    val q = FieldRegexpQuery("role", "us(e|o)r")
    assert(ids(q) === Seq(0L, 2L, 4L))
    assert(ids(q) === oracle.topK(q, Nil, 100).map(_._1).sorted)
    assert(ids(FieldRegexpQuery("role", "h.lper")) === Seq(1L, 3L))
    assert(ids(FieldRegexpQuery("role", "elper")) === Seq.empty) // anchored
  }

  test("parser: /re/, field:/re/, occur prefixes, boolean composition") {
    def p(s: String) = QueryText.parse(s, t => Analyzers.Simple(t).terms)
    assert(p("/s.an/") === BoolQuery(should = Seq(RegexpQuery("s.an"))))
    assert(p("+/s.an/ -sort") === BoolQuery(
      must = Seq(RegexpQuery("s.an")), mustNot = Seq(TermQuery("sort"))))
    assert(p("role:/us.r/") === BoolQuery(should = Seq(FieldRegexpQuery("role", "us.r"))))
    assert(p("text:/s.an/") === BoolQuery(should = Seq(RegexpQuery("s.an"))))
    assert(p("//") === MatchAll) // empty regexp body is dropped
    // boolean composition end-to-end: regexp MUST + term SHOULD
    val q = p("+/s.a(n|ns|rk)/ merge")
    val got = exec.topK(q, Nil, 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val want = oracle.topK(q, Nil, 10)
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((_, gs), (_, ws)) =>
      assert(math.abs(gs - ws) <= math.abs(ws) * 1e-5 + 1e-7)
    }
  }
}
