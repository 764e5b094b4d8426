package graft.score

import graft.SparkSuite
import graft.analysis.Analyzers
import graft.api.SearchEngine
import graft.model._

/** Fuzzy-query semantics (graft.model.FuzzyQuery — Lucene FuzzyQuery with
  * its TopTermsBlendedFreqScoringRewrite default): dictionary expansion
  * within maxEdits, boost = 1 − edits/min(lengths), blended df, OSA
  * transpositions. The engine's distributed path must agree with the
  * independent NaiveOracle full-scan implementation on ids AND scores. */
class FuzzySpec extends SparkSuite {

  private def mkTurns(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      Turn("conv-0", i, if (i % 2 == 0) "user" else "asistant", t, None,
        new java.sql.Timestamp(1767225600000L + i * 60000L))
    }.toDS()
  }

  private val texts = Seq(
    "spark shuffles the spark plan",      // spark tf 2
    "sprak typo of spark",                // transposition neighbor + exact
    "spars vectors stay sparse",          // spars, sparse
    "sharp knives cut parts",             // sharp (2 edits), parts
    "the part and the sort of it",        // part, sort
    "sparkle is not spark but near",      // sparkle (2 edits incl len)
    "plain words only here")
  private lazy val engine =
    SearchEngine.build(mkTurns(texts), Analyzers.Simple)
  private lazy val exec = new QueryExec(engine.index)
  private lazy val oracle = NaiveOracle.fromTurns(
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Turn("conv-0", i, if (i % 2 == 0) "user" else "asistant", t,
        None, new java.sql.Timestamp(1767225600000L + i * 60000L)))
    }, Analyzers.Simple)

  private def parity(q: Query, clue: String): Unit = {
    val got = exec.topK(q, Nil, 20)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val want = oracle.topK(q, Nil, 20)
    assert(got.map(_._1) === want.map(_._1), s"rank mismatch: $clue")
    got.zip(want).foreach { case ((gid, gs), (_, ws)) =>
      assert(math.abs(gs - ws) <= math.abs(ws) * 1e-5 + 1e-7,
        s"score mismatch ($clue) doc $gid: engine=$gs oracle=$ws")
    }
  }

  test("EditDistance: OSA transpositions vs plain Levenshtein") {
    import graft.model.EditDistance.bounded
    assert(bounded("ab", "ba", 2, transpositions = true) === 1)
    assert(bounded("ab", "ba", 2, transpositions = false) === 2)
    // OSA (not free Damerau): a transposed pair cannot be edited again
    assert(bounded("ca", "abc", 3, transpositions = true) === 3)
    assert(bounded("spark", "sprak", 1, transpositions = true) === 1)
    assert(bounded("spark", "sprak", 1, transpositions = false) === -1)
    assert(bounded("spark", "spark", 0, transpositions = false) === 0)
    assert(bounded("abcdef", "xyzuvw", 2, transpositions = true) === -1)
    // agrees with the oracle's independent full-matrix implementation
    for (a <- Seq("spark", "sprak", "part", "sort", "a", "", "sparkle");
         b <- Seq("sark", "spark", "pat", "", "elkraps"); t <- Seq(true, false)) {
      val full = NaiveOracle.editDistance(a, b, t)
      val bd = bounded(a, b, 2, t)
      assert(bd === (if (full <= 2) full else -1), s"($a,$b,$t)")
    }
  }

  test("fuzzy expansion scores with blended df and boost — oracle parity") {
    parity(FuzzyQuery("spark"), "spark~2")
    parity(FuzzyQuery("spark", maxEdits = 1), "spark~1")
    parity(FuzzyQuery("sark", maxEdits = 2, transpositions = false), "sark no-transpose")
    parity(FuzzyQuery("sprak", maxEdits = 1), "sprak~1 transposition")
    parity(FuzzyQuery("zzzz"), "no expansion at all")
  }

  test("transpositions=true admits a transposed pair that plain rejects") {
    val on = exec.topK(FuzzyQuery("sprak", maxEdits = 1), Nil, 20)
      .collect().map(_.getLong(0)).toSet
    // 1 edit with OSA reaches both the literal 'sprak' and 'spark'
    assert(on === Set(0L, 1L, 5L))
    val off = exec.topK(FuzzyQuery("sprak", maxEdits = 1, transpositions = false),
        Nil, 20).collect().map(_.getLong(0)).toSet
    assert(off === Set(1L)) // only the doc containing literal 'sprak'
  }

  test("prefixLength restricts expansion; maxExpansions caps by boost") {
    parity(FuzzyQuery("spark", maxEdits = 2, prefixLength = 2), "prefix sp")
    val pref = exec.topK(FuzzyQuery("park", maxEdits = 1, prefixLength = 1), Nil, 20)
      .collect().map(_.getLong(0)).toSet
    // prefix 'p': only 'part' (park→part 1 edit; 'parts' is 2) — 'spark'
    // fails the prefix; 'part' occurs only in doc 4
    assert(pref === Set(4L))
    // cap 1 keeps only the best-boost term (the exact match, boost 1)
    val capped = exec.topK(FuzzyQuery("spark", maxExpansions = 1), Nil, 20)
      .collect().map(_.getLong(0)).toSet
    assert(capped === Set(0L, 1L, 5L)) // docs containing literal 'spark'
    parity(FuzzyQuery("spark", maxExpansions = 1), "maxExpansions 1")
    parity(FuzzyQuery("spark", maxExpansions = 2), "maxExpansions 2")
  }

  test("maxEdits 0 degenerates to the exact term") {
    val fz = exec.topK(FuzzyQuery("spark", maxEdits = 0), Nil, 20)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val tq = exec.topK(TermQuery("spark"), Nil, 20)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(fz === tq)
  }

  test("parser: word~, word~N, fielded value~N, malformed suffixes") {
    def p(s: String) = QueryText.parse(s, t => Analyzers.Simple(t).terms)
    assert(p("sark~") === BoolQuery(should = Seq(FuzzyQuery("sark", 2))))
    assert(p("SARK~1") === BoolQuery(should = Seq(FuzzyQuery("sark", 1))))
    assert(p("+sark~0") === BoolQuery(must = Seq(FuzzyQuery("sark", 0))))
    assert(p("role:usr~1") === BoolQuery(should = Seq(FieldFuzzyQuery("role", "usr", 1))))
    // out-of-range / malformed suffix: not fuzzy syntax — analyzed as
    // text (the multi-token SHOULD group is the whole query, so the
    // single-child boolean collapses — Lucene
    // BooleanSingleChildOptimizationQueryNodeProcessor semantics)
    assert(p("sark~3") ===
      BoolQuery(should = Seq(TermQuery("sark"), TermQuery("3"))))
    assert(p("~sark") === BoolQuery(should = Seq(TermQuery("sark"))))
  }

  test("fielded fuzzy: constant score, bounded distance on the attribute") {
    // role values: 'user' (even docs), 'asistant' (odd). usr~1 → user
    val got = exec.topK(FieldFuzzyQuery("role", "usr", 1), Nil, 20)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(got.map(_._1) === Seq(0L, 2L, 4L, 6L))
    assert(got.forall(_._2 === 1.0f))
    parity(FieldFuzzyQuery("role", "usr", 1), "role:usr~1")
    // assistant~1 matches the misspelled 'asistant' (1 deletion)
    val odd = exec.topK(FieldFuzzyQuery("role", "assistant", 1), Nil, 20)
      .collect().map(_.getLong(0)).toSeq
    assert(odd === Seq(1L, 3L, 5L))
    parity(FieldFuzzyQuery("role", "nosuch", 1), "fielded no match")
  }

  test("fuzzy inside boolean trees and through the search facade") {
    parity(BoolQuery(must = Seq(FuzzyQuery("spark", 1)),
      mustNot = Seq(TermQuery("typo"))), "+spark~1 -typo")
    val resp = engine.search(SearchRequest(text = Some("sark~ -typo"),
      maxResults = 10))
    val want = oracle.topK(BoolQuery(should = Seq(FuzzyQuery("sark", 2)),
      mustNot = Seq(TermQuery("typo"))), Nil, 10)
    assert(resp.hits.map(_.docId) === want.map(_._1))
  }
}
