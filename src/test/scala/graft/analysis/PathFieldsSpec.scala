package graft.analysis

import graft.SparkSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recast of the reference's 19 location-field hit-count goldens
  * (reference: TestLucene.java:362-412 `testLocationFields`) over the
  * three path views (tokens / hierarchy-exact / filename). Each golden
  * query is hand-translated to its boolean structure over the view
  * expressions; expected hit counts are the reference's own assertions. */
class PathFieldsSpec extends SparkSuite {

  private val locations = Seq(
    "/dls/i00/data/2000/ab00000-0/screening/ABC/AB00/AB00_0_0000.txt",
    "/dls/i00/data/2000/ab00000-0/screening/ABC/AB00/AB00_0_0000.csv",
    "/dls/i00/data/2000/cd00000-0/screening/DEF/DE00/DE00_0_0000.txt",
    "/dls/i00/data/2000/cd00000-0/screening/DEF/DE00/DE00_0_0000.csv")

  private lazy val df: DataFrame = {
    import spark.implicits._
    PathFields.expand(locations.toDF("location"), "location").cache()
  }

  private val toks = col("location_tokens")
  private val fname = col("location_filename")
  private val exact = col("location_exact")

  /** default-field match: location tokens OR location.fileName tokens
    * (datafileParser default fields, DocumentMapping.java:121-122). */
  private def dft(word: String): Column =
    PathFields.termMatch(toks, word) || PathFields.termMatch(fname, word)

  /** default-field phrase: the quoted path analyzed per view. */
  private def dfPhrase(path: String): Column = {
    val t = path.split("/").filter(_.nonEmpty).toSeq
    val f = path.split("\\.").filter(_.nonEmpty).toSeq
    PathFields.phraseMatch(toks, t) || PathFields.phraseMatch(fname, f)
  }

  private def hits(cond: Column): Long = df.filter(cond).count()

  test("hierarchyPrefixes matches PathHierarchyTokenizer output") {
    assert(PathFields.hierarchyPrefixes("/a/b/c").toSeq ===
      Seq("/a", "/a/b", "/a/b/c"))
    assert(PathFields.hierarchyPrefixes("a/b").toSeq === Seq("a", "a/b"))
    assert(PathFields.hierarchyPrefixes("/a/b/").toSeq ===
      Seq("/a", "/a/b", "/a/b/"))
    assert(PathFields.hierarchyPrefixes("").isEmpty)
  }

  test("default fields are case-insensitive (golden 1-3)") {
    assert(hits(dft("Screening")) === 4L)
    assert(hits(dft("abc")) === 2L)
    assert(hits(dft("CSV")) === 2L)
  }

  test("wildcards on default fields (golden 4-5)") {
    assert(hits(dft("A*C")) === 2L)
    assert(hits(dft("d?f")) === 2L)
  }

  test("paths on default fields (golden 6-8)") {
    assert(hits(dfPhrase("AB00/AB00_0_0000.txt")) === 1L)
    assert(hits(dfPhrase("/dls/i00/data/2000/") &&
      (dft("ab00000-0") || dft("ab00000-1"))) === 2L)
    assert(hits(dfPhrase("/dls/i00/data/2000/ab00000-0") ||
      dfPhrase("/dls/i00/data/2000/cd00000-0")) === 4L)
  }

  test("partial path matches the hierarchy however escaped (golden 9-11)") {
    // quoted, backslash-escaped and raw forms all parse to the same term
    (1 to 3).foreach { _ =>
      assert(hits(PathFields.exactMatch(exact, "/dls/i00/data")) === 4L)
    }
  }

  test("path wildcards match the hierarchy (golden 12)") {
    assert(hits(PathFields.exactMatch(exact, "/dls/*/data/20??/ab*")) === 2L)
  }

  test("location.exact with OR grouping (golden 13-14)") {
    assert(hits(PathFields.exactMatch(exact, "/dls/i00/data/2000") &&
      (dft("ab00000-0") || dft("ab00000-1"))) === 2L)
    assert(hits(
      PathFields.exactMatch(exact, "/dls/i00/data/2000/ab00000-0") ||
        PathFields.exactMatch(exact, "/dls/i00/data/2000/cd00000-0")) === 4L)
  }

  test("location.exact is case-sensitive (golden 15-16)") {
    assert(hits(PathFields.exactMatch(exact,
      "/dls/i00/data/2000/ab00000-0/screening/ABC")) === 2L)
    assert(hits(PathFields.exactMatch(exact,
      "/dls/i00/data/2000/ab00000-0/screening/abc")) === 0L)
  }

  test("exemplar searches (golden 17-19)") {
    assert(hits(
      PathFields.exactMatch(exact, "/dls/i00/data/2000/*/screen*/AB00/*.txt") ||
        PathFields.exactMatch(exact, "/dls/i00/data/2000/*/screen*/DE00/*.txt")) === 2L)
    assert(hits(
      PathFields.phraseMatch(toks, Seq("dls", "i00", "data", "2000")) &&
        PathFields.termMatch(toks, "screen*") &&
        (PathFields.termMatch(toks, "AB00") || PathFields.termMatch(toks, "DE00")) &&
        PathFields.termMatch(fname, "txt")) === 2L)
    assert(hits(
      dfPhrase("/dls/i00/data/2000") && dft("screen*") &&
        (dft("AB00") || dft("DE00")) && dft("txt")) === 2L)
  }

  test("query-string fielded wildcards reach the case-preserved exact view") {
    import graft.model._
    import spark.implicits._
    // corpus carrying the hierarchy view as a queryable column
    val corpus = PathFields.expand(
        locations.zipWithIndex.toDF("location", "i"), "location")
      .withColumn("docId", col("i").cast("long"))
    val idx = graft.build.Index(corpus, spark.emptyDataFrame,
      spark.emptyDataFrame, graft.build.CorpusStats(4L, 4L), "simple")
    val exec = new graft.score.QueryExec(idx)
    def q(text: String): Query =
      QueryText.parse(text, s => Analyzers.Simple(s).terms,
        keywordFields = Set("location_exact"))
    // goldens 12 + 15-16 (TestLucene.java:403-409) through the PARSED
    // query-string path: wildcard hierarchy match, case preserved on the
    // _exact view (lowercaseWildcardQueries skips .exact fields)
    assert(exec.matches(q("location_exact:/dls/*/data/20??/ab*")).count() === 2L)
    assert(exec.matches(
      q("location_exact:/dls/i00/data/2000/ab00000-0/screening/ABC")).count() === 2L)
    assert(exec.matches(
      q("location_exact:/dls/i00/data/2000/ab00000-0/screening/abc")).count() === 0L)
    assert(exec.matches(
      q("location_exact:/dls/i00/data/2000/ab00000-0/screening/AB*")).count() === 2L)
    assert(exec.matches(
      q("location_exact:/dls/i00/data/2000/ab00000-0/screening/ab*")).count() === 0L)
  }

  test("fielded fuzzy works on the array-typed hierarchy view") {
    import graft.model._
    import spark.implicits._
    val corpus = PathFields.expand(
        locations.zipWithIndex.toDF("location", "i"), "location")
      .withColumn("docId", col("i").cast("long"))
    val idx = graft.build.Index(corpus, spark.emptyDataFrame,
      spark.emptyDataFrame, graft.build.CorpusStats(4L, 4L), "simple")
    val exec = new graft.score.QueryExec(idx)
    // an element within 1 edit of a stored prefix matches (any-element
    // semantics, like the wildcard/regexp/exact siblings); previously
    // this threw AnalysisException (length() on an array column)
    val fq = FieldFuzzyQuery("location_exact", "/dlz", maxEdits = 1,
      transpositions = false)
    assert(exec.matches(fq).count() === locations.size.toLong) // "/dls" 1 edit away, in every doc
    val none = FieldFuzzyQuery("location_exact", "/zzzz", maxEdits = 1,
      transpositions = false)
    assert(exec.matches(none).count() === 0L)
  }

  test("PathHierarchy analyzer emits prefixes as terms") {
    val a = Analyzers.PathHierarchy("/x/y/z.txt")
    assert(a.terms.toSeq === Seq("/x", "/x/y", "/x/y/z.txt"))
    assert(Analyzers.byName("path_hierarchy") === Analyzers.PathHierarchy)
  }
}
