package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Path-field views and query expressions, reproducing the reference's
  * three-way fan-out of a `location` value (reference: Field.java:61-67;
  * index analyzers Lucene.java:437-448; query analyzers
  * DocumentMapping.java:130-137):
  *
  *  - `<c>_tokens`:   split on '/', lowercased (IcatSeparatorAnalyzer("/"))
  *  - `<c>_exact`:    every cumulative path prefix, case preserved
  *                    (PathHierarchyTokenizer; queried with
  *                    KeywordAnalyzer — case-sensitive whole-token match)
  *  - `<c>_filename`: split on '.', lowercased (IcatSeparatorAnalyzer("."))
  *
  * All match builders are pure column expressions (array predicates inside
  * whole-stage codegen) — a hierarchy-prefix filter over 100 TB is a
  * narrow scan, no shuffle, no UDF.
  */
object PathFields {

  /** Lucene PathHierarchyTokenizer output: one token per cumulative
    * prefix. "/a/b/c" → ["/a", "/a/b", "/a/b/c"]; "a/b" → ["a", "a/b"];
    * a trailing delimiter yields a final token with the trailing '/'. */
  def hierarchyPrefixes(path: String): Array[String] = {
    if (path == null || path.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 1 // a leading '/' belongs to the first token
    while (i < path.length) {
      if (path.charAt(i) == '/') out += path.substring(0, i)
      i += 1
    }
    out += path
    out.toArray
  }

  private def sepTokens(c: Column, sep: String): Column =
    filter(split(lower(c), java.util.regex.Pattern.quote(sep)), t => t =!= "")

  private val prefixesUdf =
    udf((s: String) => hierarchyPrefixes(if (s == null) "" else s).toSeq)

  /** Add the three view columns for a path column. */
  def expand(df: DataFrame, pathCol: String): DataFrame = df
    .withColumn(s"${pathCol}_tokens", sepTokens(col(pathCol), "/"))
    .withColumn(s"${pathCol}_exact", prefixesUdf(col(pathCol)))
    .withColumn(s"${pathCol}_filename", sepTokens(col(pathCol), "."))

  /** anchored regex for a wildcard pattern (`*` any run incl. '/', `?`
    * one char — Lucene wildcard semantics over a whole token). */
  private def wildcardRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    pattern.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()<>+-=!^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  private def isWildcard(s: String): Boolean = s.exists(c => c == '*' || c == '?')

  /** Term (or wildcard) match against an analyzed token-array view; the
    * word is lowercased like the reference lowercases non-.exact terms and
    * wildcards (SearchBucket.java:171-194). */
  def termMatch(tokens: Column, word: String): Column = {
    val w = word.toLowerCase(java.util.Locale.ROOT)
    if (isWildcard(w)) exists(tokens, t => t.rlike(wildcardRegex(w)))
    else array_contains(tokens, w)
  }

  /** Positional phrase match over a token-array view (consecutive
    * tokens) — the analyzed-phrase semantics a quoted path query gets on
    * the separator-analyzed field. */
  def phraseMatch(tokens: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty)
    val ph = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    if (ph.length == 1) return termMatch(tokens, ph.head)
    val starts = sequence(lit(1), size(tokens) - lit(ph.length - 1))
    when(size(tokens) < ph.length, lit(false)).otherwise(
      exists(starts, i =>
        ph.zipWithIndex.map { case (p, j) =>
          element_at(tokens, i + j) === lit(p)
        }.reduce(_ && _)))
  }

  /** location.exact semantics: KeywordAnalyzer query term (case-sensitive,
    * NOT lowercased — the reference skips lowercasing for `.exact` fields,
    * SearchBucket.java:171-194) matched whole against any hierarchy
    * prefix; wildcards allowed, `*` crossing '/' freely. */
  def exactMatch(prefixes: Column, pattern: String): Column =
    if (isWildcard(pattern)) exists(prefixes, t => t.rlike(wildcardRegex(pattern)))
    else array_contains(prefixes, pattern)
}
