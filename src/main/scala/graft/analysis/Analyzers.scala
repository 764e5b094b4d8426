package graft.analysis

/** Analyzer pipelines mirroring the reference's analysis chains
  * (reference: src/main/java/org/icatproject/lucene/analyzers/IcatAnalyzer.java:34-41,
  * IcatSynonymAnalyzer.java:47-57, IcatSeparatorAnalyzer.java:13-26), built
  * from scratch on the published algorithms (UAX#29 word break, Porter).
  *
  * `positions` is the number of position-consuming tokens (Lucene's norm
  * length with its default discountOverlaps=true): synonym-injected tokens
  * share a position with the token they expand and do not add length; a
  * multi-token synonym expansion occupies max-path-length slots.
  */
final case class Analyzed(terms: Array[String], positions: Int)

trait TextAnalyzer extends Serializable {
  def apply(text: String): Analyzed
  /** Name used to key persisted index metadata so query-time analysis
    * always matches index-time analysis. */
  def name: String
}

object Analyzers {

  /** The 27-word stop set of the reference — Lucene's English stop words
    * minus the chemical symbols (as, at, be, in, no)
    * (reference: IcatAnalyzer.java:22-31). */
  val ScientificStopWords: Set[String] = Set(
    "a", "an", "and", "are", "but", "by", "for", "if", "into", "is",
    "it", "not", "on", "or", "such", "that", "the", "their", "then",
    "there", "these", "they", "this", "to", "was", "will", "with")

  /** EnglishPossessiveFilter: strip a trailing 's (ASCII, right-quote or
    * modifier-letter apostrophe), case-insensitive on the s. */
  def stripPossessive(tok: String): String = {
    val n = tok.length
    if (n >= 2) {
      val s = tok.charAt(n - 1)
      val ap = tok.charAt(n - 2)
      if ((s == 's' || s == 'S') && (ap == '\'' || ap == '’' || ap == 'ʼ' || ap == '＇'))
        return tok.substring(0, n - 2)
    }
    tok
  }

  @inline def lowercase(tok: String): String = tok.toLowerCase(java.util.Locale.ROOT)

  /** tokenize → possessive → lowercase → stop → Porter (IcatAnalyzer). */
  def icatTokens(text: String): Array[String] = {
    val raw = WordBreak.tokenize(text)
    val out = new scala.collection.mutable.ArrayBuffer[String](raw.length)
    var i = 0
    while (i < raw.length) {
      val t = lowercase(stripPossessive(raw(i)))
      if (!ScientificStopWords.contains(t)) out += PorterStemmer.stem(t)
      i += 1
    }
    out.toArray
  }

  /** IcatAnalyzer equivalent: full-text analysis without synonyms. */
  object Icat extends TextAnalyzer {
    val name = "icat"
    def apply(text: String): Analyzed = {
      val toks = icatTokens(text)
      Analyzed(toks, toks.length)
    }
  }

  /** IcatSynonymAnalyzer equivalent: Icat chain + post-stem synonym graph
    * injection from the bundled scientific synonym set. */
  object IcatSynonym extends TextAnalyzer {
    val name = "icat_synonym"
    // built once per JVM; SynonymSet is serializable for executor shipping
    lazy val synonyms: SynonymSet = SynonymSet.bundled(icatTokens)
    def apply(text: String): Analyzed = {
      val (toks, positions) = synonyms(icatTokens(text))
      Analyzed(toks, positions)
    }
  }

  /** Separator analyzer (IcatSeparatorAnalyzer): split on one char, then
    * lowercase — used by the reference for path-like fields. */
  final case class Separator(sep: Char) extends TextAnalyzer {
    val name = s"sep_$sep"
    def apply(text: String): Analyzed = {
      val toks = text.split(java.util.regex.Pattern.quote(sep.toString))
        .iterator.filter(_.nonEmpty).map(lowercase).toArray
      Analyzed(toks, toks.length)
    }
  }

  /** PathHierarchy analyzer (Lucene PathHierarchyTokenizer defaults —
    * delimiter '/', case preserved): emits every cumulative path prefix,
    * so an exact-match query for any ancestor path hits the document.
    * Used for the reference's `location.exact` index-time view
    * (reference: Lucene.java:441-442; query side is KeywordAnalyzer,
    * DocumentMapping.java:133). */
  object PathHierarchy extends TextAnalyzer {
    val name = "path_hierarchy"
    def apply(text: String): Analyzed = {
      val toks = PathFields.hierarchyPrefixes(text)
      Analyzed(toks, toks.length)
    }
  }

  /** Simple analyzer: lowercase, split on non-alphanumeric runs. Exactly
    * expressible in ANSI SQL (regexp_split_to_array(lower(text),
    * '[^a-z0-9]+')), used for the DuckDB-verified correctness gate. */
  object Simple extends TextAnalyzer {
    val name = "simple"
    def apply(text: String): Analyzed = {
      val toks = lowercase(text).split("[^a-z0-9]+").filter(_.nonEmpty)
      Analyzed(toks, toks.length)
    }
  }

  def byName(n: String): TextAnalyzer = n match {
    case "icat"         => Icat
    case "icat_synonym" => IcatSynonym
    case "simple"       => Simple
    case "path_hierarchy" => PathHierarchy
    case s if s.startsWith("sep_") => Separator(s.charAt(4))
    case other => throw new IllegalArgumentException(s"unknown analyzer: $other")
  }
}
