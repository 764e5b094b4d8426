package graft.analysis

/** Unicode UAX#29-style word-break tokenizer (subset sufficient for the
  * reference corpora), reproducing the observable behavior of Lucene's
  * `StandardTokenizer` as exercised by the reference's golden tests
  * (reference: src/test/java/icat/lucene/TestLucene.java:89-112 and the
  * analyzer chain at
  * src/main/java/org/icatproject/lucene/analyzers/IcatAnalyzer.java:34-41).
  *
  * Implemented rules (ASCII + general Unicode letter/digit classes):
  *  - tokens are maximal runs of letters/digits/ExtendNumLet (`_`)
  *  - WB6/WB7:  ALetter  × (MidLetter | MidNumLet) ALetter   stays joined
  *  - WB11/12:  Numeric  × (MidNum   | MidNumLet) Numeric    stays joined
  *  - WB13a/b:  ExtendNumLet joins letters and numerics on both sides
  *  - maxTokenLength 255 (longer runs are emitted in 255-char chunks,
  *    matching StandardTokenizer's default)
  *
  * So `file.txt`, `TokenStream's`, `needle_3` are each one token while
  * `(or`, `2)` shed their punctuation. This is a from-scratch
  * implementation of the published UAX#29 rules, not a port.
  */
object WordBreak {
  final val MaxTokenLength = 255

  @inline private def isAlpha(c: Char): Boolean = Character.isLetter(c)
  @inline private def isNum(c: Char): Boolean = Character.isDigit(c)
  @inline private def isExtendNumLet(c: Char): Boolean =
    c == '_' || Character.getType(c) == Character.CONNECTOR_PUNCTUATION
  // NOTE: ASCII ':' is NOT MidLetter — Unicode removed it in 6.1 and
  // Lucene 8.11's StandardTokenizer splits `foo:bar` into two tokens;
  // U+0387 (Greek ano teleia) IS MidLetter.
  @inline private def isMidLetter(c: Char): Boolean =
    c == '\u00B7' || c == '\u0387' || c == '\u2027' || c == '\u05F4'
  @inline private def isMidNum(c: Char): Boolean = c == ',' || c == ';'
  @inline private def isMidNumLet(c: Char): Boolean =
    c == '.' || c == '\'' || c == '’' || c == '‘' || c == 'ʼ' || c == '＇'
  @inline private def isWordChar(c: Char): Boolean =
    isAlpha(c) || isNum(c) || isExtendNumLet(c)

  /** Tokenize `text` into UAX#29-lite word tokens (original case kept). */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    // presized: one token per ~6 chars is the corpus mean, so the buffer
    // usually never regrows (it defaults to 16 slots and doubled several
    // times per 400-token document)
    val out = new scala.collection.mutable.ArrayBuffer[String](
      math.max(8, text.length / 6))
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isWordChar(c)) {
        val start = i
        var j = i
        var continue = true
        while (continue && j < n) {
          val cj = text.charAt(j)
          if (isWordChar(cj)) {
            j += 1
          } else if (j > start && j + 1 < n) {
            // candidate mid-word char: joined only if flanked per WB6/7, WB11/12
            val prev = text.charAt(j - 1)
            val next = text.charAt(j + 1)
            val joins =
              (isAlpha(prev) && (isMidLetter(cj) || isMidNumLet(cj)) && isAlpha(next)) ||
                (isNum(prev) && (isMidNum(cj) || isMidNumLet(cj)) && isNum(next))
            if (joins) j += 2 else continue = false
          } else {
            continue = false
          }
        }
        var tok = text.substring(start, j)
        // StandardTokenizer default: split over-long runs at 255 chars
        while (tok.length > MaxTokenLength) {
          out += tok.substring(0, MaxTokenLength)
          tok = tok.substring(MaxTokenLength)
        }
        if (tok.nonEmpty) out += tok
        i = j
      } else {
        i += 1
      }
    }
    out.toArray
  }
}
