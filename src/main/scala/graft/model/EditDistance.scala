package graft.model

/** Bounded edit distance for fuzzy term expansion (reference surface:
  * `term~N` fuzzy syntax accepted by the StandardQueryParser the reference
  * instantiates per entity, DocumentMapping.java:120-146; Lucene's
  * FuzzyQuery documents the "optimal string alignment" Damerau-Levenshtein
  * variant — adjacent transposition is one primitive edit, but a
  * transposed pair cannot be edited again).
  *
  * Iterative three-row DP with an early bail when a whole row exceeds the
  * bound — O(|a|·|b|) worst case on short dictionary terms, exits in
  * O(maxEdits·|a|) for the common far-apart case via the row-minimum
  * check. This runs inside a dictionary-scan UDF (one call per term that
  * survives the pushed-down length/prefix prefilters), not per posting.
  */
object EditDistance {

  /** Distance between `a` and `b` if ≤ maxEdits, else -1.
    * `transpositions` = optimal-string-alignment (Lucene FuzzyQuery
    * default); false = plain Levenshtein. */
  def bounded(a: String, b: String, maxEdits: Int, transpositions: Boolean): Int = {
    if (a == b) return 0
    if (maxEdits <= 0) return -1
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > maxEdits) return -1
    if (la == 0) return if (lb <= maxEdits) lb else -1
    if (lb == 0) return if (la <= maxEdits) la else -1

    var prevPrev = new Array[Int](lb + 1) // row i-2 (transposition source)
    var prev = new Array[Int](lb + 1)     // row i-1
    var cur = new Array[Int](lb + 1)      // row i
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }

    var i = 1
    while (i <= la) {
      cur(0) = i
      var rowMin = i
      val ca = a.charAt(i - 1)
      j = 1
      while (j <= lb) {
        val cb = b.charAt(j - 1)
        val cost = if (ca == cb) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        if (transpositions && i > 1 && j > 1 &&
            ca == b.charAt(j - 2) && a.charAt(i - 2) == cb)
          d = math.min(d, prevPrev(j - 2) + 1)
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (rowMin > maxEdits) return -1
      val t = prevPrev; prevPrev = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(lb)
    if (d <= maxEdits) d else -1
  }
}
