package graft.analysis

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980), implemented from the published
  * algorithm description including the two departures present in the
  * author's reference implementations (step2 `bli`→`ble`, `logi`→`log`),
  * which Lucene's `PorterStemFilter` also follows — that filter terminates
  * the reference analyzer chain
  * (reference: src/main/java/org/icatproject/lucene/analyzers/IcatAnalyzer.java:40).
  *
  * Validated against the reference's golden token streams
  * (src/test/java/icat/lucene/TestLucene.java:89-171): e.g. singing→sing,
  * dancing→danc, added→ad, technique→techniqu, ionization→ioniz,
  * spectroscopy→spectroscopi.
  *
  * Words of length ≤ 2 are returned unchanged, as in the reference
  * implementation. Only lowercase a-z input is meaningfully stemmed;
  * other strings pass through the same state machine unchanged-ish,
  * matching Lucene behavior for already-lowercased tokens.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val s = new State(word.toCharArray)
    s.run()
    // unchanged fast path: most tokens take no suffix rule at all, so
    // skip the result-String allocation when neither the length nor any
    // character changed (`dirty` covers every in-place char write)
    if (s.k == word.length - 1 && !s.dirty) word
    else new String(s.b, 0, s.k + 1)
  }

  private final class State(val b: Array[Char]) {
    var k: Int = b.length - 1 // index of last char
    var j: Int = 0            // general offset set by ends()
    var dirty: Boolean = false // any in-place char write happened

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !cons(i - 1)
      case _                           => true
    }

    /** measure: number of VC sequences in b[0..j] */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doubleC(at: Int): Boolean =
      at >= 1 && b(at) == b(at - 1) && cons(at)

    /** true when b[i-2..i] is consonant-vowel-consonant and the last
      * consonant is not w, x or y (the *o condition). */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      val l = s.length
      var i = 0
      while (i < l) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + l
      if (l > 0) dirty = true
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** plurals and -ed / -ing */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** terminal y → i when there is another vowel in the stem */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) { b(k) = 'i'; dirty = true }

    /** double suffixes → single, e.g. -ization → -ize */
    private def step3(): Unit = {
      if (k == 0) return
      (b(k - 1): @annotation.switch) match {
        case 'a' =>
          if (ends("ational")) { r("ate"); return }
          if (ends("tional")) { r("tion"); return }
        case 'c' =>
          if (ends("enci")) { r("ence"); return }
          if (ends("anci")) { r("ance"); return }
        case 'e' =>
          if (ends("izer")) { r("ize"); return }
        case 'l' =>
          if (ends("bli")) { r("ble"); return } // departure: abli→able in the paper
          if (ends("alli")) { r("al"); return }
          if (ends("entli")) { r("ent"); return }
          if (ends("eli")) { r("e"); return }
          if (ends("ousli")) { r("ous"); return }
        case 'o' =>
          if (ends("ization")) { r("ize"); return }
          if (ends("ation")) { r("ate"); return }
          if (ends("ator")) { r("ate"); return }
        case 's' =>
          if (ends("alism")) { r("al"); return }
          if (ends("iveness")) { r("ive"); return }
          if (ends("fulness")) { r("ful"); return }
          if (ends("ousness")) { r("ous"); return }
        case 't' =>
          if (ends("aliti")) { r("al"); return }
          if (ends("iviti")) { r("ive"); return }
          if (ends("biliti")) { r("ble"); return }
        case 'g' =>
          if (ends("logi")) { r("log"); return } // departure, present in ref impls
        case _ => ()
      }
    }

    /** -ic-, -full, -ness etc. */
    private def step4(): Unit = {
      (b(k): @annotation.switch) match {
        case 'e' =>
          if (ends("icate")) { r("ic"); return }
          if (ends("ative")) { r(""); return }
          if (ends("alize")) { r("al"); return }
        case 'i' =>
          if (ends("iciti")) { r("ic"); return }
        case 'l' =>
          if (ends("ical")) { r("ic"); return }
          if (ends("ful")) { r(""); return }
        case 's' =>
          if (ends("ness")) { r(""); return }
        case _ => ()
      }
    }

    /** -ant, -ence etc. removed when m > 1 */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = (b(k - 1): @annotation.switch) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (matched && m() > 1) k = j
    }

    /** final -e and -ll cleanup */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): Unit = {
      if (k > 1) { step1(); step2(); step3(); step4(); step5(); step6() }
    }
  }
}
