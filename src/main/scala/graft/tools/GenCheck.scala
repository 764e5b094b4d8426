package graft.tools

/** One-off dev check: the round-6 TranscriptGen speedups (precomputed
  * vocabulary strings, presized builder) must be BYTE-IDENTICAL to the
  * round-5 generator — this embeds the old per-conversation logic
  * verbatim and compares full corpora. No Spark needed: generation is
  * per-conversation deterministic. */
object GenCheck {

  // ---- the pre-round-6 generator, copied verbatim (format-per-word) ----
  private val commonVocabSize = 5000
  private val zipfS = 1.07
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(commonVocabSize)(r => 1.0 / math.pow(r + 1.0, zipfS))
    val total = w.sum
    val cdf = new Array[Double](commonVocabSize)
    var acc = 0.0
    var i = 0
    while (i < commonVocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }
  private val elements = Array(
    "hydrogen", "helium", "lithium", "beryllium", "boron", "carbon",
    "nitrogen", "oxygen", "fluorine", "neon", "sodium", "magnesium",
    "aluminum", "silicon", "phosphorus", "sulfur", "chlorine", "argon",
    "potassium", "calcium", "titanium", "chromium", "manganese", "iron",
    "cobalt", "nickel", "copper", "zinc", "gallium", "germanium")
  private val rareVocab: Array[String] =
    Array.tabulate(470)(i => f"rare_$i%03d") ++ elements
  private val tools = Array("bash", "search", "browser", "editor", "python")
  private def rngFor(convIdx: Long): java.util.Random = {
    var z = 42L ^ (convIdx * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    new java.util.Random(z ^ (z >>> 31))
  }
  private def zipfWord(r: java.util.Random): String = {
    val u = r.nextDouble()
    var lo = 0; var hi = commonVocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    f"w$lo%04d"
  }
  private def oldTurnsOf(convIdx: Long): Seq[graft.model.Turn] = {
    val r = rngFor(convIdx)
    val nTurns = 1 + r.nextInt(64)
    val convId = f"conv-$convIdx%08d"
    val baseEpochSec = 1767225600L + (convIdx % 720) * 3600
    (0 until nTurns).map { t =>
      val role =
        if (t == 0) { if (r.nextDouble() < 0.2) "system" else "user" }
        else {
          val u = r.nextDouble()
          if (u < 0.40) "user" else if (u < 0.85) "assistant" else if (u < 0.95) "tool" else "system"
        }
      val tool = if (role == "tool") Some(tools(r.nextInt(tools.length))) else None
      val len = 20 + r.nextInt(381)
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        val u = r.nextDouble()
        val w =
          if (u < 0.90) zipfWord(r)
          else if (u < 0.99) rareVocab(r.nextInt(rareVocab.length))
          else s"needle_${r.nextInt(10)}"
        if (i > 0) sb.append(' ')
        sb.append(w)
        i += 1
      }
      if (r.nextDouble() < 0.08) {
        val tf = 1 + r.nextInt(6)
        (0 until tf).foreach(_ => sb.append(" ambiguous"))
      }
      graft.model.Turn(convId, t, role, sb.toString,
        tool, new java.sql.Timestamp((baseEpochSec + t * 60L) * 1000L))
    }
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(4000L)
    var checked = 0L
    var convIdx = 0L
    while (convIdx < nConvs) {
      val a = oldTurnsOf(convIdx)
      val b = graft.corpus.TranscriptGen.turnsOf(convIdx)
      require(a == b, s"MISMATCH at conv $convIdx:\nold=${a.take(1)}\nnew=${b.take(1)}")
      checked += a.length
      convIdx += 1
    }
    println(s"GENCHECK OK: $nConvs convs, $checked turns identical")
  }
}
