package graft

/** Standalone calibration-probe main, launched by [[Bench]] as a FRESH
  * subprocess per measurement: the probe must sample what the HOST can
  * deliver for analyzer-class work, and running it inside the bench JVM
  * right after a 780k-turn build measured that JVM's GC debt instead
  * (observed: the same probe 20× slower after a build than before it).
  * A subprocess has a clean young heap and isolates the reading from
  * Spark's memory state; it JIT-warms its own kernel before timing.
  *
  * args: <threads> [unitsTimed]. Prints one line: the timed seconds. */
object BenchProbe {

  /** One unit of analyzer-class work: build pseudo-sentences, run the
    * real Icat analysis chain, count tokens (string scan + allocation +
    * hash maps — the build's workload class). */
  def unit(sentences: Int): Long = {
    var acc = 0L
    var s = 0
    while (s < sentences) {
      val sb = new java.lang.StringBuilder(256)
      var w = 0
      while (w < 24) {
        val x = (s * 31 + w * 7 + 13) & 0xffff
        sb.append("word").append(x).append(
          if ((x & 3) == 0) "'s " else if ((x & 3) == 1) "ing " else " ")
        w += 1
      }
      val a = graft.analysis.Analyzers.Icat(sb.toString)
      acc += a.terms.length + a.positions
      s += 1
    }
    acc
  }

  /** Run `units` probe units on `threads` pool threads; returns seconds. */
  def run(threads: Int, units: Int, sentencesPerUnit: Int): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val fs = (0 until units).map(_ => pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = unit(sentencesPerUnit)
    }))
    val acc = fs.map(_.get()).sum
    val secs = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    if (acc == 42L) println("") // defeat DCE
    secs
  }

  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val units = if (args.length > 1) args(1).toInt else 64
    run(threads, units, 6000) // JIT warm (untimed)
    // min of two timed passes: at 32 threads a single pass is only two
    // pool waves and one straggler skews it
    val secs = math.min(run(threads, units, 120000), run(threads, units, 120000))
    println("%.4f".format(secs))
  }
}
