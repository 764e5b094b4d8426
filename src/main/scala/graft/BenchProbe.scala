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

  /** One unit of pure-ALU work (FNV mixing, no allocation) — the
    * BEST-SMT-scaling workload this host can run, used as the hardware
    * CEILING probe: a real job cannot scale 8→32 better than this, so
    * raw/ceiling stays ≤ ~1 by construction. (The analyzer kernel above
    * is allocation/memory-bound and scales WORSE than the build's actual
    * mix of analysis + columnar I O — using it as the ceiling produced
    * vs-ceiling readings above 1.) */
  def aluUnit(iters: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < iters) { h = (h ^ i) * 0x100000001b3L; i += 1 }
    h
  }

  def runAlu(threads: Int, units: Int, itersPerUnit: Int): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val fs = (0 until units).map(_ => pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = aluUnit(itersPerUnit)
    }))
    val acc = fs.map(_.get()).sum
    val secs = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    if (acc == 42L) println("")
    secs
  }

  /** Prints one line: `<analyzerSecs> <aluSecs>` — the workload-matched
    * drift probe and the hardware-ceiling probe, each min-of-two after a
    * JIT warm pass. */
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val units = if (args.length > 1) args(1).toInt else 64
    run(threads, units, 6000) // JIT warm (untimed)
    // min of two timed passes: at 32 threads a single pass is only two
    // pool waves and one straggler skews it
    val a = math.min(run(threads, units, 120000), run(threads, units, 120000))
    runAlu(threads, units, 40000000)
    val b = math.min(runAlu(threads, units, 400000000),
      runAlu(threads, units, 400000000))
    println("%.4f %.4f".format(a, b))
  }
}
