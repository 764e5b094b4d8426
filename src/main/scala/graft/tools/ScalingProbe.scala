package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.SparkSession

/** Dev utility: replicate Bench's scaling section exactly (A/B/A/B
  * alternating best-of, adjacent CPU probes) at a configurable size. */
object ScalingProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"sp$cores").config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def cpuProbe(threads: Int, units: Int = 64): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val work: Runnable = () => {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < 40000000) { h = (h ^ i) * 0x100000001b3L; i += 1 }
      if (h == 42L) println("")
    }
    val (_, secs) = time { (0 until units).map(_ => pool.submit(work)).foreach(_.get()) }
    pool.shutdown()
    secs
  }

  def buildAt(cores: Int, numConvs: Long, outDir: String): (Long, Double, Double) = {
    val spark = session(cores)
    try {
      cpuProbe(cores, 8)
      val probe = (1 to 2).map(_ => cpuProbe(cores)).min
      val turns = TranscriptGen.generate(spark, numConvs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTurns = turns.count()
      def oneBuild(dir: String): Double = {
        val (_, secs) = time {
          val corpus = DocIds.forTurns(turns)
          IndexBuilder.buildAndSave(corpus, Analyzers.Icat, dir,
            hotDfThreshold = 10000L, writeCorpus = false)
        }
        spark.catalog.clearCache()
        turns.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        secs
      }
      oneBuild(s"$outDir-warm"); System.gc()
      val secs = oneBuild(outDir)
      (nTurns, secs, probe)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val convs = sys.env.getOrElse("SP_CONVS", "12000").toLong
    val lo = 8
    val hi = 32
    val tmp = java.nio.file.Files.createTempDirectory("sp").toString
    val (turns, lo1, pLo1) = buildAt(lo, convs, s"$tmp/a$lo")
    val (_, hi1, pHi1) = buildAt(hi, convs, s"$tmp/a$hi")
    val (_, lo2, pLo2) = buildAt(lo, convs, s"$tmp/b$lo")
    val (_, hi2, pHi2) = buildAt(hi, convs, s"$tmp/b$hi")
    val sLo = math.min(lo1, lo2); val sHi = math.min(hi1, hi2)
    val pLo = math.min(pLo1, pLo2); val pHi = math.min(pHi1, pHi2)
    val ceiling = (pLo / pHi) / (hi.toDouble / lo)
    val raw = (sLo / sHi) / (hi.toDouble / lo)
    println(f"SCALING turns=$turns lo=[$lo1%.1f,$lo2%.1f] hi=[$hi1%.1f,$hi2%.1f] " +
      f"best lo=$sLo%.1f hi=$sHi%.1f thrLo=${turns / sLo}%.0f thrHi=${turns / sHi}%.0f " +
      f"raw=$raw%.3f ceiling=$ceiling%.3f cal=${raw / ceiling}%.3f")
  }
}
