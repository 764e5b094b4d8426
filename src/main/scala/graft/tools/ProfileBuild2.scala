package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.DocIds
import graft.corpus.TranscriptGen
import org.apache.spark.sql.SparkSession

/** Dev utility: replicate Bench.buildAt exactly, with inner timers. */
object ProfileBuild2 {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def buildAt(cores: Int, numConvs: Long, outDir: String): Unit = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"b$cores").config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // JIT/codegen warmup: small untimed build
      {
        val w = DocIds.forTurns(TranscriptGen.generate(spark, 300))
        IndexBuilder.save(IndexBuilder.build(w, Analyzers.Icat), s"$outDir-warm", hotDfThreshold = 10000L)
      }
      t(s"total@$cores") {
        val turns = TranscriptGen.generate(spark, numConvs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("ingest")(turns.count())
        val corpus = t("docIds")(DocIds.forTurns(turns)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val idx = t("build")(IndexBuilder.build(corpus, Analyzers.Icat))
        t("save")(IndexBuilder.save(idx, outDir, hotDfThreshold = 10000L))
      }
    } finally spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("pb2").toString
    val n = sys.env.getOrElse("PB2_CONVS", "12000").toLong
    val lo = sys.env.getOrElse("PB2_LO", "8").toInt
    val hi = sys.env.getOrElse("PB2_HI", "32").toInt
    buildAt(lo, n, s"$tmp/i$lo")
    buildAt(hi, n, s"$tmp/i$hi")
  }
}
