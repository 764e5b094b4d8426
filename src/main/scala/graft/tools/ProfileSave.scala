package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.sys

/** Dev utility: step-by-step timing of IndexBuilder.save internals. */
object ProfileSave {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def at(cores: Int, numConvs: Long): Unit = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"ps$cores").config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.local.dir", sys.env.getOrElse("PS_LOCAL_DIR", "/tmp"))
      .config("spark.shuffle.compress", sys.env.getOrElse("PS_SHUF_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("PS_SHUF_COMPRESS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val tmp = java.nio.file.Files.createTempDirectory(s"ps$cores").toString
      val turns = TranscriptGen.generate(spark, numConvs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      turns.count()
      // small warm
      IndexBuilder.save(IndexBuilder.build(
        DocIds.forTurns(TranscriptGen.generate(spark, 200)), Analyzers.Icat),
        s"$tmp/warm", hotDfThreshold = 10000L)
      val corpus = t(s"docIds@$cores")(DocIds.forTurns(turns))
      val idx = t(s"build@$cores")(IndexBuilder.build(corpus, Analyzers.Icat))
      println("postings rows: " + idx.postings.count())
      t(s"termstats.write@$cores")(
        idx.termStats.write.mode("overwrite").parquet(s"$tmp/ts"))
      t(s"hot.collect@$cores")(
        idx.termStats.filter(col("df") >= 10000L).select("term").collect())
      t(s"post.write.plain@$cores")(
        idx.postings.write.mode("overwrite").parquet(s"$tmp/p0"))
      t(s"post.write.repart.sorted@$cores")(
        idx.postings.repartition(cores, col("term"))
          .sortWithinPartitions("term", "docId")
          .write.mode("overwrite").parquet(s"$tmp/p1"))
      t(s"post.repart.only@$cores")(
        idx.postings.repartition(cores, col("term"))
          .write.mode("overwrite").parquet(s"$tmp/p2"))
      spark.catalog.clearCache()
      turns.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      t(s"buildAndSave.total@$cores") {
        val c2 = DocIds.forTurns(turns)
        IndexBuilder.buildAndSave(c2, Analyzers.Icat, s"$tmp/bas",
          hotDfThreshold = 10000L, writeCorpus = false)
      }
    } finally spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PS_CONVS", "6000").toLong
    at(8, n)
    at(32, n)
  }
}
