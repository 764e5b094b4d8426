package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-phase timings of the buildAndSave pipeline. */
object PhaseProbe {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def at(cores: Int, numConvs: Long): Unit = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"pp$cores").config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val tmp = java.nio.file.Files.createTempDirectory(s"pp$cores").toString
      val turns = TranscriptGen.generate(spark, numConvs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      turns.count()
      // warm
      IndexBuilder.buildAndSave(DocIds.forTurns(TranscriptGen.generate(spark, 300)),
        Analyzers.Icat, s"$tmp/w", hotDfThreshold = 10000L, writeCorpus = false)
      val corpus = t(s"docIds@$cores")(DocIds.forTurns(turns))
      val sampled = corpus.filter(pmod(xxhash64(col("docId")), lit(100)) === 0)
      val hot = t(s"sample@$cores")(
        IndexBuilder.analyzedPostings(sampled, Analyzers.Icat)
          .groupBy("term").agg(count(lit(1)).as("sdf"))
          .filter(col("sdf") * 100 >= 10000L).select("term").collect())
      println(s"hot terms: ${hot.length}")
      t(s"analyze.only@$cores")(
        IndexBuilder.analyzedPostings(corpus, Analyzers.Icat)
          .agg(count(lit(1))).collect())
      t(s"shufflewrite@$cores")(
        IndexBuilder.analyzedPostings(corpus, Analyzers.Icat)
          .withColumn("_salt", lit(0))
          .repartition(cores, col("term"), col("_salt")).drop("_salt")
          .sortWithinPartitions("term", "docId")
          .write.mode("overwrite").parquet(s"$tmp/p"))
      val postings = spark.read.parquet(s"$tmp/p")
      t(s"termstats@$cores")(
        postings.groupBy(col("term")).agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
          .write.mode("overwrite").parquet(s"$tmp/ts"))
      t(s"stats@$cores")(
        postings.agg(countDistinct(col("docId")), sum(col("tf"))).collect())
    } finally spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val convs = sys.env.getOrElse("PP_CONVS", "12000").toLong
    at(8, convs)
    at(32, convs)
  }
}
