package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: time each internal phase of the at-scale build path
  * (DocIds assignment, hot-term sample, analyze+shuffle+write, termStats,
  * stats aggregates) at a given core count, to locate the non-scaling
  * floor in the 8→32 efficiency measurement. */
object ProfilePhases {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"pp$cores").config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def t[T](name: String, cores: Int)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase@$cores $name] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def runAt(cores: Int, numConvs: Long, outDir: String): Unit = {
    val spark = session(cores)
    try {
      val turns = TranscriptGen.generate(spark, numConvs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      turns.count()
      // warm (untimed)
      IndexBuilder.buildAndSave(DocIds.forTurns(turns), Analyzers.Icat,
        s"$outDir-warm", hotDfThreshold = 10000L, writeCorpus = false)
      spark.catalog.clearCache()
      turns.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      System.gc()

      t("TOTAL", cores) {
        val corpus = t("docIds", cores)(DocIds.forTurns(turns))
        val analyzer = Analyzers.Icat
        val n = cores
        val sampleRate = 100
        val hotDfThreshold = 10000L
        val dir = outDir
        val hotTerms = t("hotSample", cores) {
          val sampled = corpus.filter(pmod(xxhash64(col("docId")), lit(sampleRate)) === 0)
          IndexBuilder.analyzedPostings(sampled, analyzer)
            .groupBy("term").agg(count(lit(1)).as("sdf"))
            .filter(col("sdf") * sampleRate >= hotDfThreshold)
            .select("term").collect().map(_.getString(0)).toSet
        }
        val bHot = spark.sparkContext.broadcast(hotTerms)
        val isHot = udf((s: String) => bHot.value.contains(s))
        t("analyzeWrite", cores) {
          IndexBuilder.analyzedPostings(corpus, analyzer)
            .withColumn("_salt",
              when(isHot(col("term")), pmod(hash(col("docId")), lit(16))).otherwise(lit(0)))
            .repartition(n, col("term"), col("_salt"))
            .drop("_salt")
            .sortWithinPartitions("term", "docId")
            .write.mode("overwrite").parquet(s"$dir/postings")
        }
        val postings = spark.read.parquet(s"$dir/postings")
        t("termStatsWrite", cores) {
          postings.groupBy(col("term"))
            .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
            .write.mode("overwrite").parquet(s"$dir/termstats")
        }
        t("sttf", cores) {
          spark.read.parquet(s"$dir/termstats").agg(sum(col("cf"))).collect()
        }
        t("docCountDistinct", cores) {
          postings.select("docId").distinct().count()
        }
        t("corpusCount", cores)(corpus.count())
      }
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val convs = sys.env.getOrElse("PP_CONVS", "24000").toLong
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
               else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tmp = java.nio.file.Files.createTempDirectory(base, "graft-pp").toString
    runAt(8, convs, s"$tmp/p8")
    runAt(32, convs, s"$tmp/p32")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(new java.io.File(tmp))
  }
}
