package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: time each internal phase of the at-scale build path
  * (DocIds assignment, hot-term sample, analyze+shuffle+write, termStats,
  * stats aggregates) at a given core count, to locate the non-scaling
  * floor in the 8→32 efficiency measurement. Mirrors
  * IndexBuilder.buildAndSave phase by phase (incl. the empty-doc sentinel
  * bookkeeping) with the bench's session config (2×cores shuffle
  * partitions), and prints per-STAGE task statistics (task count, wall,
  * busy fraction, max task) so stage tails are directly visible.
  */
object ProfilePhases {

  /** Per-stage tail diagnostics: busy = Σ task run time / (wall × cores)
    * — the fraction of the stage's core-seconds actually used; a long
    * maxTask with low busy is a straggler tail. */
  private final class StageStats(cores: Int) extends org.apache.spark.scheduler.SparkListener {
    case class S(name: String, submitted: Long, var completed: Long = 0L,
                 var nTasks: Int = 0, var sumRunMs: Long = 0L, var maxTaskMs: Long = 0L)
    private val stages = scala.collection.concurrent.TrieMap.empty[Int, S]
    private var enabled = false
    def start(): Unit = { stages.clear(); enabled = true }
    override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
      if (enabled)
        stages.put(e.stageInfo.stageId,
          S(e.stageInfo.name.takeWhile(_ != '\n').take(60), System.currentTimeMillis()))
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      stages.get(e.stageId).foreach { s =>
        s.synchronized {
          s.nTasks += 1
          val ms = e.taskInfo.duration
          s.sumRunMs += ms
          if (ms > s.maxTaskMs) s.maxTaskMs = ms
        }
      }
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.get(e.stageInfo.stageId).foreach(_.completed = System.currentTimeMillis())
    def report(): Unit = {
      enabled = false
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        val wall = (s.completed - s.submitted) / 1000.0
        if (wall > 0.3) {
          val busy = s.sumRunMs / 1000.0 / (wall * cores)
          println(f"[stage $id%4d] ${s.name}%-60s tasks=${s.nTasks}%4d " +
            f"wall=$wall%6.2fs busy=$busy%4.2f maxTask=${s.maxTaskMs / 1000.0}%6.2fs")
        }
      }
    }
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"pp$cores")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PP_SHUFFLE_PARTS", (cores * 2).toString))
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
    val stats = new StageStats(cores)
    spark.sparkContext.addSparkListener(stats)
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

      stats.start()
      t("TOTAL", cores) {
        val corpus = t("docIds", cores)(DocIds.forTurns(turns))
        val analyzer = Analyzers.Icat
        val sampleRate = 100
        val hotDfThreshold = 10000L
        val dir = outDir
        val (hotTerms, estPostings) = t("hotSample", cores) {
          val sampled = corpus.filter(pmod(xxhash64(col("docId")), lit(sampleRate)) === 0)
          val counts = IndexBuilder.analyzedPostings(sampled, analyzer)
            .groupBy("term").agg(count(lit(1)).as("sdf"))
            .persist()
          val hot = counts.filter(col("sdf") * sampleRate >= hotDfThreshold)
            .select("term").collect().map(_.getString(0)).toSet
          val tot = counts.agg(sum(col("sdf"))).collect()(0)
          counts.unpersist()
          (hot, (if (tot.isNullAt(0)) 0L else tot.getLong(0)) * sampleRate)
        }
        // volume-sized shuffle, mirroring IndexBuilder.buildAndSave
        val n = math.max(spark.sessionState.conf.numShufflePartitions.toLong,
                         estPostings / IndexBuilder.TargetShuffleRows + 1).toInt
        println(s"[pp@$cores] estPostings=$estPostings shufflePartitions=$n")
        val bHot = spark.sparkContext.broadcast(hotTerms)
        val isHot = udf((s: String) => bHot.value.contains(s))
        t("analyzeWrite", cores) {
          IndexBuilder.analyzedPostings(corpus, analyzer, keepEmptyDocs = true)
            .withColumn("_salt",
              when(isHot(col("term")), pmod(hash(col("docId")), lit(16))).otherwise(lit(0)))
            .repartition(n, col("term"), col("_salt"))
            .drop("_salt")
            .sortWithinPartitions("term", "docId")
            .write.mode("overwrite").parquet(s"$dir/postings")
        }
        val written = spark.read.parquet(s"$dir/postings")
        t("sentinels", cores)(written.filter(col("term").isNull).count())
        val postings = written.filter(col("term").isNotNull)
        t("termStatsWrite", cores) {
          postings.groupBy(col("term"))
            .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
            .write.mode("overwrite").parquet(s"$dir/termstats")
        }
        t("sttf", cores) {
          spark.read.parquet(s"$dir/termstats").agg(sum(col("cf"))).collect()
        }
        t("corpusCount", cores)(corpus.count())
      }
      stats.report()
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val convs = sys.env.getOrElse("PP_CONVS", "24000").toLong
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
               else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tmp = java.nio.file.Files.createTempDirectory(base, "graft-pp").toString
    val coreList = sys.env.getOrElse("PP_CORES", "8,32").split(",").map(_.trim.toInt)
    coreList.foreach(c => runAt(c, convs, s"$tmp/p$c"))
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(new java.io.File(tmp))
  }
}
