package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession

/** Dev utility: per-stage timing of the MinHash+LSH gate query at an sf
  * dir, with a per-Spark-stage task-statistics listener to locate where
  * the wall time goes (the end-to-end gate timing can't attribute it). */
object ProfileMinhash {

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

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new StageStats(cores)
    spark.sparkContext.addSparkListener(stats)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    for (round <- 1 to 3) {
      stats.start()
      val t0 = System.nanoTime()
      val out = Dedup.minhashLshPairs(docs, 0.8)
      val n = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let stage-completed events drain
      println(f"--- round $round: full=$secs%.3f s rows=$n")
      stats.report()
      out.unpersist()
    }
    spark.stop()
  }
}
