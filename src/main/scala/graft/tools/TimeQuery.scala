package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time named gate queries against an sf dir without running
  * the whole bench. Usage:
  *   sbt "runMain graft.tools.TimeQuery <sfDir> <name> [<name> …]"
  * Each query runs twice (warm, timed) like the bench's gate loop. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <queryName>…")
    val sfDir = args(0)
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def stealJiffies(): Long =
      try {
        val line = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/stat")).get(0)
        line.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L)
      } catch { case _: Throwable => 0L }
    def cpuSecs(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case s: com.sun.management.OperatingSystemMXBean => s.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime(); val n0 = fn(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      val (c0, j0, g0) = (cpuSecs(), stealJiffies(), gcMs())
      val t1 = System.nanoTime(); val n1 = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t1) / 1e9
      val cores = (cpuSecs() - c0) / s
      val steal = (stealJiffies() - j0) / 100.0 / s
      val gc = (gcMs() - g0) / 1000.0
      println(f"[timequery] $name%-24s cold=$w%.3f s warm=$s%.3f s rows=$n1 " +
        f"(coldRows=$n0) warmCores=$cores%.1f warmSteal=$steal%.2f warmGc=$gc%.1f s")
    }
    spark.stop()
  }
}
