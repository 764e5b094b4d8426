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
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime(); val n0 = fn(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val n1 = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t1) / 1e9
      println(f"[timequery] $name%-24s cold=$w%.3f s warm=$s%.3f s rows=$n1 (coldRows=$n0)")
    }
    spark.stop()
  }
}
