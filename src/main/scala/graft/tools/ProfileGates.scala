package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: warm per-gate timing for a named subset of gate queries
  * at an sf dir (args: sfDir query1 query2 …; default sf0.1 +
  * source_overlap/lm_score/semdedup). Each query runs twice; the second
  * (warm, post-JIT) time is the reported one — matching Bench's
  * protocol. */
object ProfileGates {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("source_overlap", "lm_score", "semdedup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val rows = qs(n)(spark, sfDir).count()
        println(f"[gate] $n%-24s pass$pass ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$rows")
      }
    }
    spark.stop()
  }
}
