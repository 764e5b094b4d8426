package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-iteration timer for a single gate query: warms once (the serving
  * process pays codegen/JIT once per process, matching the bench
  * protocol) then reports three timed executions.
  *
  *   sbt "runMain graft.tools.TimeQuery curation_pipeline /root/testdata/sf0.1"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      val timed = (1 to 3).map(_ => once())
      println(f"TIMEQ $name warm=$warm%.2f timed=${timed.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
