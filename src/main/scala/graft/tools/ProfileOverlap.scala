package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the sourceOverlap gate to
  * attribute its end-to-end cost (shingle UDF vs mask aggregation vs
  * histogram post-processing). */
object ProfileOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ovl] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      t("distinct sources collect") {
        docs.select(col("source")).distinct().collect().length
      }
      val sets = Dedup.shingleSets(docs, 3, "source", "text")
      t("shingleSets count") { sets.count() }
      t("explode+hash count") {
        sets.select(col("id"), explode(col("set")).as("s"))
          .select(xxhash64(col("s")).as("h")).count()
      }
      t("mask groupBy count") {
        sets.select(col("id").as("src"), explode(col("set")).as("s"))
          .select(xxhash64(col("s")).as("h"), lit(1L).as("bit"))
          .groupBy("h").agg(expr("bit_or(bit)").as("mask"))
          .groupBy("mask").agg(count(lit(1))).count()
      }
      val srcNames = docs.select(col("source").cast("string").as("s"))
        .where(col("s").isNotNull).distinct()
        .collect().map(_.getString(0)).sorted
      val bitLit = typedLit(srcNames.zipWithIndex.toMap)
      t("real mask construction (mc)") {
        Dedup.shingleSets(docs, 3, "source", "text")
          .select(col("id").as("src"), explode(col("set")).as("s"))
          .where(col("src").isNotNull)
          .select(xxhash64(col("s")).as("h"),
            element_at(bitLit, col("src").cast("string")).as("b"))
          .select(col("h"), expr("shiftleft(CAST(1 AS BIGINT), b)").as("bit"))
          .groupBy("h").agg(expr("bit_or(bit)").as("mask"))
          .groupBy("mask").agg(count(lit(1)).as("c")).count()
      }
      t("full sourceOverlap") { Curation.sourceOverlap(docs, n = 3).count() }
    }
    spark.stop()
  }
}
