package graft.tools

import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.corpus.{DocIds, TranscriptGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: step-by-step timing of the index build. */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val convs = if (args.length > 1) args(1).toLong else 500L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val gen = t("generate.count")(TranscriptGen.generate(spark, convs).cache().count())
    println(s"turns: $gen")
    val turns = TranscriptGen.generate(spark, convs)
    val corpus = t("docIds")(DocIds.forTurns(turns).cache())
    t("corpus.count")(corpus.count())
    val analyzeUdf = udf((s: String) => { val a = Analyzers.Icat(s); (a.terms, a.positions) })
    t("analyze.sumtokens")(println(corpus.select(analyzeUdf(col("text")).as("a"))
      .select(size(col("a._1")).as("n")).agg(sum(col("n"))).collect()(0)))
    val idx = t("build (postings+stats)")(IndexBuilder.build(corpus, Analyzers.Icat))
    t("postings.count")(idx.postings.count())
    t("postings.count2")(idx.postings.count())
    val dir = java.nio.file.Files.createTempDirectory("prof").toString
    t("save")(IndexBuilder.save(idx, dir, hotDfThreshold = 10000L))
    spark.stop()
  }
}
