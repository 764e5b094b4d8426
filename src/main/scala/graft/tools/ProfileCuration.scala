package graft.tools

import graft.pipeline.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-stage timing of the curation_pipeline gate query
  * (quality filter → near-dup pairs → clusters → apply → sample) plus a
  * job counter, to locate driver-bound stages the end-to-end timing
  * can't attribute. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    def t[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      println(f"[cur] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }
    val dd = spark.read.parquet(s"$sfDir/documents.parquet")
    t("qualityFilter plain count") {
      Curation.qualityFilter(dd, Curation.QualityConfig(minTokens = 10)).count()
    }
    t("qualityFilter pass-filter") {
      Curation.qualityFilter(dd, Curation.QualityConfig(minTokens = 10))
        .filter(col("pass")).count()
    }
    t("qualityFilter pass-col-only") {
      Curation.qualityFilter(dd, Curation.QualityConfig(minTokens = 10))
        .select("doc_id", "pass").filter(col("pass")).count()
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val qIds = t("qualityFilter ids count") {
        val q = Curation.qualityFilter(dd, Curation.QualityConfig(minTokens = 10))
          .filter(col("pass")).select("doc_id")
        q.count(); q
      }
      val qdocs = dd.join(qIds, "doc_id")
      val pairs = t("ngramJaccardPairs eager") {
        Dedup.ngramJaccardPairs(qdocs, 5, 0.8)
      }
      val clusters = t("dedupClusters") {
        val c = Dedup.dedupClusters(pairs); c.count(); c
      }
      val deduped = t("applyDedup count") {
        val a = Dedup.applyDedup(qdocs, clusters); a.count(); a
      }
      t("stratifiedSample count") {
        Curation.stratifiedSample(deduped, "lang",
          Map("en" -> 0.5, "fr" -> 0.25), defaultRate = 0.1)
          .select("doc_id", "lang").orderBy("doc_id").count()
      }
      pairs.unpersist()
    }
    spark.stop()
  }
}
