package graft.streaming

import graft.SparkSuite
import graft.analysis.Analyzers
import graft.corpus.TranscriptGen
import org.apache.spark.sql.functions._

/** End-to-end Structured Streaming ingest: file source → analyze →
  * postings sink, micro-batch commits as the visibility boundary
  * (reference: modify feed + commitSeconds timer, Lucene.java:481-513,
  * 1094-1110). */
class StreamingSpec extends SparkSuite {

  test("streaming ingest writes the same postings as the batch transform") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"
    new java.io.File(inDir).mkdirs()

    val turns = TranscriptGen.generate(spark, 10).toDF()
    turns.coalesce(1).write.mode("overwrite").parquet(inDir)

    val q = StreamingIndex.start(spark, inDir, outDir, ckDir, triggerSecs = 1)
    try {
      q.processAllAvailable() // drain every pending micro-batch
    } finally q.stop()

    val streamed = spark.read.parquet(outDir)
    val batch = StreamingIndex.postingsFor(spark.read.parquet(inDir), Analyzers.Icat)
    // identical (docId, term, tf, norm) multisets
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("docId", "term", "tf", "norm")
        .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(key(streamed) === key(batch))
    assert(streamed.count() > 0)

    // a SECOND batch of files becomes visible after its micro-batch
    // commit — the commitSeconds semantics
    val more = TranscriptGen.generate(spark, 13).toDF()
      .filter(col("conv_id") >= "conv-00000010")
    more.coalesce(1).write.mode("append").parquet(inDir)
    val q2 = StreamingIndex.start(spark, inDir, outDir, ckDir, triggerSecs = 1)
    try q2.processAllAvailable() finally q2.stop()
    val after = spark.read.parquet(outDir)
    assert(after.select("docId").distinct().count() >
      streamed.select("docId").distinct().count())
  }
}
