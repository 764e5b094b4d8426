package graft.streaming

import graft.analysis.{Analyzers, TextAnalyzer}
import graft.build.SmallFloat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental micro-batched indexing via Structured Streaming — the
  * Spark-native analogue of the reference's `modify` feed + commit timer
  * (reference: Lucene.java:481-513 modify batches; 1094-1110 the
  * commitSeconds timer that makes buffered docs searchable). Each
  * micro-batch analyzes new turns and appends finished posting rows; a
  * batch commit IS the visibility boundary, exactly like the reference's
  * IndexWriter.commit cadence.
  *
  * The per-batch transform is the same narrow (shuffle-free) pipeline as
  * the batch IndexBuilder, so the streaming path inherits its scale
  * behavior. Streaming docIds are xxhash64(conv_id, turn_idx) surrogates
  * over the FULL key pair — no bit-packing, so a conversation of any
  * length cannot bleed into another's id space; the natural key columns
  * ride along so batch compaction can re-densify ids (and detect the
  * ~2^-64-per-pair hash collisions) exactly as the reference re-keys from
  * the upstream entity store.
  */
object StreamingIndex {

  /** Postings transform for one micro-batch of turns. */
  def postingsFor(turns: DataFrame, analyzer: TextAnalyzer): DataFrame = {
    val analyzeUdf = udf((s: String) => {
      val a = analyzer(if (s == null) "" else s)
      val counts = new java.util.LinkedHashMap[String, Int]()
      a.terms.foreach(t => counts.put(t, counts.getOrDefault(t, 0) + 1))
      (scala.jdk.CollectionConverters.MapHasAsScala(counts).asScala.toMap, a.positions)
    })
    val normUdf = udf((p: Int) => SmallFloat.intToByte4(p))
    turns
      .withColumn("docId", xxhash64(col("conv_id"), col("turn_idx")))
      .withColumn("a", analyzeUdf(col("text")))
      .select(col("docId"), col("conv_id"), col("turn_idx"),
        normUdf(col("a._2")).as("norm"),
        explode(col("a._1")).as(Seq("term", "tf")),
        col("role"), col("tool"), col("ts"))
      .withColumn("tf", col("tf").cast("int"))
  }

  /** Start a streaming append: watch `inDir` for new turn parquet files,
    * append postings to `outDir` every `triggerSecs` (the commitSeconds
    * knob, run.properties:5-6 in the reference). */
  def start(spark: SparkSession, inDir: String, outDir: String,
            checkpointDir: String, triggerSecs: Int = 5,
            analyzer: TextAnalyzer = Analyzers.Icat): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("turn_idx", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tool", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema).parquet(inDir)
    postingsFor(stream, analyzer)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$triggerSecs seconds"))
      .start()
  }
}
