package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are the DuckDB-verified correctness gate
  * (graft.gate.Gate + graft.pipeline.PipelineGate): each entry runs the
  * real engine/pipeline code over the driver's parquet tables and has an
  * equivalent oracle SQL (or a rows-only check for ops DuckDB cannot
  * express, which are instead verified by ScalaTest suites).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: BM25 boolean search over
    * the documents corpus through the full index/scoring pipeline. */
  def entry(spark: SparkSession): DataFrame =
    gate.Gate.queries("bm25_or")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gate.Gate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    gate.Gate.oracleSql
}
