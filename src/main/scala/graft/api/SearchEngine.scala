package graft.api

import graft.build.{Index, IndexBuilder}
import graft.analysis.{Analyzers, TextAnalyzer}
import graft.corpus.DocIds
import graft.model._
import graft.score.QueryExec
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Engine facade mirroring the reference's search service surface
  * (reference: Lucene.java:751-779 search endpoints, 956-973 facet
  * endpoint, 1411-1423 searchEntity): build/load an index over a turns
  * corpus, run text+filter searches with pagination, and compute facets.
  */
final class SearchEngine(val index: Index) {
  private val exec = new QueryExec(index)
  private val analyzer: TextAnalyzer = index.analyzer
  private val spark = index.corpus.sparkSession

  /** Translate a SearchRequest into (Query, filters). Mirrors the parse
    * stage of the reference (SearchBucket ctor, SearchBucket.java:126-153):
    * query text → boolean tree; filter map + date bounds → FILTER legs. */
  def plan(req: SearchRequest): (Query, Seq[AttrPredicate]) = {
    val q: Query = req.text.map(_.trim).filter(_.nonEmpty) match {
      case Some(t) => QueryText.parse(t, s => analyzer(s).terms)
      case None    => MatchAll
    }
    val attr = scala.collection.mutable.ArrayBuffer.empty[AttrPredicate]
    req.filter.foreach { case (f, vs) =>
      if (vs.size == 1) attr += FieldEquals(f, vs.head)
      else attr += FieldIn(f, vs)
    }
    (req.lower, req.upper) match {
      case (None, None) => ()
      case (lo, hi) =>
        attr += TsRange(
          lo.map(Dates.parseMs).getOrElse(Long.MinValue),
          hi.map(Dates.parseUpperMs).getOrElse(Long.MaxValue))
    }
    (q, attr.toSeq)
  }

  /** Top-k search; hits carry stored fields (the reference's per-hit
    * stored-field fetch, Lucene.java:859, realized as a broadcast join of
    * the k winning docIds back to the corpus table). */
  def search(req: SearchRequest): SearchResponse = {
    val (q, filters) = plan(req)
    val top =
      if (req.sort.isScore) exec.topK(q, filters, req.maxResults, req.searchAfter)
      else exec.topKSorted(q, filters, req.sort, req.maxResults, req.searchAfter)
    // Collect the ordered top-k FIRST (≤ k rows) and keep ITS row order —
    // the limited frame is already in the engine's full lexicographic sort
    // order (all sort fields + docId tiebreak); re-sorting driver-side by a
    // subset of keys would mis-order multi-field sorts and mint a wrong
    // search_after token.
    val topRows = top.collect()
    val orderedIds: Array[Long] = topRows.map(_.getLong(0))
    val scoreOf: Map[Long, Float] =
      topRows.map(r => r.getLong(0) -> toFloatScore(r.get(1))).toMap
    import spark.implicits._
    val fetched = index.corpus
      .join(broadcast(spark.createDataset(orderedIds.toSeq).toDF("docId")), "docId")
      .select("docId", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .collect()
      .map { r =>
        val id = r.getLong(0)
        id -> ScoredHit(id, scoreOf(id), r.getString(1), r.getInt(2), r.getString(3),
          r.getString(4), Option(r.getString(5)), r.getTimestamp(6))
      }.toMap
    val ordered: Seq[ScoredHit] = orderedIds.flatMap(fetched.get).toSeq
    // after token from the last TOP row: field values come off the sorted
    // frame itself (topKSorted selects every sort column); timestamps are
    // encoded as epoch ms, the reference's token wire shape
    // (Lucene.java:1544-1561).
    val afterTok = topRows.lastOption.map { r =>
      if (req.sort.isScore) AfterToken(r.getLong(0), Some(toFloatScore(r.get(1))), Nil)
      else AfterToken(r.getLong(0), None, req.sort.fields.zipWithIndex.map {
        case ((_, _), i) =>
          r.get(i + 2) match {
            case t: java.sql.Timestamp => t.getTime
            case v                     => v
          }
      })
    }
    SearchResponse(ordered, afterTok)
  }

  private def toFloatScore(v: Any): Float = v match {
    case f: Float  => f
    case d: Double => d.toFloat
    case n: Number => n.floatValue()
  }

  /** Time-limited search (reference: TimeLimitingCollector + HTTP 504,
    * Lucene.java:1467-1516, default 5 s). Spark job groups are
    * thread-local, so the group MUST be set inside the Future body on the
    * thread that actually submits the jobs — setting it on the caller's
    * thread would leave the submitted jobs ungrouped and cancelJobGroup
    * a no-op. */
  def searchWithTimeout(req: SearchRequest, timeoutSecs: Int = 5,
                        groupName: Option[String] = None): Either[String, SearchResponse] = {
    val group = groupName.getOrElse(s"graft-search-${System.nanoTime()}")
    val sc = spark.sparkContext
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f = Future {
      sc.setJobGroup(group, "time-limited search", interruptOnCancel = true)
      try search(req)
      finally sc.clearJobGroup() // pooled thread: don't leak the group
    }
    try Right(Await.result(f, timeoutSecs.seconds))
    catch {
      case _: java.util.concurrent.TimeoutException =>
        sc.cancelJobGroup(group) // kills the Future's in-flight Spark jobs
        Left(s"search exceeded $timeoutSecs s") // the reference's 504
    }
  }

  /** String facets: doc counts per label of each dimension over the
    * query's matches, ordered count-desc then label, limited to maxLabels
    * (reference: Lucene.java:1334-1368; cross-partition merge is the
    * groupBy itself, FacetedDimension.java:51-62). */
  def facetStrings(req: SearchRequest, dimensions: Seq[String],
                   maxLabels: Int = 10): Map[String, Seq[(String, Long)]] = {
    val (q, filters) = plan(req)
    val m = exec.matches(q, filters).select("docId")
    val joined = index.corpus.join(m, "docId")
    dimensions.map { dim =>
      val rows = joined.filter(col(dim).isNotNull)
        .groupBy(col(dim)).agg(count(lit(1)).as("doc_count"))
        .orderBy(col("doc_count").desc, col(dim).asc)
        .limit(maxLabels)
        .collect()
        .map(r => (r.get(0).toString, r.getLong(1)))
      dim -> rows.toSeq
    }.toMap
  }

  /** Range facets on a numeric/timestamp expression: [from, to) buckets
    * (reference: lower-inclusive upper-exclusive LongRange,
    * Lucene.java:1292-1318). Single pass: one conditional-sum aggregate
    * per range inside ONE aggregation over ONE scan of the match join —
    * overlapping ranges double-count exactly as Lucene's per-range
    * counters do, but without launching a Spark job per bucket. */
  def facetRanges(req: SearchRequest, field: String,
                  ranges: Seq[(String, Long, Long)]): Seq[(String, Long)] = {
    if (ranges.isEmpty) return Nil
    val (q, filters) = plan(req)
    val m = exec.matches(q, filters).select("docId")
    val joined = index.corpus.join(m, "docId")
    val valueCol = field match {
      case "ts" => col("ts").cast("double") * 1000.0 // epoch ms
      case f    => col(f).cast("double")
    }
    val aggs = ranges.map { case (_, lo, hi) =>
      sum(when(valueCol >= lo && valueCol < hi, 1L).otherwise(0L))
    }
    val row = joined.agg(aggs.head, aggs.tail: _*).collect()(0)
    ranges.zipWithIndex.map { case ((label, _, _), i) =>
      label -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }
  }

  /** Reference-shaped facet JSON:
    * {"aggregations":{dim:{"buckets":{label:{"doc_count":n}}}}}
    * (reference: FacetedDimension.java:70-88). */
  def facetJson(req: SearchRequest, dimensions: Seq[String], maxLabels: Int = 10): String = {
    val dims = facetStrings(req, dimensions, maxLabels)
    val body = dims.map { case (dim, labels) =>
      val buckets = labels
        .map { case (l, n) => s""""$l":{"doc_count":$n}""" }
        .mkString("{", ",", "}")
      s""""$dim":{"buckets":$buckets}"""
    }.mkString(",")
    s"""{"aggregations":{$body}}"""
  }
}

object SearchEngine {

  /** API version constant (reference: Constants.java / GET /version,
    * Lucene.java:467-476). */
  val ApiVersion = "1.0.0"

  /** Build an engine from a turns dataset: assign dense docIds, build the
    * index tables. */
  def build(turns: Dataset[Turn], analyzer: TextAnalyzer = Analyzers.Icat): SearchEngine = {
    val corpus = DocIds.forTurns(turns)
    new SearchEngine(IndexBuilder.build(corpus, analyzer))
  }

  def load(spark: SparkSession, dir: String): SearchEngine =
    new SearchEngine(IndexBuilder.load(spark, dir))
}
