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
    val hitsDf = index.corpus
      .join(broadcast(top.select("docId", "score")), "docId")
    import spark.implicits._
    val rows = hitsDf
      .select("docId", "score", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[ScoredHit].collect()
    val ordered =
      if (req.sort.isScore) rows.sortBy(h => (-h.score, h.docId)).toSeq
      else {
        val keyOf: ScoredHit => Long = req.sort.fields.head._1 match {
          case "ts"       => h => h.ts.getTime
          case "turn_idx" => h => h.turnIdx
          case f          => sys.error(s"unsupported sort field $f")
        }
        val asc = req.sort.fields.head._2
        rows.sortBy(h => (if (asc) keyOf(h) else -keyOf(h), h.docId)).toSeq
      }
    val afterTok = ordered.lastOption.map { h =>
      if (req.sort.isScore) AfterToken(h.docId, Some(h.score), Nil)
      else AfterToken(h.docId, None, req.sort.fields.map {
        case ("ts", _)       => h.ts.getTime
        case ("turn_idx", _) => h.turnIdx
        case (f, _)          => sys.error(s"unsupported sort field $f")
      })
    }
    SearchResponse(ordered, afterTok)
  }

  private implicit class HitOps(h: ScoredHit) { def turnIdx: Int = h.turn_idx }

  /** Time-limited search (reference: TimeLimitingCollector + HTTP 504,
    * Lucene.java:1467-1516, default 5 s): cancel the job group on timeout
    * and report the overrun instead of hanging. */
  def searchWithTimeout(req: SearchRequest, timeoutSecs: Int = 5): Either[String, SearchResponse] = {
    val group = s"graft-search-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "time-limited search", interruptOnCancel = true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      val f = Future(search(req))
      Right(Await.result(f, timeoutSecs.seconds))
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        Left(s"search exceeded $timeoutSecs s") // the reference's 504
    } finally spark.sparkContext.clearJobGroup()
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
    * Lucene.java:1292-1318). */
  def facetRanges(req: SearchRequest, field: String,
                  ranges: Seq[(String, Long, Long)]): Seq[(String, Long)] = {
    val (q, filters) = plan(req)
    val m = exec.matches(q, filters).select("docId")
    val joined = index.corpus.join(m, "docId")
    val valueCol = field match {
      case "ts" => col("ts").cast("double") * 1000.0 // epoch ms
      case f    => col(f).cast("double")
    }
    ranges.map { case (label, lo, hi) =>
      label -> joined.filter(valueCol >= lo && valueCol < hi).count()
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
