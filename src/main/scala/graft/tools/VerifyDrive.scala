package graft.tools

import graft.api.{Json, SearchEngine}
import graft.corpus.TranscriptGen
import org.apache.spark.sql.SparkSession

/** Throwaway verification drive: exercises the round-3 surface through
  * the PUBLIC api (JSON request → engine → JSON response). */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = SearchEngine.build(TranscriptGen.tiny(spark), withPositions = true)

    def run(tag: String, json: String): Unit = {
      val out = try {
        val resp = engine.search(Json.parseRequest(json))
        Json.renderResponse(resp)
      } catch { case e: Throwable => s"EXCEPTION ${e.getClass.getSimpleName}: ${e.getMessage}" }
      println(s"== $tag ==")
      println(out.take(500))
    }

    run("joinFetch happy path",
      """{"query":{"text":"needle_3"},"maxResults":2,"joinFetch":{"key":"conv_id","limit":2}}""")
    run("pure-negative query (-term) must match NOTHING",
      """{"query":{"text":"-ambiguous"},"maxResults":5}""")
    run("fielded wildcard role:us* (lowercased pattern)",
      """{"query":{"text":"+needle_3 +role:us*"},"maxResults":3}""")
    run("PROBE: joinFetch limit 5000 clamps to 100",
      """{"query":{"text":"needle_3"},"maxResults":1,"joinFetch":{"key":"role","limit":5000}}""")
    run("PROBE: joinFetch on unknown column",
      """{"query":{"text":"needle_3"},"maxResults":1,"joinFetch":{"key":"nope","limit":2}}""")
    run("PROBE: joinFetch missing key field is ignored",
      """{"query":{"text":"needle_3"},"maxResults":1,"joinFetch":{"limit":2}}""")
    run("PROBE: wildcard matching nothing role:zz*",
      """{"query":{"text":"needle_3 role:zz*"},"maxResults":2}""")
    run("quoted phrase through the JSON surface",
      """{"query":{"text":"\"w0000 w0001\""},"maxResults":3}""")
    run("phrase as MUST leg with a NOT term",
      """{"query":{"text":"+\"w0000 w0001\" -ambiguous"},"maxResults":3}""")
    run("PROBE: phrase of all-stopwords drops the clause (match-all)",
      """{"query":{"text":"\"the the\""},"maxResults":1}""")
    run("PROBE: unterminated quote falls back to word parsing",
      """{"query":{"text":"\"w0000 w0001"},"maxResults":2}""")
    run("fuzzy term needle_33~1 (expands over the needle_N dictionary)",
      """{"query":{"text":"needle_33~1"},"maxResults":5}""")
    run("fielded fuzzy role:usr~1 as MUST leg",
      """{"query":{"text":"+needle_3 +role:usr~1"},"maxResults":3}""")
    run("PROBE: fuzzy with no dictionary neighbors (zzzzzz~1)",
      """{"query":{"text":"zzzzzz~1"},"maxResults":2}""")
    run("PROBE: malformed fuzzy suffix word~9 analyzes as text",
      """{"query":{"text":"needle_3~9"},"maxResults":2}""")
    run("regexp term /needle_[0-9]/ (anchored dictionary expansion)",
      """{"query":{"text":"/needle_[0-9]/"},"maxResults":3}""")
    run("fielded regexp role:/us.r/ as MUST leg",
      """{"query":{"text":"+needle_3 +role:/us.r/"},"maxResults":3}""")
    run("PROBE: empty regexp // is dropped (match-all)",
      """{"query":{"text":"//"},"maxResults":1}""")
    run("sloppy phrase \"w0000 w0002\"~2 (order-tolerant proximity)",
      """{"query":{"text":"\"w0000 w0002\"~2"},"maxResults":3}""")
    run("parens grouping with AND/OR: (needle_3 OR needle_4) AND role:user",
      """{"query":{"text":"(needle_3 OR needle_4) AND role:user"},"maxResults":3}""")
    run("NOT operator: needle_3 AND NOT ambiguous",
      """{"query":{"text":"needle_3 AND NOT ambiguous"},"maxResults":3}""")
    run("^boost distributes into leaf weights: needle_3^2 ambiguous",
      """{"query":{"text":"needle_3^2 ambiguous"},"maxResults":3}""")
    run("PROBE: boosted group (needle_3 needle_4)^0.5 keeps flat plan",
      """{"query":{"text":"(needle_3 needle_4)^0.5"},"maxResults":3}""")
    // facet single-pass through the facade
    println("== facets (single pass) ==")
    println(engine.facetJson(graft.model.SearchRequest(text = Some("ambiguous")), Seq("role", "tool")))
    println("== facet request wire shape: dimensions + ranges (from/to buckets) ==")
    val (fdims, frange) = graft.api.Json.parseDimensions(
      """{"dimensions":[{"dimension":"role"},
        |  {"dimension":"ts","ranges":[
        |    {"from":1767225600000,"to":1767225603600000,"key":"early"},
        |    {"from":1767225603600000}]}]}""".stripMargin)
    println(engine.facetJson(graft.model.SearchRequest(text = Some("ambiguous")),
      fdims, rangeDims = frange))
    // timeout path: generous budget → Right
    println("== searchWithTimeout 30s ==")
    println(engine.searchWithTimeout(graft.model.SearchRequest(text = Some("needle_3")), 30)
      .map(_.hits.size))
    // count joined sizes for the clamp probe
    val resp = engine.search(Json.parseRequest(
      """{"query":{"text":"needle_3"},"maxResults":1,"joinFetch":{"key":"role","limit":5000}}"""))
    println(s"== clamp check: joined sizes = ${resp.joined.values.map(_.size).toList} (must be <=100) ==")
    spark.stop()
  }
}
