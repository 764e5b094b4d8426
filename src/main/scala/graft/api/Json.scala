package graft.api

import graft.model._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON request/response surface mirroring the reference's REST contract
  * (reference: Lucene.java:751-779 search endpoints; request parse
  * SearchBucket.java:126-153; result encode Lucene.java:1532-1570;
  * search_after token Lucene.java:1544-1561).
  *
  * Request shape:
  * {"query":{"text":"...","lower":"yyyyMMddHHmm","upper":"...",
  *           "filter":{"role":"assistant","tool":["bash","search"]}},
  *  "sort":"{\"ts\":\"desc\"}", "search_after":"{...}", "maxResults":10}
  */
object Json {

  def parseRequest(json: String): SearchRequest = {
    val root = JsonMethods.parse(json)
    val q = root \ "query"
    def str(v: JValue): Option[String] = v match {
      case JString(s) => Some(s)
      case _          => None
    }
    val filter: Map[String, Seq[String]] = (q \ "filter") match {
      case JObject(fields) =>
        fields.map {
          case (k, JString(s)) => k -> Seq(s)
          case (k, JArray(vs)) => k -> vs.collect { case JString(s) => s }
          case (k, other)      => k -> Seq(other.toString)
        }.toMap
      case _ => Map.empty
    }
    val sort: SortSpec = (root \ "sort") match {
      case JString(s) if s.trim.nonEmpty =>
        JsonMethods.parse(s) match {
          case JObject(fields) =>
            SortSpec(fields.map { case (f, dir) =>
              (f, str(dir).forall(_.equalsIgnoreCase("asc")))
            })
          case _ => SortSpec(Nil)
        }
      case JObject(fields) =>
        SortSpec(fields.map { case (f, dir) =>
          (f, str(dir).forall(_.equalsIgnoreCase("asc")))
        })
      case _ => SortSpec(Nil)
    }
    val after: Option[AfterToken] = (root \ "search_after") match {
      case JNothing | JNull => None
      case v =>
        val tok = v match {
          case JString(s) => JsonMethods.parse(s)
          case other      => other
        }
        val doc = (tok \ "doc") match {
          case JInt(i)  => i.toLong
          case JLong(l) => l
          case _        => sys.error("search_after.doc required")
        }
        val score = (tok \ "score") match {
          case JDouble(d)  => Some(d.toFloat)
          case JDecimal(d) => Some(d.toFloat)
          case JInt(i)     => Some(i.toFloat)
          case _           => None
        }
        val fields = (tok \ "fields") match {
          case JArray(vs) => vs.map {
            case JInt(i)     => i.toLong
            case JLong(l)    => l
            case JDouble(d)  => d
            case JDecimal(d) => d.toDouble
            case JString(s)  => s
            case o           => o.toString
          }
          case _ => Nil
        }
        Some(AfterToken(doc, score, fields))
    }
    val maxResults = (root \ "maxResults") match {
      case JInt(i)  => i.toInt
      case JLong(l) => l.toInt
      case _        => 10
    }
    // joined-entity fetch option (the reference's fields[] analogue,
    // SearchBucket.java:755-778): {"joinFetch":{"key":"conv_id","limit":3}}
    val joinFetch: Option[JoinFetchSpec] = (root \ "joinFetch") match {
      case JObject(fs) =>
        val m = fs.toMap
        m.get("key").flatMap(str).map { k =>
          val lim = m.get("limit") match {
            case Some(JInt(i))  => i.toInt
            case Some(JLong(l)) => l.toInt
            case _              => 100
          }
          JoinFetchSpec(k, lim)
        }
      case _ => None
    }
    SearchRequest(
      text = str(q \ "text"),
      filter = filter,
      lower = str(q \ "lower"),
      upper = str(q \ "upper"),
      sort = sort,
      searchAfter = after,
      maxResults = maxResults,
      joinFetch = joinFetch)
  }

  /** Parse the reference's facet-request `dimensions` array
    * (SearchBucket.java:687-747 parseDimensions):
    * `[{"dimension":"role"},
    *   {"dimension":"ts","ranges":[{"from":1,"to":2,"key":"lbl"}]}]`
    * → (string dimensions, range dimensions). Reference semantics kept:
    * a missing `from`/`to` defaults to Long.Min/MaxValue, the default
    * label is `"<from>-<to>"`, bounds are lower-inclusive
    * upper-exclusive (LongRange(label, lower, true, upper, false)), and
    * a `dimension` key is required. The JSON may be the whole search
    * request or just the object carrying `dimensions`. */
  def parseDimensions(json: String): (Seq[String], Seq[(String, Seq[(String, Long, Long)])]) = {
    val root = JsonMethods.parse(json)
    (root \ "dimensions") match {
      case JArray(dims) =>
        val parsed = dims.map { d =>
          val dim = (d \ "dimension") match {
            case JString(s) => s
            case _ => sys.error(s"'dimension' not specified for facet request $d")
          }
          val ranges = (d \ "ranges") match {
            case JArray(rs) => Some(rs.map { r =>
              def bound(key: String, dflt: Long): Long = (r \ key) match {
                case JInt(i)  => i.toLong
                case JLong(l) => l
                case _        => dflt
              }
              val lo = bound("from", Long.MinValue)
              val hi = bound("to", Long.MaxValue)
              val label = (r \ "key") match {
                case JString(s) => s
                case _          => s"$lo-$hi"
              }
              (label, lo, hi)
            })
            case _ => None
          }
          (dim, ranges)
        }
        (parsed.collect { case (d, None) => d },
          parsed.collect { case (d, Some(rs)) => (d, rs) })
      case _ => (Nil, Nil)
    }
  }

  private def esc(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case '\n'          => "\\n"
    case '\r'          => "\\r"
    case '\t'          => "\\t"
    case c if c < ' '  => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }

  /** Response encode: hits with stored fields + the search_after token of
    * the last hit, mirroring the reference's {"results":[…],
    * "search_after":{…}} shape. */
  def renderResponse(resp: SearchResponse): String = {
    val hits = resp.hits.map { h =>
      val tool = h.tool.map(t => s""""${esc(t)}"""").getOrElse("null")
      // joined docs ride inline per hit, the reference's shape
      // (Lucene.java:869-901 embeds ≤100 joined documents in each result)
      val joined = resp.joined.get(h.docId).map { ds =>
        ds.map { d =>
          val dt = d.tool.map(t => s""""${esc(t)}"""").getOrElse("null")
          s"""{"id":${d.docId},"conv_id":"${esc(d.conv_id)}",""" +
            s""""turn_idx":${d.turn_idx},"role":"${esc(d.role)}",""" +
            s""""text":"${esc(d.text)}","tool":$dt,"ts":${d.ts.getTime}}"""
        }.mkString(""","joined":[""", ",", "]")
      }.getOrElse("")
      s"""{"id":${h.docId},"score":${h.score},"source":{""" +
        s""""conv_id":"${esc(h.conv_id)}","turn_idx":${h.turn_idx},""" +
        s""""role":"${esc(h.role)}","text":"${esc(h.text)}","tool":$tool,""" +
        s""""ts":${h.ts.getTime}}$joined}"""
    }.mkString("[", ",", "]")
    val after = resp.searchAfter.map { a =>
      val score = a.score.map(s => s""","score":$s""").getOrElse("")
      val fields =
        if (a.fields.isEmpty) ""
        else a.fields.map {
          case s: String => s""""${esc(s)}""""
          case other     => other.toString
        }.mkString(""","fields":[""", ",", "]")
      s"""{"doc":${a.docId}$score$fields}"""
    }.getOrElse("null")
    s"""{"results":$hits,"search_after":$after}"""
  }
}
