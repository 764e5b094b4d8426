package graft.score

import graft.SparkSuite
import graft.analysis.Analyzers
import graft.api.SearchEngine
import graft.corpus.TranscriptGen
import graft.model._

/** Committed golden files (FIXTURES.md §3): the frozen query set's top-20
  * (docId, score) over the tiny seed-42 corpus. Asserts BOTH
  * oracle == golden (guards the oracle against regressions) and
  * engine == golden (guards the engine), so the goldens play the role of
  * the reference's recorded query-suite outputs. */
class GoldenSpec extends SparkSuite {

  private lazy val engine = SearchEngine.build(TranscriptGen.tiny(spark), Analyzers.Icat)
  private lazy val exec = new QueryExec(engine.index)
  private lazy val oracle: NaiveOracle = {
    val rows = engine.index.corpus
      .select("docId", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .collect()
      .map(r => (r.getLong(0), Turn(r.getString(1), r.getInt(2), r.getString(3),
        r.getString(4), Option(r.getString(5)), r.getTimestamp(6))))
    NaiveOracle.fromTurns(rows.toIndexedSeq, Analyzers.Icat)
  }

  private def golden(id: String): (String, Seq[(Long, Float)]) = {
    val src = scala.io.Source.fromResource(s"golden/topk/$id.json")
    val s = try src.mkString finally src.close()
    val text = "\"text\":\"([^\"]*)\"".r.findFirstMatchIn(s).get.group(1)
    val hits = """\{"docId":(\d+),"score":([0-9.Ee+-]+)\}""".r
      .findAllMatchIn(s).map(m => (m.group(1).toLong, m.group(2).toFloat)).toSeq
    (text, hits)
  }

  graft.tools.GenGoldens.queries.foreach { case (id, _, filters) =>
    test(s"golden $id: oracle and engine both reproduce the committed file") {
      val (text, want) = golden(id)
      val q = if (text.isEmpty) MatchAll
              else QueryText.parse(text, s => Analyzers.Icat(s).terms)
      val fromOracle = oracle.topK(q, filters, 20)
      assert(fromOracle === want, s"$id: oracle drifted from golden")
      val fromEngine = exec.topK(q, filters, 20)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      assert(fromEngine.map(_._1) === want.map(_._1), s"$id: engine ranks != golden")
      fromEngine.zip(want).foreach { case ((gd, gs), (wd, ws)) =>
        assert(gd === wd)
        assert(math.abs(gs - ws) <= math.abs(ws) * 1e-6 + 1e-7, s"$id doc $gd score")
      }
    }
  }

  test("golden stats: docCount / sumTotalTermFreq / df") {
    val src = scala.io.Source.fromResource("golden/stats.json")
    val s = try src.mkString finally src.close()
    def num(k: String): Long =
      ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(s).get.group(1).toLong
    assert(engine.index.stats.docCount === num("docCount"))
    assert(engine.index.stats.sumTotalTermFreq === num("sumTotalTermFreq"))
    assert(oracle.df(Analyzers.Icat("ambiguous").terms.head) === num("ambiguous"))
    assert(oracle.df("needle_3") === num("needle_3"))
  }
}
