package graft.api

import graft.analysis.{Analyzers, TextAnalyzer}
import graft.build.{Index, IndexBuilder}
import graft.model.Turn
import org.apache.spark.sql.{Dataset, SparkSession}

/** Named-index registry — the lookup surface the reference serves its 13
  * entity indexes through (reference: `indexBuckets` map keyed by entity
  * name, Lucene.java:232-264; the name set DocumentMapping.java:62-65).
  * Each name maps to an independent Index bundle with its own analyzer,
  * stats and engine; `modify`-style batches address indexes by name
  * exactly as the reference's `_index` field does.
  */
final class IndexRegistry(val spark: SparkSession) {

  private val indexes =
    scala.collection.concurrent.TrieMap.empty[String, Index]

  /** Register (or replace) a built index under a name — replacement is an
    * atomic pointer swap, the reader-visible commit. */
  def register(name: String, index: Index): Unit = indexes.put(name, index)

  /** Build from a turns dataset and register. */
  def build(name: String, turns: Dataset[Turn],
            analyzer: TextAnalyzer = Analyzers.Icat): Index = {
    val idx = IndexBuilder.build(graft.corpus.DocIds.forTurns(turns), analyzer)
    register(name, idx)
    idx
  }

  def get(name: String): Option[Index] = indexes.get(name)

  /** Engine over a named index (reference: per-entity search endpoints,
    * Lucene.java:751-779 route to the named bucket). */
  def engine(name: String): SearchEngine =
    new SearchEngine(indexes.getOrElse(name,
      throw new NoSuchElementException(s"no index named $name")))

  def names: Seq[String] = indexes.keys.toSeq.sorted

  /** Drop one index (reference: per-bucket clear, Lucene.java:547-566).
    * Releases the dropped bundle's cached tables — in a long-lived
    * service, drop without unpersist would pin every dropped generation
    * in executor storage until LRU eviction. */
  def drop(name: String): Unit =
    indexes.remove(name).foreach(_.unpersistAll())

  /** Wipe the registry (reference: clear-all, Lucene.java:547-566). */
  def clear(): Unit = {
    indexes.values.foreach(_.unpersistAll())
    indexes.clear()
  }

  /** Load a persisted index directory under a name. */
  def load(name: String, dir: String): Index = {
    val idx = IndexBuilder.load(spark, dir)
    register(name, idx)
    idx
  }
}
