package graft.build

import graft.analysis.{Analyzers, TextAnalyzer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global collection statistics needed by BM25 (reference semantics:
  * Lucene's per-index CollectionStatistics; we use one logical index —
  * SURVEY.md §2.8: N, df, avgdl with avgdl = sumTotalTermFreq/docCount
  * over UNquantized totals). */
final case class CorpusStats(docCount: Long, sumTotalTermFreq: Long) {
  def avgdl: Double = sumTotalTermFreq.toDouble / docCount
}

/** The index table bundle — the Spark-native equivalent of a committed
  * Lucene index (reference: IndexBucket/ShardBucket, Lucene.java:115-264):
  *
  *  - corpus:    docId + the original turn row (stored fields)
  *  - postings:  (term, docId, tf, norm, role, tool, ts) — one row per
  *               distinct (term, doc); `norm` is the Lucene-quantized
  *               length byte; role/tool/ts are denormalized so attribute
  *               FILTER legs are plain pushed-down scan predicates instead
  *               of a corpus join (the analogue of Lucene keeping doc
  *               values colocated with each segment)
  *  - termStats: (term, df, cf)
  *  - stats:     global docCount / sumTotalTermFreq
  */
final case class Index(
    corpus: DataFrame,
    postings: DataFrame,
    termStats: DataFrame,
    stats: CorpusStats,
    analyzerName: String,
    segments: Option[DataFrame] = None,
    segSize: Int = Segments.DefaultSegSize) {
  def analyzer: TextAnalyzer = Analyzers.byName(analyzerName)

  /** Whether the postings carry per-term position lists (built
    * `withPositions` — the proximity data phrase queries require). */
  def hasPositions: Boolean = postings.columns.contains("positions")

  /** Cache-ownership hook: drop every cached table of this bundle (the
    * close() of a long-lived service — see IndexRegistry.drop/clear).
    * No-op for tables that were never persisted; the bundle itself stays
    * queryable afterwards, recomputing from lineage/storage. Corpus
    * inclusion is optional because the corpus cache is minted by
    * DocIds.assign and may be shared by other bundles built over it. */
  def unpersistAll(includeCorpus: Boolean = true): Unit = {
    postings.unpersist()
    termStats.unpersist()
    segments.foreach(_.unpersist())
    if (includeCorpus) corpus.unpersist()
    ()
  }
}

object IndexBuilder {

  /** Read one long metric off a completed Observation, defaulting when
    * the metric is absent or null. Absence is REAL: when an observed
    * subtree is provably empty at plan time (e.g. a sample filter over a
    * tiny corpus), PropagateEmptyRelation folds the CollectMetrics node
    * away and the observation completes with a ZERO-FIELD row — so the
    * empty case must read as its aggregate's identity, not a crash. */
  private def obsLong(obs: org.apache.spark.sql.Observation,
                      key: String, default: Long): Long = {
    // `future` completes when the observed action finishes (the public
    // blocking `get` throws on the zero-field row instead of defaulting)
    val row = scala.concurrent.Await.result(
      obs.future, scala.concurrent.duration.Duration.Inf)
    // the zero-field row carries no schema at all
    val i = Option(row.schema).map(_.fieldNames.indexOf(key)).getOrElse(-1)
    if (i < 0 || row.isNullAt(i)) default else row.getLong(i)
  }

  /** Target posting rows per shuffle partition for the salted postings
    * write — sized so a partition's sortWithinPartitions run (~80 B/row
    * unsafe row + sorter pointers ≈ 320 MB) stays inside one task's
    * execution memory share at the default heap. */
  val TargetShuffleRows: Long = 4000000L

  /** Build the inverted index tables from a corpus with docIds.
    *
    * Shuffle plan (scale notes):
    *  - postings are built with NO shuffle at all: every occurrence of a
    *    term within a document sits in the same input row, so per-doc
    *    (term → tf) counting happens inside the analyze projection and
    *    explode(map) emits finished posting rows — a narrow pipeline that
    *    scales embarrassingly (Lucene counts per-doc tf in memory the
    *    same way while inverting a document)
    *  - termStats groupBy(term): the ONE shuffle, over distinct
    *    (term,doc) pairs, partial-aggregated map-side; a hot term arrives
    *    at its reducer as at most numPartitions pre-summed rows — no skew
    * Salted repartitioning for hot terms applies to the term-major packed
    * layout (graft.build.SaltedPostings) where whole posting lists must be
    * assembled on one task, and to the sorted save layout below.
    */
  def build(corpusWithIds: DataFrame, analyzer: TextAnalyzer,
            withPositions: Boolean = false): Index = {
    // persist: stats, termStats, save and every query reuse this table —
    // without it the analyze DAG re-runs per downstream action. (For
    // at-scale builds use buildAndSave, which streams postings to storage
    // instead of caching them.)
    val postings = analyzedPostings(corpusWithIds, analyzer,
        withPositions = withPositions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val termStats = postings
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val stats = computeStats(postings)
    Index(corpusWithIds, postings, termStats, stats, analyzer.name)
  }

  private def computeStats(postings: DataFrame): CorpusStats = {
    val row = postings
      .agg(countDistinct(col("docId")).as("docCount"), sum(col("tf")).as("sttf"))
      .collect()(0)
    if (row.isNullAt(0) || row.isNullAt(1)) CorpusStats(0L, 0L)
    else CorpusStats(row.getLong(0), row.getLong(1))
  }

  /** Analyzed narrow projection: one finished posting row per (doc, term)
    * — per-doc tf counted inside the projection, no shuffle.
    *
    * `keepEmptyDocs = true` emits ONE sentinel row (term = null, tf =
    * null) for a doc whose text analyzes to zero tokens, so the at-scale
    * build can recover the exact Lucene docCount (docs with ≥1 term —
    * Terms.getDocCount semantics) from corpusCount − sentinelCount
    * without a distinct-docId shuffle over the whole postings table.
    *
    * `withPositions = true` additionally carries each term's Lucene
    * position list as a `positions: array<int>` column (tf ≡ its length)
    * — the proximity data phrase queries need (Lucene's .pos file; same
    * narrow no-shuffle pipeline, bigger rows). Stopword gaps and
    * synonym-shared positions come from the analyzer's positional mode. */
  private[graft] def analyzedPostings(corpusWithIds: DataFrame,
                                      analyzer: TextAnalyzer,
                                      keepEmptyDocs: Boolean = false,
                                      withPositions: Boolean = false): DataFrame = {
    val hasAttrs = Seq("role", "tool", "ts").forall(corpusWithIds.columns.contains)
    val attrCols = if (hasAttrs) Seq(col("role"), col("tool"), col("ts")) else Nil
    val normUdf = udf((positions: Int) => SmallFloat.intToByte4(positions))
    // Both branches return the per-doc groups as an ARRAY of (term, …)
    // tuples (encoded array<struct>) rather than a Scala Map: the array
    // is built in one pass over the LinkedHashMap entries, where the old
    // `asScala.toMap` rebuilt an immutable HashMap per document — pure
    // allocation in the hottest loop of the build (GC pressure is the
    // measured 32-thread work-inflation tax). `inline`/`inline_outer`
    // explodes array<struct> exactly as explode/explode_outer did the
    // map (one row per entry; one null row per empty doc when
    // keepEmptyDocs), with identical row order and values.
    if (withPositions) {
      val analyzeUdf = udf((s: String) => {
        val a = analyzer.positional(if (s == null) "" else s)
        val posLists = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
        var i = 0
        while (i < a.terms.length) {
          val t = a.terms(i)
          var buf = posLists.get(t.term)
          if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Int]; posLists.put(t.term, buf) }
          buf += t.pos
          i += 1
        }
        val arr = new Array[(String, Array[Int])](posLists.size())
        val it = posLists.entrySet().iterator()
        var j = 0
        while (it.hasNext) {
          val e = it.next()
          arr(j) = (e.getKey, e.getValue.toArray)
          j += 1
        }
        (arr, a.positions)
      })
      val exploded =
        if (keepEmptyDocs) inline_outer(col("plists")) else inline(col("plists"))
      corpusWithIds
        .select(Seq(col("docId"), analyzeUdf(col("text")).as("a")) ++ attrCols: _*)
        .select(Seq(col("docId"), col("a._1").as("plists"), normUdf(col("a._2")).as("norm")) ++ attrCols: _*)
        .select((Seq(col("docId"), col("norm")) ++ attrCols :+ exploded): _*)
        .withColumnRenamed("_1", "term")
        .withColumnRenamed("_2", "positions")
        .withColumn("tf", size(col("positions")))
        .withColumn("tf", when(col("term").isNull, lit(null)).otherwise(col("tf")).cast("int"))
        .select(Seq(col("docId"), col("norm"), col("term"), col("tf"), col("positions"))
          ++ attrCols: _*)
    } else {
      val analyzeUdf = udf((s: String) => {
        val a = analyzer(if (s == null) "" else s)
        val counts = new java.util.LinkedHashMap[String, Integer]()
        var i = 0
        while (i < a.terms.length) {
          // single-probe upsert (merge) instead of getOrDefault + put
          counts.merge(a.terms(i), Integer.valueOf(1),
            (x: Integer, y: Integer) => Integer.valueOf(x.intValue() + y.intValue()))
          i += 1
        }
        val arr = new Array[(String, Int)](counts.size())
        val it = counts.entrySet().iterator()
        var j = 0
        while (it.hasNext) {
          val e = it.next()
          arr(j) = (e.getKey, e.getValue)
          j += 1
        }
        (arr, a.positions)
      })
      val exploded =
        if (keepEmptyDocs) inline_outer(col("tfs")) else inline(col("tfs"))
      corpusWithIds
        .select(Seq(col("docId"), analyzeUdf(col("text")).as("a")) ++ attrCols: _*)
        .select(Seq(col("docId"), col("a._1").as("tfs"), normUdf(col("a._2")).as("norm")) ++ attrCols: _*)
        .select((Seq(col("docId"), col("norm")) ++ attrCols :+ exploded): _*)
        .withColumnRenamed("_1", "term")
        .withColumnRenamed("_2", "tf")
        .withColumn("tf", col("tf").cast("int"))
        .select(Seq(col("docId"), col("norm"), col("term"), col("tf"))
          ++ attrCols: _*)
    }
  }

  /** At-scale build: analyze → ONE salted shuffle → sorted parquet write,
    * then stats from the written table. Unlike build()+save(), this never
    * materializes the exploded posting rows into a deserialized cache —
    * at 100 TB you cannot hold the postings of a build in executor
    * memory, and even locally the cache write is the non-scaling step.
    * Passes over the data:
    *   1. a 1/`sampleRate` deterministic doc sample is analyzed to
    *      estimate hot terms (heavy-hitter sketch — a term whose sampled
    *      df clears threshold/sampleRate is salted);
    *   2. the full narrow analyze feeds repartition(n, term, salt) +
    *      sortWithinPartitions(term, docId) + parquet write — the one
    *      shuffle, carrying finished posting rows;
    *   3. termStats + global stats aggregate over the WRITTEN columnar
    *      table, reading only (term, docId, tf).
    */
  def buildAndSave(corpusWithIds: DataFrame, analyzer: TextAnalyzer, dir: String,
                   numPartitions: Int = 0, hotDfThreshold: Long = 1000000L,
                   saltBuckets: Int = 16, writeCorpus: Boolean = true,
                   sampleRate: Int = 100, withPositions: Boolean = false): Index = {
    val spark = corpusWithIds.sparkSession
    // driver-phase wall timestamps (GRAFT_BUILD_PROFILE=1): splits the
    // build's serial floor into its driver legs for the scaling work
    val profT0 = System.nanoTime()
    def prof(tag: String): Unit =
      if (sys.env.get("GRAFT_BUILD_PROFILE").contains("1"))
        System.err.println(f"PROFPH ${(System.nanoTime() - profT0) / 1e9}%7.2f $tag")

    // heavy-hitter + volume estimate from one deterministic doc sample —
    // ONE job: the posting-row count (volume estimate) rides the same
    // action as the hot-term collect via an Observation on the pre-agg
    // frame, instead of a persist + second aggregate job (each small
    // serial job in this path idles every core at high parallelism)
    val sampled = corpusWithIds.filter(pmod(xxhash64(col("docId")), lit(sampleRate)) === 0)
    val sampleObs = org.apache.spark.sql.Observation()
    val hotTerms = analyzedPostings(sampled, analyzer)
      .observe(sampleObs, count(lit(1)).as("rows"))
      .groupBy("term").agg(count(lit(1)).as("sdf"))
      .filter(col("sdf") * sampleRate >= hotDfThreshold)
      .select("term").collect().map(_.getString(0)).toSet
    prof("hot_terms_collected")
    val estPostings = obsLong(sampleObs, "rows", 0L) * sampleRate
    val bHot = spark.sparkContext.broadcast(hotTerms)
    val isHot = udf((t: String) => bHot.value.contains(t))

    // Partition the ONE salted shuffle by DATA VOLUME, not core count:
    // with partitions tied to parallelism, per-partition sort volume
    // grows linearly with the corpus until sortWithinPartitions spills
    // and the build turns superlinear (measured: 2.5× turns → 5.3× the
    // 8-core wall). ~TargetShuffleRows posting rows (~≤300 MB unsafe
    // rows) per partition keeps every sort in execution memory at any
    // corpus size — at 10^12 postings this yields ~250k tasks, the
    // shape a 1000-executor cluster wants — while the numShufflePartitions
    // floor keeps every core busy on small corpora.
    val n = if (numPartitions > 0) numPartitions
            else math.max(spark.sessionState.conf.numShufflePartitions.toLong,
                          estPostings / TargetShuffleRows + 1).toInt

    // zero-token docs ride along as ONE null-term sentinel row each, so
    // the exact Lucene docCount (docs with ≥1 term) falls out of
    // corpusCount − sentinelCount below — no distinct-docId shuffle over
    // the full postings table (which defeats partial aggregation: every
    // term-partitioned partition sees most docIds, so the "distinct"
    // shuffles nearly the whole docId column and scales with I/O, not
    // cores)
    // GLOBAL stats ride the write action itself (map-side Observation on
    // the analyzed rows, before the shuffle): sumTotalTermFreq = sum(tf)
    // (sentinel rows carry tf null, which sum skips), empty-doc count =
    // the sentinel rows. The previous shape re-derived both from a
    // persisted post-write aggregate with two collect jobs — serial
    // floor on every build.
    val buildObs = org.apache.spark.sql.Observation()
    analyzedPostings(corpusWithIds, analyzer, keepEmptyDocs = true,
        withPositions = withPositions)
      .observe(buildObs,
        sum(col("tf").cast("long")).as("sttf"),
        count(when(col("term").isNull, lit(1))).as("emptyDocs"))
      .withColumn("_salt",
        when(isHot(col("term")), pmod(hash(col("docId")), lit(saltBuckets))).otherwise(lit(0)))
      .repartition(n, col("term"), col("_salt"))
      .drop("_salt")
      .sortWithinPartitions("term", "docId")
      .write.mode("overwrite").parquet(s"$dir/postings")
    prof("postings_written")
    val sttf = obsLong(buildObs, "sttf", 0L)
    val emptyDocs = obsLong(buildObs, "emptyDocs", 0L)

    // ONE post-write job: the per-term stats table, aggregated from the
    // written columnar postings (reads only term + tf)
    val written = spark.read.parquet(s"$dir/postings")
    val postings = written.filter(col("term").isNotNull)
    postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      // sorted within each written file so query-time per-term lookups
      // (weightsFrame / phraseMatches / WAND idf collects — each a
      // pushed-down isin scan) prune to ~one row group per file via
      // parquet min/max stats instead of decoding the whole dictionary;
      // no extra exchange — the groupBy's own partitioning is kept
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/termstats")
    prof("termstats_written")
    // docCount needs only the corpus row count (cached by DocIds.assign)
    val docCount = corpusWithIds.count() - emptyDocs
    val stats =
      if (docCount == 0L) CorpusStats(0L, 0L) else CorpusStats(docCount, sttf)
    if (writeCorpus) corpusWithIds.write.mode("overwrite").parquet(s"$dir/corpus")

    val meta =
      s"""{"analyzer":"${analyzer.name}","docCount":${stats.docCount},""" +
        s""""sumTotalTermFreq":${stats.sumTotalTermFreq},"segSize":${Segments.DefaultSegSize},""" +
        s""""hasSegments":false,"version":1}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/meta.json"), meta)

    prof("done")
    Index(corpusWithIds, postings, spark.read.parquet(s"$dir/termstats"),
      stats, analyzer.name)
  }

  /** Persist the index as a directory of parquet tables + metadata.
    *
    * Postings are written hash-distributed on (term, salt) — hot terms
    * (df above `hotDfThreshold`) are salted across `salt` buckets so no
    * single write task owns a Zipf head term — and sorted by (term, docId)
    * within partitions so parquet row-group min/max stats on `term` give
    * file/row-group pruning for query-term lookups.
    */
  def save(index: Index, dir: String, numPartitions: Int = 0,
           hotDfThreshold: Long = 1000000L, saltBuckets: Int = 16,
           writeSegments: Boolean = false, segSize: Int = Segments.DefaultSegSize,
           writeCorpus: Boolean = true): Unit = {
    val spark = index.corpus.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions

    // stored fields: when the corpus already lives in a source table the
    // rewrite is optional (Lucene must store fields; we have the table)
    if (writeCorpus) index.corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    index.termStats.sortWithinPartitions("term") // row-group-pruned lookups
      .write.mode("overwrite").parquet(s"$dir/termstats")

    val hotTerms = index.termStats
      .filter(col("df") >= hotDfThreshold)
      .select("term").collect().map(_.getString(0)).toSet
    val bHot = spark.sparkContext.broadcast(hotTerms)
    val isHot = udf((t: String) => bHot.value.contains(t))
    index.postings
      .withColumn("_salt",
        when(isHot(col("term")), pmod(hash(col("docId")), lit(saltBuckets))).otherwise(lit(0)))
      .repartition(n, col("term"), col("_salt"))
      .drop("_salt")
      .sortWithinPartitions("term", "docId")
      .write.mode("overwrite").parquet(s"$dir/postings")

    if (writeSegments)
      Segments.save(Segments.pack(index.postings, index.stats, segSize), s"$dir/segments", n)

    val meta =
      s"""{"analyzer":"${index.analyzerName}","docCount":${index.stats.docCount},""" +
        s""""sumTotalTermFreq":${index.stats.sumTotalTermFreq},"segSize":$segSize,""" +
        s""""hasSegments":$writeSegments,"version":1}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/meta.json"), meta)
  }

  /** Load a persisted index. The directory must contain a corpus table
    * (write with `writeCorpus = true`); corpus-less saves are
    * postings-only artifacts for throughput benchmarking. */
  def load(spark: SparkSession, dir: String): Index = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/corpus")),
      s"$dir has no corpus table — saved with writeCorpus=false?")
    val meta = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/meta.json"))
    def field(k: String): String = {
      val m = java.util.regex.Pattern.compile("\"" + k + "\":\"?([^,}\"]+)").matcher(meta)
      require(m.find(), s"missing $k in meta.json"); m.group(1)
    }
    val hasSegments = meta.contains("\"hasSegments\":true")
    Index(
      corpus = spark.read.parquet(s"$dir/corpus"),
      // buildAndSave artifacts carry one null-term sentinel row per
      // zero-token doc (docCount bookkeeping); the live view filters them
      // (pushed to the scan, free on sentinel-less save() artifacts)
      postings = spark.read.parquet(s"$dir/postings").filter(col("term").isNotNull),
      termStats = spark.read.parquet(s"$dir/termstats"),
      stats = CorpusStats(field("docCount").toLong, field("sumTotalTermFreq").toLong),
      analyzerName = field("analyzer"),
      segments = if (hasSegments) Some(spark.read.parquet(s"$dir/segments")) else None,
      segSize = if (meta.contains("\"segSize\"")) field("segSize").toInt
                else Segments.DefaultSegSize)
  }
}
