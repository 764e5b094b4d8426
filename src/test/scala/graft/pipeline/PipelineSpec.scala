package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Verifies the approximate (LSH) pipeline operators against their exact
  * baselines on the driver's sf0.001 tables. */
class PipelineSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("minhash LSH pairs ⊇ high-jaccard pairs and ⊆ threshold-jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, 5, 0.8)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.8)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes precision exact; recall should be ≥ 90% at j≥0.8
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    assert(lsh.size >= (exact.size * 0.9).toInt, s"recall ${lsh.size}/${exact.size}")
  }

  test("simhash: near-identical docs collide, fingerprints deterministic") {
    val fp1 = Dedup.simhash(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fp2 = Dedup.simhash(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp1 === fp2)
    val pairs = Dedup.simhashPairs(docs, 3).collect()
    assert(pairs.forall(r => java.lang.Long.bitCount(
      fp1(r.getLong(0)) ^ fp1(r.getLong(1))) <= 3))
  }

  test("ANN: LSH top-k ⊆ reasonable and overlaps brute-force top-k") {
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val brute = Similarity.bruteForceTopK(emb, q, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(emb, q, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty)
    // sign-random-projection at 16 planes: expect meaningful overlap
    assert((brute intersect lsh).size >= 3, s"overlap ${(brute intersect lsh).size}")
  }

  test("IVF ANN: probed cells recover most of the brute-force top-k") {
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val brute = Similarity.bruteForceTopK(emb, q, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, q, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(ivf.nonEmpty)
    assert((brute intersect ivf).size >= 3, s"ivf overlap ${(brute intersect ivf).size}")
  }

  test("simhash blocking is lossless at any block count (Manku pigeonhole)") {
    import spark.implicits._
    // synthetic fingerprints with planted near-dups: groups of 4 prints
    // derived from one base by flipping 0..3 distinct bits — every
    // within-group pair is within distance 6, many within 3
    val fps: Seq[(Long, Long)] = (0 until 400).map { i =>
      val base = Dedup.fnv1a64(s"fp-${i / 4}")
      val flips = i % 4
      val start = (java.lang.Long.remainderUnsigned(
        Dedup.fnv1a64(s"p-${i / 4}"), 52L)).toInt
      val flipped = (0 until flips).foldLeft(base)((f, b) => f ^ (1L << (start + 3 * b)))
      (i.toLong, flipped)
    }
    val brute = (for {
      a <- fps; b <- fps if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= 3
    } yield (a._1, b._1, d)).toSet
    assert(brute.nonEmpty)
    val fpDf = fps.toDF("id", "simhash")
    // identical output at the default, an uneven-width, and a wide config
    Seq(4, 5, 6).foreach { k =>
      val got = Dedup.simhashPairsFromFingerprints(fpDf, 3, nBlocks = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute, s"nBlocks=$k diverged (recall must be 1.0)")
    }
    // the adaptive chooser widens the key space as the corpus grows:
    // 16-bit single-chunk keys until ~6.7e7 docs, 25-bit 2-chunk keys
    // beyond, 31-bit 3-chunk keys at trillion scale
    assert(Dedup.simhashBlocks(100000L) === 4)
    assert(Dedup.simhashBlocks(1L << 30) === 5)
    assert(Dedup.simhashBlocks(1L << 40) === 6)
  }

  test("IVF: hashed quantizer sample covers a time-ordered corpus (no id bias)") {
    import spark.implicits._
    // ids CORRELATE with content: the first 1024 ids cluster near 0.5,
    // the last 1024 near 5.0 — a lowest-id training sample (the round-4
    // scheme) would never see the second cluster
    val dim = 8
    val rows = (0L until 2048L).map { i =>
      val c = if (i < 1024) 0.5f else 5.0f
      (i, Array.tabulate(dim)(d => c +
        java.lang.Long.remainderUnsigned(Dedup.fnv1a64(s"e-$i-$d"), 1000L) / 10000.0f))
    }
    val tEmb = rows.toDF("vec_id", "embedding")
    // the hashed sample (rate = 2048/256 = 8) draws from BOTH halves
    val sample = Similarity.ivfSampleQ(tEmb, 2048L, 256, 42L, "vec_id", "embedding")
    assert(sample.length > 128 && sample.length < 1024, s"sample ${sample.length}")
    val lo = sample.count(_.head < 25000L) // quantized: 0.5→~5000, 5.0→~50000
    val hi = sample.length - lo
    assert(lo > sample.length / 8 && hi > sample.length / 8,
      s"biased sample: lo=$lo hi=$hi of ${sample.length}")
    // a build over it quantizes both clusters and a probe into the
    // late-id cluster recovers the brute-force top-k from the right cells
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-bias").toString
    AnnIndex.buildIvf(tEmb, dir) // auto cells = ⌈√2048⌉ = 46
    val cents = AnnIndex.readCentroids(dir)
    assert(cents.exists(_.head < 25000L) && cents.exists(_.head >= 25000L),
      "centroids do not span both clusters")
    val q = Array.fill(dim)(5.05f)
    val brute = Similarity.bruteForceTopK(tEmb, q, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = AnnIndex.ivfTopK(spark, dir, q, 10, nProbe = 12)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.forall(_ >= 1024L), s"probe strayed into the early-id cluster: $ivf")
    assert((brute intersect ivf).size >= 5, s"recall ${(brute intersect ivf).size}/10")
  }

  test("materialized LSH index: probe prunes partitions and matches the scan-based result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-test").toString
    AnnIndex.buildLsh(emb, dir)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    // I/O pruning: the probe touches strictly fewer parquet files than the
    // whole bucket table holds
    val allFiles = spark.read.parquet(s"$dir/lsh_buckets")
      .select(input_file_name()).distinct().count()
    val probedFiles = AnnIndex.lshProbeScan(spark, dir, q)
      .select(input_file_name()).distinct().count()
    assert(probedFiles < allFiles, s"probe read $probedFiles of $allFiles files")
    // the bucket predicate lands in the scan's PartitionFilters
    val plan = AnnIndex.lshProbeScan(spark, dir, q).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("band"), plan.take(500))
    // result parity with the per-query scan implementation
    val idxTop = AnnIndex.lshTopK(spark, dir, q, 10, emb, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val scanTop = Similarity.lshTopK(emb, q, 10, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(idxTop === scanTop)
    // footprint: the default ids-only index is a fraction of the
    // vector-carrying variant; both probe modes agree
    val dirV = java.nio.file.Files.createTempDirectory("graft-ann-vec").toString
    AnnIndex.buildLsh(emb, dirV, storeVectors = true)
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    assert(dirBytes(s"$dir/lsh_buckets") < dirBytes(s"$dirV/lsh_buckets") / 2)
    val vecTop = AnnIndex.lshTopK(spark, dirV, q, 10, emb, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(vecTop === idxTop)
  }

  test("materialized IVF index: probe prunes cells and recovers brute-force top-k") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-test").toString
    AnnIndex.buildIvf(emb, dir)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val allFiles = spark.read.parquet(s"$dir/ivf_cells")
      .select(input_file_name()).distinct().count()
    val probedFiles = AnnIndex.ivfProbeScan(spark, dir, q, nProbe = 4)
      .select(input_file_name()).distinct().count()
    assert(probedFiles < allFiles, s"probe read $probedFiles of $allFiles files")
    val plan = AnnIndex.ivfProbeScan(spark, dir, q).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(500))
    val brute = Similarity.bruteForceTopK(emb, q, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val ivf = AnnIndex.ivfTopK(spark, dir, q, 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert((brute intersect ivf).size >= 3, s"ivf overlap ${(brute intersect ivf).size}")
  }

  test("hot-shingle df cap keeps exact pairs at gate scale and bounds blocking") {
    // cap far above this corpus's max shingle df (3): identical results
    val uncapped = Dedup.ngramJaccardPairs(docs, 5, 0.8, hotShingleDfCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccardPairs(docs, 5, 0.8, hotShingleDfCap = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === uncapped)
    assert(capped.nonEmpty)
    // tiny cap on a boilerplate-heavy corpus: candidates shrink, scores
    // for surviving pairs stay exact
    import spark.implicits._
    val boiler = (0L to 19L).map(i =>
      (i, s"common boiler plate header shared by all docs unique_$i tail token stream ${i % 2}"))
      .toDF("doc_id", "text")
    val strict = Dedup.ngramJaccardPairs(boiler, 3, 0.1, hotShingleDfCap = 1L).collect()
    val loose = Dedup.ngramJaccardPairs(boiler, 3, 0.1, hotShingleDfCap = Long.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    strict.foreach { r =>
      assert(loose((r.getLong(0), r.getLong(1))) === r.getDouble(2))
    }
    assert(strict.length <= loose.size)
  }

  test("exact dedup by hash key equals dedup by full text") {
    val byHash = Dedup.exact(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byText = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byHash === byText)
  }

  test("char-ngram language ID classifies real sentences") {
    import spark.implicits._
    val df = Seq(
      (1L, "the weather was nice and the children played in the garden all day"),
      (2L, "le temps etait agreable et les enfants jouaient dans le jardin"),
      (3L, "das wetter war schoen und die kinder spielten den ganzen tag im garten"),
      (4L, "el tiempo era agradable y los ninos jugaban en el jardin todo el dia"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langIdNgram(df).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "fr")
    assert(got(3L) === "de")
    assert(got(4L) === "es")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.nearDupPairs(emb, 0.30).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.30)
    }
  }

  test("multimodal: decode plumbing roundtrips byte counts") {
    val media = Multimodal.asMedia(docs)
    val dec = Multimodal.decode(media).collect()
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    dec.foreach { r =>
      assert(r.getLong(1) === lens(r.getLong(0))) // ASCII text: bytes == chars
      assert(r.getInt(3) === (r.getLong(1) % 640).toInt)
    }
    val frames = Multimodal.sampleFrames(media)
    assert(frames.count() > 0)
  }

  test("fingerprint: equal normalized content gives equal prints") {
    import spark.implicits._
    val df = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("repetitionStats: hand-computed goldens incl. tie-break and edge cases") {
    import spark.implicits._
    val df = Seq(
      // "a b a b a": top word a (3/5), bigrams: "a b"×2,"b a"×2 → tie,
      // frac 2/4; dup 3/5 (2 distinct of 5)
      (1L, "a b a b a"),
      // all same word: top 4/4, bigram 3/3, dup 3/4
      (2L, "x x x x"),
      // all distinct: top tie → lexicographically smallest "ant"
      (3L, "zebra ant moth"),
      // single token: no bigrams → null
      (4L, "solo"),
      // punctuation/case folding matches the analyzer-free toks()
      (5L, "The THE the, cat!")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df).orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) === 5L)
    assert(byId(1L).getString(2) === "a")
    assert(byId(1L).getDouble(3) === 0.6)
    assert(byId(1L).getDouble(4) === 0.5)
    assert(byId(1L).getDouble(5) === 0.6)
    assert(byId(2L).getString(2) === "x")
    assert(byId(2L).getDouble(3) === 1.0)
    assert(byId(2L).getDouble(4) === 1.0)
    assert(byId(2L).getDouble(5) === 0.75)
    assert(byId(3L).getString(2) === "ant")
    assert(byId(3L).getDouble(3) === 0.3333)
    assert(byId(3L).getDouble(5) === 0.0)
    assert(byId(4L).getLong(1) === 1L)
    assert(byId(4L).isNullAt(4))
    assert(byId(5L).getLong(1) === 4L)
    assert(byId(5L).getString(2) === "the")
    assert(byId(5L).getDouble(3) === 0.75)
  }

  test("chunkDocuments: coverage, overlap, and no redundant tail chunk") {
    import spark.implicits._
    val words10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, words10),        // 10 tokens, chunk=4 overlap=1 (stride 3)
      (2L, "a b"),          // shorter than one chunk → exactly one
      (3L, "x y z w"),      // exactly one chunk length → one chunk
      (4L, "  ")            // empty after tokenize → no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, 4, 1)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // starts 0,3,6 (⌈6/3⌉·3=6): chunks t1-t4, t4-t7, t7-t10
    assert(d1.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(d1.map(_.getString(2)).toSeq ===
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_.getLong(3)).toSeq === Seq(4L, 4L, 4L))
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2(0).getString(2) === "a b" && d2(0).getLong(3) === 2L)
    val d3 = got.filter(_.getLong(0) == 3L)
    assert(d3.length === 1 && d3(0).getString(2) === "x y z w")
    assert(!got.exists(_.getLong(0) == 4L))
    // every token of doc 1 appears in some chunk (coverage)
    val covered = d1.flatMap(_.getString(2).split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("packSequences: distributed prefix sum ≡ serial packing; tiling invariants") {
    val budget = 37
    val got = TextAnalysis.packSequences(docs, budget)
      .orderBy("seq_id", "doc_id", "doc_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // serial reference: collect (id, n) and pack on the driver
    val ns = docs.select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => t =!= "")).cast("long").as("n"))
      .where(col("n") > 0).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var o = 0L
    val want = ns.flatMap { case (id, n) =>
      val frags = ((o / budget) to ((o + n - 1) / budget)).map { s =>
        (s, id, math.max(s * budget - o, 0L),
          math.min((s + 1) * budget, o + n) - math.max(s * budget, o))
      }
      o += n
      frags
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq === want.toSeq)
    // tiling: fragments sum to the doc's tokens; all sequences but the
    // last are exactly full
    val perDoc = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc === ns.toMap)
    val perSeq = got.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    val lastSeq = got.map(_._1).max
    assert(perSeq.forall { case (s, t) => t == budget || s == lastSeq })
  }

  test("trainingOrder: dense permutation, reproducible, seed-sensitive, hash-ordered") {
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val m1 = TextAnalysis.trainingOrder(docs, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // dense positions 0..N-1, each id exactly once
    assert(m1.map(_._1).sorted.toSeq === ids.indices.map(_.toLong))
    assert(m1.map(_._2).sorted.toSeq === ids)
    // reproducible at a different parallelism/layout
    val m1b = TextAnalysis.trainingOrder(docs.repartition(7), seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m1.sortBy(_._1).toSeq === m1b.sortBy(_._1).toSeq)
    // a different seed is a different epoch order (and not the id order)
    val m2 = TextAnalysis.trainingOrder(docs, seed = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m1.sortBy(_._1).map(_._2).toSeq !== m2.sortBy(_._1).map(_._2).toSeq)
    assert(m1.sortBy(_._1).map(_._2).toSeq !== ids)
    // position order IS the (signed fnv hash, id) order
    val want = ids.map(id => (Dedup.fnv1a64(s"ord-7-$id"), id)).sorted.map(_._2)
    assert(m1.sortBy(_._1).map(_._2).toSeq === want)
  }

  test("connectedComponents: chains, cliques, singleton pairs, empty input") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — exercises pointer jumping), clique
    // 10-11-12, isolated pair (20,21)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("ida", "idb")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // small-graph fast path (driver union-find under the edge cap)...
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // ...and the distributed pointer-jumping loop (cap disabled) agree
    val gotDist = Dedup.connectedComponents(pairs, driverEdgeCap = -1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist === expect)
    // empty pair set → empty result, converged (both paths)
    assert(Dedup.connectedComponents(pairs.limit(0)).count() === 0L)
    assert(Dedup.connectedComponents(pairs.limit(0), driverEdgeCap = -1L).count() === 0L)
  }

  test("connectedComponents: long chain converges within the iteration cap") {
    import spark.implicits._
    // 200-vertex chain: plain min-propagation would need ~200 rounds;
    // the pointer-jumping variant must finish inside the default 20
    // (cap disabled so the DISTRIBUTED loop is what's exercised)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("ida", "idb")
    val got = Dedup.connectedComponents(chain, driverEdgeCap = -1L)
    assert(got.count() === 200L)
    assert(got.filter(col("comp") =!= 0L).count() === 0L)
  }

  test("dedupClusters marks exactly one keeper per component") {
    import spark.implicits._
    val pairs = Seq((7L, 3L), (3L, 9L), (40L, 41L)).toDF("ida", "idb")
    val rows = Dedup.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSet === Set((3L, 3L, true), (7L, 3L, false), (9L, 3L, false),
      (40L, 40L, true), (41L, 40L, false)))
  }

  test("applyDedup drops exactly the non-keepers, leaves unpaired docs alone") {
    import spark.implicits._
    val corpus = (1L to 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 8L)).toDF("ida", "idb")
    val kept = Dedup.applyDedup(corpus, Dedup.dedupClusters(pairs))
      .collect().map(_.getLong(0)).toSet
    // component {2,5,8} keeps 2; every unpaired doc survives
    assert(kept === Set(1L, 2L, 3L, 4L, 6L, 7L, 9L, 10L))
  }

  test("duplicateSpans: cross-doc runs coalesce; within-doc repeats and short docs don't count") {
    import spark.implicits._
    val shared = (1 to 10).map(k => s"dup$k").mkString(" ") // 10-token shared block
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta"),              // block at tokens [2,12)
      (2L, s"$shared zeta"),                                // block at tokens [0,10)
      (3L, "unique tokens only here nothing shared at all"),// 8 tokens, unique
      (4L, "short text"),                                   // < n tokens: no windows
      (5L, "rep rep rep rep rep rep rep rep rep")           // repeats only WITHIN one doc
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(corpus, n = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    // a 10-token block at offset s yields 3 overlapping 8-windows
    // (s, s+1, s+2) that coalesce to [s, s+10); doc 5's identical windows
    // live in ONE doc, so countDistinct(doc) = 1 < minDocs and it's out
    assert(got === Set((1L, 2, 12, 3L), (2L, 0, 10, 3L)))
  }

  test("applySpans: duplicated spans cut, untouched and token-less docs intact") {
    import spark.implicits._
    val shared = (1 to 10).map(k => s"dup$k").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta"), // span [2,12) cut
      (2L, s"$shared zeta"),                   // span [0,10) cut
      (3L, "unique tokens only here nothing shared at all"), // windows, no dups
      (4L, "short text"),                      // < n tokens: untouched
      (5L, "...")                              // tokenizes to NOTHING
    ).toDF("doc_id", "text")
    val got = Dedup.applySpans(corpus, n = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, "alpha beta gamma delta", 10L),
      (2L, "zeta", 10L),
      (3L, "unique tokens only here nothing shared at all", 0L),
      (4L, "short text", 0L),
      (5L, "", 0L)))
  }

  test("topNgrams: occurrence counts with deterministic tie-break") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c a b c"),  // "a b c"×2, "b c a", "c a b"
      (2L, "a b c"),        // "a b c"
      (3L, "z z")           // < n tokens: contributes nothing
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(corpus, n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got === List(("a b c", 3L), ("b c a", 1L), ("c a b", 1L)))
  }

  test("sourceOverlap: exact Jaccard between per-source distinct shingle sets") {
    import spark.implicits._
    // unigram shingles (n=1) make the sets easy to state:
    // web = {a,b,c,d}, books = {c,d,e}, code = {x}
    val corpus = Seq(
      (1L, "a b c", "web"), (2L, "c d", "web"),
      (3L, "c d e", "books"),
      (4L, "x x", "code")
    ).toDF("doc_id", "text", "source")
    val got = Curation.sourceOverlap(corpus, n = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got === Set(
      ("books", "web", 2L, 3L, 4L, 0.4),      // {c,d} / {a,b,c,d,e}
      ("books", "code", 0L, 3L, 1L, 0.0),
      ("code", "web", 0L, 1L, 4L, 0.0)))
  }

  test("duplicateSpans: disjoint duplicated runs stay separate spans") {
    import spark.implicits._
    val b1 = (1 to 8).map(k => s"x$k").mkString(" ")
    val b2 = (1 to 8).map(k => s"y$k").mkString(" ")
    val mid = (1 to 9).map(k => s"m$k").mkString(" ") // > n gap keeps spans apart
    val corpus = Seq(
      (1L, s"$b1 $mid $b2"),
      (2L, s"$b1 tail is all different here one two three"),
      (3L, s"head goes differently four five six seven $b2")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(corpus, n = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 0, 8, 1L), (1L, 17, 25, 1L), // doc 1: both blocks, separate spans
      (2L, 0, 8, 1L), (3L, 7, 15, 1L)))
  }

  test("lmScore: engine matches an independent driver-side bigram LM") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def tok(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val v = 8
    val counts = texts.flatMap { case (_, t) => tok(t) }
      .groupBy(identity).map { case (t, xs) => (t, xs.length) }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(v)
      .zipWithIndex.map { case ((t, _), i) => t -> i }.toMap
    val vSz = vocab.size
    val bigs = texts.flatMap { case (_, t) =>
      val ids = tok(t).map(x => vocab.getOrElse(x, vSz).toLong)
      ids.zip(ids.drop(1))
    }
    val c12 = bigs.groupBy(identity).map { case (k, xs) => (k, xs.length.toLong) }
    val c1 = bigs.groupBy(_._1).map { case (k, xs) => (k, xs.length.toLong) }
    val expected = texts.map { case (id, t) =>
      val ids = tok(t).map(x => vocab.getOrElse(x, vSz).toLong)
      val nb = math.max(0, ids.length - 1)
      val sum = ids.zip(ids.drop(1)).map { p =>
        1000000000L * (c12.getOrElse(p, 0L) + 1L) / (c1.getOrElse(p._1, 0L) + vSz + 1L)
      }.sum
      val mean = if (nb > 0)
        Some(BigDecimal(sum.toDouble / (nb.toDouble * 1e9))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      id -> ((ids.length.toLong, ids.count(_ == vSz.toLong).toLong, nb.toLong, mean))
    }.toMap
    val got = LanguageModel.lmScore(docs, vocabSize = v).collect()
    assert(got.length === texts.length)
    got.foreach { r =>
      val (nt, noov, nb, mean) = expected(r.getLong(0))
      assert(r.getLong(1) === nt)
      assert(r.getLong(2) === noov)
      assert(r.getLong(4) === nb)
      val gotMean = if (r.isNullAt(5)) None else Some(r.getDouble(5))
      assert(gotMean === mean, s"doc ${r.getLong(0)}")
    }
  }

  test("lmScore: null and empty texts degrade to zero-token rows") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b"), (2L, null: String), (3L, "???"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = LanguageModel.lmScore(corpus, vocabSize = 4)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(4L, 0L, 0L, 1L))
    assert(got.map(_.getLong(4)).toSeq === Seq(3L, 0L, 0L, 0L))
    assert(!got(0).isNullAt(5) && got(1).isNullAt(5) &&
      got(2).isNullAt(5) && got(3).isNullAt(5))
  }

  test("semDedup: drop rule matches brute-force in-cell smaller-id neighbors") {
    val out = Similarity.semDedup(emb, threshold = 0.35, targetOccupancy = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    assert(out.length === vecs.size)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) {
        d += a(j).toDouble * b(j).toDouble
        na += a(j).toDouble * a(j).toDouble
        nb += b(j).toDouble * b(j).toDouble
        j += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = out.groupBy(_._2)
    out.foreach { case (id, cell, kept) =>
      val hasSmallerNeighbor = byCell(cell).exists { case (other, _, _) =>
        other < id && cos(vecs(other), vecs(id)) >= 0.35
      }
      assert(kept === !hasSmallerNeighbor, s"vec $id cell $cell")
    }
    // the fixed-occupancy sizing keeps every cell id in range
    val nCells = math.ceil(vecs.size / 16.0).toInt
    assert(out.forall { case (_, c, _) => c >= 0 && c < nCells })
  }

  test("tokenBudget: exact discrete percentiles, null source/text edges") {
    import spark.implicits._
    val corpus = Seq(
      // source A: token counts [0(null text), 1, 2, 3, 10]
      (1L, "A", "alpha"),
      (2L, "A", "alpha beta"),
      (3L, "A", "alpha beta gamma"),
      (4L, "A", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (5L, "A", null),
      // source B: a single 5-token doc
      (6L, "B", "one two three four five"),
      // source C: all-ties [2, 2, 2]
      (7L, "C", "x y"), (8L, "C", "p q"), (9L, "C", "m n"),
      // null source: excluded entirely
      (10L, null, "should not appear")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.tokenBudget(corpus).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // A: cnt=5 → p50 pos ⌈2.5⌉=3 → sorted [0,1,2,3,10](3)=2; p90 pos 5 → 10
    // B: every percentile is the single value
    // C: ties collapse to one histogram row; all percentiles = 2
    assert(out.toMap === Map(
      "A" -> ((5L, 16L, 2L, 10L, 10L)),
      "B" -> ((1L, 5L, 5L, 5L, 5L)),
      "C" -> ((3L, 6L, 2L, 2L, 2L))))
    // rows come back ordered by source
    assert(out.map(_._1).toSeq === Seq("A", "B", "C"))
    // custom percents surface with their own labels, p100 = max
    val p = TextAnalysis.tokenBudget(corpus, percents = Seq(10, 100))
    assert(p.columns.toSeq ===
      Seq("source", "docs", "total_tokens", "p10_tokens", "p100_tokens"))
    val a = p.filter(col("source") === "A").head()
    assert(a.getLong(3) === 0L && a.getLong(4) === 10L)
  }
}
