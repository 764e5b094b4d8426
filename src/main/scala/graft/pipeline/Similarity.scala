package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine is the exactness baseline (a single
  * narrow scan + TakeOrderedAndProject — no shuffle beyond the final
  * top-k); the LSH-bucketed variant is the scale path: signature
  * computation is a narrow map, candidate generation is a bucket join on
  * the band key, and only candidates are reranked exactly.
  */
object Similarity {

  /** cos(v, q) in double precision: dot / (sqrt(|v|²) * sqrt(|q|²)),
    * sequential left-fold accumulation (matches DuckDB's
    * list_cosine_similarity on DOUBLE[] for the oracle). */
  def cosineCol(v: Column, q: Array[Float]): Column = {
    val qd = q.map(_.toDouble)
    val qlit = typedlit(qd)
    val dot = aggregate(zip_with(v, qlit, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)
    val nv = aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nq = math.sqrt(qd.map(x => x * x).sum)
    dot / (sqrt(nv) * lit(nq))
  }

  /** Exact brute-force cosine top-k against one query vector. */
  def bruteForceTopK(emb: DataFrame, query: Array[Float], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.map(i => emb.filter(col(idCol) =!= i)).getOrElse(emb)
    base
      .select(col(idCol), cosineCol(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic random hyperplanes: `numPlanes` unit-free gaussian
    * vectors of dimension `dim`, seed-derived. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val r = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(r.nextGaussian()))
  }

  /** Sign-random-projection signature (one int, bit p = sign of v·h_p). */
  def signatureCol(v: Column, planes: Array[Array[Double]]): Column = {
    val sigBits = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(v, typedlit(p.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _).cast("long")
  }

  /** LSH-bucketed ANN: band the signature into `bands` chunks; candidates
    * share any band value with the query; rerank candidates exactly and
    * return top-k. At cluster scale the banded signature table is the
    * (small) index; the exact rerank touches only candidate rows. */
  def lshTopK(emb: DataFrame, query: Array[Float], k: Int,
              numPlanes: Int = 16, bands: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeId: Option[Long] = None): DataFrame = {
    require(numPlanes % bands == 0)
    val rows = numPlanes / bands
    val dim = query.length
    val planes = hyperplanes(dim, numPlanes, seed)
    val mask = (1L << rows) - 1

    def qSig: Long = {
      var s = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += query(j).toDouble * p(j); j += 1 }
        if (dot > 0) s |= (1L << i)
      }
      s
    }
    val qs = qSig
    val qBands = (0 until bands).map(b => ((qs >>> (b * rows)) & mask, b))

    val base = excludeId.map(i => emb.filter(col(idCol) =!= i)).getOrElse(emb)
    val withSig = base.withColumn("sig", signatureCol(col(vecCol), planes))
    val bandMatch = qBands.map { case (bv, b) =>
      shiftright(col("sig"), b * rows).bitwiseAND(lit(mask)) === lit(bv)
    }.reduce(_ || _)
    withSig.filter(bandMatch)
      .select(col(idCol), cosineCol(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cos"), 4).as("cos"))
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer assigns every
    * vector to a cell; a query probes only the `nProbe` nearest cells and
    * reranks those candidates exactly. The cell table is the "index";
    * at cluster scale it is partitioned by cell id so a probe touches
    * nProbe partitions. Training runs driver-side over a deterministic
    * sample (standard IVF practice — the quantizer is tiny). */
  def kmeansCentroids(sample: Array[Array[Double]], k: Int, iters: Int = 8,
                      seed: Long = 42L): Array[Array[Double]] = {
    val r = new java.util.Random(seed)
    val dim = sample.head.length
    val idx = r.ints(0, sample.length).distinct().limit(k).toArray
    val cents = idx.map(i => sample(i).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, cents)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      (0 until k).foreach { c =>
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
      }
    }
    cents
  }

  /** Index of the nearest centroid (squared-L2). */
  def nearestCentroidOf(v: Array[Double], cents: Array[Array[Double]]): Int =
    nearestCentroid(v, cents)

  private def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < v.length) { val x = v(j) - cents(c)(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k for one query vector. */
  def ivfTopK(emb: DataFrame, query: Array[Float], k: Int,
              nCells: Int = 16, nProbe: Int = 4, sampleSize: Int = 1024,
              seed: Long = 42L, idCol: String = "vec_id",
              vecCol: String = "embedding", excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.map(i => emb.filter(col(idCol) =!= i)).getOrElse(emb)
    // deterministic sample: lowest ids
    val sample = base.orderBy(col(idCol)).limit(sampleSize)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val cents = kmeansCentroids(sample, math.min(nCells, sample.length), seed = seed)
    val bCents = base.sparkSession.sparkContext.broadcast(cents)
    val cellUdf = udf((v: Seq[Float]) =>
      nearestCentroid(v.map(_.toDouble).toArray, bCents.value))
    val qv = query.map(_.toDouble)
    val probeCells = cents.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < qv.length) { val x = qv(j) - c(j); d += x * x; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    base.withColumn("__cell", cellUdf(col(vecCol)))
      .filter(col("__cell").isin(probeCells.toSeq: _*))
      .select(col(idCol), cosineCol(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cos"), 4).as("cos"))
  }

  /** All-pairs embedding near-duplicates above a cosine threshold, LSH
    * blocked (pairs sharing any signature band), exact rerank.
    *
    * Ids-first shape (round 4): the candidate distinct shuffles 16-byte
    * id pairs, and the vectors join back in only for the rerank — the
    * same shape AnnIndex probes use. Previously each candidate row
    * carried BOTH embedding vectors through the distinct. */
  def nearDupPairs(emb: DataFrame, threshold: Double, numPlanes: Int = 16,
                   bands: Int = 4, seed: Long = 42L,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numPlanes % bands == 0)
    val rows = numPlanes / bands
    val dimRow = emb.select(size(col(vecCol))).head()
    val planes = hyperplanes(dimRow.getInt(0), numPlanes, seed)
    val sigs = emb.withColumn("sig", signatureCol(col(vecCol), planes))
    val bandArr = array((0 until bands).map(b =>
      shiftright(col("sig"), b * rows).bitwiseAND(lit((1L << rows) - 1))): _*)
    val banded = sigs.select(col(idCol).as("id"),
      posexplode(bandArr).as(Seq("band", "bv")))
    val l = banded.toDF("ida", "band", "bv")
    val r = banded.toDF("idb", "band", "bv")
    val cands = l.join(r, Seq("band", "bv"))
      .where(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    def norm(c: Column) = sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    cands
      .join(emb.select(col(idCol).as("ida"), col(vecCol).as("va")), "ida")
      .join(emb.select(col(idCol).as("idb"), col(vecCol).as("vb")), "idb")
      .withColumn("cos", dot / (norm(col("va")) * norm(col("vb"))))
      .where(col("cos") >= threshold)
      .select(col("ida"), col("idb"), round(col("cos"), 4).as("cos"))
  }
}
