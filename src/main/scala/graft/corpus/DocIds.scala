package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Dense docId assignment by stable (conv_id, turn_idx) ordering — the
  * per-row invariant the driver checks ("per-turn text equality under
  * stable turn ordering"). Equivalent role to Lucene's internal doc ids
  * (reference: Lucene.java:1631-1639 one Document per row; ids are the
  * engine-side ordering handle and final sort tiebreak,
  * SearchBucket.java:962,988).
  *
  * Scalable two-pass scheme (no single-partition window):
  *   1. range-repartition by the ordering key and sort within partitions —
  *      partitions now hold contiguous key ranges;
  *   2. count rows per partition, prefix-sum the counts on the driver
  *      (one long per partition), and assign ids per partition from the
  *      broadcast offsets.
  *
  * Ids are MINTED EXACTLY ONCE: the ranged input is materialized (cached)
  * before the count pass so both passes see one fixed partition layout,
  * and the id-assigned result is itself materialized before being
  * returned. Partition ids are a runtime artifact — AQE may lay out the
  * same logical plan differently across executions — so an id assignment
  * recomputed per downstream query would not be stable. Minting once and
  * serving every query from the materialized result (or the saved corpus
  * parquet) is also what the reference does: Lucene assigns doc ids at
  * index time, never as a recomputable view.
  */
object DocIds {

  def assign(df: DataFrame, orderCols: Seq[String], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    val parted = df
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .persist()
    // the count pass below is the materializing action for the parted
    // cache (persist() already fixed the cached plan's layout); the
    // assignment pass then reads the same cached partitions
    val counts: Array[(Int, Long)] = parted.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }
        Iterator.single((pid, c))
      }
      .collect()
    val offsets = new Array[Long](counts.length + 1)
    counts.sortBy(_._1).foreach { case (pid, c) => offsets(pid + 1) = c }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    // docId = offsets(pid) + index-within-partition, in COLUMN math:
    // monotonically_increasing_id() is documented as pid·2^33 + row index
    // within the partition, and the scan below reads the FIXED cached
    // layout of `parted`, so splitting it back apart and adding the
    // partition's prefix-sum offset reproduces exactly the dense ids the
    // old mapPartitions pass minted — without its per-row Row.fromSeq
    // allocation and GenericRow cache (measured as part of the build's
    // serial floor: the minting count() materialized an object cache
    // instead of codegen'd unsafe rows)
    val offArr = typedlit(offsets.toSeq)
    val out = parted
      .withColumn("_mono", monotonically_increasing_id())
      .select((element_at(offArr, shiftright(col("_mono"), 33).cast("int") + 1) +
          col("_mono").bitwiseAND(lit((1L << 33) - 1))).as("docId")
        +: parted.columns.map(col): _*)
      .persist()
    // mint: every downstream plan reads these cached rows, never re-runs
    // the pid-dependent assignment
    out.count()
    parted.unpersist()
    out
  }

  /** Corpus helper: assign docIds to a turns dataset. */
  def forTurns(turns: Dataset[graft.model.Turn]): DataFrame =
    assign(turns.toDF(), Seq("conv_id", "turn_idx"))
}
