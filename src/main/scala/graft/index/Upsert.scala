package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance for the stored (partitioned) vector indexes —
  * upsert / delete / compact over the v6 IVF(+PQ) layout (SURVEY.md §2.9;
  * ref `backend/services/vector_store.py:165-205` re-upserts a document's
  * vectors on every re-ingest, which a write-once index cannot express).
  *
  * LSM-style segment layout, Spark-native: the index directory stays
  * `partitionBy(cell)` parquet; every mutation APPENDS a new segment
  * (monotone `seg` number) instead of rewriting — an upsert touches only
  * the cell partitions its batch lands in, a delete writes tombstone rows
  * into the deleted vectors' CURRENT cells. Readers resolve latest-wins
  * per vector (max seg; a live row outranks a same-seg tombstone, which
  * occurs only for the old-cell tombstone of a cell MOVE). Because a
  * move writes its tombstone into the OLD cell, resolution is correct
  * even over a cell-pruned read — the old cell sees the tombstone, the
  * new cell sees the live row, and neither needs the other.
  *
  * Scale shape: upsert cost is O(batch + one ids-only column-pruned scan
  * of (vec_id, cell, seg, deleted)) — never O(corpus) row data (the d8
  * incremental-dedup contract); the pruned query path resolves only the
  * probed cell's rows. `compact` folds segments back to seg 0 when the
  * tombstone/segment count warrants it (the judge of WHEN is a manifest
  * policy, deliberately out of scope). */
object Upsert {

  /** Write the initial index: `index` must carry (idCol, payload columns,
    * cellCol); segments start at 0, nothing deleted. */
  def writeBase(index: DataFrame, cellCol: String, out: String): Unit =
    index.withColumn("seg", lit(0L)).withColumn("deleted", lit(false))
      .write.mode("overwrite").partitionBy(cellCol).parquet(out)

  /** Latest-wins resolution over any (possibly cell-pruned) segment view:
    * max seg per vector, live row outranking a same-seg move-tombstone,
    * tombstoned vectors dropped. */
  def resolveView(segments: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("seg").desc, col("deleted").asc)
    segments.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("deleted"))
      .drop("_rn", "deleted")
  }

  /** The current live index (full read + resolution). */
  def resolve(spark: SparkSession, out: String, idCol: String = "vec_id"): DataFrame =
    resolveView(spark.read.parquet(out), idCol)

  private def nextSeg(spark: SparkSession, out: String): Long =
    spark.read.parquet(out).agg(max(col("seg"))).head.getLong(0) + 1L

  /** Upsert a batch of (idCol, payload..., cellCol) rows: new vectors
    * insert, existing vectors are superseded; a vector whose cell CHANGED
    * additionally gets a tombstone in its old cell so pruned readers of
    * that cell drop it. One segment per call; a vec_id must appear at
    * most once per batch (enforced). */
  def upsert(spark: SparkSession, out: String, batch: DataFrame,
             idCol: String = "vec_id", cellCol: String = "cell"): Unit = {
    require(batch.groupBy(col(idCol)).count().filter(col("count") > 1).isEmpty,
      s"upsert batch must carry at most one row per $idCol")
    val seg = nextSeg(spark, out)
    // ids-only view of the current index: the scan reads 4 small columns,
    // never the payload (codes/vectors)
    val current = resolveView(
      spark.read.parquet(out).select(col(idCol), col(cellCol), col("seg"), col("deleted")),
      idCol)
    val payloadCols = batch.columns.filterNot(c => c == idCol || c == cellCol)
    val moveTombstones = batch.select(col(idCol), col(cellCol).as("_new_cell"))
      .join(current.select(col(idCol), col(cellCol)), Seq(idCol))
      .filter(col(cellCol) =!= col("_new_cell"))
      .select(Seq(col(idCol), col(cellCol)) ++
        payloadCols.map(c => lit(null).cast(batch.schema(c).dataType).as(c)): _*)
      .withColumn("deleted", lit(true))
    val liveRows = batch.withColumn("deleted", lit(false))
    liveRows.unionByName(moveTombstones)
      .withColumn("seg", lit(seg))
      .write.mode("append").partitionBy(cellCol).parquet(out)
  }

  /** Delete by id: tombstones appended into each victim's CURRENT cell
    * (ids with no live row are ignored — idempotent). `template` supplies
    * the payload schema for the null columns. */
  def delete(spark: SparkSession, out: String, ids: DataFrame,
             idCol: String = "vec_id", cellCol: String = "cell"): Unit = {
    val seg = nextSeg(spark, out)
    val full = spark.read.parquet(out)
    val payloadCols = full.columns.filterNot(c =>
      Seq(idCol, cellCol, "seg", "deleted").contains(c))
    val current = resolveView(
      full.select(col(idCol), col(cellCol), col("seg"), col("deleted")), idCol)
    current.join(ids.select(col(idCol)), Seq(idCol), "left_semi")
      .select(Seq(col(idCol), col(cellCol)) ++
        payloadCols.map(c => lit(null).cast(full.schema(c).dataType).as(c)): _*)
      .withColumn("deleted", lit(true))
      .withColumn("seg", lit(seg))
      .write.mode("append").partitionBy(cellCol).parquet(out)
  }

  /** [[upsert]] with the segment number and the current (id, cell) view
    * supplied by the CALLER — the manifest-driven form (v19): at 100 TB
    * the next segment id comes from the index's manifest log, never from
    * a `max(seg)` scan over the physical index, and the ids-only current
    * view is read once per epoch by the caller (column-pruned — the
    * [[upsert]] contract) and shared between the tombstone derivation
    * and whatever else the epoch needs. Batch contract as [[upsert]]
    * (at most one row per id; the caller's manifest commit is the
    * enforcement point). Returns the per-cell write inventory
    * (cell, n_live, n_tombstones) so the caller can commit manifest rows
    * WITHOUT re-listing files. */
  def upsertSeg(batch: DataFrame, current: DataFrame, seg: Long, out: String,
                idCol: String = "vec_id", cellCol: String = "cell"): DataFrame = {
    val payloadCols = batch.columns.filterNot(c => c == idCol || c == cellCol)
    val moveTombstones = batch.select(col(idCol), col(cellCol).as("_new_cell"))
      .join(current.select(col(idCol), col(cellCol)), Seq(idCol))
      .filter(col(cellCol) =!= col("_new_cell"))
      .select(Seq(col(idCol), col(cellCol)) ++
        payloadCols.map(c => lit(null).cast(batch.schema(c).dataType).as(c)): _*)
      .withColumn("deleted", lit(true))
    val rows = batch.withColumn("deleted", lit(false)).unionByName(moveTombstones)
      .withColumn("seg", lit(seg)).localCheckpoint() // one compute: write + inventory
    rows.write.mode("append").partitionBy(cellCol).parquet(out)
    rows.groupBy(col(cellCol)).agg(
      sum(when(!col("deleted"), 1L).otherwise(0L)).as("n_live"),
      sum(when(col("deleted"), 1L).otherwise(0L)).as("n_tombstones"))
  }

  /** [[delete]]'s manifest-driven twin: the caller supplies the victims
    * WITH their current cells (from its ids-only view) and the segment
    * number; `template` supplies the payload schema for the null
    * columns. Returns the per-cell inventory like [[upsertSeg]]. */
  def deleteSeg(victims: DataFrame, template: DataFrame, seg: Long, out: String,
                idCol: String = "vec_id", cellCol: String = "cell"): DataFrame = {
    val payloadCols = template.columns.filterNot(c => c == idCol || c == cellCol)
    val rows = victims.select(Seq(col(idCol), col(cellCol)) ++
        payloadCols.map(c => lit(null).cast(template.schema(c).dataType).as(c)): _*)
      .withColumn("deleted", lit(true)).withColumn("seg", lit(seg)).localCheckpoint()
    rows.write.mode("append").partitionBy(cellCol).parquet(out)
    rows.groupBy(col(cellCol)).agg(
      sum(when(!col("deleted"), 1L).otherwise(0L)).as("n_live"),
      sum(when(col("deleted"), 1L).otherwise(0L)).as("n_tombstones"))
  }

  /** Fold all segments into a fresh seg-0 index at `dst` (tombstones and
    * superseded rows dropped). Query-equivalence with the un-compacted
    * index is the v9 gate's invariant. */
  def compact(spark: SparkSession, out: String, dst: String,
              idCol: String = "vec_id", cellCol: String = "cell"): Unit =
    writeBase(resolve(spark, out, idCol).drop("seg"), cellCol, dst)

  /** Cell-pruned read + resolution: the partition-pruned scan of
    * [[Search.readPruned]] (the query's cell directory only), then
    * latest-wins over just those rows. */
  def readPrunedResolved(spark: SparkSession, out: String, queryRow: DataFrame,
                         idCol: String = "vec_id", cellCol: String = "cell"): DataFrame =
    resolveView(
      spark.read.parquet(out).join(broadcast(queryRow), Seq(cellCol)), idCol)
}
