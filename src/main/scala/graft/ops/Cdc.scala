package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental CDC apply — the micro-batch form of cdc1's one-shot fold
  * (see `queries/LakehouseQueries.cdc1Apply`): fold a change batch
  * (k, seq, op ∈ {U, D}, new_cents) into a snapshot (k, cents, last_seq).
  *
  *  - within the batch, the max-seq change per key wins;
  *  - changes with seq ≤ the snapshot's last_seq are STALE and ignored —
  *    replaying an already-applied batch is a no-op, so an
  *    at-least-once delivery (file-source restarts, retried
  *    micro-batches) still converges to the exactly-once result;
  *  - 'D' drops the key, 'U' inserts-or-updates.
  *
  * Batching is associative: applying waves w1 then w2 equals applying
  * w1 ∪ w2 at once (the overall max-seq change wins either way) — the
  * invariant CdcStreamSpec pins across a streaming replay. Scale shape:
  * one window over the batch (batch-sized) + one outer join on the key
  * — the snapshot never rewrites more than the touched partition set
  * under a partitioned sink. */
object Cdc {

  /** Fold one change batch into the working state. Deletes become
    * TOMBSTONES (cents = null, last_seq kept), not physical drops: if a
    * delete at seq 1239 landed in an earlier batch and an out-of-order
    * update at seq 1234 arrives later, only the remembered last_seq can
    * mark it stale — dropping the row would resurrect the key
    * (CdcStreamSpec's waves hit exactly this). Read the user-facing
    * table through [[publish]]. */
  def applyBatch(snap: DataFrame, changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    val last = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("seq").as("ch_seq"), col("op"), col("new_cents"))
    snap.join(last, Seq("k"), "full")
      // stale guard: ignore a change the state has already absorbed
      .withColumn("fresh", col("ch_seq").isNotNull &&
        (col("last_seq").isNull || col("ch_seq") > col("last_seq")))
      .select(col("k"),
        when(col("fresh") && col("op") === "D", lit(null).cast("long")) // tombstone
          .when(col("fresh"), col("new_cents"))
          .otherwise(col("cents")).as("cents"),
        when(col("fresh"), col("ch_seq")).otherwise(col("last_seq")).as("last_seq"))
  }

  /** The readable table: tombstones filtered out. */
  def publish(state: DataFrame): DataFrame = state.filter(col("cents").isNotNull)
}
