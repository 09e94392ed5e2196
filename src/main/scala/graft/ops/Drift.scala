package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared smoothed-PSI machinery (x33 temporal drift and fs5 split
  * drift both ride it; the SQL twin is `OracleSql.psiSql` — ONE copy of
  * the smoothing/rounding rules, so the two audits cannot desync).
  *
  * `cnt` must have columns (bucket, refN, curN); buckets absent from
  * cnt get Laplace-smoothed zero counts. The input is eagerly
  * materialized because it feeds BOTH the totals aggregate and the
  * bucket join — without that, the upstream scan (and any per-row hash
  * work in it) runs twice (the gov4 lesson). */
object Drift {

  def psiTerms(cnt: DataFrame, b: Int, refN: String, curN: String,
               refP: String, curP: String): DataFrame = {
    val cntM = cnt.localCheckpoint()
    val tot = cntM.agg(sum(refN).as("t_ref"), sum(curN).as("t_cur"))
    val buckets = cntM.sparkSession.range(0, b).select(col("id").as("bucket"))
    val p = (coalesce(col(refN), lit(0L)).cast("double") + 1.0) /
      (col("t_ref").cast("double") + lit(b.toDouble))
    val q = (coalesce(col(curN), lit(0L)).cast("double") + 1.0) /
      (col("t_cur").cast("double") + lit(b.toDouble))
    buckets.join(cntM, Seq("bucket"), "left").crossJoin(broadcast(tot))
      .select(col("bucket").cast("int").as("bucket"),
        coalesce(col(refN), lit(0L)).as(refN),
        coalesce(col(curN), lit(0L)).as(curN),
        round(p, 6).as(refP), round(q, 6).as(curP),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy("bucket")
  }
}
