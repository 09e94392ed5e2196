package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA by power iteration — the embedding-compression /
  * whitening primitive (project to the top principal directions before
  * indexing; the dense-retrieval counterpart of PQ/SQ's quantization).
  *
  * Scale shape: the covariance is ONE map-side-combined aggregate over the
  * (id-equi-joined) centered component pairs — O(N·d²) exploded rows but
  * no cross join and nothing driver-side; the power iterations then run
  * entirely on the d×d covariance frame (constant size in N), so corpus
  * scale only ever touches the covariance pass. Every reduction that
  * crosses a shuffle sums in DECIMAL(25,15) (order-independent — the d9
  * discipline) and iterated vectors are 12-dp-rounded doubles, so both
  * engines (and any cluster layout) see bit-identical values.
  */
object Pca {

  /** Covariance matrix of the first `dim` vector components, as
    * `(i, j, cov)` rows (full matrix, both triangles). Components are
    * widened float→double before any arithmetic. */
  def covariance(emb: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val comp = emb.select(col(idCol).as("_pid"),
      posexplode(transform(slice(col(vecCol), 1, dim), v => v.cast("double"))).as(Seq("i", "x")))
    val n = emb.agg(count(lit(1)).cast("double").as("n"))
    val mu = comp.groupBy("i")
      .agg(sum(col("x").cast("decimal(25,15)")).cast("double").as("sx"))
      .crossJoin(broadcast(n))
      .select(col("i"), (col("sx") / col("n")).as("mu"))
    val centered = comp.join(broadcast(mu), "i")
      .select(col("_pid"), col("i"), (col("x") - col("mu")).as("cx"))
    centered.join(centered.select(col("_pid"), col("i").as("j"), col("cx").as("cy")), "_pid")
      .groupBy("i", "j")
      .agg(sum((col("cx") * col("cy")).cast("decimal(25,15)")).cast("double").as("s"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), (col("s") / col("n")).as("cov"))
  }

  /** Top eigenvector of a `(i, j, cov)` covariance frame by `iterations`
    * power-iteration rounds from the deterministic start e₁ (fixed start,
    * so there is no eigen-sign ambiguity to resolve). Each round is one
    * broadcast join + one d-row aggregate on the CONSTANT-size covariance
    * frame; the covariance input is localCheckpoint-ed so iterations never
    * re-run its corpus-scale lineage (the pageRank lesson). Returns
    * `(i, v)` unit-vector components. */
  def powerIteration(cov: DataFrame, dim: Int, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val c = cov.localCheckpoint()
    var v = c.sparkSession.range(dim)
      .select(col("id").cast("int").as("i"),
        when(col("id") === 0, 1.0).otherwise(0.0).as("v"))
    for (_ <- 1 to iterations) {
      val w = matvec(c, v)
      val norm = w.agg(sqrt(sum((col("w") * col("w")).cast("decimal(25,15)")).cast("double")).as("nrm"))
      v = w.crossJoin(broadcast(norm))
        .select(col("i"), round(col("w") / col("nrm"), 12).as("v"))
        .localCheckpoint()
    }
    v
  }

  /** `C · v` for a `(i, j, cov)` frame and `(i, v)` vector — broadcast
    * join on j + DECIMAL-exact per-i sum. */
  def matvec(cov: DataFrame, v: DataFrame): DataFrame =
    cov.join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))), "j")
      .groupBy("i")
      .agg(sum((col("cov") * col("vj")).cast("decimal(25,15)")).cast("double").as("w"))
}
