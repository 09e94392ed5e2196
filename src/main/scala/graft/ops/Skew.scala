package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4 physical strategy; 100 TB
  * design requirement).
  *
  * AQE's skew-join splitting handles most runtime skew; these helpers cover
  * the two cases AQE can't re-plan: a hash aggregate whose hot key floods
  * one reducer, and a join against a dimension with a known hot key set.
  */
object Skew {

  /** Two-phase (salted) aggregation: groupBy(keys + salt) partial, then
    * groupBy(keys) final. Use when one key holds a large share of rows —
    * the partial phase spreads the hot key over `saltBuckets` reducers.
    * `aggs` must be decomposable (sum/count/min/max — the partial results
    * re-aggregate with the same function). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, String]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partialExprs = aggs.map { case (c, f) => expr(s"$f($c)").as(s"_p_$c") }.toSeq
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val finalExprs = aggs.map { case (c, f) =>
      val refin = if (f == "count") "sum" else f
      expr(s"$refin(_p_$c)").as(s"${f}_$c")
    }.toSeq
    partial.groupBy(keys.map(col): _*).agg(finalExprs.head, finalExprs.tail: _*)
  }

  /** Skewed fact-dim join: replicate dim rows for hot keys across
    * `saltBuckets` salt values and salt the fact side randomly, so the hot
    * key's rows spread over `saltBuckets` tasks. Non-hot keys join with
    * salt 0 (no replication cost). */
  def skewJoin(fact: DataFrame, dim: DataFrame, key: String, hotKeys: Seq[Any],
               saltBuckets: Int): DataFrame = {
    val hot = hotKeys.map(lit(_))
    val factSalted = fact.withColumn("_salt",
      when(col(key).isin(hot: _*), pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
        .otherwise(lit(0L)))
    val dimReplicated = dim
      .withColumn("_salts",
        when(col(key).isin(hot: _*), sequence(lit(0L), lit(saltBuckets.toLong - 1)))
          .otherwise(array(lit(0L))))
      .withColumn("_salt", explode(col("_salts"))).drop("_salts")
    factSalted.join(dimReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
