package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog (Flajolet et al. 2007) — the MERGEABLE
  * distinct-count sketch a 100 TB ingest ledger runs on (prompt family:
  * aggregation/incremental; the sk1 portable-CMS discipline applied to
  * cardinality): built from md5 like every dedup signature in this
  * engine, so ANY engine — including the DuckDB oracle — computes
  * bit-identical registers and estimates. Spark's own
  * `approx_count_distinct`/DataSketches sketches are binary-opaque and
  * engine-specific; this one is a (bucket, rho) TABLE, which also makes
  * it storable, diffable, and mergeable with plain SQL max().
  *
  * Layout: p register-index bits from the first 2 md5 hex chars
  * (m = 256 registers), a 48-bit suffix from the next 12 hex chars;
  * rho = leading-zero count of the suffix + 1 (= 49 - bitlength, the
  * v = 0 case pinned to 49). Register build is ONE aggregate keyed
  * (group, bucket) — ≤ groups × 256 rows out, CONSTANT in corpus size
  * after the vocab-bounded distinct. Merge across batches/partitions/
  * days is register-wise MAX — the exact-algebra property (merge of
  * part sketches ≡ sketch of the union, not approximately but exactly)
  * that makes incremental maintenance sound.
  *
  * Estimator: alpha_m·m²/Σ2^-M_j with the small-range linear-counting
  * correction (raw ≤ 2.5m and zeros > 0 → m·ln(m/zeros)); large-range
  * correction is unreachable in a 48-bit space. Determinism: 2^-rho
  * terms are exact dyadic doubles summed via the 12-dp/DECIMAL(25,15)
  * recipe; alpha is a shared literal; ln parity per the x8 precedent.
  */
object Hll {

  val p = 8
  val m = 256
  /** alpha_256 = 0.7213/(1 + 1.079/m) — inlined identically in generated
    * oracle SQL via [[alphaM2Sql]]. */
  val alphaM2: Double = 0.7213 / (1.0 + 1.079 / m) * m * m
  def alphaM2Sql: String = f"$alphaM2%.17g"

  // ---- DuckDB oracle twins (generated SQL replaying the exact register
  // and estimator algebra above — used by sk2 / a12b so every portable-HLL
  // query carries a strict hash gate) ----
  private val hexDigitsSql = "'0123456789abcdef'"

  /** Oracle twin of [[registers]]: (keys..., bucket, rho) over the DISTINCT
    * (keys, w) stream of `src` (a relation exposing `keys` columns and a
    * VARCHAR item column `w`). */
  def regSql(src: String, keys: String): String =
    s"""(SELECT $keys, bucket,
            max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS rho
          FROM (SELECT $keys,
              (strpos($hexDigitsSql, substr(dig, 1, 1)) - 1) * 16 + strpos($hexDigitsSql, substr(dig, 2, 1)) - 1 AS bucket,
              list_sum(list_transform(range(1, 13), i ->
                CAST(strpos($hexDigitsSql, substr(dig, CAST(i AS INT) + 2, 1)) - 1 AS BIGINT)
                  * (1::BIGINT << (4 * (12 - CAST(i AS INT)))))) AS v
            FROM (SELECT $keys, md5(w) AS dig FROM (SELECT DISTINCT $keys, w FROM $src)))
          GROUP BY $keys, bucket)"""

  /** Oracle twin of [[estimate]]: per-key `est` from a register relation
    * (the 12-dp/DECIMAL(25,15) dyadic-sum recipe, linear-counting branch
    * at raw ≤ 2.5·m with zeros > 0). */
  def estSql(regs: String, keys: String): String =
    s"""(SELECT $keys,
            CASE WHEN ($alphaM2Sql / (CAST(256 - present AS DOUBLE) + sp)) <= 640.0 AND present < 256
                 THEN 256.0 * ln(256.0 / CAST(256 - present AS DOUBLE))
                 ELSE $alphaM2Sql / (CAST(256 - present AS DOUBLE) + sp) END AS est
          FROM (SELECT $keys, count(*) AS present,
              CAST(sum(CAST(round(1.0 / (1::BIGINT << rho), 12) AS DECIMAL(25,15))) AS DOUBLE) AS sp
            FROM $regs GROUP BY $keys))"""

  /** (keys..., bucket, rho) registers over the DISTINCT (keys, item)
    * stream. Absent buckets mean register value 0 (the estimator accounts
    * for them); present registers have rho in [1, 49]. */
  def registers(df: DataFrame, keyNames: Seq[String], item: Column): DataFrame = {
    val kcols = keyNames.map(col)
    val dv = df.select(kcols :+ item.as("_w"): _*).distinct()
    val dig = md5(col("_w").cast("binary"))
    val v = conv(substring(dig, 3, 12), 16, 10).cast("long")
    dv.select(kcols ++ Seq(
        conv(substring(dig, 1, 2), 16, 10).cast("int").as("bucket"),
        when(v === 0L, 49).otherwise(lit(49) - length(bin(v))).cast("int").as("rho")): _*)
      .groupBy(kcols :+ col("bucket"): _*).agg(max(col("rho")).as("rho"))
  }

  /** Register-wise max — merging part sketches (per batch, per day, per
    * partition) into the sketch of their union, EXACTLY. */
  def merge(regs: DataFrame, keyNames: Seq[String]): DataFrame =
    regs.groupBy(keyNames.map(col) :+ col("bucket"): _*).agg(max(col("rho")).as("rho"))

  /** Per-key cardinality estimate from a register table. One aggregate
    * over ≤ keys×m rows; everything downstream is per-key arithmetic. */
  def estimate(regs: DataFrame, keyNames: Seq[String]): DataFrame = {
    val k = keyNames.map(col)
    val term = round(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), rho)"), 12)
    val agg = regs.groupBy(k: _*).agg(
      count(lit(1)).as("present"),
      sum(term.cast("decimal(25,15)")).cast("double").as("s_present"))
    val zeros = lit(m) - col("present")
    val s = zeros.cast("double") + col("s_present")
    val raw = lit(alphaM2) / s
    val est = when(raw <= 2.5 * m && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))).otherwise(raw)
    agg.select(k :+ round(est, 4).as("est_distinct"): _*)
  }
}
