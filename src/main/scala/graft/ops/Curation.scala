package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composed pipeline a 100 TB
  * pre-training run actually executes, as one DataFrame→DataFrame call
  * (prompt families: dedup + text analysis + PII, composed; generalizes the
  * reference's ingest lifecycle — clean/filter/dedup — from documents to a
  * corpus, cf. reference ingestion/text_processor.py + SURVEY.md §3.1).
  *
  * Stage order and its scale rationale (stages are ordered so the expensive
  * shuffling steps see the fewest rows):
  *   1. quality filter   — map-only expression, runs at scan bandwidth,
  *                         drops low-value docs before anything shuffles;
  *   2. PII redaction    — map-only regexp chain on the survivors;
  *   3. exact dedup      — one hash shuffle on md5(normalized text);
  *   4. near-dup cluster — MinHash+LSH band join (O(N·bands) short rows)
  *                         + connected components over the pair list (pair
  *                         graphs are tiny relative to the corpus), keep
  *                         the min-id doc per duplicate cluster;
  *   5. decontamination  — broadcast semi-join against the eval suite's
  *                         n-gram set (eval sets are MBs; the corpus side
  *                         never shuffles), drop any doc sharing a gram;
  *   6. stratified sample— seedless md5-threshold mixing by stratum,
  *                         map-only, reproducible across reruns/engines.
  *
  * Every stage is engine-portable (md5 + regex + relational ops only), so
  * the whole pipeline has a line-by-line DuckDB oracle
  * (`queries/MiscQueries.c1CurationPipeline`).
  */
object Curation {

  /** @param minQuality    keep docs with qualityScore ≥ this
    * @param stopwords     quality-score stopword profile
    * @param shingleWidth  word-shingle width for MinHash
    * @param numHashes     MinHash signature length
    * @param rowsPerBand   LSH band height (numHashes / rowsPerBand bands)
    * @param jaccard       verified-Jaccard near-dup threshold
    * @param decontamN     word-n-gram width for eval-overlap removal
    * @param rates         per-stratum keep rates (mixing weights)
    * @param defaultRate   keep rate for unlisted strata */
  final case class CurationConfig(
    minQuality: Double = 0.5,
    stopwords: Seq[String] = Seq("the", "a", "of", "and"),
    shingleWidth: Int = 3,
    numHashes: Int = 6,
    rowsPerBand: Int = 2,
    jaccard: Double = 0.8,
    decontamN: Int = 4,
    rates: Seq[(String, Double)] = Seq("en" -> 0.5, "zh" -> 0.25),
    defaultRate: Double = 0.1)

  /** Returns the curated corpus: (id, stratum, quality, text) with `text`
    * redacted; survivors of all six stages, one row per kept document. */
  def curate(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
             evalSet: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    // 1+2: quality gate then redaction, one fused map stage over the scan
    val scored = docs.select(
      col(idCol).as("id"), col(stratumCol).as("stratum"),
      TextAnalysis.qualityScore(col(textCol), cfg.stopwords).as("quality"),
      Pii.redact(col(textCol)).as("text"))
      .filter(col("quality") >= cfg.minQuality)
    // 3: exact dedup — first-wins (min id) per normalized-content hash.
    // No explicit persist: the chain up to the dedup window is an identical
    // exchange subtree for all three downstream consumers, so ReuseExchange
    // computes it once and the consumers re-read the shuffle files (tested
    // faster than MEMORY_AND_DISK persist, which only added a
    // materialization barrier). At cluster scale this cut point is where a
    // real pipeline would write the deduped corpus to storage instead.
    val exact = Dedup.exact(scored, col("text"), col("id"))
    // 4: near-dup clustering; drop every doc whose cluster has a smaller id
    val pairs = Dedup.minHashDuplicates(exact, "id", col("text"),
      cfg.shingleWidth, cfg.numHashes, cfg.rowsPerBand, cfg.jaccard)
    // loser/contaminated sets are usually small but CAN be corpus-scale on
    // duplicate-heavy crawls — no broadcast hint; AQE picks the strategy
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("cluster_id") < col("id")).select("id")
    val deduped = exact.join(losers, Seq("id"), "left_anti")
    // 5: benchmark decontamination — any shared eval n-gram disqualifies
    val evalNorm = evalSet.select(col(idCol).as("id"), col(textCol).as("text"))
    val contaminated = Dedup.decontaminate(deduped, evalNorm, "id", "text", cfg.decontamN)
      .select("id")
    val clean = deduped.join(contaminated, Seq("id"), "left_anti")
    // 6: deterministic mixing by stratum
    TextAnalysis.sampleByStrata(clean, col("id"), col("stratum"), cfg.rates, cfg.defaultRate)
      .select("id", "stratum", "quality", "text")
  }

  /** Per-domain curation report — the decision table a crawl-mixing pass
    * reads: volume, length profile, and the share of docs inside the keep
    * band, plus the domain-level verdict. One hash aggregate over the
    * corpus (map-side combine; domain cardinality is tiny next to doc
    * count), so it runs at scan bandwidth at any scale. Averages are
    * exact-integer sums divided once as doubles (the oracle-parity rule). */
  def domainStats(docs: DataFrame, domainCol: Column, charsCol: Column,
                  keepLo: Long = 200L, keepHi: Long = 5000L,
                  keepThreshold: Double = 0.6): DataFrame = {
    val inBand = sum(when(charsCol.between(keepLo, keepHi), 1L).otherwise(0L))
    docs.groupBy(domainCol.as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(charsCol).cast("long").as("total_chars"),
        (sum(charsCol).cast("double") / count(lit(1))).as("mean_chars"),
        (inBand.cast("double") / count(lit(1))).as("keep_rate"))
      .withColumn("domain_kept", (col("keep_rate") >= keepThreshold).cast("long"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each RAW
    * document by the log-likelihood ratio of a TARGET-domain unigram LM
    * against a raw-domain unigram LM (mean over tokens, add-one
    * smoothing), then select k documents by Gumbel-top-k — which samples
    * proportionally to the importance weights WITHOUT replacement, using
    * seedless md5-derived uniforms so the "randomness" is deterministic,
    * engine-portable, and rerun-stable (the hashSamplePredicate rule).
    *
    * Scale shape: both LMs are one vocab-bounded aggregate each
    * (broadcastable at any corpus size); scoring is the x8 join shape
    * (token→count equi-join + per-doc aggregate with DECIMAL-summed ln
    * terms for reduction-order independence); selection is
    * TakeOrderedAndProject on the 6-dp-rounded Gumbel score. */
  def importanceResample(raw: DataFrame, target: DataFrame, idCol: Column, text: Column,
                         k: Int): DataFrame = {
    def toks(df: DataFrame) = df.select(idCol.as("id"), explode(TextAnalysis.tokens(text)).as("w"))
    val tt = toks(target)
    val rr = toks(raw)
    val ct = tt.groupBy("w").agg(count(lit(1)).as("ct"))
    val cr = rr.groupBy("w").agg(count(lit(1)).as("cr"))
    val tot = ct.agg(sum("ct").cast("double").as("nt"), count(lit(1)).cast("double").as("vt"))
      .crossJoin(cr.agg(sum("cr").cast("double").as("nr"), count(lit(1)).cast("double").as("vr")))
    val sc = rr.join(cr, "w").join(ct, Seq("w"), "left")
      .groupBy("id")
      .agg(sum(log(coalesce(col("ct"), lit(0L)) + 1).cast("decimal(25,15)")).cast("double").as("st"),
        sum(log(col("cr") + 1).cast("decimal(25,15)")).cast("double").as("sr"),
        count(lit(1)).as("n"))
    val u = (conv(substring(md5(col("id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    sc.crossJoin(broadcast(tot))
      .withColumn("logweight",
        (col("st") - col("sr")) / col("n") - log(col("nt") + col("vt")) + log(col("nr") + col("vr")))
      .withColumn("sel_score", round(col("logweight") - log(-log(u)), 6))
      .select(col("id"), round(col("logweight"), 6).as("logweight"), col("sel_score"))
      .orderBy(col("sel_score").desc, col("id"))
      .limit(k)
  }

  /** Temperature-scaled domain mixture weights (the α-sampling rule of
    * multilingual/multi-domain pre-training, cf. the mixing in XLM-R /
    * Gopher): each domain's sampling weight ∝ (token share)^α, normalized;
    * α = 0.5 flattens the natural distribution so small domains are
    * up-sampled. `epochs` is the implied pass count over each domain when
    * the sampled corpus is held at the original total token budget —
    * weight·total/tokens (>1 = up-sampled, <1 = down-sampled).
    *
    * Scale shape: one map-side-combined hash aggregate over the corpus
    * (domain cardinality is bounded), then domain-table-only arithmetic —
    * the corpus is scanned exactly once. Cross-engine exactness: α = 0.5
    * runs as IEEE-exact `sqrt`, and the normalizer Σ√share is summed in
    * DECIMAL(25,15) so the reduction order of a parallel double-sum can't
    * leak into the weights (the x8 rule). */
  def mixtureWeights(docs: DataFrame, domainCol: Column, text: Column): DataFrame = {
    val per = docs.groupBy(domainCol.as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(text).cast("long")).as("tokens"))
    val total = per.agg(sum(col("tokens")).cast("double").as("total_tokens"))
    val shared = per.crossJoin(broadcast(total))
      .withColumn("s", sqrt(col("tokens").cast("double") / col("total_tokens")))
    val norm = shared.agg(sum(col("s").cast("decimal(25,15)")).cast("double").as("sum_s"))
    // greatest(tokens, 1): an all-empty-text domain has tokens = 0 and
    // would otherwise 0/0 the epochs column (its share s is already 0, so
    // the guarded result is a clean 0.0). A fully empty CORPUS remains a
    // documented precondition (sum_s = 0 nulls every weight).
    shared.crossJoin(broadcast(norm))
      .select(col("domain"), col("n_docs"), col("tokens"),
        round(col("s") / col("sum_s"), 6).as("weight"),
        round(col("s") / col("sum_s") * col("total_tokens")
            / greatest(col("tokens"), lit(1L)).cast("double"), 6)
          .as("epochs"))
  }

  /** Capped water-filling token-budget allocation — the DoReMi/LLaMA-style
    * planning step BETWEEN mixture weights and the sampler: given a total
    * token budget (`budgetFactor` × corpus tokens) and a repeat ceiling
    * (`maxEpochs` per domain — data repeated beyond a few epochs stops
    * helping), allocate target tokens per domain from the temperature
    * weights, cap each domain at maxEpochs × its tokens, and REDISTRIBUTE
    * the capped overflow proportionally among still-open domains —
    * `rounds` fixed-point iterations (k domains converge in ≤ k rounds;
    * residual overflow after the last round stays unallocated rather than
    * violating a cap).
    *
    * Scale shape: ONE corpus aggregate (per-domain token counts); every
    * iteration runs on the k-row domain frame with two broadcast scalars
    * — corpus size never re-enters. Determinism: the ml1 recipe (12-dp
    * intermediate rounds, DECIMAL(25,15) frame sums, binary-exact factor
    * constants); sqrt is IEEE-exact. Output: (domain, tokens, weight,
    * target_tokens, epochs, capped). */
  def budgetAllocation(docs: DataFrame, domainCol: Column, text: Column,
                       budgetFactor: Double, maxEpochs: Double, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && budgetFactor > 0 && maxEpochs > 0,
      s"need rounds >= 1 and positive factors, got rounds=$rounds " +
        s"budgetFactor=$budgetFactor maxEpochs=$maxEpochs")
    val per = docs.groupBy(domainCol.as("domain"))
      .agg(sum(TextAnalysis.tokenCount(text).cast("long")).as("tokens"))
    val total = per.agg(sum(col("tokens")).cast("double").as("total_tokens"))
    val shared = per.crossJoin(broadcast(total))
      .withColumn("s", sqrt(col("tokens").cast("double") / col("total_tokens")))
    val norm = shared.agg(sum(col("s").cast("decimal(25,15)")).cast("double").as("sum_s"))
    var frame = shared.crossJoin(broadcast(norm))
      .withColumn("w", round(col("s") / col("sum_s"), 12))
      .withColumn("budget", col("total_tokens") * budgetFactor)
      .withColumn("cap", col("tokens").cast("double") * maxEpochs)
      .withColumn("t", round(col("budget") * col("w"), 12))
      .select("domain", "tokens", "w", "budget", "cap", "t")
    for (_ <- 1 to rounds) {
      val capped = frame.withColumn("c", least(col("t"), col("cap")))
      val stats = capped.agg(
        (max(col("budget")) - sum(col("c").cast("decimal(25,15)")).cast("double")).as("leftover"),
        sum(when(col("c") < col("cap"), col("w").cast("decimal(25,15)")))
          .cast("double").as("open_w"))
      frame = capped.crossJoin(broadcast(stats))
        .withColumn("t",
          when(col("c") >= col("cap"), col("cap"))
            .when(col("open_w").isNull || col("open_w") <= 0.0, col("c"))
            .otherwise(round(col("c") +
              greatest(col("leftover"), lit(0.0)) * col("w") / col("open_w"), 12)))
        .select("domain", "tokens", "w", "budget", "cap", "t")
    }
    // final clamp: the last round's refill may overshoot an open domain's
    // cap with no re-cap pass behind it — the cap contract wins and the
    // residual stays unallocated (documented above)
    frame.select(col("domain"), col("tokens"),
      round(col("w"), 6).as("weight"),
      round(least(col("t"), col("cap")), 6).as("target_tokens"),
      round(least(col("t"), col("cap"))
        / greatest(col("tokens"), lit(1L)).cast("double"), 6).as("epochs"),
      (col("t") >= col("cap")).as("capped"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934 — the
    * survey-sampling optimum dom2's temperature mixing doesn't give):
    * stratum h receives n·(N_h·σ_h)/Σ(N_h·σ_h) of the budget, so
    * high-variance strata are oversampled exactly where a uniform or
    * proportional draw wastes budget — the right allocator for building
    * eval sets from heterogeneous corpora. Integer seats are assigned by
    * floor + LARGEST REMAINDER (Hamilton), ties → stratum name asc, so
    * Σ alloc == budget exactly — PROVIDED no stratum saturates: seats
    * cap at the stratum's row count (it cannot supply more), and a
    * saturated stratum leaves the total short by its shortfall.
    *
    * Determinism/scale contract: per-stratum moments are EXACT integer
    * sums (value must be an integer column — lengths, token counts);
    * σ_h derives from them with one expression tree; the Neyman weights
    * are 12-dp-rounded and DECIMAL-summed (order-free); remainder
    * ranking is a count-join on the k-row strata frame (never a global
    * window); the draw itself is the seedless md5 order per stratum
    * (partitioned row_number). One corpus aggregate + one k-row frame +
    * one partitioned rank — scales as a groupBy at any size. */
  def neymanSample(docs: DataFrame, stratumCol: Column, intValue: Column,
                   idCol: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val base = docs.select(stratumCol.as("stratum"), intValue.cast("long").as("v"),
      idCol.as("id"))
    val mom = base.groupBy("stratum").agg(
      count(lit(1)).as("n_h"), sum(col("v")).as("s1"), sum(col("v") * col("v")).as("s2"))
    val nD = col("n_h").cast("double")
    // trailing operator, NEVER leading: a statement-level `x / y\n- z`
    // parses as two statements under semicolon inference (the - z line is
    // a discarded unary expression) and silently drops the mean term
    val variance = (col("s2").cast("double") / nD) -
      (col("s1").cast("double") / nD) * (col("s1").cast("double") / nD)
    // 6 dp, NOT 12: weights sit in the thousands, and rounding the 12th
    // decimal of a ~1e3 double asks for the 16th significant digit -
    // past IEEE precision, where the two engines legitimately disagree
    val strata = mom.withColumn("w",
      round(nD * sqrt(greatest(variance, lit(0.0))), 6))
    val tot = strata.agg(sum(col("w").cast("decimal(25,12)")).cast("double").as("tw"))
    val share = strata.crossJoin(broadcast(tot))
      // all-zero-variance corpus → shares 0; the remainder pass then hands
      // at most one seat per stratum by the deterministic tie-break
      .withColumn("share", when(col("tw") > 0, lit(budget) * col("w") / col("tw"))
        .otherwise(lit(0.0)))
      .withColumn("fl", floor(col("share")).cast("long"))
      .withColumn("rem", round(col("share") - col("fl"), 12))
      .localCheckpoint() // tiny k-row frame, feeds both rank sides
    // largest-remainder rank via a count-join on the k-row frame (never a
    // global window): seats left after flooring go to the largest rems.
    // The probe side is REBUILT with renamed columns — a .as("x")/.as("y")
    // self-join over a checkpointed frame resolves both sides to the same
    // attributes and silently scrambles the rank (found the hard way).
    val ys = share.select(col("stratum").as("y_stratum"), col("rem").as("y_rem"))
    val r = share.join(ys,
        col("y_rem") > col("rem") ||
          (col("y_rem") === col("rem") && col("y_stratum") < col("stratum")), "left")
      .groupBy(col("stratum"), col("n_h"), col("fl"), col("rem"))
      .agg(count(col("y_stratum")).as("nbigger"))
    val leftOver = share.agg((lit(budget) - sum("fl")).as("k"))
    // cap at the stratum's population: a stratum cannot supply more rows
    // than it has; a saturated stratum leaves Sigma alloc short of the
    // budget by its shortfall (documented) rather than over-reporting an
    // alloc the draw cannot fill
    val alloc = r.crossJoin(broadcast(leftOver))
      .select(col("stratum"),
        least(col("fl") + when(col("nbigger") < col("k"), 1L).otherwise(0L), col("n_h"))
          .as("alloc"))
    // the draw: per stratum, the alloc smallest md5(id) — seedless,
    // rerun-stable, cluster-layout-free (the x10/x17 discipline)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("stratum")
      .orderBy(md5(col("id").cast("string")), col("id"))
    base.join(alloc, "stratum")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("alloc"))
      .select(col("stratum"), col("alloc"), col("id"))
  }
}
