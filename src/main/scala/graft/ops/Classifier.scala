package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier by full-batch
  * gradient descent — the DCLM/fastText-style "train a cheap classifier,
  * filter the corpus with it" primitive (ref scores doc quality with
  * heuristics in ingestion/validator.py; this learns the weights from
  * labels instead).
  *
  * Scale shape: the feature frame is computed once and localCheckpoint-ed
  * (d+1 doubles per row — the standard cached-training-set layout); each
  * GD iteration is ONE map-side-combined aggregate over it (a d+1-value
  * gradient row, bytes to the driver side of the plan), and the weight
  * row rides a broadcast back into the next scoring pass. Corpus scale
  * enters only as the embarrassingly-parallel scan; iterations add no
  * shuffle.
  *
  * Determinism (the cross-engine discipline, proven by experiment —
  * round 5): IEEE `exp` drifts 1 ulp between JVM and C libm on ~10% of
  * inputs, so every sigmoid output is rounded to 9 dp BEFORE entering the
  * gradient (sigmoid ∈ (0,1): 1 ulp ≈ 1e-16 vs a 1e-9 rounding boundary —
  * crossings are vanishingly rare); gradient sums go through
  * DECIMAL(25,15) (order-independent across any partitioning); weights
  * are 12-dp-rounded after each update. Learning rate 0.5 is an exact
  * binary fraction.
  */
object Classifier {

  /** 9-dp-rounded logistic sigmoid — see the class note on libm drift. */
  def sigmoid(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 9)

  /** Train `iters` full-batch GD rounds of logistic regression on
    * `features` (bias is implicit) against the 0/1 `label`. Returns one
    * row per coefficient: `(feature_idx, weight)` with idx 0 = bias and
    * idx i = features(i-1), weights at full 12-dp training precision. */
  def logregTrain(df: DataFrame, features: Seq[Column], label: Column,
                  iters: Int, lr: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val d = features.size
    val cols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") } :+
      label.cast("double").as("y")
    val data = df.select(cols: _*).localCheckpoint()
    var w = data.sparkSession.range(1)
      .select((0 to d).map(i => lit(0.0).as(s"w$i")): _*)
    for (k <- 1 to iters) {
      val scored = data.crossJoin(broadcast(w))
        .withColumn("p", sigmoid(margin(d)))
      val gAggs = (lit(0.0) +: (0 until d).map(i => col(s"f$i"))).zipWithIndex.map {
        case (_, 0) => (sum((col("p") - col("y")).cast("decimal(25,15)")).cast("double") /
          count(lit(1)).cast("double")).as("g0")
        case (f, j) => (sum(((col("p") - col("y")) * f).cast("decimal(25,15)")).cast("double") /
          count(lit(1)).cast("double")).as(s"g$j")
      }
      val grad = scored.agg(gAggs.head, gAggs.tail: _*)
      w = w.crossJoin(broadcast(grad))
        .select((0 to d).map(j => round(col(s"w$j") - lit(lr) * col(s"g$j"), 12).as(s"w$j")): _*)
      // checkpoint every 3rd round and at the end — NOT every round:
      // `w` appears twice per level (crossJoin left + inside the gradient),
      // so an uncheckpointed chain doubles per level (2^depth subplans) —
      // depth ≤ 3 keeps that ≤ 7 tiny agg stages fused into ONE job,
      // versus one scheduler round-trip per iteration (measured: the
      // iteration jobs, not the arithmetic, dominate training latency).
      // The terminal checkpoint stops downstream consumers (pivots,
      // broadcasts per head) from re-running the whole training per
      // reference. Values are checkpoint-invariant.
      if (k % 3 == 0 || k == iters) w = w.localCheckpoint()
    }
    w.select(posexplode(array((0 to d).map(j => col(s"w$j")): _*)))
      .select(col("pos").cast("int").as("feature_idx"), col("col").as("weight"))
  }

  /** The linear margin `w0 + Σ f_i·w_{i+1}`, folded left-to-right so the
    * floating-point association is fixed (the oracle mirrors it). */
  private def margin(d: Int): Column =
    (0 until d).foldLeft(col("w0"): Column)((acc, i) => acc + col(s"f$i") * col(s"w${i + 1}"))

  /** Closed-form OLS fit `y = intercept + slope·x` — in log-log space
    * this is the scaling-law / power-law fit (Kaplan et al. 2020 style)
    * a data pipeline runs to extrapolate loss-vs-tokens curves. ONE
    * map-side-combined aggregate computes the five moment sums (each
    * product 12-dp-rounded then DECIMAL(25,15)-summed —
    * order-independent), and slope/intercept/r² are pure arithmetic on
    * that single broadcast-sized row; corpus scale enters only as the
    * moment scan. Callers should pre-round transcendental inputs (ln of
    * counts) to 9 dp so libm drift never reaches the sums. Returns one
    * row: (slope, intercept, r2, n). */
  def olsFit(df: DataFrame, x: Column, y: Column): DataFrame = {
    def dsum(c: Column) = sum(round(c, 12).cast("decimal(25,15)")).cast("double")
    val m = df.select(x.cast("double").as("_x"), y.cast("double").as("_y"))
      .agg(count(lit(1)).cast("double").as("n"),
        dsum(col("_x")).as("sx"), dsum(col("_y")).as("sy"),
        dsum(col("_x") * col("_x")).as("sxx"),
        dsum(col("_y") * col("_y")).as("syy"),
        dsum(col("_x") * col("_y")).as("sxy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varx = col("n") * col("sxx") - col("sx") * col("sx")
    val vary = col("n") * col("syy") - col("sy") * col("sy")
    m.select((cov / varx).as("slope"),
        ((col("sy") - (cov / varx) * col("sx")) / col("n")).as("intercept"),
        ((cov * cov) / (varx * vary)).as("r2"),
        col("n").cast("long").as("n"))
  }

  /** Score rows with a trained weight row (same margin fold) and count
    * correct 0.5-threshold predictions — the train-set accuracy check. */
  /** Per-row inference with a trained weight frame — the "train once,
    * score the corpus" half of the lifecycle: one broadcast of the
    * (d+1)-row weight table into a map-only scan; keeps `keep` columns
    * and appends the 9-dp sigmoid score `p`. */
  def score(df: DataFrame, keep: Seq[Column], features: Seq[Column],
            weights: DataFrame): DataFrame = {
    val d = features.size
    val cols = keep ++ features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") }
    val wRow = pivotWeights(weights, d)
    df.select(cols: _*).crossJoin(broadcast(wRow))
      .withColumn("p", sigmoid(margin(d)))
      .drop((0 to d).map(j => s"w$j") ++ (0 until d).map(i => s"f$i"): _*)
  }

  /** Multi-head training in ONE aggregate per iteration — the one-vs-rest
    * batching of [[logregTrain]]: K binary problems over the SAME feature
    * frame share one localCheckpoint and one gradient pass per round (a
    * K·(d+1)-value aggregate row), instead of K separate trainings with
    * K checkpoints and K·iters jobs. The arithmetic per head is
    * IDENTICAL to [[logregTrain]] (same 9-dp sigmoid, DECIMAL(25,15)
    * sums, 12-dp weight rounds, shared count) — measured on the x29 LID
    * query this cut 5-lang×3-iter training from ~13 s to the cost of 3
    * aggregate jobs, with bit-identical weights. Returns one
    * (feature_idx, weight) frame per head name. */
  def logregTrainMulti(df: DataFrame, features: Seq[Column],
                       labels: Seq[(String, Column)], iters: Int,
                       lr: Double = 0.5): Seq[(String, DataFrame)] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(labels.nonEmpty, "need at least one labeled head")
    val d = features.size
    val cols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") } ++
      labels.map { case (n, y) => y.cast("double").as(s"y_$n") }
    val data = df.select(cols: _*).localCheckpoint()
    val names = labels.map(_._1)
    var w = data.sparkSession.range(1)
      .select(names.flatMap(n => (0 to d).map(j => lit(0.0).as(s"${n}_w$j"))): _*)
    def margin(n: String): Column =
      (0 until d).foldLeft(col(s"${n}_w0"): Column)((acc, i) => acc + col(s"f$i") * col(s"${n}_w${i + 1}"))
    for (k <- 1 to iters) {
      val scored = names.foldLeft(data.crossJoin(broadcast(w))) { (acc, n) =>
        acc.withColumn(s"p_$n", sigmoid(margin(n)))
      }
      val gAggs = names.flatMap { n =>
        (0 to d).map { j =>
          val term = if (j == 0) col(s"p_$n") - col(s"y_$n")
          else (col(s"p_$n") - col(s"y_$n")) * col(s"f${j - 1}")
          (sum(term.cast("decimal(25,15)")).cast("double") /
            count(lit(1)).cast("double")).as(s"${n}_g$j")
        }
      }
      val grad = scored.agg(gAggs.head, gAggs.tail: _*)
      w = w.crossJoin(broadcast(grad))
        .select(names.flatMap(n => (0 to d).map(j =>
          round(col(s"${n}_w$j") - lit(lr) * col(s"${n}_g$j"), 12).as(s"${n}_w$j"))): _*)
      // every-3rd + terminal checkpoint — see the logregTrain note
      if (k % 3 == 0 || k == iters) w = w.localCheckpoint()
    }
    names.map { n =>
      n -> w.select(posexplode(array((0 to d).map(j => col(s"${n}_w$j")): _*)))
        .select(col("pos").cast("int").as("feature_idx"), col("col").as("weight"))
    }
  }

  /** Multi-model inference in ONE corpus scan — the one-vs-rest /
    * multi-head case ([[Lid]]): every named weight frame is pivoted to a
    * single row (columns `<name>_w0..wd`), ALL of them ride one broadcast
    * chain into the same map-only pass, and each contributes a 9-dp
    * sigmoid `p_<name>` column. K models cost K broadcast rows + one
    * scan, never K scans or a join. */
  def scoreMulti(df: DataFrame, keep: Seq[Column], features: Seq[Column],
                 weightsByName: Seq[(String, DataFrame)],
                 trustedWeights: Boolean = false): DataFrame = {
    require(weightsByName.nonEmpty, "need at least one weight frame")
    val d = features.size
    // K frames validated in ONE job (union + combined-key distinct), not
    // one head() per frame — K scheduler round-trips were the measured
    // latency of multi-head inference. `trustedWeights` (frames straight
    // out of logregTrainMulti, shape-correct by construction) skips even
    // that job; keep the default validating for user-supplied frames.
    if (!trustedWeights) {
      val k = weightsByName.size
      val tagged = weightsByName.zipWithIndex.map { case ((_, wdf), i) =>
        wdf.select(lit(i).as("_h"), col("feature_idx"), col("weight"))
      }.reduce(_ union _)
      val counts = tagged.filter(col("feature_idx").between(0, d))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("_h") * (d + 1) + col("feature_idx")).as("nd"),
          sum(when(col("weight").isNull, 1L).otherwise(0L)).as("nulls"))
        .head()
      require(counts.getLong(0) == k.toLong * (d + 1) && counts.getLong(1) == k.toLong * (d + 1) &&
        counts.getLong(2) == 0,
        s"each weights frame must have exactly one non-null weight per feature_idx 0..$d " +
          s"(got ${counts.getLong(0)} rows, ${counts.getLong(1)} distinct, ${counts.getLong(2)} null " +
          s"across $k heads)")
    }
    val cols = keep ++ features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") }
    val withW = weightsByName.foldLeft(df.select(cols: _*)) { case (acc, (name, w)) =>
      val row = pivotWeights(w, d, validate = false)
        .select((0 to d).map(j => col(s"w$j").as(s"${name}_w$j")): _*)
      acc.crossJoin(broadcast(row))
    }
    val scored = weightsByName.foldLeft(withW) { case (acc, (name, _)) =>
      val m = (0 until d).foldLeft(col(s"${name}_w0"): Column)(
        (z, i) => z + col(s"f$i") * col(s"${name}_w${i + 1}"))
      acc.withColumn(s"p_$name", sigmoid(m))
    }
    scored.drop(weightsByName.flatMap { case (n, _) => (0 to d).map(j => s"${n}_w$j") } ++
      (0 until d).map(i => s"f$i"): _*)
  }

  /** Pivot a (feature_idx, weight) frame into one (w0..wd) row, failing
    * LOUDLY on a malformed frame: a missing index would pivot to NULL and
    * a duplicate index to an arbitrary `first`, both of which silently
    * poison every downstream sigmoid — so require exactly one weight per
    * index 0..d before broadcasting. The check is a d-bounded aggregate
    * on the (d+1)-row weight table, not a corpus-scale pass. */
  private def pivotWeights(weights: DataFrame, d: Int,
                           validate: Boolean = true): DataFrame = {
    if (validate) {
      val counts = weights.filter(col("feature_idx").between(0, d))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("feature_idx")).as("nd"),
          sum(when(col("weight").isNull, 1L).otherwise(0L)).as("nulls"))
        .head()
      require(counts.getLong(0) == d + 1 && counts.getLong(1) == d + 1 && counts.getLong(2) == 0,
        s"weights frame must have exactly one non-null weight per feature_idx 0..$d " +
          s"(got ${counts.getLong(0)} rows, ${counts.getLong(1)} distinct, ${counts.getLong(2)} null)")
    }
    weights.groupBy()
      .pivot("feature_idx", 0 to d).agg(first("weight"))
      .select((0 to d).map(j => col(s"$j").as(s"w$j")): _*)
  }

  def accuracy(df: DataFrame, features: Seq[Column], label: Column,
               weights: DataFrame): DataFrame = {
    val d = features.size
    val cols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") } :+
      label.cast("double").as("y")
    val wRow = pivotWeights(weights, d)
    df.select(cols: _*).crossJoin(broadcast(wRow))
      .withColumn("p", sigmoid(margin(d)))
      .agg(sum(when((col("p") >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L)).as("n_correct"),
        count(lit(1)).as("n_total"))
  }

  /** Exact tie-aware AUC-ROC (Mann–Whitney U): over rows with a score
    * column and a 0/1 label column, U = Σ_{pos,neg} [s⁺ > s⁻] +
    * ½[s⁺ = s⁻], carried as the INTEGER 2U so ties stay exact; one
    * double division at the end (bit-identical cross-engine). Returns
    * one row (n_pos, n_neg, u2, auc, gini).
    *
    * Overflow: 2U and n_pos·n_neg are O(N²) in the label counts, so they
    * accumulate in DECIMAL(38,0) — exact to ~10¹⁸ labeled rows per class
    * (2U ≈ 2·n_pos·n_neg caps out DECIMAL(38,0) near 7·10¹⁸ per class; a
    * LongType sum overflows silently past ~3·10⁹). The per-term
    * 2·nn_below + nn is computed IN decimal too — in LongType it would
    * overflow first, at ~4.6·10¹⁸ negatives. Past the decimal bound
    * Spark's non-ANSI decimal overflow yields NULL, not a raise — so the
    * final projection raises loudly on a null 2U over non-empty two-class
    * input instead of coalescing it to a silent 0. The emitted `u2`
    * column stays BIGINT for the catalog's no-decimal-output rule, with
    * a loud raise if the exact value ever exceeds Long range; auc/gini
    * divide the decimals (exact integers, so the doubles are identical
    * to the long path's wherever both are defined).
    *
    * Distributed shape: group to distinct scores (map-side combine),
    * then the global "negatives strictly below" running sum as a
    * TWO-PHASE bucketed scan — a per-bucket partitioned window plus a
    * broadcast triangular prefix over `nBuckets` totals — never a global
    * unpartitioned window (the single-reducer bottleneck at 100 TB, and
    * banned catalog-wide). Scores are assumed in [0, 1) for bucketing
    * (clamped at the top). */
  def aucExact(scored: DataFrame, score: Column, label: Column, nBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scored.select(score.cast("double").as("score"), label.cast("double").as("y"))
      .groupBy("score")
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("nn"))
      .withColumn("bkt", least(floor(col("score") * nBuckets), lit(nBuckets - 1).cast("double")).cast("long"))
      .localCheckpoint() // feeds bucket totals AND the ranked scan
    val btot = g.groupBy("bkt").agg(sum("nn").as("bnn"))
    val prefix = btot
      .join(btot.select(col("bkt").as("b2"), col("bnn").as("nn2")), col("b2") < col("bkt"), "left")
      .groupBy("bkt").agg(coalesce(sum("nn2"), lit(0L)).as("prefix_nn"))
    val w = Window.partitionBy("bkt").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = g.join(broadcast(prefix), Seq("bkt"))
      .withColumn("nn_below", col("prefix_nn") + coalesce(sum("nn").over(w), lit(0L)))
    val pnProduct = col("n_pos").cast("decimal(19,0)") * col("n_neg").cast("decimal(19,0)")
    // 2·nn_below + nn in DECIMAL: the LongType intermediate would be the
    // FIRST thing to overflow (~4.6·10¹⁸ negatives), before the product.
    // decimal(21,0) CANNOT overflow from Long inputs (≤ ~2.8·10¹⁹).
    val nnTerm = (col("nn_below").cast("decimal(19,0)") * 2 + col("nn").cast("decimal(19,0)"))
      .cast("decimal(21,0)")
    // the PER-ROW product can itself overflow DECIMAL(38,0) → NULL, and
    // sum() SKIPS nulls — the total would come back non-null but missing
    // terms, silently wrong. Raise inside the sum instead: np/nnTerm are
    // count-derived and never null, so a null product can only be
    // overflow.
    val rowTerm = col("np").cast("decimal(19,0)") * nnTerm
    val guardedTerm = when(rowTerm.isNull,
      raise_error(lit("aucExact: per-score 2U term overflowed DECIMAL(38,0)"))
        .cast("decimal(38,0)")).otherwise(rowTerm)
    // overflow guard shared by EVERY projection of the total: a null
    // decimal sum over non-empty two-class input can only be overflow
    val overflowGuarded =
      when(col("n_pos") > 0 && col("n_neg") > 0 && col("u2d").isNull,
        raise_error(lit("aucExact: 2U overflowed DECIMAL(38,0) (~10^18 rows per class)"))
          .cast("decimal(38,0)"))
        .otherwise(coalesce(col("u2d"), lit(0).cast("decimal(38,0)")))
    c.agg(sum(guardedTerm).as("u2d"),
        coalesce(sum("np"), lit(0L)).as("n_pos"), coalesce(sum("nn"), lit(0L)).as("n_neg"))
      .select(
        // AUC over a single class is undefined — raise instead of
        // emitting a silent NaN (the file's loud-guard convention); the
        // coalesces make EMPTY input hit this guard too (null sums would
        // otherwise null the comparison past the raise)
        when(col("n_pos") === 0 || col("n_neg") === 0,
          raise_error(lit("aucExact: need at least one positive and one negative label")))
          .otherwise(col("n_pos")).as("n_pos"),
        col("n_neg"),
        // the BIGINT projection of the exact decimal must fail loudly
        // rather than wrap (auc/gini below stay defined past Long range —
        // they divide the decimal)
        when(overflowGuarded > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(lit("aucExact: 2U exceeds BIGINT range — read the decimal internally"))
            .cast("decimal(38,0)"))
          .otherwise(overflowGuarded).cast("long").as("u2"),
        // auc/gini divide the SAME guarded decimal: a consumer selecting
        // only auc must hit the overflow raise too, not a silent null
        (overflowGuarded.cast("double") / (pnProduct * 2).cast("double")).as("auc"),
        (overflowGuarded.cast("double") / pnProduct.cast("double") - 1.0).as("gini"))
  }
}
