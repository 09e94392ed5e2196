package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-ranking operators for RLHF / evaluation data pipelines.
  *
  * Bradley–Terry strength estimation is how pairwise human (or LLM-judge)
  * preferences become a scalar leaderboard — the Chatbot-Arena-style
  * rating computation, run here as the minorization–maximization update of
  * Hunter (2004, "MM algorithms for generalized Bradley-Terry models"):
  *
  *   p_i ← (W_i + prior) / Σ_{j≠i} n_ij / (p_i + p_j),   then normalize.
  *
  * Scale shape (the d9/pr1 iterative contract): ONE shuffle builds the
  * per-pair match counts from the raw match log; every MM iteration then
  * touches only the k-item frames (k = number of rated models/sources —
  * dozens, not documents), joined broadcast. No data row ever reaches the
  * driver. Determinism: each division term is 12-dp-rounded then
  * DECIMAL(25,15)-summed, so reduction order never changes the result
  * (the ml1/dom4 discipline); the `prior` (a half-win Laplace smoothing)
  * keeps winless items at a finite positive strength.
  */
object Preference {

  /** `matches`: one row per decided match, columns `winner` / `loser`
    * (item ids). Returns one row per item: (item, wins, n_matches,
    * strength) with strength the normalized 3-iteration (default) MM
    * estimate, 6-dp. */
  def bradleyTerry(matches: DataFrame, iters: Int = 3, prior: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // materialize the match log ONCE — md, wins, and the per-iteration
    // joins all hang off it, and without the barrier each action would
    // replay the upstream pairing scan (measured 10 s → ~3 s on the
    // pref2 gate)
    val m = matches.localCheckpoint()
    // the one real shuffle: match log → directed per-pair counts + wins
    val md = m.select(col("winner").as("src"), col("loser").as("opp"))
      .unionByName(m.select(col("loser").as("src"), col("winner").as("opp")))
      .groupBy("src", "opp").agg(count(lit(1)).as("n"))
      .localCheckpoint() // k²-bounded; cut lineage before iterating
    val wins = m.groupBy(col("winner").as("src")).agg(count(lit(1)).as("wins"))
      .localCheckpoint()
    val items = md.select("src").distinct()
    val kf = items.agg(count(lit(1)).cast("double").as("k"))
    var p = items.crossJoin(broadcast(kf))
      .select(col("src"), round(lit(1.0).cast("double") / col("k"), 12).as("p"))
    for (_ <- 1 to iters) {
      val joined = md
        .join(broadcast(p.select(col("src").as("_s"), col("p").as("pa"))), col("src") === col("_s")).drop("_s")
        .join(broadcast(p.select(col("src").as("_o"), col("p").as("pb"))), col("opp") === col("_o")).drop("_o")
      val den = joined.groupBy("src")
        .agg(sum(round(col("n").cast("double") / (col("pa") + col("pb")), 12)
          .cast("decimal(25,15)")).cast("double").as("den"))
      val praw = den.join(wins, Seq("src"), "left")
        .select(col("src"),
          round((coalesce(col("wins"), lit(0L)).cast("double") + lit(prior)) / col("den"), 12).as("praw"))
      val s = praw.agg(sum(col("praw").cast("decimal(25,15)")).cast("double").as("s"))
      p = praw.crossJoin(broadcast(s))
        .select(col("src"), round(col("praw") / col("s"), 12).as("p"))
    }
    val nm = md.groupBy("src").agg(sum("n").as("n_matches"))
    p.join(nm, Seq("src")).join(wins, Seq("src"), "left")
      .select(col("src").as("item"),
        coalesce(col("wins"), lit(0L)).cast("long").as("wins"),
        col("n_matches").cast("long").as("n_matches"),
        round(col("p"), 6).as("strength"))
  }
}
