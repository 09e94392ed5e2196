package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / fuzzy record matching (SURVEY.md §2 extension —
  * the record-linkage stage a crawl→training corpus pipeline needs to
  * merge author/site/license records across sources; ref
  * `ingestion/deduplicator.py` stops at document near-dup, this family
  * adds the field-level variant).
  *
  * Three composable stages, each with the 100 TB shape:
  *
  *  1. `symspellPairs` — all token pairs within Levenshtein distance k
  *     via SymSpell deletion-neighborhood blocking: every token emits its
  *     ≤k-char-deletion variants (≤ 1 + L + L² rows for k=2, L = token
  *     length, BEFORE distinct), candidates co-group on a shared variant,
  *     and a native `levenshtein` filter verifies. Lossless: lev(a,b) ≤ k
  *     implies a and b share a common ≤k-deletion string (take the
  *     alignment; delete the substituted/inserted chars on each side), so
  *     blocking never loses a true pair — the verify step only removes
  *     false candidates. The join is a hash join on the variant string;
  *     no cross product anywhere. Skew note: a degenerate vocabulary
  *     (millions of 1-char-apart ids) concentrates on shared variants —
  *     the standard df-cap applies (drop variants with document frequency
  *     above a cap, documented recall trade, same lever as d13/d17).
  *  2. blocked Jaro-Winkler scoring — candidates from a cheap blocking
  *     key (here: 2-char prefix), scored with the DuckDB-bit-exact
  *     `jaro_winkler_sim` codegen expression, best match per record by
  *     (score desc, master asc) window rank. Blocking is the documented
  *     recall trade of record linkage (d16/d19 audit machinery applies).
  *  3. `Dedup.connectedComponents` over match pairs — transitive closure
  *     into entity clusters (min-label propagation, rounds = diameter).
  *
  * The name-record fixture is generated from doc_id arithmetic by
  * `records` / `recordsSql` (ONE constant pool feeding both engines, so
  * the planted perturbations cannot drift between Spark and the oracle).
  *
  * Cross-engine unit caveat (matters beyond ASCII): Spark's native
  * `levenshtein` counts UTF-16 CHARS while DuckDB's counts UTF-8 BYTES
  * ('é' is one char but two bytes). The er gates use ASCII-only
  * fixtures where the two agree; a non-ASCII vocabulary needs a
  * byte-level distance expression on the Spark side (the
  * `functions.JaroWinkler` expressions already operate byte-wise to
  * match DuckDB exactly).
  */
object EntityResolution {

  /** 16×16 name pools — one source of truth for Spark AND the DuckDB
    * oracle. Perturbations are planted at 1-based positions ≥ 3, so
    * 2-char-prefix blocking is lossless BY CONSTRUCTION for er2 (the
    * general recall trade is documented above). */
  val firsts: Seq[String] = Seq(
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica")
  val lasts: Seq[String] = Seq(
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas")

  private def sqlArray(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Dirty-record generator, Spark side: (doc_id, rec) where rec is the
    * canonical "first last" name for class 0, a planted single-char
    * deletion / adjacent swap / substitution for classes 1-3, and a
    * reversed (unlinkable) string for class 4. Class = doc_id % 5; the
    * perturbed position p = 3 + (doc_id div 64) % (len-3) ∈ [3, len-1]. */
  def records(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val d = col(idCol)
    val fullname = concat(
      element_at(array(firsts.map(lit): _*), (pmod(d, lit(16)) + 1).cast("int")),
      lit(" "),
      element_at(array(lasts.map(lit): _*),
        (pmod(expr(s"$idCol div 16"), lit(16)) + 1).cast("int")))
    docs.select(d.as("doc_id"), fullname.as("fullname"))
      .withColumn("p", (lit(3) + pmod(expr("doc_id div 64"), length(col("fullname")) - 3)).cast("int"))
      .withColumn("rec", {
        val f = col("fullname"); val p = col("p")
        val del = concat(f.substr(lit(1), p - 1), f.substr(p + 1, lit(64)))
        val swap = concat(f.substr(lit(1), p - 1), f.substr(p + 1, lit(1)),
          f.substr(p, lit(1)), f.substr(p + 2, lit(64)))
        val sub = concat(f.substr(lit(1), p - 1), lit("x"), f.substr(p + 1, lit(64)))
        when(pmod(col("doc_id"), lit(5)) === 0, f)
          .when(pmod(col("doc_id"), lit(5)) === 1, del)
          .when(pmod(col("doc_id"), lit(5)) === 2, swap)
          .when(pmod(col("doc_id"), lit(5)) === 3, sub)
          .otherwise(reverse(f))
      })
      .select(col("doc_id"), col("fullname"), col("rec"))
  }

  /** The SAME generator as DuckDB CTE text: yields `recs(doc_id, fullname, rec)`. */
  val recordsSql: String =
    s"""recs AS (
         SELECT doc_id, fullname,
           CASE doc_id % 5
             WHEN 0 THEN fullname
             WHEN 1 THEN substr(fullname, 1, p - 1) || substr(fullname, p + 1, 64)
             WHEN 2 THEN substr(fullname, 1, p - 1) || substr(fullname, p + 1, 1)
                         || substr(fullname, p, 1) || substr(fullname, p + 2, 64)
             WHEN 3 THEN substr(fullname, 1, p - 1) || 'x' || substr(fullname, p + 1, 64)
             ELSE reverse(fullname)
           END AS rec
         FROM (
           SELECT doc_id, fullname,
             CAST(3 + (doc_id // 64) % (length(fullname) - 3) AS INT) AS p
           FROM (
             SELECT doc_id,
               ${sqlArray(firsts)}[1 + doc_id % 16] || ' ' ||
               ${sqlArray(lasts)}[1 + (doc_id // 16) % 16] AS fullname
             FROM documents)))"""

  /** All distinct-token pairs within Levenshtein distance `maxEdit` via
    * deletion-neighborhood blocking. `vocab` must have one string column
    * `tok` (distinct). Returns (tok_a, tok_b, dist) with tok_a < tok_b.
    *
    * The variant generator runs as native HOFs (sequence/transform/
    * flatten) — each intermediate bound to a column so the lambda
    * references attributes, not re-inlined subtrees. */
  /** `maxVariantDf`: drop blocking variants shared by more than this
    * many tokens before the self-join — the d13/d17 skew lever. A
    * degenerate vocabulary (say 10⁶ ids one char apart around a hub
    * variant) otherwise concentrates O(df²) candidate pairs on one
    * variant key. Capped variants lose the pairs that ONLY meet there
    * (documented recall trade; Round9SparkSpec measures it); the default
    * Int.MaxValue keeps the join exact. */
  def symspellPairs(vocab: DataFrame, maxEdit: Int = 2,
                    maxVariantDf: Int = Int.MaxValue): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2, "deletion neighborhood supports k=1,2")
    val d1 = expr(
      "transform(sequence(1, length(tok)), i -> concat(substring(tok, 1, i-1), substring(tok, i+1, 64)))")
    val base = vocab.select(col("tok")).distinct()
      .withColumn("d1", d1)
    val withVars =
      if (maxEdit == 1)
        base.withColumn("vars", array_distinct(concat(array(col("tok")), col("d1"))))
      else
        base.withColumn("d2", expr(
          "flatten(transform(d1, t -> transform(sequence(1, length(t)), j -> concat(substring(t, 1, j-1), substring(t, j+1, 64)))))"))
          .withColumn("vars", array_distinct(concat(array(col("tok")), col("d1"), col("d2"))))
    val raw = withVars.select(col("tok"), explode(col("vars")).as("variant"))
    val exploded =
      if (maxVariantDf == Int.MaxValue) raw
      else {
        // one aggregate on the variant key, then a semi filter — the df
        // histogram is variant-sized, and hot keys never reach the join
        val ok = raw.groupBy("variant").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxVariantDf).select("variant")
        raw.join(ok, "variant")
      }
    val a = exploded.select(col("tok").as("tok_a"), col("variant"))
    val b = exploded.select(col("tok").as("tok_b"), col("variant"))
    a.join(b, "variant")
      .filter(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b").distinct()
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")).cast("long"))
      .filter(col("dist") <= maxEdit)
  }
}
