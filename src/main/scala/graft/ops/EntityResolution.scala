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
  * Distance semantics: all verify/scoring distances use
  * [[graft.functions.LevenshteinBytes]] — UTF-8 BYTE-level edit distance,
  * pinned to DuckDB's `levenshtein` exactly (like `functions.JaroWinkler`)
  * — so the family works on any input, not just ASCII. Byte-wise, one
  * edited CHARACTER costs its encoded byte length (a Thai substitution =
  * up to 3 byte edits); thresholds on non-ASCII vocabularies must be set
  * in bytes (er7_unicode_linkage gates exactly this on Thai names).
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

  /** 8×8 Thai name pools for the non-ASCII linkage gate (er7) — the
    * reference's own home domain is a Thai corpus. Every Thai character
    * is 3 UTF-8 bytes, so char-unit and byte-unit distances diverge on
    * EVERY edit here: a char deletion costs 3 byte edits, a same-block
    * substitution costs 1-2 (Thai codepoints share the 0xE0 0xB8/0xB9
    * lead bytes). One constant pool feeds both engines. */
  val thaiFirsts: Seq[String] = Seq(
    "สมชาย", "สมหญิง", "อนันต์", "กัลยา", "ประวิทย์", "มาลี", "วิชัย", "สุนทร")
  val thaiLasts: Seq[String] = Seq(
    "ใจดี", "ทองดี", "ศรีสุข", "บุญมา", "แก้วใส", "พูนสุข", "รักไทย", "สายทอง")

  /** U+0E2E HO NOKHUK — absent from both pools, so the planted
    * substitution never degenerates to identity; also the unlinkable
    * class's prefix breaker (no master starts with it). */
  private val thaiSub = "ฮ"

  /** Thai dirty-record generator, Spark side: class = doc_id % 4 —
    * 0 clean, 1 single-char deletion at char position p, 2 substitution
    * with [[thaiSub]] at p, 3 unlinkable (prefix-broken by a double
    * [[thaiSub]] — NOT reverse(): DuckDB reverses grapheme clusters while
    * Spark reverses code points, which diverges on Thai combining vowels).
    * p = 3 + (doc_id div 64) % (len-3) ∈ [3, len-1], so 2-char-prefix
    * blocking stays lossless for classes 0-2 by construction. All string
    * surgery is CHAR-based substr (identical semantics in both engines);
    * only the DISTANCE is byte-based. */
  def thaiRecords(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val d = col(idCol)
    val fullname = concat(
      element_at(array(thaiFirsts.map(lit): _*), (pmod(d, lit(8)) + 1).cast("int")),
      lit(" "),
      element_at(array(thaiLasts.map(lit): _*),
        (pmod(expr(s"$idCol div 8"), lit(8)) + 1).cast("int")))
    docs.select(d.as("doc_id"), fullname.as("fullname"))
      .withColumn("p", (lit(3) + pmod(expr("doc_id div 64"), length(col("fullname")) - 3)).cast("int"))
      .withColumn("rec", {
        val f = col("fullname"); val p = col("p")
        val del = concat(f.substr(lit(1), p - 1), f.substr(p + 1, lit(64)))
        val sub = concat(f.substr(lit(1), p - 1), lit(thaiSub), f.substr(p + 1, lit(64)))
        when(pmod(col("doc_id"), lit(4)) === 0, f)
          .when(pmod(col("doc_id"), lit(4)) === 1, del)
          .when(pmod(col("doc_id"), lit(4)) === 2, sub)
          .otherwise(concat(lit(thaiSub), lit(thaiSub), f))
      })
      .select(col("doc_id"), col("fullname"), col("rec"))
  }

  /** The SAME Thai generator as DuckDB CTE text: `trecs(doc_id, fullname, rec)`. */
  val thaiRecordsSql: String =
    s"""trecs AS (
         SELECT doc_id, fullname,
           CASE doc_id % 4
             WHEN 0 THEN fullname
             WHEN 1 THEN substr(fullname, 1, p - 1) || substr(fullname, p + 1, 64)
             WHEN 2 THEN substr(fullname, 1, p - 1) || '$thaiSub' || substr(fullname, p + 1, 64)
             ELSE '$thaiSub$thaiSub' || fullname
           END AS rec
         FROM (
           SELECT doc_id, fullname,
             CAST(3 + (doc_id // 64) % (length(fullname) - 3) AS INT) AS p
           FROM (
             SELECT doc_id,
               ${sqlArray(thaiFirsts)}[1 + doc_id % 8] || ' ' ||
               ${sqlArray(thaiLasts)}[1 + (doc_id // 8) % 8] AS fullname
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
    graft.functions.GraftFunctions.register(vocab.sparkSession)
    a.join(b, "variant")
      .filter(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b").distinct()
      // byte-level verify (DuckDB parity): byte-distance ≥ char-distance
      // for any pair, so the char-wise deletion blocking above is still a
      // lossless superset of byte-distance ≤ k — the verify only narrows
      .withColumn("dist", levBytes(col("tok_a"), col("tok_b")))
      .filter(col("dist") <= maxEdit)
  }

  /** Column wrapper for [[graft.functions.LevenshteinBytes]] — the ONE
    * distance every er verify/scoring step uses (caller must have a
    * registered session; [[symspellPairs]] and the er queries do). */
  def levBytes(a: Column, b: Column): Column =
    call_function("levenshtein_bytes", a, b)
}
