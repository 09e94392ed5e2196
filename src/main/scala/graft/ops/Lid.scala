package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Char-ngram language identification — the fastText-LID shape (hashed
  * character-ngram features into a linear classifier) built from parts the
  * engine already trusts: [[Classifier.logregTrain]]'s deterministic GD is
  * the trainer, one-vs-rest composes it to K languages, and inference is a
  * single map-only corpus scan with all K weight rows broadcast (ref
  * classifies documents by keyword rules at
  * ingestion/document_classifier.py:87-183; this learns from labels
  * instead, the multilingual-pipeline LID operator).
  *
  * Feature shape: the doc's first `prefixChars` characters (LID saturates
  * on a short prefix; bounding it makes per-doc cost O(prefix), not
  * O(doc)) are lowercased, every adjacent char pair is hashed
  * `(c1*31 + c2) mod buckets`, and the features are the per-bucket
  * frequencies — a hashed bag-of-bigrams, normalized so doc length
  * cancels. The hash is plain codepoint arithmetic (not murmur) so any
  * engine can replay it exactly; frequencies are exact int/int doubles.
  *
  * Scale shape: training = K·iters map-side-combined gradient aggregates
  * over ONE localCheckpoint-ed feature frame (computed once, shared by
  * all K binary problems — the frame is (B+1) doubles per row); inference
  * = one scan with K broadcast (d+1)-row weight tables, no shuffle, no
  * iteration. Corpus scale enters only as the two scans.
  *
  * Determinism: inherits ml1's proven cross-engine recipe (9-dp sigmoid,
  * DECIMAL(25,15) gradient sums, 12-dp weights, lr an exact binary
  * fraction). Argmax ties break to the earliest language in `langs` —
  * pass them sorted for a stable contract.
  */
object Lid {

  /** Hashed char-bigram bucket sequence over the lowercased
    * `prefixChars`-bounded prefix: array of `(cp(i)*31 + cp(i+1)) % buckets`.
    * Codepoint extraction is `ascii()` of a 1-char substring — exact for
    * single-byte text (the corpus contract here); a multibyte corpus
    * should swap in a native codepoint walk. Empty/1-char docs → empty. */
  def bigramBuckets(text: Column, buckets: Int, prefixChars: Int = 256): Column = {
    val s = substring(lower(text), 1, prefixChars)
    // split-into-chars + zip_with-of-adjacent, NOT s.substr(i, 1) inside a
    // transform lambda: a lambda re-inlines `s` (which carries the FULL
    // lower(text)) at every element, turning O(prefix) into
    // O(prefix × doclen) per row — measured 12 s → 2 s on the x29 bench.
    // Here every piece is O(len): split once per reference, slices, one zip.
    val chars = split(s, "")
    when(length(s) >= 2,
        zip_with(
          slice(chars, lit(1), size(chars) - 1),
          slice(chars, lit(2), size(chars) - 1),
          (a, b) => (ascii(a) * 31 + ascii(b)) % buckets))
      .otherwise(array().cast("array<int>"))
  }

  /** Per-bucket frequency features over a bound bucket-array column:
    * `count(b)/len`, exact int/int division (len guarded to >= 1). */
  def bucketFeatures(bs: Column, buckets: Int): Seq[Column] =
    (0 until buckets).map { b =>
      size(filter(bs, x => x === lit(b))).cast("double") /
        greatest(size(bs), lit(1)).cast("double")
    }

  /** One-vs-rest training via [[Classifier.logregTrainMulti]]: all K
    * binary problems share one checkpointed feature frame and ONE
    * gradient aggregate per round (bit-identical weights to K separate
    * [[Classifier.logregTrain]] runs — Round7Spec pins the parity; the
    * batched form cut the x29 bench from ~13 s to ~2.5 s). Returns
    * (lang → (feature_idx, weight) frame), each at full 12-dp precision. */
  def trainOneVsRest(df: DataFrame, features: Seq[Column], langCol: Column,
                     langs: Seq[String], iters: Int, lr: Double = 0.5): Seq[(String, DataFrame)] =
    Classifier.logregTrainMulti(df, features,
      langs.map(l => l -> when(langCol === l, 1.0).otherwise(0.0)), iters, lr)

  /** Classify: ONE corpus scan crossJoin-ing all K broadcast weight rows;
    * appends `p_<lang>` (9-dp sigmoid per language), `pred_lang` (argmax,
    * ties to the earliest lang in `langs`), and `score` (the winning p). */
  def classify(df: DataFrame, keep: Seq[Column], features: Seq[Column],
               weightsByLang: Seq[(String, DataFrame)],
               trustedWeights: Boolean = false): DataFrame = {
    val d = features.size
    val scored = Classifier.scoreMulti(df, keep, features, weightsByLang, trustedWeights)
    val langs = weightsByLang.map(_._1)
    val best = langs.tail.foldLeft(
        struct(col(s"p_${langs.head}").as("p"), lit(langs.head).as("lang"))) { (acc, l) =>
      when(col(s"p_$l") > acc.getField("p"),
        struct(col(s"p_$l").as("p"), lit(l).as("lang"))).otherwise(acc)
    }
    scored.withColumn("_best", best)
      .withColumn("pred_lang", col("_best.lang"))
      .withColumn("score", col("_best.p"))
      .drop("_best")
  }
}
