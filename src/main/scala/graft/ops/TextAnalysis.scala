package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (prompt family:
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * All pure Catalyst expressions over a text column — codegen'd, no UDFs,
  * embarrassingly parallel (no shuffle at all until an aggregate is asked
  * for), so they scale to 100 TB as a straight map stage over the scan.
  */
object TextAnalysis {

  /** Repartition a FEW-SPLIT input to cluster parallelism before heavy
    * per-row compute (guide §2.5: an unsplittable or single-file input
    * serializes the whole map stage on one task while the rest of the
    * cluster idles — the corpus here is one small parquet file at every
    * SF, and a real crawl shard behind gzip has the same shape).
    * Strictly scale-adaptive: a scan already carrying ≥
    * defaultParallelism splits (the 100 TB case) passes through
    * UNTOUCHED — this never adds an exchange where the input is already
    * parallel. When it fires, one round-robin exchange of raw rows
    * (deterministic under retries —
    * spark.sql.execution.sortBeforeRepartition is on) is paid once and
    * every heavy map after it uses the whole cluster.
    *
    * Apply at RAW-SCAN call sites only: the split probe
    * (`df.rdd.getNumPartitions`) physically plans `df`, which is free on
    * a bare table read but re-plans the whole upstream pipeline on a
    * composed frame — measured as a regression when this sat inside the
    * dedup operators and c1's curation chain flowed through it (c1 +18%,
    * d17 +24% min-merged), versus −27…−36% on the direct-scan gates. */
  def spreadSmallInput(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Stopword-profile language ID: score each language by hits of its
    * marker words; highest count wins (ties → lexicographic language id).
    * The n-gram-heuristic shape of fastText-style LID with a deterministic
    * marker table. */
  def languageId(text: Column, profiles: Seq[(String, Seq[String])], default: String = "und"): Column = {
    val toks = array_distinct(filter(split(lower(text), "\\s+"), t => t =!= ""))
    val scored = profiles.map { case (lang, markers) =>
      struct((-size(array_intersect(toks, array(markers.map(lit): _*)))).as("negscore"), lit(lang).as("lang"))
    }
    val best = element_at(sort_array(array(scored: _*)), 1)
    when(-best.getField("negscore") > 0, best.getField("lang")).otherwise(default)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish subword count: word-piece regex (letter runs, digit runs,
    * punctuation singles) — a deterministic proxy for tokenizer cost. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Quality score in [0,1]: blend of length band, alpha ratio, stopword
    * ratio, and mean word length band — the rule-based doc-quality shape
    * (C4/Gopher-style filters) as one expression. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val len = length(text).cast("double")
    val toks = filter(split(lower(text), "\\s+"), t => t =!= "")
    val nTok = size(toks).cast("double")
    val alphaRatio = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / greatest(len, lit(1.0))
    val swHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val swRatio = swHits / greatest(nTok, lit(1.0))
    val meanWordLen = (len - nTok + lit(1.0)) / greatest(nTok, lit(1.0))
    val lenBand = when(len >= 200 && len <= 5000, 1.0).when(len >= 50, 0.5).otherwise(0.0)
    val wordBand = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0).otherwise(0.3)
    round((lenBand * 0.3 + alphaRatio * 0.3 + least(swRatio * lit(3.0), lit(1.0)) * 0.2 + wordBand * 0.2), 6)
  }

  /** Document fingerprint: minimum md5 over rolling word shingles — a
    * 1-hash MinHash usable as a near-dup blocking key. */
  def fingerprint(text: Column, shingleWidth: Int = 4): Column =
    array_min(transform(Dedup.wordShingles(text, shingleWidth), s => md5(s)))

  /** Repetition stats (Gopher-style quality filters): per document, the
    * duplicate-word fraction, the fraction of all word-bigrams taken by
    * the most frequent bigram, and the longest run of one repeated token.
    * Relational formulation — posexplode + windows + hash aggregates — so
    * the heavy per-gram counting shuffles on doc_id and scales as a
    * standard aggregation rather than an O(n²)-per-row array expression. */
  def repetitionStats(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val base = df.select(idCol.as("doc_id"),
      filter(split(lower(text), "\\s+"), t => t =!= "").as("toks"))
    val e = base.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val seq2 = e
      .withColumn("nxt", lead("w", 1).over(w))
      .withColumn("brk", when(lag("w", 1).over(w) === col("w"), 0).otherwise(1))
    val runs = seq2
      .withColumn("run_id", sum("brk").over(w))
      .groupBy("doc_id", "run_id").agg(count(lit(1)).as("run_len"))
      .groupBy("doc_id").agg(max("run_len").as("max_run"))
    val words = e.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("n_distinct"))
    val bigrams = seq2.filter(col("nxt").isNotNull)
      .groupBy(col("doc_id"), concat(col("w"), lit(" "), col("nxt")).as("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(max("n").as("max_bg"), sum("n").as("tot_bg"))
    words.join(runs, Seq("doc_id")).join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens")).as("dup_word_frac"),
        coalesce(col("max_bg").cast("double") / col("tot_bg"), lit(0.0)).as("top_bigram_frac"),
        col("max_run"))
  }

  /** Hex threshold for [[hashSamplePredicate]]: the first 8 hex digits of
    * floor(rate·2³²), zero-padded to md5 width — lexicographic compare on
    * lowercase hex equals numeric compare, so the predicate is portable to
    * any engine with md5. Clamped: rate ≥ 1 yields "g" (greater than every
    * hex digest → keep all; an unclamped 2³² would format as NINE hex
    * digits and silently keep only digests starting with '0'); rate ≤ 0
    * yields "" (below every digest → keep none). */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) ""
    else f"${math.floor(rate * 4294967296.0).toLong}%08x" + "0" * 24

  /** Deterministic hash sampling: keep a row iff md5(key) falls below the
    * rate threshold. Seedless and engine-portable — the same key always
    * samples the same way, so reruns, retries, and cross-engine checks
    * agree (a `rand()` sample would be none of those). */
  def hashSamplePredicate(key: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else md5(key.cast("string")) < lit(hexThreshold(rate))

  /** Stratified deterministic sampling — the data-mixing primitive: each
    * stratum keeps its own rate (e.g. up-weight rare languages, downsample
    * crawl dumps). */
  def sampleByStrata(df: DataFrame, key: Column, stratum: Column,
                     rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val threshold = rates.foldRight(lit(hexThreshold(defaultRate)): Column) {
      case ((s, r), rest) => when(stratum === s, lit(hexThreshold(r))).otherwise(rest)
    }
    df.filter(md5(key.cast("string")) < threshold)
  }

  /** Deterministic uniform in (0,1) from a key: the first 8 hex chars of
    * md5(key) as an integer, offset by 0.5 and scaled by 2^-32 — never
    * exactly 0 or 1 (safe under ln), exact in doubles (numerator < 2^33,
    * divisor a power of two), and engine-portable (the DuckDB oracle
    * rebuilds the same value with a strpos fold). */
  def hashUniform(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long").cast("double") + 0.5) /
      lit(4294967296.0)

  /** Weighted sampling without replacement (Efraimidis–Spirakis, IPL 2006):
    * each row draws a deterministic uniform u and ranks by ln(u)/w —
    * taking the top-k of that key IS an exact weighted sample. One
    * map-only key computation + `TakeOrderedAndProject` per-partition
    * heaps: no shuffle of the corpus, no rejection loop, and the seedless
    * md5 uniform makes the sample rerun/engine/layout-stable (the same
    * discipline as [[hashSamplePredicate]]). Keys are rounded to 10 dp
    * before ranking so libm `ln` drift cannot reorder the cutoff; ties
    * break on the key column asc. Weights must be > 0. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame =
    df.withColumn("es_key", round(log(hashUniform(key)) / weight.cast("double"), 10))
      .orderBy(col("es_key").desc, key).limit(k)

  /** Per-group [[weightedSample]]: top-k of the Efraimidis–Spirakis key
    * WITHIN each stratum (sample k docs per language/domain, ∝ weight) —
    * the rank window partitions by the stratum, so Spark plans a
    * WindowGroupLimit with per-partition top-k heaps; no global window,
    * no per-group TakeOrdered loop. */
  def weightedSamplePerGroup(df: DataFrame, key: Column, group: Column,
                             weight: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(col("es_key").desc, key)
    df.withColumn("es_key", round(log(hashUniform(key)) / weight.cast("double"), 10))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Lowercase whitespace tokens with empties dropped — the corpus-stats
    * tokenize shared by the LM scores and [[bpePairCounts]]. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Flesch reading-ease statistics over REAL punctuated text — the
    * readability gate a curation pipeline bands educational content by
    * (the FineWeb-Edu/Textbooks-style signal, rule-based form). Sentences
    * are terminator runs (`[.!?]+`, floor 1); words are tokens with
    * non-letters stripped; syllables use the standard vowel-group
    * heuristic (runs of `[aeiouy]`, floor 1 per word). Pure codegen'd
    * expressions — map-only at any corpus size. Returns a struct
    * (n_sentences, n_words, n_syllables, flesch); flesch = 206.835 −
    * 1.015·(words/sentence) − 84.6·(syllables/word), 6-dp. */
  def fleschStats(text: Column): Column = {
    val words = filter(transform(tokens(text), t => regexp_replace(t, "[^a-z]", "")),
      w => w =!= "")
    val nWords = size(words)
    val nSent = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
    val nSyll = aggregate(words, lit(0),
      (acc, w) => acc + greatest(regexp_count(w, lit("[aeiouy]+")), lit(1)))
    val wps = nWords.cast("double") / nSent.cast("double")
    val spw = nSyll.cast("double") / greatest(nWords, lit(1)).cast("double")
    struct(
      nSent.cast("long").as("n_sentences"),
      nWords.cast("long").as("n_words"),
      nSyll.cast("long").as("n_syllables"),
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6).as("flesch"))
  }

  /** Distinct-n diversity (Li et al. 2016) — the standard text-generation
    * degeneracy metric (and, over a training corpus, a repetition tell
    * complementary to [[repetitionScore]]): distinct-1 = unique unigrams /
    * total, distinct-2 = unique bigrams / total. One HOF expression chain
    * per doc — bigrams via zip_with over two token-list slices, no
    * explode, no shuffle. Returns a struct (n_unigrams, d1, n_bigrams,
    * d2); d2 is NULL for docs with fewer than 2 tokens (no bigram is a
    * fact, not a zero). */
  def distinctN(text: Column): Column = {
    val toks = tokens(text)
    val n1 = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), greatest(n1 - 1, lit(0))),
      slice(toks, lit(2), greatest(n1 - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val n2 = greatest(n1 - 1, lit(0))
    struct(
      n1.cast("long").as("n_unigrams"),
      round(size(array_distinct(toks)).cast("double") / greatest(n1, lit(1)).cast("double"), 6).as("d1"),
      n2.cast("long").as("n_bigrams"),
      when(n2 >= 1,
        round(size(array_distinct(bigrams)).cast("double") / n2.cast("double"), 6)).as("d2"))
  }

  /** Deflate compression ratio — the codec-based repetition/junk tell
    * (a near-constant doc compresses toward 0; random bytes toward ~1):
    * the signal CCNet-style curation uses alongside [[charEntropy]] and
    * [[repetitionScore]], and the only one of the three that sees
    * LONG-RANGE redundancy (a paragraph pasted 40 times fools per-char
    * entropy, not the LZ window). Runs executor-side through the
    * [[Stages.appendFields]] seam (Deflate is not a SQL expression) with
    * a fresh level-6 `Deflater` per row, released in finally — JDK-built
    * so the path is real, deterministic for a given JVM, and map-only at
    * any corpus size. Appends (raw_len = UTF-8 octets, compressed_len,
    * ratio 6-dp); empty/null text → ratio NULL (nothing to measure). */
  def compressionStage(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    val idx = df.schema.fieldIndex(textCol)
    Stages.appendFields(df, Seq(StructField("raw_len", LongType),
      StructField("compressed_len", LongType), StructField("ratio", DoubleType)))(
      r => {
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        if (t == null || t.isEmpty) Seq[Any](if (t == null) null else 0L, null, null)
        else {
          val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val d = new java.util.zip.Deflater(6)
          try {
            d.setInput(raw); d.finish()
            val buf = new Array[Byte](8192)
            var n = 0L
            while (!d.finished()) n += d.deflate(buf)
            val ratio = BigDecimal(n.toDouble / raw.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Seq[Any](raw.length.toLong, n, ratio)
          } finally d.end()
        }
      })
  }

  /** Unicode script-composition counts — the multilingual-curation prior
    * (fastText-style LID uses script share as its strongest signal; a
    * mixed-script doc is the classic boilerplate/spam tell). Each script
    * is counted as `length(text) - length(text with the script class
    * removed)` — one codegen'd regexp_replace per script, map-only, no
    * tokenize. `scripts` maps name → a regex character class whose
    * PATTERN STRING should be interpolated verbatim into any oracle SQL
    * so both engines match identical bytes. */
  def scriptCounts(text: Column, scripts: Seq[(String, String)]): Column = {
    val t = coalesce(text, lit(""))
    struct(scripts.map { case (name, cls) =>
      (length(t) - length(regexp_replace(t, cls, ""))).cast("long").as(name)
    }: _*)
  }

  /** Per-group KL divergence `KL(P_group ‖ P_corpus)` over unigram
    * distributions — the distribution-shift statistic a mixing pipeline
    * watches per source/domain (a domain drifting from the corpus mix
    * shows up as rising KL). Shape: one (group, token) hash aggregate
    * (Heaps-sublinear key space), re-aggregated for the corpus marginal —
    * no second tokenize pass — then a token-keyed equi-join; every
    * `p·ln(p/q)` term is 12-dp-rounded and DECIMAL(25,15)-summed so the
    * per-group total is reduction-order-independent. P's support is a
    * subset of Q's by construction, so no zero-q guard is needed. */
  /** Per-doc character-level Shannon entropy — the compression-flavored
    * quality signal (binary junk and encrypted blobs run high, repeated
    * boilerplate runs low; CCNet/Gopher-adjacent filters threshold on
    * it). Shape: one explode to (doc, char) rows, one map-side-combined
    * hash aggregate over the per-doc alphabet (bounded keys), entropy
    * terms 12-dp-rounded then DECIMAL-summed so a parallel sum's
    * reduction order never reaches the output (the dom4 KL discipline).
    * Returns (id, n, u, h): total chars, distinct chars, entropy in nats
    * (un-rounded — callers round for display). Docs shorter than 1 char
    * are the caller's left-join case. */
  def charEntropy(docs: DataFrame, idCol: Column, text: Column): DataFrame = {
    val chars = docs.filter(length(text) >= 1)
      .select(idCol.as("id"),
        explode(transform(sequence(lit(1), length(text)), i => text.substr(i, lit(1)))).as("c"))
    val cnt = chars.groupBy("id", "c").agg(count(lit(1)).as("k"))
    val tot = cnt.groupBy("id").agg(sum("k").as("n"), count(lit(1)).as("u"))
    val p = col("k").cast("double") / col("n").cast("double")
    cnt.join(tot, "id")
      .select(col("id"), col("n"), col("u"), round(-p * log(p), 12).as("term"))
      .groupBy("id", "n", "u")
      .agg(sum(col("term").cast("decimal(25,15)")).cast("double").as("h"))
  }

  def klBySource(docs: DataFrame, group: Column, text: Column): DataFrame = {
    val gw = docs.select(group.as("g"), explode(tokens(text)).as("w"))
      .groupBy("g", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val corpus = gw.groupBy("w").agg(sum("c").as("qc"))
    val gtot = gw.groupBy("g").agg(sum("c").as("gt"))
    val ctot = gw.agg(sum("c").as("ct"))
    val p = col("c").cast("double") / col("gt").cast("double")
    val q = col("qc").cast("double") / col("ct").cast("double")
    gw.join(corpus, "w").join(gtot, "g").crossJoin(broadcast(ctot))
      .select(col("g"), col("gt"), round(p * log(p / q), 12).as("term"))
      .groupBy("g", "gt")
      .agg(sum(col("term").cast("decimal(25,15)")).cast("double").as("kl"))
      .select(col("g"), col("gt").cast("long").as("n_tokens"), round(col("kl"), 6).as("kl"))
  }

  /** Adjacent-symbol pairs inside each word — the statistic the BPE merge
    * step maximizes: the most frequent pair becomes the next merge rule.
    * Distributed shape: explode to one row per pair occurrence (map-only),
    * hash-aggregate on a small key space with map-side combine — the plan
    * a tokenizer-training pass over 100 TB wants. Guarded for 1-char
    * words: Spark's `sequence(1, 0)` counts DOWN, so the empty case must
    * be explicit. */
  def bpePairCounts(docs: DataFrame, text: Column, topN: Int): DataFrame = {
    val words = docs.select(explode(tokens(text)).as("w"))
    val pairs = when(length(col("w")) >= 2,
        transform(sequence(lit(1), length(col("w")) - 1), i => col("w").substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    words.select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topN)
  }

  /** BPE symbol-string encoding: each symbol wrapped in U+0001 separators
    * ("•n••e••w•" for "new"), so a merge rule (a, b) is the literal string
    * replace "•a••b•" → "•ab•" — left-to-right, non-overlapping, exactly
    * the greedy merge-application order of Sennrich et al. 2016, and
    * byte-identical across engines because `replace` has those semantics
    * in both Spark (UTF8String.replace) and DuckDB. Symbols are [a-z]+
    * (training filters the vocab to alphabetic words), so the separator
    * can never collide with symbol content. */
  private val BpeSep = "\u0001"

  private def bpeInitEnc(word: Column): Column =
    regexp_replace(word, "(.)", BpeSep + "$1" + BpeSep)

  private def bpeSymbols(enc: Column): Column =
    split(trim(enc, BpeSep), BpeSep + BpeSep)

  private def bpeMergeRule(enc: Column, a: String, b: String): Column =
    replace(enc, lit(BpeSep + a + BpeSep + BpeSep + b + BpeSep), lit(BpeSep + a + b + BpeSep))

  /** Iterative BPE merge TRAINING (Sennrich et al. 2016): starting from
    * characters, repeatedly count adjacent symbol pairs over the word
    * vocabulary (weighted by word frequency), take the most frequent pair
    * (ties → lexicographic), rewrite every occurrence, repeat. Returns the
    * learned merge table (step, lhs, rhs, cnt) — the tokenizer artifact.
    *
    * Distributed shape: the corpus collapses to its word-frequency VOCAB
    * in one hash aggregate (the only corpus-sized pass); each merge round
    * is then a map-only pair explode + one map-side-combined aggregate
    * over the vocab, with only the single winning rule (3 scalars) pulled
    * to the driver — the same scalar-only driver-loop contract as
    * [[graft.ops.Dedup.connectedComponents]]. The vocab frame is
    * localCheckpoint-ed per round so lineage stays flat across rounds.
    * At 100 TB the corpus is scanned exactly once; rounds cost
    * O(vocab), which Heaps' law keeps sublinear in corpus size. */
  def bpeTrain(docs: DataFrame, text: Column, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"bpeTrain needs at least one merge, got $nMerges")
    val spark = docs.sparkSession
    var vocab = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("enc", bpeInitEnc(col("w")))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val pairs = when(size(col("syms")) >= 2,
          transform(sequence(lit(0), size(col("syms")) - 2),
            j => struct(get(col("syms"), j).as("a"), get(col("syms"), j + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val top = vocab.select(col("cnt"), bpeSymbols(col("enc")).as("syms"))
        .select(col("cnt"), explode(pairs).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("a"), col("b"))
        .limit(1).take(1)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, t) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((step, a, b, t))
        vocab = vocab.withColumn("enc", bpeMergeRule(col("enc"), a, b)).localCheckpoint()
        step += 1
      }
    }
    spark.createDataFrame(learned.result()).toDF("step", "lhs", "rhs", "cnt")
  }

  /** BPE ENCODER: apply a learned merge list to a word column, yielding its
    * symbol array. Map-only (a chain of `nMerges` literal replaces compiled
    * into one projection) — the inference half of [[bpeTrain]]. */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    bpeSymbols(merges.foldLeft(bpeInitEnc(word)) {
      case (e, (a, b)) => bpeMergeRule(e, a, b)
    })

  /** Deterministic train/val/test assignment: the md5-threshold ladder over
    * cumulative fractions — the same seedless, engine-portable mechanism as
    * [[hashSamplePredicate]], so a document's split never changes across
    * reruns, engines, or cluster layouts (a `rand()` split would violate
    * all three). `cuts` are (label, cumulativeFraction) in ladder order;
    * everything past the last cut gets `rest`. */
  def assignSplit(key: Column, cuts: Seq[(String, Double)], rest: String): Column =
    cuts.foldRight(lit(rest): Column) { case ((label, cum), tail) =>
      when(md5(key.cast("string")) < lit(hexThreshold(cum)), label).otherwise(tail)
    }

  /** Winnowing fingerprints (Schleimer et al., MOSS): md5 every positional
    * character k-gram, take the min hash of every w-wide sliding window,
    * dedupe. Guarantees a shared fingerprint for any sufficiently long
    * shared substring — the local-dup detection x4's single global min
    * can't give — while selecting only ~2/(w+1) of the hashes. Map-only,
    * one compiled pass per document (`functions.WinnowHashesExpr`): the
    * HOF formulation re-evaluated the hash chain inside the window lambda
    * — O(L²) md5 calls, unusable past toy scale — and per-position
    * `substring` is O(position) on UTF8String. NULL text fingerprints as
    * '' (coalesced here so both engines agree). Short-text conventions
    * mirror the shingle ops: text shorter than k → itself as the one
    * gram; fewer than w hashes → one window over them all. */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    graft.functions.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    call_function("winnow_hashes", coalesce(text, lit("")), lit(k), lit(w))
  }

  /** Adjacent token pairs of a token-array column, as (p, w) structs —
    * the bigram events an interpolated bigram LM trains on. Zip-shift, no
    * window: pair generation stays a map stage. */
  def adjacentTokenPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("p"), element_at(toks, i + 1).as("w"))))
      .otherwise(array().cast("array<struct<p:string,w:string>>"))

  /** Adjacent token triples of a token-array column, as (u, v, w) structs
    * — the trigram events a backoff LM scores. Zip-shift like
    * [[adjacentTokenPairs]]: generation stays a map stage (guarded for
    * short docs — Spark's `sequence` counts DOWN on an empty range). */
  def adjacentTokenTriples(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => struct(element_at(toks, i).as("u"), element_at(toks, i + 1).as("v"),
          element_at(toks, i + 2).as("w"))))
      .otherwise(array().cast("array<struct<u:string,v:string,w:string>>"))

  /** Gopher rule-set quality filter (Rae et al. 2021, appendix A1.1 —
    * the published rule battery behind `qualityScore`'s blended score):
    * per document, every rule statistic plus the composed keep verdict.
    * Kept iff word count ∈ [minWords, maxWords], mean word length ∈
    * [minMeanLen, maxMeanLen], symbol-to-word ratio ('#' or '...')
    * ≤ maxSymbolRatio, ≤ maxBulletFrac of lines start with a bullet,
    * ≤ maxEllipsisFrac of lines end with an ellipsis, ≥ minAlphaFrac of
    * words contain a letter, and ≥ minStopHits distinct stop words occur.
    * Pure expressions — map-only at any corpus size; every ratio is a
    * single exact-integer division so both engines produce bit-identical
    * doubles. REF ingestion/quality_checker.py:44-101 gates on the same
    * length/alpha/stopword families. */
  def gopherRules(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Int = 2): Column = {
    val t = coalesce(text, lit(""))
    val toks = tokens(t)
    val nWords = size(toks).cast("long")
    val nW = greatest(nWords, lit(1L)).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") / nW
    val symRatio = size(regexp_extract_all(t, lit("#|\\.\\.\\."), lit(0))).cast("double") / nW
    val alphaFrac = size(filter(toks, w => w.rlike("[a-z]"))).cast("double") / nW
    val stopHits = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = size(filter(lines,
      l => l.startsWith("•") || l.startsWith("- "))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("double") / nLines
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      symRatio <= maxSymbolRatio &&
      bulletFrac <= maxBulletFrac && ellipsisFrac <= maxEllipsisFrac &&
      alphaFrac >= minAlphaFrac && stopHits >= minStopHits
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), alphaFrac.as("alpha_word_frac"),
      stopHits.as("n_stop_hits"), bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"), keep.as("keep"))
  }

  /** Piece vocabulary for unigram-LM segmentation (the SentencePiece
    * vocabulary SHAPE, deterministically constructed rather than
    * EM-trained): every single character of the corpus (guaranteeing any
    * word segments) plus the top-`k` multi-character grams (length 2-4) by
    * frequency-weighted occurrence count, with `logp = ln(count / total)`
    * over the selected vocabulary. One gram aggregate (vocab-bounded) +
    * a TakeOrdered top-k; ties at the k boundary break lexicographically
    * so the vocabulary is reproducible across engines and runs.
    * Input: `(word, wc)` word counts; output: `(piece, logp)`. */
  def unigramPieceVocab(wordCounts: DataFrame, k: Int, maxPieceLen: Int = 4): DataFrame = {
    val grams = wordCounts.select(col("wc"),
      explode(flatten(array((1 to maxPieceLen).map { l =>
        when(length(col("word")) >= l,
          transform(sequence(lit(1), length(col("word")) - l + 1),
            p => col("word").substr(p, lit(l))))
          .otherwise(array().cast("array<string>"))
      }: _*))).as("piece"))
    val gcnt = grams.groupBy("piece").agg(sum("wc").as("c"))
    val singles = gcnt.filter(length(col("piece")) === 1)
    val multi = gcnt.filter(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece")).limit(k)
    val vocab = singles.unionByName(multi)
    val tot = vocab.agg(sum("c").cast("double").as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), log(col("c").cast("double") / col("tot")).as("logp"))
  }

  /** Unigram-LM Viterbi segmentation — SentencePiece INFERENCE (Kudo
    * 2018): segment each word into the vocabulary pieces maximizing
    * Σ ln p(piece). The BPE encoder (tok2/tok3) replays learned merges;
    * this is the other major tokenizer family, where segmentation is a
    * per-word dynamic program (and beats greedy longest-match — pinned in
    * Round5Spec).
    *
    * Distributed shape: candidate (start, len, piece) edges are map-only
    * array builds; ONE hash equi-join attaches vocabulary log-probs; the
    * DP is a bounded fold per word (edges ≤ maxPieceLen·|word|), run on
    * DISTINCT words — Heaps-bounded, so at corpus scale the expensive
    * part is a vocabulary-sized map stage, with stats joined back to
    * documents at scan bandwidth. Forward scores fold positionally (no
    * shuffle-order arithmetic) and the backtrack breaks score ties by
    * longest piece, then lexicographic piece, then start — fully
    * deterministic. Returns (word, pieces, n_pieces, score).
    *
    * `words` must carry distinct non-empty `word` rows; `vocab` is
    * `(piece, logp)` and MUST contain every single character of every
    * word (what [[unigramPieceVocab]] guarantees) — otherwise a word
    * with an uncoverable prefix yields null score/pieces. */
  def viterbiSegment(words: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val cand = words.select(col("word"),
        explode(flatten(array((1 to maxPieceLen).map { l =>
          when(length(col("word")) >= l,
            transform(sequence(lit(0), length(col("word")) - l),
              s => struct(s.as("start"), lit(l).as("len"),
                col("word").substr(s + 1, lit(l)).as("piece"))))
            .otherwise(array().cast("array<struct<start:int,len:int,piece:string>>"))
        }: _*))).as("e"))
      .select(col("word"), col("e.start").as("start"), col("e.len").as("len"), col("e.piece").as("piece"))
    val withEdges = cand.join(vocab, "piece")
      .groupBy("word")
      .agg(collect_list(struct(col("start"), col("len"), col("piece"), col("logp"))).as("edges"))
    val L = length(col("word"))
    // forward pass: dp[0]=0; dp[i] = max over vocab edges ending at i of
    // dp[start] + logp — the accumulator grows one position per step
    val dp = aggregate(sequence(lit(1), L), array(lit(0.0)), (acc, i) =>
      concat(acc, array(array_max(transform(
        filter(col("edges"), e => e.getField("start") + e.getField("len") === i),
        e => element_at(acc, e.getField("start") + 1) + e.getField("logp"))))))
    // backtrack: from pos=L, repeatedly take the best-scoring edge ending
    // at pos (ties: longest piece, then lexicographic, then start) and
    // prepend its piece; freezes at pos=0. L steps always suffice.
    val walk = aggregate(sequence(lit(1), L),
      struct(L.cast("int").as("pos"), array().cast("array<string>").as("pieces")),
      (acc, _) => {
        val best = element_at(array_sort(transform(
          filter(col("edges"), e => e.getField("start") + e.getField("len") === acc.getField("pos")),
          e => struct(
            (-(element_at(col("dp"), e.getField("start") + 1) + e.getField("logp"))).as("negs"),
            (-e.getField("len")).as("neglen"),
            e.getField("piece").as("piece"),
            e.getField("start").as("start")))), 1)
        when(acc.getField("pos") === 0, acc)
          .otherwise(struct(best.getField("start").as("pos"),
            concat(array(best.getField("piece")), acc.getField("pieces")).as("pieces")))
      })
    withEdges
      .withColumn("dp", dp)
      .withColumn("w", walk)
      .select(col("word"), col("w.pieces").as("pieces"),
        size(col("w.pieces")).cast("long").as("n_pieces"),
        element_at(col("dp"), L + 1).as("score"))
  }

  /** SFT chat-template rendering: serialize a (system, user, assistant)
    * triple into one training string with role markers, plus the 1-based
    * character offset where the assistant span begins — the loss-mask
    * boundary a completion-only SFT loss needs (everything before it is
    * context, not target). Pure string expressions; a tokenizer-level
    * mask is this same arithmetic over token counts (x1/x3). */
  def chatTemplate(system: Column, user: Column, assistant: Column): Column = {
    val prefix = concat(lit("<|system|>"), system, lit("<|user|>"), user, lit("<|assistant|>"))
    struct(concat(prefix, assistant, lit("<|end|>")).as("sample"),
      (length(prefix) + 1).cast("long").as("mask_start"))
  }

  /** URL canonicalization — the key-building step of crawl dedup (two
    * fetches of one page must collide BEFORE content dedup ever runs):
    * lowercase scheme+host, strip `www.`, drop the fragment, drop default
    * ports (:80 http / :443 https), collapse the path's trailing slashes,
    * and drop tracking params (utm_*, ref, fbclid, gclid — case-
    * insensitively, an `UTM_SOURCE` variant must not split the key) while
    * sorting the survivors so param order can't split a URL into two keys.
    * Scheme-less input (a bare "example.com/a", common in crawl
    * frontiers) passes through minus its fragment — distinct pages must
    * never collapse to one degenerate key; its query string is left as-is
    * (param sorting/tracking-drop applies to absolute URLs only — out of
    * scope by design, as is IPv6 bracket-host parsing). Userinfo
    * ("alice@host") is stripped before host extraction. Pure
    * RE2-compatible expressions — map-only at any scale. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1), "^[^@]*@", "")
    val host = regexp_replace(lower(regexp_extract(hostPort, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "https" && port === "443") || (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    val rawPath = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    // (=|$) drops valueless tracking params too ("?ref", "?utm_source") —
    // a crawl frontier serves both forms and they must collapse to one key
    val kept = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike("(?i)^(utm_[^=]*|ref|fbclid|gclid)(=|$)")))
    val queryPart = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(scheme === "", noFrag)
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Consecutive `w`-token span strings of a text column, in order — the
    * unit of C4-style span-level dedup. Built by slicing the token array
    * (map-only, no shuffle, no per-token explode): span i = tokens
    * [i·w, i·w+w). Empty text → empty array (guarded: Spark's
    * `sequence(0, -1)` counts DOWN rather than yielding empty). */
  def spanSegments(text: Column, w: Int): Column = {
    val toks = tokens(text)
    val nSeg = floor((size(toks) + lit(w - 1)) / lit(w.toDouble)).cast("int")
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSeg - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
  }

  /** C4-style global span dedup: every document is cut into consecutive
    * `w`-token spans, each distinct span text survives only at its FIRST
    * occurrence corpus-wide (ordered by doc id, then position — the same
    * deterministic first-wins rule as exact dedup), and each document is
    * reassembled from its surviving spans. Returns one row per input
    * document: (doc_id, n_spans, n_kept, kept_text).
    *
    * Scale shape: span build is map-only array slicing; the dedup is ONE
    * shuffle on the span text (candidate volume O(tokens/w)). The winner
    * is `min(struct(doc_id, seg_idx))` per span — a HASH aggregate, not a
    * window: duplicate spans collapse in the map-side partial (boilerplate
    * spans, the hot keys, shrink BEFORE the shuffle) and nothing is
    * sorted; min-of-struct is order-independent, so shuffle
    * nondeterminism cannot reach the result. The span being the group key
    * means winners need no join back. Reassembly is one aggregate on
    * doc_id with an order-struct sort. A pathological single span is
    * bounded by doc count — the `Skew.saltedAgg` profile if a real crawl
    * needs it. */
  def spanDedup(df: DataFrame, idCol: Column, text: Column, w: Int): DataFrame = {
    // per-doc span totals are ceil(tokens/w) — map-only, and WITHOUT
    // building the span strings a second time (each branch of the plan
    // re-executes its projection; counting must not pay the array_join)
    val base = df.select(idCol.as("doc_id"), spanSegments(text, w).as("segs"))
    val segs = base.select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
    val kept = segs.groupBy("seg")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.seg_idx").as("seg_idx"), col("seg"))
    val keptAgg = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), " ").as("kept_text"))
    // coalesce: NULL text tokenizes to NULL, which must count as 0 spans
    // (matching the 0/''-coalesced kept columns), not propagate NULL
    df.select(idCol.as("doc_id"),
        coalesce(floor((size(tokens(text)) + lit(w - 1)) / lit(w.toDouble)).cast("long"), lit(0L))
          .as("n_spans"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** ExactSubstr-style duplicated-substring detection (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): mark
    * every token position whose `w`-token gram occurs more than once
    * corpus-wide, merge overlapping/adjacent marked grams into MAXIMAL
    * duplicated spans, and report per-document duplication stats —
    * (doc_id, n_tokens, n_dup_spans, dup_tokens, dup_frac). Unlike
    * [[spanDedup]]'s fixed non-overlapping windows, the grams here
    * OVERLAP, so a duplicated run is found at any alignment and its full
    * extent is recovered (a length-L shared run yields L-w+1 marked
    * positions that merge back into one length-L span).
    *
    * Scale shape: gram build is map-only array slicing (no per-token
    * explode of text copies beyond the gram rows); duplicate detection is
    * a count window PARTITIONED BY THE GRAM — one shuffle of the gram
    * table, where the agg+join-back alternative shuffles it twice
    * (measured 1.8× slower at sf0.1); the span merge runs in a window
    * PARTITIONED by doc_id (never global), bounded by per-doc gram
    * counts. The suffix-array pass of the paper is replaced by the
    * gram-mark + merge equivalent because a distributed suffix sort would
    * shuffle full suffixes; grams cap the shuffled key at `w` tokens with
    * the same ≥`w`-token detection guarantee. */
  def dupSubstringSpans(df: DataFrame, idCol: Column, text: Column, w: Int): DataFrame = {
    val base = df.select(idCol.as("doc_id"), tokens(coalesce(text, lit(""))).as("toks"))
    val grams = base.select(col("doc_id"),
        when(size(col("toks")) >= w,
          transform(sequence(lit(0), size(col("toks")) - w),
            i => struct(i.as("pos"), array_join(slice(col("toks"), i + 1, lit(w)), " ").as("gram"))))
          .otherwise(array().cast("array<struct<pos:int,gram:string>>")).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    // hot-gram marking via a count window keyed by (xxhash64(gram), gram):
    // ONE shuffle and ONE gram build (an agg + join-back evaluates the
    // tokenize/explode lineage twice and adds a join stage — measured ~2×
    // slower), with the partition sort dominated by the 8-byte hash prefix
    // instead of the 8-token string (the r14 complaint against the plain
    // string window). The gram string stays IN the key, so equality is
    // exact — the hash only cheapens comparisons, never merges grams.
    // BOUNDED state (r15 ADVICE): the window's sort spills; the previous
    // collect_list of every (doc_id,pos) was unbounded per-group executor
    // memory on a boilerplate gram repeated at corpus scale.
    val wn0 = Window.partitionBy(col("gh"), col("gram"))
    val marked = grams.withColumn("gh", xxhash64(col("gram")))
      .withColumn("n", count(lit(1)).over(wn0))
      .filter(col("n") >= 2).select(col("doc_id"), col("pos"))
    // two length-w intervals [p1, p1+w) and [p2, p2+w), p2 > p1, belong to
    // one maximal span iff p2 <= p1 + w (overlap or touch) — first row's
    // NULL lag falls to the otherwise(0) branch and opens island 0
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    val islands = marked
      .withColumn("brk", when(col("pos") - lag("pos", 1).over(wn) > w, 1).otherwise(lit(0)))
      .withColumn("island", sum("brk").over(wn.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("s"), (max("pos") + w).as("e"))
    val perDoc = islands.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("e") - col("s")).as("dup_tokens"))
    base.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / greatest(col("n_tokens"), lit(1L))).as("dup_frac"))
  }

  /** WordPiece encode of one word (Wu et al. 2016 / BERT): greedy
    * longest-match-first — start pieces at position 1, `##` continuation
    * pieces after; ANY unmatchable position turns the WHOLE word into one
    * [UNK] (BERT's is_bad rule), as does exceeding `maxLen` chars (the
    * max_input_chars_per_word guard). Bounded fold: each step consumes
    * ≥ 1 char, so `maxLen` steps always finish. Returns struct(n_pieces,
    * n_unk). Run once per DISTINCT word and join back (the tok6 plan) —
    * the fold costs |pieces|·maxLen substring probes. */
  def wordPieceStats(word: Column, startPieces: Seq[String], contPieces: Seq[String],
                     maxLen: Int = 16): Column = {
    require(startPieces.nonEmpty && contPieces.nonEmpty, "need non-empty piece vocabularies")
    def bestAt(pos: Column, pieces: Seq[String]) =
      greatest(pieces.map(p =>
        when(word.substr(pos.cast("int"), lit(p.length)) === p, p.length).otherwise(0)): _*)
    val st = aggregate(sequence(lit(1), lit(maxLen)),
      struct(lit(1).as("pos"), lit(0).as("cnt"), (length(word) > maxLen).as("unk")),
      (s0, _) => {
        val fin = s0.getField("unk") || s0.getField("pos") > length(word)
        val best = when(s0.getField("pos") === 1, bestAt(s0.getField("pos"), startPieces))
          .otherwise(bestAt(s0.getField("pos"), contPieces))
        struct(
          when(fin || best === 0, s0.getField("pos")).otherwise(s0.getField("pos") + best).as("pos"),
          when(fin || best === 0, s0.getField("cnt")).otherwise(s0.getField("cnt") + 1).as("cnt"),
          when(fin, s0.getField("unk")).when(best === 0, lit(true))
            .otherwise(s0.getField("unk")).as("unk"))
      })
    struct(when(st.getField("unk"), 1).otherwise(st.getField("cnt")).as("n_pieces"),
      when(st.getField("unk"), 1).otherwise(0).as("n_unk"))
  }

  /** SPDX-style license detection for code/doc corpora — the governance
    * gate every permissively-licensed training set runs before
    * admission. Each license is identified by its canonical header
    * phrase (the SPDX license-text anchors, matched case-insensitively);
    * copyleft detection matters most, so GPL is checked before the
    * permissive family. Returns (license, family) where family ∈
    * {permissive, copyleft, cc, none}. Pure Column expression — codegen,
    * no UDF. */
  def licenseDetect(text: Column): Column = {
    val t = lower(text)
    val license =
      // LGPL before GPL: the real LGPL-3.0 text contains "GNU General
      // Public License" verbatim ("…incorporates the terms and conditions
      // of version 3 of the GNU General Public License…"), so the
      // more-specific anchor must win
      when(t.contains("gnu lesser general public license"), "LGPL-3.0")
        .when(t.contains("gnu general public license"), "GPL-3.0")
        .when(t.contains("mozilla public license"), "MPL-2.0")
        .when(t.contains("licensed under the apache license, version 2.0"), "Apache-2.0")
        .when(t.contains("permission is hereby granted, free of charge"), "MIT")
        .when(t.contains("redistribution and use in source and binary forms"), "BSD-3-Clause")
        .when(t.contains("creative commons attribution"), "CC-BY-4.0")
        .otherwise("none")
    val family =
      when(license.isin("GPL-3.0", "LGPL-3.0", "MPL-2.0"), "copyleft")
        .when(license === "CC-BY-4.0", "cc")
        .when(license === "none", "none")
        .otherwise("permissive")
    struct(license.as("license"), family.as("family"))
  }
}
