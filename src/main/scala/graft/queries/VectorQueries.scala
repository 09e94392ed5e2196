package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.TestTables._
import graft.ops.{Dedup, DeltaLog, TextAnalysis}
import graft.index.{Embed, Search, Upsert}
import org.apache.spark.sql.Column

/** Vector / dedup / similarity inventory (SURVEY.md §2.9 V1–V2; prompt
  * families: deduplication, similarity search, multimodal, text analysis).
  *
  * All signatures are md5-based so the DuckDB oracle can compute identical
  * values; dot products fold left-to-right in element order so the IEEE
  * result is engine-independent.
  */
object VectorQueries extends QuerySet {

  /** V1: deterministic bag-of-words embedding over a fixed vocabulary,
    * L2-normalized, serialized for comparison. */
  val v1Embed = Q("v1_vocab_embed",
    Some("""WITH t AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
              FROM documents),
            v AS (
              SELECT doc_id, [
                CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE),
                CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE),
                CAST(len(list_filter(toks, x -> x = 'stream')) AS DOUBLE),
                CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE),
                CAST(len(list_filter(toks, x -> x = 'sort')) AS DOUBLE),
                CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE)] AS vec
              FROM t),
            n AS (SELECT doc_id, vec, sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm FROM v)
            SELECT doc_id, list_aggregate(list_transform(vec,
              x -> CAST(round(CASE WHEN nrm > 0 THEN x / nrm ELSE 0.0 END, 6) AS VARCHAR)), 'string_agg', ',') AS embedding
            FROM n ORDER BY doc_id"""),
    (s, d) => {
      // vec materialized as its own projection: l2Normalize references it
      // twice (norm + scale), which would otherwise recompute the fold
      documents(s, d)
        .withColumn("vec", Embed.vocabVector(col("text"),
          Seq("spark", "join", "stream", "hash", "sort", "vector")))
        .select(col("doc_id"),
          concat_ws(",", transform(Embed.l2Normalize(col("vec")),
            x => round(x, 6).cast("string"))).as("embedding"))
        .orderBy("doc_id")
    })

  /** V2: brute-force ANN top-k against the vec_id=0 query vector. */
  val v2AnnTopK = Q("v2_ann_topk",
    Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
            FROM embeddings, q
            ORDER BY score DESC, vec_id LIMIT 10"""),
    (s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
    })

  /** Embedding near-dup pairs, LSH-band-blocked: candidates share ≥1 of 4
    * four-bit SRP bands (16 seed-43 hyperplanes, baked into the oracle as
    * literals so both engines derive identical band keys), then exact
    * cosine ≥ 0.42 verifies. The threshold sits in the tail of the global
    * cosine distribution (≈30 qualifying pairs per SF, max ≈0.51), so the
    * banded recall (~50% at cos 0.42) still returns a real, non-empty pair
    * set at every SF — a 0.95-style threshold would pass vacuously. */
  val d5EmbedDup: Q = {
    val dim = 64; val bitsPerBand = 4; val numBands = 4
    val planes: Seq[Seq[Double]] = {
      val rng = new scala.util.Random(43)
      Seq.fill(bitsPerBand * numBands)(Seq.fill(dim)(rng.nextGaussian()))
    }
    def planeSql(p: Seq[Double]) = p.map(v => f"$v%.17g").mkString("[", ",", "]")
    def bandSql(b: Int) = (0 until bitsPerBand).map { j =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(planes(b * bitsPerBand + j))}) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    val bandsSql = (0 until numBands).map(b => s"concat('$b', ':', ${bandSql(b)})").mkString("[", ", ", "]")
    Q("d5_embedding_dup_pairs",
      Some(s"""WITH banded AS (
                SELECT vec_id, embedding, unnest($bandsSql) AS band FROM embeddings),
              cand AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id)
              SELECT id_a, id_b,
                round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 4) AS cos
              FROM cand
              JOIN embeddings ea ON ea.vec_id = id_a
              JOIN embeddings eb ON eb.vec_id = id_b
              WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) >= 0.42
              ORDER BY id_a, id_b"""),
      (s, d) => Search.lshNearDuplicatePairs(embeddings(s, d), "embedding", "vec_id",
          dim, bitsPerBand, numBands, threshold = 0.42, seed = 43)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy("id_a", "id_b"))
  }

  /** Exact dedup: first-wins per normalized-content hash. */
  val d1Exact = Q("d1_exact_dedup",
    Some("""SELECT doc_id, source FROM (
              SELECT doc_id, source,
                row_number() OVER (PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) ORDER BY doc_id) AS rn
              FROM documents) t WHERE rn = 1 ORDER BY doc_id"""),
    (s, d) => Dedup.exact(documents(s, d), col("text"), col("doc_id"))
      .select("doc_id", "source").orderBy("doc_id"))

  /** MinHash signature (4 rotation-permutations of one md5 per shingle,
    * serialized) — engine-portable, one digest pass. */
  val d2MinHash = Q("d2_minhash_signature",
    Some(s"""WITH t AS (SELECT doc_id AS id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT id, ${OracleSql.shinglesSql(3)} AS shingles FROM t),
            hs AS (SELECT id, list_transform(shingles, s -> md5(s)) AS hs FROM sh)
            SELECT id AS doc_id,
              ${(0 until 4).map(i => s"${OracleSql.minhashSql(i)} AS h$i").mkString(",\n              ")}
            FROM hs ORDER BY doc_id"""),
    (s, d) => {
      val sig = Dedup.minHashSignature(col("hs"), 4)
      documents(s, d)
        .withColumn("sh", Dedup.wordShingles(col("text"), 3))
        .withColumn("hs", Dedup.shingleHashes(col("sh")))
        .select(col("doc_id"),
          element_at(sig, 1).as("h0"), element_at(sig, 2).as("h1"),
          element_at(sig, 3).as("h2"), element_at(sig, 4).as("h3"))
        .orderBy("doc_id")
    })

  /** MinHash + LSH banding: candidate pairs sharing a band, verified by
    * exact Jaccard ≥ 0.8 over the shingle sets. */
  val d2MinHashPairs = Q("d2_minhash_lsh_pairs",
    Some(s"""WITH src AS (SELECT doc_id AS id, text FROM documents),
            ${OracleSql.lshPairsCtes("src", shingleWidth = 3, numHashes = 6, rows = 2, threshold = 0.8)}
            SELECT id_a, id_b, round(jacc, 6) AS jaccard FROM pairs ORDER BY id_a, id_b"""),
    (s, d) => Dedup.minHashDuplicates(graft.ops.TextAnalysis.spreadSmallInput(documents(s, d)), "doc_id", col("text"),
        shingleWidth = 3, numHashes = 6, rowsPerBand = 2, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b"))

  /** SimHash 16-bit fingerprint (md5-hex-vote construction). */
  val d3SimHash = Q("d3_simhash",
    Some(s"""WITH t AS (
              SELECT doc_id, list_transform(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''), x -> md5(x)) AS hs
              FROM documents)
            SELECT doc_id, ${OracleSql.simhashSql(16)} AS simhash
            FROM t ORDER BY doc_id"""),
    (s, d) => documents(s, d)
      .select(col("doc_id"), Dedup.simHash(col("text"), 16).as("simhash"))
      .orderBy("doc_id"))

  /** Character-n-gram Jaccard similarity between deterministic doc pairs
    * (doc i vs doc i+1). */
  val d4NgramJaccard = Q("d4_ngram_jaccard",
    Some("""WITH g AS (
              SELECT doc_id, list_distinct(list_transform(range(1, length(lower(text)) - 1),
                       i -> substr(lower(text), CAST(i AS INT), 3))) AS grams
              FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                    len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
            ORDER BY id_a"""),
    (s, d) => {
      // grams built once per doc before the join — computing them inside the
      // pair expression would rebuild each doc's gram set four times
      val g = documents(s, d)
        .select(col("doc_id"), Dedup.charNgrams(lower(col("text")), 3).as("grams"))
        // both sides of the shifted self-join read the gram sets; checkpoint
        // (not cache) so the blocks free on GC instead of pinning the
        // CacheManager for the session
        .localCheckpoint()
      val a = g.select(col("doc_id").as("id_a"), col("grams").as("ga"))
      val b = g.select(col("doc_id").as("id_b"), col("grams").as("gb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          round(size(array_intersect(col("ga"), col("gb"))).cast("double") /
            size(array_union(col("ga"), col("gb"))), 6).as("jaccard"))
        .orderBy("id_a")
    })

  /** Exact all-pairs Jaccard near-dup join via PPJoin prefix filtering
    * (Xiao et al. 2008) — the zero-false-negative complement to d2's
    * MinHash banding: docs ordered rarest-shingle-first must share a
    * prefix shingle to reach Jaccard ≥ 0.5, so the candidate join runs
    * on the rare vocabulary tail only. The fixture's planted near-dups
    * sit at j ≥ 0.5 with the background at ≤ 0.025 (measured), so the
    * threshold is exercised, not vacuous. Verification filters on the
    * UNROUNDED exact ratio in both engines. */
  val d13PrefixJaccard = Q("d13_prefix_jaccard_pairs",
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
            g AS (SELECT doc_id AS id, ${OracleSql.shinglesSql(3)} AS grams FROM t),
            ex AS (SELECT id, unnest(grams) AS gram FROM g),
            freq AS (SELECT gram, count(*) AS df FROM ex GROUP BY gram),
            keyed AS (SELECT id, concat(lpad(CAST(df AS VARCHAR), 10, '0'), chr(1), gram) AS k
                      FROM ex JOIN freq USING (gram)),
            pre AS (SELECT id, CAST(count(*) AS INT) AS s, array_slice(list_sort(list(k)), 1,
                      CAST(count(*) - ceil(CAST(count(*) AS DOUBLE) * 0.5) + 1 AS INT)) AS prefix
                    FROM keyed GROUP BY id),
            pe AS (SELECT id, s, unnest(prefix) AS k FROM pre),
            cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                     FROM pe a JOIN pe b ON a.k = b.k AND a.id < b.id
                       AND CAST(b.s AS DOUBLE) >= 0.5 * CAST(a.s AS DOUBLE)
                       AND CAST(a.s AS DOUBLE) >= 0.5 * CAST(b.s AS DOUBLE)),
            v AS (SELECT id_a, id_b,
                    CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                      / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) AS j
                  FROM cand JOIN g ga ON ga.id = id_a JOIN g gb ON gb.id = id_b)
            SELECT id_a, id_b, round(j, 6) AS jaccard FROM v
            WHERE j >= 0.5 ORDER BY id_a, id_b"""),
    (s, d) => Dedup.prefixJaccardPairs(documents(s, d), "doc_id", "text", w = 3, threshold = 0.5)
      .orderBy("id_a", "id_b"))

  /** LSH-recall audit — the engine grading its own approximation: the
    * d2 MinHash banding chain's pairs measured against the exact-Jaccard
    * ground truth the d13 PPJoin chain computes, both at the same
    * threshold. Banding trades recall for candidate-set size; this row
    * pins the trade on the corpus (and would flag a banding-parameter
    * regression as a hash change). The audit join is on pair keys —
    * O(pairs), nothing rescans the corpus. */
  val d16LshRecall = Q("d16_lsh_recall",
    Some(s"""WITH src AS (SELECT doc_id AS id, text FROM documents),
            ${OracleSql.lshPairsCtes("src", shingleWidth = 3, numHashes = 6, rows = 2, threshold = 0.5)},
            tt AS (SELECT doc_id AS id, ${OracleSql.toksSql} AS toks FROM documents),
            gg AS (SELECT id, ${OracleSql.shinglesSql(3)} AS grams FROM tt),
            exu AS (SELECT DISTINCT id, unnest(grams) AS gram FROM gg),
            cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                     FROM exu a JOIN exu b ON a.gram = b.gram AND a.id < b.id),
            v AS (SELECT id_a, id_b FROM cand
                  JOIN gg ga ON ga.id = id_a JOIN gg gb ON gb.id = id_b
                  WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) >= 0.5),
            hit AS (SELECT count(*) AS n_hit FROM pairs p JOIN v ON v.id_a = p.id_a AND v.id_b = p.id_b),
            ne AS (SELECT count(*) AS n_exact FROM v),
            nl AS (SELECT count(*) AS n_lsh FROM pairs)
            SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_lsh AS BIGINT) AS n_lsh,
              CAST(n_hit AS BIGINT) AS n_hit,
              round(CAST(n_hit AS DOUBLE) / CAST(greatest(n_exact, 1) AS DOUBLE), 6) AS recall
            FROM ne CROSS JOIN nl CROSS JOIN hit"""),
    (s, d) => {
      val docs = documents(s, d)
      // ONE tokenize+shingle scan shared by the LSH side and the exact
      // verify — each operator previously re-derived the same w=3 word
      // shingles from text (two full corpus scans for one gram table)
      val shingled = graft.ops.TextAnalysis.spreadSmallInput(docs)
        .select(col("doc_id").as("id"),
          Dedup.wordShingles(col("text"), 3).as("sh")).localCheckpoint()
      val lsh = Dedup.minHashDuplicatesFrom(shingled,
        numHashes = 6, rowsPerBand = 2, threshold = 0.5).select("id_a", "id_b")
      val exact = Dedup.prefixJaccardPairsFrom(shingled, "sh", threshold = 0.5)
        .select("id_a", "id_b")
      val hit = exact.join(lsh, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_hit"))
      val ne = exact.agg(count(lit(1)).as("n_exact"))
      val nl = lsh.agg(count(lit(1)).as("n_lsh"))
      ne.crossJoin(nl).crossJoin(hit).select(col("n_exact"), col("n_lsh"), col("n_hit"),
        round(col("n_hit").cast("double")
          / greatest(col("n_exact"), lit(1L)).cast("double"), 6).as("recall"))
    })

  /** Containment near-dup pairs ([[graft.ops.Dedup.containmentPairs]]) —
    * the asymmetric subset/quote detector Jaccard misses. Every 23rd doc
    * is planted as the 40%-token prefix of its predecessor (cross-row
    * synthesis via a doc_id−1 self-join, identical in both engines), so
    * true containment-1.0 pairs exist that have LOW Jaccard; the 0.9
    * threshold also re-finds the corpus's symmetric near-dups. Blocking
    * is probe×index on the (df, gram) order: each doc probes with its
    * 3 globally-rarest shingles (only those with df ≤ 200 — rarer ones
    * cannot match the index) against a df≤200 occurrence index, with at
    * most 64 probers kept per gram — per-gram candidate fan-out is thus
    * deterministically ≤ 64×200 regardless of corpus clustering. */
  val d17Containment = Q("d17_containment_pairs",
    Some(s"""WITH tt AS (SELECT doc_id, text, ${OracleSql.toksSql} AS toks FROM documents),
            src AS (SELECT a.doc_id AS id,
                CASE WHEN a.doc_id % 23 = 0 AND b.doc_id IS NOT NULL
                     THEN array_to_string(b.toks[1:CAST(greatest((len(b.toks) * 2) // 5, 3) AS BIGINT)], ' ')
                     ELSE a.text END AS text
              FROM tt a LEFT JOIN tt b ON b.doc_id = a.doc_id - 1),
            t2 AS (SELECT id, ${OracleSql.toksSql} AS toks FROM src),
            g AS (SELECT id, ${OracleSql.shinglesSql(3)} AS grams FROM t2),
            ex AS (SELECT id, unnest(grams) AS gram FROM g),
            freq AS (SELECT gram, count(*) AS df FROM ex GROUP BY gram),
            keyed AS (SELECT id, df, concat(lpad(CAST(df AS VARCHAR), 10, '0'), chr(1), gram) AS k
                      FROM ex JOIN freq USING (gram)),
            probes AS (SELECT id, unnest(array_slice(list_sort(list(k)), 1, 3)) AS k2
                       FROM keyed GROUP BY id),
            pf AS (SELECT id, substr(k2, 12) AS gram FROM probes
                   WHERE CAST(substr(k2, 1, 10) AS BIGINT) <= 200),
            pcap AS (SELECT gram, unnest(array_slice(list_sort(list(id)), 1, 64)) AS pid
                     FROM pf GROUP BY gram),
            idx AS (SELECT id, substr(k, 12) AS gram FROM keyed WHERE df <= 200),
            cand AS (SELECT DISTINCT least(a.pid, b.id) AS id_a, greatest(a.pid, b.id) AS id_b
                     FROM pcap a JOIN idx b ON a.gram = b.gram AND a.pid <> b.id),
            v AS (SELECT id_a, id_b,
                CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_shared,
                CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) / CAST(len(ga.grams) AS DOUBLE) AS ca,
                CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) / CAST(len(gb.grams) AS DOUBLE) AS cb
              FROM cand JOIN g ga ON ga.id = id_a JOIN g gb ON gb.id = id_b)
            SELECT id_a, id_b, n_shared, round(ca, 6) AS cont_a_in_b, round(cb, 6) AS cont_b_in_a
            FROM v WHERE greatest(ca, cb) >= 0.9 ORDER BY id_a, id_b"""),
    (s, d) => {
      val tt = documents(s, d).select(col("doc_id"), col("text"),
        graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      val prev = tt.select((col("doc_id") + 1).as("doc_id"),
        col("toks").as("ptoks"), lit(1).as("_has"))
      val planted = tt.join(prev, Seq("doc_id"), "left")
        .select(col("doc_id").as("id"),
          when(col("doc_id") % 23 === 0 && col("_has").isNotNull,
            array_join(slice(col("ptoks"), lit(1),
              greatest(floor((size(col("ptoks")) * 2) / lit(5)), lit(3)).cast("int")), " "))
            .otherwise(col("text")).as("text"))
      Dedup.containmentPairs(planted, "id", "text", w = 3, probeK = 3,
          indexDfCap = 200, threshold = 0.9, probeCap = 64)
        .orderBy("id_a", "id_b")
    })

  /** SKEW DRILL ([[graft.ops.Dedup.bucketRepDedup]]) — the dedup family
    * under a Zipfian corpus: every 5th doc (20% of the corpus, all on one
    * host) is a boilerplate-template near-dup of every other (7 variants,
    * cross-variant Jaccard 0.8; same-variant exact), synthesized from
    * doc_id arithmetic so the oracle replays the corpus byte-for-byte.
    * At sf0.1 that is a single ~1000-doc near-dup cluster — the shape
    * that makes pair-emitting LSH chains materialize O(cluster²)
    * candidates. The gated operator never enumerates pairs: bucket→min
    * aggregate, one rep per doc, one verify per doc — output stays O(N)
    * regardless of cluster size (the k1-salting story applied to dedup).
    * A wrong bucket min, a dropped variant, or a rep-chain slip changes
    * rep assignments and hash-fails. */
  val d20SkewedDedup = Q("d20_skewed_dedup",
    Some(s"""WITH src AS (SELECT doc_id AS id,
              CASE WHEN doc_id % 5 = 0
                THEN concat('mega boiler plate body text alpha beta gamma delta tail ',
                  CAST(doc_id % 7 AS VARCHAR))
                ELSE concat('doc ', CAST(doc_id AS VARCHAR), ' unique content token',
                  CAST(doc_id % 11 AS VARCHAR), ' filler', CAST(doc_id % 13 AS VARCHAR)) END AS text,
              CASE WHEN doc_id % 5 = 0 THEN 'mega.example'
                ELSE concat('h', CAST(doc_id % 97 AS VARCHAR), '.example') END AS host
            FROM documents),
            ${OracleSql.bandedCtes("", "src", 3, 6, 2)},
            reps AS (SELECT band, min(id) AS rep FROM bands GROUP BY band),
            cand AS (SELECT b.id AS id, min(r.rep) AS rep_id
                     FROM bands b JOIN reps r USING (band)
                     WHERE r.rep <> b.id GROUP BY b.id),
            v AS (SELECT c.id, c.rep_id, ${OracleSql.jaccSql} AS jacc
                  FROM cand c JOIN sh a ON a.id = c.id JOIN sh b ON b.id = c.rep_id)
            SELECT s.id AS doc_id, s.host, v.rep_id, round(v.jacc, 6) AS jacc,
              coalesce(v.jacc >= 0.7, false) AS is_dup
            FROM src s LEFT JOIN v ON v.id = s.id ORDER BY doc_id"""),
    (s, d) => {
      val src = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("mega boiler plate body text alpha beta gamma delta tail "),
            (col("doc_id") % 7).cast("string")))
          .otherwise(concat(lit("doc "), col("doc_id").cast("string"),
            lit(" unique content token"), (col("doc_id") % 11).cast("string"),
            lit(" filler"), (col("doc_id") % 13).cast("string"))).as("text"),
        when(col("doc_id") % 5 === 0, "mega.example")
          .otherwise(concat(lit("h"), (col("doc_id") % 97).cast("string"),
            lit(".example"))).as("host"))
      Dedup.bucketRepDedup(src, "doc_id", col("text"),
          shingleWidth = 3, numHashes = 6, rowsPerBand = 2, threshold = 0.7)
        .join(src.select(col("doc_id").as("id"), col("host")), Seq("id"))
        .select(col("id").as("doc_id"), col("host"), col("rep_id"),
          round(col("jacc"), 6).as("jacc"), col("is_dup"))
        .orderBy("doc_id")
    })

  /** Text-analysis fingerprint + quality score. */
  val x4Fingerprint = Q("x4_doc_fingerprint",
    Some(s"""WITH t AS (SELECT doc_id AS id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT id, ${OracleSql.shinglesSql(4)} AS shingles FROM t)
            SELECT id AS doc_id, list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS fp
            FROM sh ORDER BY doc_id"""),
    (s, d) => TextAnalysis.spreadSmallInput(documents(s, d)) // §2.5: map-only
      // shingle+md5 compute otherwise serializes on the one-task scan
      .select(col("doc_id"), TextAnalysis.fingerprint(lower(col("text")), 4).as("fp"))
      .orderBy("doc_id"))

  /** Multimodal plumbing: opaque binary column + typed metadata — byte
    * length and sha256 computed on the binary payload. */
  val m1Binary = Q("m1_binary_metadata",
    Some("""SELECT doc_id, length(text) AS n_bytes, sha256(text) AS digest,
              CASE WHEN length(text) > 300 THEN 'large' ELSE 'small' END AS size_class
            FROM documents ORDER BY doc_id"""),
    (s, d) => documents(s, d)
      .select(col("doc_id"),
        length(col("text")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("digest"),
        when(length(col("text")) > 300, "large").otherwise("small").as("size_class"))
      .orderBy("doc_id"))

  /** Multimodal decoder, oracle-gated end-to-end: REAL image byte headers
    * (PNG big-endian IHDR, GIF little-endian logical screen, plus garbage
    * payloads) are synthesized from doc_id arithmetic, then
    * `Multimodal.imageDims` must recover the planted dimensions from the
    * raw bytes — the oracle knows only the arithmetic, so any decoder
    * offset/endianness bug hash-fails the gate. */
  val m2ImageDims = Q("m2_image_dims",
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 5 = 0 THEN NULL
                   WHEN doc_id % 6 = 0 THEN 'jpeg'
                   WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format,
              CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(doc_id % 1000 + 1 AS INT) END AS width,
              CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST((doc_id * 3) % 800 + 1 AS INT) END AS height
            FROM documents ORDER BY doc_id"""),
    (s, d) => {
      val w = (col("doc_id") % 1000 + 1).cast("int")
      val h = ((col("doc_id") * 3) % 800 + 1).cast("int")
      def le16(v: org.apache.spark.sql.Column) = {
        val bx = lpad(hex(v), 4, "0")
        concat(substring(bx, 3, 2), substring(bx, 1, 2))
      }
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"))
      val gifHex = concat(lit("474946383961"), le16(w), le16(h))
      // JPEG with the SOF0 at a doc-dependent VARIABLE offset: SOI, a full
      // 16-byte JFIF APP0, then a COM segment of doc_id%7+1 filler bytes —
      // so the decoder's marker walk (not a fixed-offset read) is what the
      // oracle's expected dims actually gate
      val jpegHex = concat(
        lit("FFD8" + "FFE000104A46494600010100000100010000" + "FFFE"),
        lpad(hex(col("doc_id") % 7 + 3), 4, "0"),
        expr("repeat('41', CAST(doc_id % 7 + 1 AS INT))"),
        lit("FFC0" + "0011" + "08"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("03" + "011100021100031100"))
      val payload = when(col("doc_id") % 5 === 0, unhex(lit("DEADBEEF")))
        .when(col("doc_id") % 6 === 0, unhex(jpegHex))
        .when(col("doc_id") % 2 === 0, unhex(pngHex))
        .otherwise(unhex(gifHex))
      // native compiled decoder (one byte walk per row); the Column-tree
      // form it replaced needed the payload pre-bound to an attribute to
      // avoid ~70 re-inlined copies of the synthesis chain — kept bound
      // anyway so the fixture builder runs once per row
      documents(s, d)
        .withColumn("payload", payload)
        .withColumn("d", graft.ops.Multimodal.imageDimsNative(col("payload")))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"))
        .orderBy("doc_id")
    })

  /** Embedding outliers: squared distance to the corpus centroid flagged
    * beyond mean+2σ — the corrupt-point filter SemDeDup doesn't cover
    * (d9 drops points NEAR neighbors; this flags points FAR from
    * everything). The distance runs as ONE fixed-order compiled fold per
    * row (centered vector dotted with itself against the broadcast
    * centroid array) — per-term DECIMAL casts measurably drift between
    * engines at 1 ulp, a fixed-order fold doesn't (see the op's drift
    * note); DECIMAL stays on the cross-partition aggregates only. */
  val d14Outliers = Q("d14_embedding_outliers",
    Some("""WITH comp AS (SELECT vec_id,
                generate_subscripts(embedding, 1) - 1 AS i,
                unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
              FROM embeddings),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
            mu AS (SELECT i, CAST(sum(CAST(x AS DECIMAL(25,15))) AS DOUBLE) / n AS mu
                   FROM comp CROSS JOIN nn GROUP BY i, n),
            ma AS (SELECT list(mu ORDER BY i) AS mu_arr FROM mu),
            d2 AS (SELECT vec_id, round(list_dot_product(df, df), 6) AS d2 FROM (
                SELECT vec_id, list_transform(range(1, 65),
                    i -> CAST(embedding[i] AS DOUBLE) - mu_arr[i]) AS df
                FROM embeddings CROSS JOIN ma) t),
            st AS (SELECT CAST(sum(CAST(d2 AS DECIMAL(25,15))) AS DOUBLE) / count(*) AS m,
                CAST(sum(CAST(d2 * d2 AS DECIMAL(25,15))) AS DOUBLE) / count(*) AS m2
              FROM d2)
            SELECT vec_id, d2 AS dist2,
              d2 > m + 2.0 * sqrt(m2 - m * m) AS is_outlier
            FROM d2 CROSS JOIN st ORDER BY vec_id"""),
    (s, d) => graft.ops.Cluster.centroidOutliers(embeddings(s, d), "vec_id", "embedding",
        dim = 64, sigmas = 2.0)
      .orderBy("vec_id"))

  /** REAL TIFF dimension decode, BOTH endiannesses: every even doc_id is
    * an "II" little-endian file, every odd a "MM" big-endian one — the
    * same IFD walked under both byte orders. The IFD offset varies
    * (doc_id%5 pad bytes), a dummy tag-254 entry precedes the dims (the
    * scan must skip it), and ImageWidth alternates between SHORT
    * (left-justified value field) and LONG types. Every 11th doc carries
    * a bad magic and must fail to null, never garbage. */
  val m6TiffDims = Q("m6_tiff_dims",
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 'tiff' END AS format,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE CAST(doc_id % 500 + 1 AS INT) END AS width,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE CAST((doc_id * 7) % 400 + 1 AS INT) END AS height
            FROM documents ORDER BY doc_id"""),
    (s, d) => {
      val isLe = col("doc_id") % 2 === 0
      def hx(v: org.apache.spark.sql.Column, bytes: Int) = lpad(hex(v), bytes * 2, "0")
      def swap(h: org.apache.spark.sql.Column, bytes: Int) =
        concat((bytes - 1 to 0 by -1).map(i => substring(h, i * 2 + 1, 2)): _*)
      def num(v: org.apache.spark.sql.Column, bytes: Int) =
        when(isLe, swap(hx(v, bytes), bytes)).otherwise(hx(v, bytes))
      def numL(v: Long, bytes: Int) = num(lit(v), bytes)
      val w = (col("doc_id") % 500 + 1).cast("long")
      val h = ((col("doc_id") * 7) % 400 + 1).cast("long")
      val pad = (col("doc_id") % 5).cast("int")
      val widthShort = col("doc_id") % 3 === 0
      val e254 = concat(numL(254, 2), numL(4, 2), numL(1, 4), numL(0, 4))
      val e256 = concat(numL(256, 2),
        when(widthShort, numL(3, 2)).otherwise(numL(4, 2)), numL(1, 4),
        when(widthShort, concat(num(w, 2), lit("0000"))).otherwise(num(w, 4)))
      val e257 = concat(numL(257, 2), numL(4, 2), numL(1, 4), num(h, 4))
      val tiffHex = concat(
        when(isLe, "49492A00").otherwise("4D4D002A"),
        num(lit(8) + pad, 4),                  // IFD offset (0-based)
        expr("repeat('00', CAST(doc_id % 5 AS INT))"),
        numL(3, 2), e254, e256, e257, lit("00000000"))
      val payload = when(col("doc_id") % 11 === 0, unhex(lit("49494242"))) // bad magic
        .otherwise(unhex(tiffHex))
      documents(s, d)
        .withColumn("payload", payload)
        .withColumn("dm", graft.ops.Multimodal.imageDimsNative(col("payload")))
        .select(col("doc_id"), col("dm.format").as("format"),
          col("dm.width").as("width"), col("dm.height").as("height"))
        .orderBy("doc_id")
    })

  /** Distributed PCA (power iteration) over the embedding corpus: the
    * top principal direction of the first 16 components + its eigenvalue
    * — the compression/whitening pass a dense-retrieval index runs before
    * quantization (v5-v7's PQ/SQ are the codebook side of the same
    * family). Covariance is ONE DECIMAL-exact aggregate (O(N·d²) exploded
    * rows, no cross join); the 5 iterations touch only the 16×16
    * covariance frame. The oracle replays covariance AND all five
    * iterations as a generated unrolled CTE chain (the pr1/tok2
    * convention); iterated vectors are 12-dp-rounded so both engines see
    * bit-identical values each round. */
  val v8PcaTop: Q = {
    val dim = 16; val iters = 5
    val iterCtes = (1 to iters).map { k =>
      s"""w$k AS (SELECT c.i, CAST(sum(CAST(c.cov * v.v AS DECIMAL(25,15))) AS DOUBLE) AS w
                 FROM cov c JOIN v${k - 1} v ON v.i = c.j GROUP BY c.i),
            n$k AS (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(25,15))) AS DOUBLE)) AS nrm FROM w$k),
            v$k AS (SELECT i, round(w / nrm, 12) AS v FROM w$k CROSS JOIN n$k)"""
    }.mkString(",\n            ")
    Q("v8_pca_top_component",
      Some(s"""WITH comp AS (
              SELECT vec_id,
                generate_subscripts(embedding[1:$dim], 1) - 1 AS i,
                unnest(list_transform(embedding[1:$dim], x -> CAST(x AS DOUBLE))) AS x
              FROM embeddings),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
            mu AS (SELECT i, CAST(sum(CAST(x AS DECIMAL(25,15))) AS DOUBLE) / n AS mu
                   FROM comp CROSS JOIN nn GROUP BY i, n),
            cen AS (SELECT vec_id, i, x - mu AS cx FROM comp JOIN mu USING (i)),
            cov AS (SELECT a.i AS i, b.i AS j,
                      CAST(sum(CAST(a.cx * b.cx AS DECIMAL(25,15))) AS DOUBLE) / n AS cov
                    FROM cen a JOIN cen b ON a.vec_id = b.vec_id CROSS JOIN nn
                    GROUP BY a.i, b.i, n),
            v0 AS (SELECT CAST(i AS INT) AS i, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS v
                   FROM range(0, $dim) r(i)),
            $iterCtes,
            wf AS (SELECT c.i, CAST(sum(CAST(c.cov * v.v AS DECIMAL(25,15))) AS DOUBLE) AS w
                   FROM cov c JOIN v$iters v ON v.i = c.j GROUP BY c.i),
            lam AS (SELECT CAST(sum(CAST(v.v * w.w AS DECIMAL(25,15))) AS DOUBLE) AS lam
                    FROM v$iters v JOIN wf w USING (i))
            SELECT CAST(v.i AS BIGINT) AS dim_idx, round(v.v, 6) AS loading,
              round(lam, 6) AS eigenvalue
            FROM v$iters v CROSS JOIN lam ORDER BY dim_idx"""),
      (s, d) => {
        // NOT spread: measured +37% (r16 A/B) — the covariance pass is
        // dominated by its (i, j) aggregate shuffle, not the scan stage
        val cov = graft.index.Pca.covariance(embeddings(s, d), "vec_id", "embedding", dim)
        val v = graft.index.Pca.powerIteration(cov, dim, iters)
        val wf = graft.index.Pca.matvec(cov, v)
        val lam = v.join(wf, "i")
          .agg(sum((col("v") * col("w")).cast("decimal(25,15)")).cast("double").as("lam"))
        v.crossJoin(broadcast(lam))
          .select(col("i").cast("long").as("dim_idx"), round(col("v"), 6).as("loading"),
            round(col("lam"), 6).as("eigenvalue"))
          .orderBy("dim_idx")
      })
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    * SIGIR'09): BM25 top-20 and dense top-20 (dot product vs the vec_id=0
    * query vector) fused by `sum 1/(60+rank)` over a full outer join —
    * a doc ranked by only one retriever still fuses. Both rank
    * derivations are bounded broadcast self-joins (`broadcastTopRank`),
    * so after each retriever's own scale-safe candidate cut the fusion
    * touches only O(N) rows; ranks are integers so the fused score is
    * bit-exact in any engine. */
  val rrf1Hybrid: Q = {
    val terms = Seq("spark", "join", "stream")
    val k1 = 1.2; val b = 0.75; val n = 20; val k0 = 60
    val dfsSql = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
    }.mkString(", ")
    val tfsSql = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf_$i"
    }.mkString(", ")
    val termSql = terms.indices.map { i =>
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
           * (tf_$i * ${k1 + 1.0}) / (tf_$i + $k1 * ((1.0 - $b) + $b * dl / avgdl))"""
    }.mkString(" + ")
    Q("rrf1_hybrid_topk",
      Some(s"""WITH t AS (SELECT doc_id, ${graft.queries.OracleSql.toksSql} AS toks FROM documents),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl, $dfsSql FROM t),
            d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, $tfsSql FROM t),
            lex AS (SELECT doc_id, round($termSql, 6) AS bm25 FROM d CROSS JOIN stats),
            lext AS (SELECT doc_id, bm25 FROM lex WHERE bm25 > 0.0
                     ORDER BY bm25 DESC, doc_id LIMIT $n),
            lexr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_a FROM lext),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            vs AS (SELECT vec_id AS doc_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
              FROM embeddings, q),
            vect AS (SELECT doc_id, score FROM vs ORDER BY score DESC, doc_id LIMIT $n),
            vecr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_b FROM vect)
            SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.rank_a, v.rank_b,
              coalesce(CAST(1.0 AS DOUBLE) / (CAST($k0.0 AS DOUBLE) + CAST(rank_a AS DOUBLE)), CAST(0.0 AS DOUBLE))
              + coalesce(CAST(1.0 AS DOUBLE) / (CAST($k0.0 AS DOUBLE) + CAST(rank_b AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf
            FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
            ORDER BY rrf DESC, doc_id"""),
      (s, d) => {
        val lex = graft.index.Bm25.topK(documents(s, d), "doc_id", "text", terms, k = n, k1 = k1, b = b)
        val lexRank = graft.ops.TableOps.broadcastTopRank(lex, "bm25", "doc_id", n)
          .select(col("doc_id"), col("rank"))
        val emb = embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val vec = emb.crossJoin(broadcast(q))
          .select(col("vec_id").as("doc_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        val vecRank = graft.ops.TableOps.broadcastTopRank(vec, "score", "doc_id", n)
          .select(col("doc_id"), col("rank"))
        graft.index.Fusion.rrf(lexRank, vecRank, "doc_id", "rank", k0)
          .orderBy(col("rrf").desc, col("doc_id"))
      })
  }

  /** MMR diversified top-5 (Carbonell/Goldstein, SIGIR'98) over the dense
    * top-12 candidates: greedy argmax of `0.7*rel - 0.3*max-sim-to-
    * selected`, every sim and step score 6-dp-rounded before comparison
    * (ties → id asc) so both engines select identically. The oracle
    * replays all 5 greedy steps as an unrolled CTE chain (the v8/tok2
    * convention); candidate cut and the N×N sim matrix are bounded, so
    * corpus scale never enters the loop. */
  val mmr1Diverse: Q = {
    val nCand = 12; val k = 5; val lambda = 0.7
    val oneMinus = (1.0 - lambda).toString
    val simExpr =
      """round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)"""
    val steps = (2 to k).map { i =>
      s"""p$i AS (SELECT c.vec_id, round($lambda * c.rel - $oneMinus * coalesce(mx.pen, CAST(0.0 AS DOUBLE)), 6) AS mmr
              FROM cand c
              LEFT JOIN (SELECT i AS vec_id, max(sim) AS pen FROM sims
                         JOIN sel${i - 1} s ON sims.j = s.vec_id GROUP BY i) mx USING (vec_id)
              WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
              ORDER BY mmr DESC, vec_id LIMIT 1),
            sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT $i AS step, vec_id, mmr FROM p$i)"""
    }.mkString(",\n            ")
    Q("mmr1_diverse_topk",
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            vs AS (SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS rel,
                embedding
              FROM embeddings, q),
            cand AS (SELECT vec_id, rel, embedding FROM vs ORDER BY rel DESC, vec_id LIMIT $nCand),
            sims AS (SELECT a.vec_id AS i, b.vec_id AS j, $simExpr AS sim
                     FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
            p1 AS (SELECT vec_id, round($lambda * rel, 6) AS mmr FROM cand
                   ORDER BY mmr DESC, vec_id LIMIT 1),
            sel1 AS (SELECT 1 AS step, vec_id, mmr FROM p1),
            $steps
            SELECT CAST(step AS INT) AS step, vec_id, mmr FROM sel$k ORDER BY step"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val cands = emb.crossJoin(broadcast(q))
          .select(col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("rel"),
            col("embedding"))
          .orderBy(col("rel").desc, col("vec_id")).limit(nCand)
        graft.index.Fusion.mmr(cands, "vec_id", "rel", "embedding", k, lambda)
          .select(col("step").cast("int").as("step"), col("vec_id"), col("mmr"))
          .orderBy("step")
      })
  }

  /** The FULL production retrieval stack composed as one gated DAG —
    * what a real RAG user actually runs (ref `rag.py` steps 3–5 made
    * hybrid): BM25 lexical top-20 (b1) ⊕ dense top-20 (v2) → RRF fusion
    * (rrf1) → top-8 fused candidates → MMR diversified top-4 (mmr1) →
    * relevance gate (p7's overlap-or-high-score rule). Every stage is
    * individually hash-gated elsewhere; this row gates the COMPOSITION —
    * rank handoffs, id alignment between the lexical and vector spaces,
    * and the filter running on post-diversification rows. The oracle
    * replays all four stages (BM25 closed form, full-outer RRF, unrolled
    * greedy MMR, overlap gate) from scratch. Scale shape: corpus-side
    * work is one BM25 stats pass + one ANN probe; everything after the
    * two top-20 cuts touches ≤ 20 rows. */
  val ask4Hybrid: Q = {
    val terms = Seq("spark", "join", "stream")
    val k1 = 1.2; val b = 0.75; val n = 20; val k0 = 60
    val nCand = 8; val k = 4; val lambda = 0.7
    val oneMinus = (1.0 - lambda).toString
    val dfsSql = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
    }.mkString(", ")
    val tfsSql = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf_$i"
    }.mkString(", ")
    val termSql = terms.indices.map { i =>
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
           * (tf_$i * ${k1 + 1.0}) / (tf_$i + $k1 * ((1.0 - $b) + $b * dl / avgdl))"""
    }.mkString(" + ")
    val simExpr =
      """round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)"""
    val steps = (2 to k).map { i =>
      s"""p$i AS (SELECT c.vec_id, round($lambda * c.rel - $oneMinus * coalesce(mx.pen, CAST(0.0 AS DOUBLE)), 6) AS mmr
              FROM cand c
              LEFT JOIN (SELECT i AS vec_id, max(sim) AS pen FROM sims
                         JOIN sel${i - 1} s ON sims.j = s.vec_id GROUP BY i) mx USING (vec_id)
              WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
              ORDER BY mmr DESC, vec_id LIMIT 1),
            sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT $i AS step, vec_id, mmr FROM p$i)"""
    }.mkString(",\n            ")
    val ovSql = s"len(list_intersect([${terms.map(t => s"'$t'").mkString(", ")}], " +
      "list_distinct(string_split_regex(lower(d.text), '\\s+'))))"
    Q("ask4_hybrid",
      Some(s"""WITH t AS (SELECT doc_id, ${graft.queries.OracleSql.toksSql} AS toks FROM documents),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl, $dfsSql FROM t),
            dd AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, $tfsSql FROM t),
            lex AS (SELECT doc_id, round($termSql, 6) AS bm25 FROM dd CROSS JOIN stats),
            lext AS (SELECT doc_id, bm25 FROM lex WHERE bm25 > 0.0
                     ORDER BY bm25 DESC, doc_id LIMIT $n),
            lexr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_a FROM lext),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            vs AS (SELECT vec_id AS doc_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
              FROM embeddings, q),
            vect AS (SELECT doc_id, score FROM vs ORDER BY score DESC, doc_id LIMIT $n),
            vecr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_b FROM vect),
            fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                coalesce(CAST(1.0 AS DOUBLE) / (CAST($k0.0 AS DOUBLE) + CAST(rank_a AS DOUBLE)), CAST(0.0 AS DOUBLE))
                + coalesce(CAST(1.0 AS DOUBLE) / (CAST($k0.0 AS DOUBLE) + CAST(rank_b AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf
              FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id),
            cand0 AS (SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT $nCand),
            cand AS (SELECT c.doc_id AS vec_id, round(c.rrf, 6) AS rrf,
                round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS rel,
                e.embedding
              FROM cand0 c JOIN embeddings e ON e.vec_id = c.doc_id CROSS JOIN q),
            sims AS (SELECT a.vec_id AS i, b.vec_id AS j, $simExpr AS sim
                     FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
            p1 AS (SELECT vec_id, round($lambda * rel, 6) AS mmr FROM cand
                   ORDER BY mmr DESC, vec_id LIMIT 1),
            sel1 AS (SELECT 1 AS step, vec_id, mmr FROM p1),
            $steps
            SELECT CAST(s.step AS INT) AS step, s.vec_id AS doc_id, c.rrf, c.rel, s.mmr,
              CAST($ovSql AS BIGINT) AS overlap
            FROM sel$k s
            JOIN cand c ON c.vec_id = s.vec_id
            JOIN documents d ON d.doc_id = s.vec_id
            WHERE $ovSql >= 1 OR c.rel >= 0.75
            ORDER BY step"""),
      (s, d) => {
        val lex = graft.index.Bm25.topK(documents(s, d), "doc_id", "text", terms, k = n, k1 = k1, b = b)
        val lexRank = graft.ops.TableOps.broadcastTopRank(lex, "bm25", "doc_id", n)
          .select(col("doc_id"), col("rank"))
        val emb = embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val vec = emb.crossJoin(broadcast(q))
          .select(col("vec_id").as("doc_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        val vecRank = graft.ops.TableOps.broadcastTopRank(vec, "score", "doc_id", n)
          .select(col("doc_id"), col("rank"))
        val fused = graft.index.Fusion.rrf(lexRank, vecRank, "doc_id", "rank", k0)
        val cand0 = fused.orderBy(col("rrf").desc, col("doc_id")).limit(nCand)
        val cands = cand0.join(emb, cand0("doc_id") === emb("vec_id"))
          .crossJoin(broadcast(q))
          .select(cand0("doc_id"), round(col("rrf"), 6).as("rrf"),
            round(Embed.dot(col("embedding"), col("qv")), 6).as("rel"), col("embedding"))
        val sel = graft.index.Fusion.mmr(cands, "doc_id", "rel", "embedding", k, lambda)
        val docs = documents(s, d).select(col("doc_id"),
          graft.index.Rerank.keywordOverlap(col("text"), lit(terms.mkString(" ")), Seq("zzzz"))
            .cast("long").as("overlap"))
        sel.join(cands.select("doc_id", "rrf", "rel"), Seq("doc_id"))
          .join(docs, Seq("doc_id"))
          .filter(col("overlap") >= 1 || col("rel") >= 0.75)
          .select(col("step").cast("int").as("step"), col("doc_id"), col("rrf"), col("rel"),
            col("mmr"), col("overlap"))
          .orderBy("step")
      })
  }

  /** REAL RIFF/WAV metadata decode (the m2 contract for audio): payloads
    * are synthesized from doc_id arithmetic — every 4th doc hides the
    * `fmt ` chunk behind a JUNK chunk of doc-dependent ODD/even size (so
    * the decoder's chunk walk and RIFF word-alignment padding are what
    * the oracle's expected fields actually gate), every 9th is garbage →
    * NULL. The oracle knows only the arithmetic; an endianness or
    * offset bug in `Multimodal.wavMeta` hash-fails. */
  val m5WavMeta = Q("m5_wav_meta",
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(doc_id % 48000 + 8000 AS INT) END AS sample_rate,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(doc_id % 2 + 1 AS INT) END AS channels,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST((doc_id % 3 + 1) * 8 AS INT) END AS bits
            FROM documents ORDER BY doc_id"""),
    (s, d) => {
      def le16(v: org.apache.spark.sql.Column) = {
        val bx = lpad(hex(v), 4, "0")
        concat(substring(bx, 3, 2), substring(bx, 1, 2))
      }
      def le32(v: org.apache.spark.sql.Column) = {
        val bx = lpad(hex(v), 8, "0")
        concat(substring(bx, 7, 2), substring(bx, 5, 2),
          substring(bx, 3, 2), substring(bx, 1, 2))
      }
      val rate = col("doc_id") % 48000 + 8000
      val channels = col("doc_id") % 2 + 1
      val bytesPerSample = col("doc_id") % 3 + 1 // bits = ×8, kept integral
      val blockAlign = channels * bytesPerSample
      val junkLen = col("doc_id") % 7 + 1
      val junkHex = concat(lit("4A554E4B"), le32(junkLen),
        expr("repeat('AB', CAST(doc_id % 7 + 1 AS INT))"),
        when(junkLen % 2 === 1, lit("00")).otherwise(lit(""))) // RIFF odd-size pad
      val fmtHex = concat(lit("666D7420"), le32(lit(16)), le16(lit(1)), le16(channels),
        le32(rate), le32(rate * blockAlign), le16(blockAlign), le16(bytesPerSample * 8))
      val wavHex = concat(lit("52494646"), le32(lit(100)), lit("57415645"),
        when(col("doc_id") % 4 === 0, junkHex).otherwise(lit("")), fmtHex)
      val payload = when(col("doc_id") % 9 === 0, unhex(lit("BADC0FFE")))
        .otherwise(unhex(wavHex))
      // payload bound to an attribute first — the m2 plan-blowup lesson
      documents(s, d)
        .withColumn("payload", payload)
        .withColumn("w", graft.ops.Multimodal.wavMeta(col("payload")))
        .select(col("doc_id"), col("w.sample_rate").as("sample_rate"),
          col("w.channels").as("channels"), col("w.bits").as("bits"))
        .orderBy("doc_id")
    })

  /** REAL MP4/ISO-BMFF metadata decode (the m5 contract for video):
    * payloads synthesized from doc_id arithmetic exercise the walk's
    * hard branches — every 4th doc uses the metadata-at-end layout
    * (`free` + `mdat` BEFORE `moov`, so the top-level hop must skip by
    * declared sizes), every 5th doc's mdat uses the 64-bit largesize
    * encoding (`size == 1`), mvhd alternates version 0/1 by parity (32-
    * vs 64-bit duration at different offsets), and every 9th is garbage
    * → NULL. The oracle knows only the arithmetic; an offset, version,
    * or box-skip bug in `Multimodal.mp4Meta` hash-fails. */
  val m8Mp4Meta = Q("m8_mp4_meta",
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(doc_id % 1000 + 600 AS INT) END AS timescale,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(doc_id % 100000 + 500 AS BIGINT) END AS duration,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(doc_id % 3 + 1 AS INT) END AS n_tracks
            FROM documents ORDER BY doc_id"""),
    (s, d) => {
      def be(v: org.apache.spark.sql.Column, bytes: Int) = lpad(hex(v), bytes * 2, "0")
      val ts = col("doc_id") % 1000 + 600
      val dur = col("doc_id") % 100000 + 500
      val nTraks = col("doc_id") % 3 + 1
      val v1 = col("doc_id") % 2 === 1
      // mvhd: v0 = 108 bytes (4B ver/flags, 4B+4B times, 4B ts, 4B dur,
      // 80B rate/volume/matrix tail zero-padded); v1 = 120 (8B times, 8B dur)
      val mvhdHex = when(v1,
          concat(be(lit(120), 4), lit("6D766864"), lit("01000000"),
            expr("repeat('00', 16)"), be(ts, 4), be(dur, 8), expr("repeat('00', 80)")))
        .otherwise(
          concat(be(lit(108), 4), lit("6D766864"), lit("00000000"),
            expr("repeat('00', 8)"), be(ts, 4), be(dur, 4), expr("repeat('00', 80)")))
      val mvhdSize = when(v1, 120).otherwise(108)
      val traksHex = expr("repeat('000000087472616B', CAST(doc_id % 3 + 1 AS INT))")
      val moovHex = concat(be(mvhdSize + nTraks * 8 + 8, 4), lit("6D6F6F76"), mvhdHex, traksHex)
      val ftypHex = lit("000000106674797069736F6D00000000")
      val freeN = col("doc_id") % 7 + 1
      val freeHex = concat(be(freeN + 8, 4), lit("66726565"),
        expr("repeat('AB', CAST(doc_id % 7 + 1 AS INT))"))
      val mdatHex = when(col("doc_id") % 5 === 0,
          concat(lit("000000016D646174"), be(lit(20), 8), lit("DEADBEEF")))
        .otherwise(lit("0000000C6D646174DEADBEEF"))
      val mp4Hex = when(col("doc_id") % 4 === 0,
          concat(ftypHex, freeHex, mdatHex, moovHex))
        .otherwise(concat(ftypHex, moovHex, mdatHex))
      val payload = when(col("doc_id") % 9 === 0, unhex(lit("BADC0FFE")))
        .otherwise(unhex(mp4Hex))
      documents(s, d)
        .withColumn("payload", payload)
        .withColumn("m", graft.ops.Multimodal.mp4Meta(col("payload")))
        .select(col("doc_id"), col("m.timescale").as("timescale"),
          col("m.duration").as("duration"), col("m.n_tracks").as("n_tracks"))
        .orderBy("doc_id")
    })

  /** V2 scale path: SRP-LSH bucketed top-k. The oracle SQL is generated
    * from the same deterministic hyperplanes (seed 42) the Spark side uses,
    * baked in as literals — both engines compute identical bucket ids, so
    * the candidate set (and thus the exact re-ranking) matches. */
  /** THE seed-42 SRP hyperplanes — single construction shared by v3 and
    * v3b so both provably hash into one bucket layout (matches
    * `Search.srpBucket(seed = 42)`). */
  private val srpPlanes: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(6)(Seq.fill(64)(rng.nextGaussian()))
  }

  val v3LshTopK: Q = {
    val dim = 64; val bits = 6
    val planes = srpPlanes
    def planeSql(p: Seq[Double]) = p.map(v => f"$v%.17g").mkString("[", ",", "]")
    val bucketSql = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    Q("v3_lsh_topk",
      Some(s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
               q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
               SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
               FROM b, q WHERE b.bucket = q.qb
               ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val qVec = transform(col("qv"), x => x.cast("double"))
        val bucketed = emb.crossJoin(broadcast(q))
          .withColumn("bucket", Search.srpBucket(col("embedding"), dim, bits))
        bucketed.filter(col("bucket") === Search.srpBucket(qVec, dim, bits))
          .select(col("vec_id"), round(Embed.dot(col("embedding"), qVec), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** V2 scale path #2: IVF-partitioned ANN — nearest-centroid cell
    * assignment, exact search restricted to the query's cell. Oracle SQL is
    * generated from the same seeded centroids; argmin tie-break (lower cell
    * id) is mirrored by the CASE/least chain. */
  /** Literal-array SQL for a centroid/hyperplane vector — 17 significant
    * digits round-trips any double exactly. */
  private def vecSql(c: Seq[Double]) = c.map(v => f"$v%.17g").mkString("[", ",", "]")

  /** THE seed-7 IVF centroids — single construction shared by v4, v4b and
    * v6 so the three queries provably use one index layout. */
  private val ivfCentroids: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(4)(Seq.fill(64)(rng.nextGaussian() * 0.05))
  }

  val v4IvfTopK: Q = {
    val dim = 64
    val centroids = ivfCentroids
    def cSql(c: Seq[Double]) = vecSql(c)
    def d2Sql(c: Seq[Double]) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> (e[i]::DOUBLE - (${cSql(c)})[i]) * (e[i]::DOUBLE - (${cSql(c)})[i])))"
    val dCols = centroids.zipWithIndex.map { case (c, i) => s"${d2Sql(c)} AS d$i" }.mkString(", ")
    val cellSql = """CASE WHEN d0 <= least(d1, d2, d3) THEN 0
                          WHEN d1 <= least(d2, d3) THEN 1
                          WHEN d2 <= d3 THEN 2 ELSE 3 END"""
    Q("v4_ivf_topk",
      Some(s"""WITH d AS (SELECT vec_id, embedding AS e, $dCols FROM embeddings),
               c AS (SELECT vec_id, e, $cellSql AS cell FROM d),
               q AS (SELECT e AS qv, cell AS qcell FROM c WHERE vec_id = 0)
               SELECT vec_id, round(list_dot_product(CAST(e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
               FROM c, q WHERE c.cell = q.qcell
               ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val qVec = transform(col("qv"), x => x.cast("double"))
        val celled = emb.crossJoin(broadcast(q))
          .withColumn("cell", Search.ivfCell(col("embedding"), centroids))
        celled.filter(col("cell") === Search.ivfCell(qVec, centroids))
          .select(col("vec_id"), round(Embed.dot(col("embedding"), qVec), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** IVF recall audit — d16's "grade your own approximation" discipline
    * applied to the ANN family: for a 20-query sample, exact brute-force
    * top-5 (self excluded) vs the v4 IVF nprobe=1 candidate top-5, per-
    * query hit count and recall@5. This is the number an operator of the
    * index watches before trusting v4/v6 at scale — and the fixture
    * regime (4 cells, near-isotropic embeddings) makes single-probe
    * recall genuinely imperfect, so the audit measures something real
    * rather than passing vacuously. Scale shape: the query sample is
    * bounded (broadcast both sides); exact ranking is one qid-partitioned
    * window over the Q×N frame (the b3 batched shape), IVF ranking only
    * over each query's own cell. */
  val v10IvfRecall: Q = {
    val dim = 64
    val centroids = ivfCentroids
    def cSql(c: Seq[Double]) = vecSql(c)
    def d2Sql(c: Seq[Double]) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> (e[i]::DOUBLE - (${cSql(c)})[i]) * (e[i]::DOUBLE - (${cSql(c)})[i])))"
    val dCols = centroids.zipWithIndex.map { case (c, i) => s"${d2Sql(c)} AS d$i" }.mkString(", ")
    val cellSql = """CASE WHEN d0 <= least(d1, d2, d3) THEN 0
                          WHEN d1 <= least(d2, d3) THEN 1
                          WHEN d2 <= d3 THEN 2 ELSE 3 END"""
    Q("v10_ivf_recall",
      Some(s"""WITH d AS (SELECT vec_id, embedding AS e, $dCols FROM embeddings),
            c AS (SELECT vec_id, e, $cellSql AS cell FROM d),
            q AS (SELECT vec_id AS qid, e AS qv, cell AS qcell FROM c WHERE vec_id < 20),
            ex AS (SELECT qid, c.vec_id,
                round(list_dot_product(CAST(e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
              FROM c CROSS JOIN q WHERE c.vec_id <> q.qid),
            exr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM ex) WHERE rn <= 5),
            iv AS (SELECT qid, c.vec_id,
                round(list_dot_product(CAST(e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
              FROM c JOIN q ON c.cell = q.qcell WHERE c.vec_id <> q.qid),
            ivr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM iv) WHERE rn <= 5),
            hits AS (SELECT e.qid, count(*) AS n_hit
              FROM exr e JOIN ivr i ON e.qid = i.qid AND e.vec_id = i.vec_id GROUP BY e.qid)
            SELECT q.qid AS query_id, CAST(coalesce(n_hit, 0) AS INT) AS n_hit,
              round(CAST(coalesce(n_hit, 0) AS DOUBLE) / 5.0, 2) AS recall_at_5
            FROM q LEFT JOIN hits ON hits.qid = q.qid ORDER BY query_id"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val celled = embeddings(s, d)
          .withColumn("cell", Search.ivfCell(col("embedding"), centroids))
        val q = celled.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cell").as("qcell"))
        def top5(scored: org.apache.spark.sql.DataFrame) = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("qid", "vec_id")
        val exact = top5(celled.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score")))
        val ivf = top5(celled.join(broadcast(q), col("cell") === col("qcell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score")))
        val hits = exact.join(ivf, Seq("qid", "vec_id")).groupBy("qid")
          .agg(count(lit(1)).as("n_hit"))
        q.select(col("qid")).join(hits, Seq("qid"), "left")
          .select(col("qid").as("query_id"),
            coalesce(col("n_hit"), lit(0L)).cast("int").as("n_hit"),
            round(coalesce(col("n_hit"), lit(0L)).cast("double") / 5.0, 2).as("recall_at_5"))
          .orderBy("query_id")
      })
  }

  /** Seed-11 8-cell centroid set for the multi-probe IVF family (the v10b
    * recall-vs-nprobe curve + the v4c probed stored read) — more cells than
    * the seed-7 four so the curve has room to climb before it degrades to
    * brute force at nprobe = #cells. */
  // non-private: AnnPruneSpec pins the stored-layout file counts against
  // THIS exact centroid set — a spec-local copy would keep passing against
  // stale geometry if the seed/scale/cell-count were ever tuned here
  val ivfCentroids8: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(11)
    Seq.fill(8)(Seq.fill(64)(rng.nextGaussian() * 0.05))
  }

  /** Shared oracle CTE prefix for the 8-cell IVF family: centroid VALUES
    * table → per-(vector, cell) squared distance → per-vector cell ranking
    * (ties → lower cell, the ivfCell/ivfProbeCells argmin rule) → the
    * rank-1 cell assignment. Generated from the SAME seeded centroids the
    * Spark side uses, so both engines provably share one index layout. */
  private def ivfRankedCtes(centroids: Seq[Seq[Double]]): String = {
    val centVals = centroids.zipWithIndex
      .map { case (c, i) => s"($i, CAST(${vecSql(c)} AS DOUBLE[]))" }
      .mkString(",\n              ")
    s"""cents(cell, cv) AS (VALUES $centVals),
            d AS (SELECT vec_id, embedding AS e FROM embeddings),
            dist AS (SELECT vec_id, e, cell,
                list_sum(list_transform(range(1, 65), i -> (e[i]::DOUBLE - cv[i]) * (e[i]::DOUBLE - cv[i]))) AS d2
              FROM d CROSS JOIN cents),
            ranked AS (SELECT vec_id, e, cell,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS crank FROM dist),
            assign AS (SELECT vec_id, e, cell FROM ranked WHERE crank = 1)"""
  }

  /** The multi-probe IVF tuning curve — the d19-style "grade your own
    * approximation" gate v10 called for: for the 20-query sample, recall@5
    * (vs exact brute force, self excluded) AND the scanned-row fraction at
    * nprobe ∈ {1, 2, 4, 6, 7, 8} over the 8-cell index. nprobe = 8 = all
    * cells degrades to brute force (recall exactly 1.0 — the machinery's
    * sanity anchor); the operator reads the knee of the curve to size
    * nprobe. On THIS fixture the knee is late (recall crosses 0.9 at
    * nprobe = 6): the driver embeddings are near-isotropic (within-label
    * mean cosine 0.0016 vs cross-label 0.0003 — measured), the regime
    * where no space partition helps, so the curve documents an honest
    * hard case rather than a clustered best case. On clustered real
    * corpora the same machinery hits the published IVF recall/scan
    * trade-offs (probing p of K cells scans ~p/K of the data).
    * Both ratios are ONE division of exact integer totals (total hits /
    * 100, scanned rows / 20·N), so the doubles are bit-exact cross-engine
    * with no rounding. Scale shape: the query sample is bounded (broadcast
    * both sides); candidate volume is Σ_p (p/K)·N per query — linear in N
    * with a p/K prefactor, never quadratic. */
  val v10bNprobeCurve: Q = {
    val centroids = ivfCentroids8
    Q("v10b_ivf_nprobe_curve",
      Some(s"""WITH ${ivfRankedCtes(centroids)},
            q AS (SELECT vec_id AS qid, e AS qv FROM assign WHERE vec_id < 20),
            qrank AS (SELECT vec_id AS qid, cell, crank FROM ranked WHERE vec_id < 20),
            ex AS (SELECT qid, a.vec_id,
                round(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
              FROM assign a CROSS JOIN q WHERE a.vec_id <> q.qid),
            exr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM ex) WHERE rn <= 5),
            cand AS (SELECT qr.qid, a.vec_id, qr.crank,
                round(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS score
              FROM assign a JOIN qrank qr ON a.cell = qr.cell JOIN q ON q.qid = qr.qid
              WHERE a.vec_id <> qr.qid),
            probes(nprobe) AS (VALUES (1), (2), (4), (6), (7), (8)),
            pc AS (SELECT nprobe, qid, vec_id, score FROM cand CROSS JOIN probes WHERE crank <= nprobe),
            ivr AS (SELECT nprobe, qid, vec_id FROM (
                SELECT nprobe, qid, vec_id, row_number() OVER (PARTITION BY nprobe, qid ORDER BY score DESC, vec_id) AS rn
                FROM pc) WHERE rn <= 5),
            hits AS (SELECT nprobe, count(*) AS total_hits
              FROM ivr i JOIN exr e ON i.qid = e.qid AND i.vec_id = e.vec_id GROUP BY nprobe),
            scans AS (SELECT nprobe, count(*) AS scanned FROM pc GROUP BY nprobe),
            n AS (SELECT count(*) AS n_vec FROM d)
            SELECT p.nprobe AS nprobe,
              CAST(coalesce(total_hits, 0) AS INT) AS total_hits,
              CAST(coalesce(total_hits, 0) AS DOUBLE) / CAST(100 AS DOUBLE) AS mean_recall_at_5,
              CAST(coalesce(scanned, 0) AS DOUBLE) / CAST(20 * n_vec AS DOUBLE) AS scanned_frac
            FROM probes p LEFT JOIN hits USING (nprobe) LEFT JOIN scans USING (nprobe) CROSS JOIN n
            ORDER BY nprobe"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // feeds the exact branch AND the candidate branch - materialize once
        val celled = embeddings(s, d)
          .withColumn("cell", Search.ivfCell(col("embedding"), centroids))
          .localCheckpoint()
        val q = celled.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val qranked = q
          .select(col("qid"), col("qv"),
            posexplode(Search.ivfProbeCells(col("qv"), centroids, centroids.size)))
          .select(col("qid"), col("qv"), (col("pos") + 1).as("crank"), col("col").as("cell"))
        val exr = celled.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("qid", "vec_id")
        val cand = celled.join(broadcast(qranked), Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("crank"),
            round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        val probesDf = s.range(1)
          .select(explode(array(lit(1), lit(2), lit(4), lit(6), lit(7), lit(8))).as("nprobe"))
        // feeds the ranking branch AND the scanned-count branch
        val pc = cand.crossJoin(broadcast(probesDf))
          .filter(col("crank") <= col("nprobe")).localCheckpoint()
        val ivr = pc.withColumn("rn", row_number().over(
            Window.partitionBy("nprobe", "qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("nprobe", "qid", "vec_id")
        val hits = ivr.join(exr, Seq("qid", "vec_id"))
          .groupBy("nprobe").agg(count(lit(1)).as("total_hits"))
        val scans = pc.groupBy("nprobe").agg(count(lit(1)).as("scanned"))
        val nVec = celled.agg(count(lit(1)).as("n_vec"))
        probesDf.join(hits, Seq("nprobe"), "left").join(scans, Seq("nprobe"), "left")
          .crossJoin(broadcast(nVec))
          .select(col("nprobe"),
            coalesce(col("total_hits"), lit(0L)).cast("int").as("total_hits"),
            (coalesce(col("total_hits"), lit(0L)).cast("double") / lit(100).cast("double"))
              .as("mean_recall_at_5"),
            (coalesce(col("scanned"), lit(0L)).cast("double")
              / (lit(20L) * col("n_vec")).cast("double")).as("scanned_frac"))
          .orderBy("nprobe")
      })
  }

  /** The CLUSTERED-regime nprobe curve — the counterpart the round-10
    * verdict asked for: v10b honestly documents the isotropic WORST case
    * (0.96 recall costs 90% of cells); this fixture plants genuinely
    * clustered embeddings and proves the pruning BENEFIT the machinery
    * exists for. Fixture (generated ARITHMETICALLY in both engines from
    * vec_id, never stored): 8 orthogonal centers (coordinate block
    * [8k, 8k+7] = 2.0), vector v = center_{v % 8} + deterministic
    * per-coordinate noise in [-0.5, 0.5] (((v·31+i·17) mod 11 − 5)/10) —
    * within-cluster dot ≈ 32 ± noise vs cross-cluster ≈ 0 ± noise, the
    * published regime where probing p of K cells
    * scans ~p/K of the data at high recall. The IVF cells are the true
    * centers, so the curve isolates the PRUNING claim: recall ≥ 0.9 at
    * nprobe ≤ 2 while scanning ≤ 35% of rows (Round11Spec pins the
    * thresholds; the oracle hash-pins the exact values), monotone in
    * nprobe, with the nprobe = 8 brute-force anchor at exactly 1.0. A
    * centroid-training regression (mis-assigned cells) collapses recall
    * at small nprobe here — invisible on the isotropic fixture. */
  val v13ClusteredNprobe: Q = {
    val centers: Seq[Seq[Double]] =
      Seq.tabulate(8)(k => Seq.tabulate(64)(i => if (i / 8 == k) 2.0 else 0.0))
    Q("v13_clustered_nprobe",
      Some(s"""WITH fix AS (
              SELECT vec_id, list_transform(range(0, 64), i ->
                (CASE WHEN i // 8 = vec_id % 8 THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                + ((vec_id * 31 + i * 17) % 11 - 5) / 10.0) AS e
              FROM embeddings),
            cents AS (
              SELECT cell, list_transform(range(0, 64), i ->
                CASE WHEN i // 8 = cell THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS cv
              FROM (SELECT unnest(range(0, 8)) AS cell)),
            dist AS (SELECT vec_id, e, cell,
                list_sum(list_transform(range(1, 65), i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS d2
              FROM fix CROSS JOIN cents),
            ranked AS (SELECT vec_id, e, cell,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS crank FROM dist),
            assign AS (SELECT vec_id, e, cell FROM ranked WHERE crank = 1),
            q AS (SELECT vec_id AS qid, e AS qv FROM assign WHERE vec_id < 20),
            qrank AS (SELECT vec_id AS qid, cell, crank FROM ranked WHERE vec_id < 20),
            ex AS (SELECT qid, a.vec_id,
                round(list_dot_product(a.e, qv), 6) AS score
              FROM assign a CROSS JOIN q WHERE a.vec_id <> q.qid),
            exr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM ex) WHERE rn <= 5),
            cand AS (SELECT qr.qid, a.vec_id, qr.crank,
                round(list_dot_product(a.e, q.qv), 6) AS score
              FROM assign a JOIN qrank qr ON a.cell = qr.cell JOIN q ON q.qid = qr.qid
              WHERE a.vec_id <> qr.qid),
            probes(nprobe) AS (VALUES (1), (2), (4), (8)),
            pc AS (SELECT nprobe, qid, vec_id, score FROM cand CROSS JOIN probes WHERE crank <= nprobe),
            ivr AS (SELECT nprobe, qid, vec_id FROM (
                SELECT nprobe, qid, vec_id, row_number() OVER (PARTITION BY nprobe, qid ORDER BY score DESC, vec_id) AS rn
                FROM pc) WHERE rn <= 5),
            hits AS (SELECT nprobe, count(*) AS total_hits
              FROM ivr i JOIN exr e ON i.qid = e.qid AND i.vec_id = e.vec_id GROUP BY nprobe),
            scans AS (SELECT nprobe, count(*) AS scanned FROM pc GROUP BY nprobe),
            n AS (SELECT count(*) AS n_vec FROM fix)
            SELECT p.nprobe AS nprobe,
              CAST(coalesce(total_hits, 0) AS INT) AS total_hits,
              CAST(coalesce(total_hits, 0) AS DOUBLE) / CAST(100 AS DOUBLE) AS mean_recall_at_5,
              CAST(coalesce(scanned, 0) AS DOUBLE) / CAST(20 * n_vec AS DOUBLE) AS scanned_frac
            FROM probes p LEFT JOIN hits USING (nprobe) LEFT JOIN scans USING (nprobe) CROSS JOIN n
            ORDER BY nprobe"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val fix = embeddings(s, d).select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            when(floor(i / 8) === col("vec_id") % 8, lit(2.0)).otherwise(lit(0.0))
              + ((col("vec_id") * 31 + i * 17) % 11 - 5).cast("double") / lit(10.0))
            .as("embedding"))
        // feeds the exact branch AND the candidate branch - materialize once
        val celled = fix.withColumn("cell", Search.ivfCell(col("embedding"), centers))
          .localCheckpoint()
        val q = celled.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val qranked = q
          .select(col("qid"), col("qv"),
            posexplode(Search.ivfProbeCells(col("qv"), centers, centers.size)))
          .select(col("qid"), col("qv"), (col("pos") + 1).as("crank"), col("col").as("cell"))
        val exr = celled.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("qid", "vec_id")
        val cand = celled.join(broadcast(qranked), Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("crank"),
            round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        val probesDf = s.range(1)
          .select(explode(array(lit(1), lit(2), lit(4), lit(8))).as("nprobe"))
        // feeds the ranking branch AND the scanned-count branch
        val pc = cand.crossJoin(broadcast(probesDf))
          .filter(col("crank") <= col("nprobe")).localCheckpoint()
        val ivr = pc.withColumn("rn", row_number().over(
            Window.partitionBy("nprobe", "qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("nprobe", "qid", "vec_id")
        val hits = ivr.join(exr, Seq("qid", "vec_id"))
          .groupBy("nprobe").agg(count(lit(1)).as("total_hits"))
        val scans = pc.groupBy("nprobe").agg(count(lit(1)).as("scanned"))
        val nVec = celled.agg(count(lit(1)).as("n_vec"))
        probesDf.join(hits, Seq("nprobe"), "left").join(scans, Seq("nprobe"), "left")
          .crossJoin(broadcast(nVec))
          .select(col("nprobe"),
            coalesce(col("total_hits"), lit(0L)).cast("int").as("total_hits"),
            (coalesce(col("total_hits"), lit(0L)).cast("double") / lit(100).cast("double"))
              .as("mean_recall_at_5"),
            (coalesce(col("scanned"), lit(0L)).cast("double")
              / (lit(20L) * col("n_vec")).cast("double")).as("scanned_frac"))
          .orderBy("nprobe")
      })
  }

  /** TRAINED centroids × the clustered fixture — the composition gate
    * the round-11 verdict asked for: v13 proves the pruning benefit with
    * PLANTED true centers, v12 proves Lloyd training on its own fixture;
    * nothing gated that TRAINED centroids achieve the v13 benefit on
    * clustered data — the contract that breaks first when centroid
    * training regresses on realistic input. Here v12's production loop
    * (`Cluster.lloyd`, 2 DECIMAL-exact iterations) trains on v13's
    * clustered embeddings from a Forgy-style init (the first vector of
    * each planted cluster, vec_id 0-7 — data points, not the answer:
    * each carries full per-coordinate noise), the corpus is assigned to
    * the TRAINED table (`Cluster.assign`), queries rank the trained
    * cells, and the SAME nprobe curve runs. The oracle unrolls init
    * assignment, both Lloyd rounds, the final assignment, the query
    * probe ranking and the curve — training, assignment and pruning
    * hash-gated as one contract; Round12Spec pins recall ≥ 0.9 at
    * nprobe ≤ 2 with ≤ 35% scanned. Numerically validated: Lloyd-2 from
    * this init converges to the pure planted clustering at every SF
    * (8 equal cells), so the curve matches v13's planted-center one. */
  val v13bTrainedClustered: Q = {
    val dim = 64
    val distSql = s"""list_sum(list_transform(range(1, ${dim + 1}),
                    i -> (f.e[i] - c.centroid[i]) * (f.e[i] - c.centroid[i])))"""
    Q("v13b_trained_clustered_nprobe",
      Some(s"""WITH fix AS (
              SELECT vec_id, list_transform(range(0, 64), i ->
                (CASE WHEN i // 8 = vec_id % 8 THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                + ((vec_id * 31 + i * 17) % 11 - 5) / 10.0) AS e
              FROM embeddings),
            cents0 AS (SELECT vec_id AS cell, e AS centroid FROM fix WHERE vec_id < 8),
            dd0 AS (SELECT f.vec_id, f.e, c.cell, $distSql AS d2
              FROM fix f CROSS JOIN cents0 c),
            a0 AS (SELECT vec_id, e, cell FROM (
                SELECT vec_id, e, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                FROM dd0) t WHERE rn = 1),
            el1 AS (SELECT cell, i, e[i] AS x FROM a0, range(1, ${dim + 1}) t(i)),
            cent1 AS (SELECT cell, i,
                round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
              FROM el1 GROUP BY cell, i),
            cl1 AS (SELECT cell, list(c ORDER BY i) AS centroid FROM cent1 GROUP BY cell),
            dd1 AS (SELECT f.vec_id, f.e, c.cell, $distSql AS d2
              FROM fix f CROSS JOIN cl1 c),
            a1 AS (SELECT vec_id, e, cell FROM (
                SELECT vec_id, e, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                FROM dd1) t WHERE rn = 1),
            el2 AS (SELECT cell, i, e[i] AS x FROM a1, range(1, ${dim + 1}) t(i)),
            cent2 AS (SELECT cell, i,
                round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
              FROM el2 GROUP BY cell, i),
            cl2 AS (SELECT cell, list(c ORDER BY i) AS centroid FROM cent2 GROUP BY cell),
            dd2 AS (SELECT f.vec_id, f.e, c.cell, $distSql AS d2
              FROM fix f CROSS JOIN cl2 c),
            a2 AS (SELECT vec_id, e, cell FROM (
                SELECT vec_id, e, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                FROM dd2) t WHERE rn = 1),
            q AS (SELECT vec_id AS qid, e AS qv FROM fix WHERE vec_id < 20),
            qd AS (SELECT q.qid, c.cell,
                list_sum(list_transform(range(1, ${dim + 1}),
                  i -> (q.qv[i] - c.centroid[i]) * (q.qv[i] - c.centroid[i]))) AS d2
              FROM cl2 c CROSS JOIN q),
            qrank AS (SELECT qid, cell,
                row_number() OVER (PARTITION BY qid ORDER BY d2, cell) AS crank FROM qd),
            ex AS (SELECT qid, f.vec_id,
                round(list_dot_product(f.e, qv), 6) AS score
              FROM fix f CROSS JOIN q WHERE f.vec_id <> q.qid),
            exr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM ex) WHERE rn <= 5),
            cand AS (SELECT qr.qid, a.vec_id, qr.crank,
                round(list_dot_product(a.e, q.qv), 6) AS score
              FROM a2 a JOIN qrank qr ON a.cell = qr.cell JOIN q ON q.qid = qr.qid
              WHERE a.vec_id <> qr.qid),
            probes(nprobe) AS (VALUES (1), (2), (4), (8)),
            pc AS (SELECT nprobe, qid, vec_id, score FROM cand CROSS JOIN probes WHERE crank <= nprobe),
            ivr AS (SELECT nprobe, qid, vec_id FROM (
                SELECT nprobe, qid, vec_id, row_number() OVER (PARTITION BY nprobe, qid ORDER BY score DESC, vec_id) AS rn
                FROM pc) WHERE rn <= 5),
            hits AS (SELECT nprobe, count(*) AS total_hits
              FROM ivr i JOIN exr e ON i.qid = e.qid AND i.vec_id = e.vec_id GROUP BY nprobe),
            scans AS (SELECT nprobe, count(*) AS scanned FROM pc GROUP BY nprobe),
            n AS (SELECT count(*) AS n_vec FROM fix)
            SELECT p.nprobe AS nprobe,
              CAST(coalesce(total_hits, 0) AS INT) AS total_hits,
              CAST(coalesce(total_hits, 0) AS DOUBLE) / CAST(100 AS DOUBLE) AS mean_recall_at_5,
              CAST(coalesce(scanned, 0) AS DOUBLE) / CAST(20 * n_vec AS DOUBLE) AS scanned_frac
            FROM probes p LEFT JOIN hits USING (nprobe) LEFT JOIN scans USING (nprobe) CROSS JOIN n
            ORDER BY nprobe"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Forgy init: the first point of each planted cluster (vec_id < 8
        // has cluster = vec_id), from the SAME arithmetic both engines use
        val trainInit: Seq[Seq[Double]] = Seq.tabulate(8)(v => Seq.tabulate(64)(i =>
          (if (i / 8 == v) 2.0 else 0.0) + ((v * 31 + i * 17) % 11 - 5) / 10.0))
        // feeds the Lloyd passes, the final assignment, the query set AND
        // the brute branch
        val fix = embeddings(s, d).select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            when(floor(i / 8) === col("vec_id") % 8, lit(2.0)).otherwise(lit(0.0))
              + ((col("vec_id") * 31 + i * 17) % 11 - 5).cast("double") / lit(10.0))
            .as("embedding"))
          .localCheckpoint()
        // v12's production loop, on the CLUSTERED fixture
        val cents = graft.ops.Cluster.lloyd(fix, "embedding", "vec_id", trainInit, iterations = 2)
        // single consumer (cand) over checkpointed inputs — no
        // materialization needed; pc below is the real fan-out point
        val assigned = graft.ops.Cluster.assign(fix, "embedding", "vec_id", cents)
        val q = fix.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val d2q = aggregate(
          zip_with(col("qv"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
        val qranked = q.crossJoin(broadcast(cents))
          .select(col("qid"), col("qv"), col("cell"), d2q.as("d2"))
          .withColumn("crank", row_number().over(
            Window.partitionBy("qid").orderBy(col("d2"), col("cell"))))
          .select("qid", "qv", "crank", "cell")
        val exr = fix.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("qid", "vec_id")
        val cand = assigned.join(broadcast(qranked), Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("crank"),
            round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        val probesDf = s.range(1)
          .select(explode(array(lit(1), lit(2), lit(4), lit(8))).as("nprobe"))
        // feeds the ranking branch AND the scanned-count branch
        val pc = cand.crossJoin(broadcast(probesDf))
          .filter(col("crank") <= col("nprobe")).localCheckpoint()
        val ivr = pc.withColumn("rn", row_number().over(
            Window.partitionBy("nprobe", "qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("nprobe", "qid", "vec_id")
        val hits = ivr.join(exr, Seq("qid", "vec_id"))
          .groupBy("nprobe").agg(count(lit(1)).as("total_hits"))
        val scans = pc.groupBy("nprobe").agg(count(lit(1)).as("scanned"))
        val nVec = fix.agg(count(lit(1)).as("n_vec"))
        probesDf.join(hits, Seq("nprobe"), "left").join(scans, Seq("nprobe"), "left")
          .crossJoin(broadcast(nVec))
          .select(col("nprobe"),
            coalesce(col("total_hits"), lit(0L)).cast("int").as("total_hits"),
            (coalesce(col("total_hits"), lit(0L)).cast("double") / lit(100).cast("double"))
              .as("mean_recall_at_5"),
            (coalesce(col("scanned"), lit(0L)).cast("double")
              / (lit(20L) * col("n_vec")).cast("double")).as("scanned_frac"))
          .orderBy("nprobe")
      })
  }

  /** The multi-probe STORED read — v4b's production layout (index written
    * `partitionBy(cell)`) read back at nprobe = 2: the query row carries
    * its 2 nearest cells as an array, the broadcast side explodes to one
    * probe row per cell, and the join's dynamic partition filter lists
    * exactly 2 of the 8 cell directories (AnnPruneSpec pins the file
    * counts). This is the recall-repair path for the v10 finding applied
    * to the layout a 100 TB index actually uses. */
  val v4cIvfMultiprobePruned: Q = {
    val centroids = ivfCentroids8
    Q("v4c_ivf_multiprobe_pruned",
      Some(s"""WITH ${ivfRankedCtes(centroids)},
               qp AS (SELECT cell FROM ranked WHERE vec_id = 0 AND crank <= 2),
               q AS (SELECT e AS qv FROM assign WHERE vec_id = 0)
               SELECT a.vec_id, round(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
               FROM assign a JOIN qp ON a.cell = qp.cell CROSS JOIN q
               ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf8_index_${Integer.toHexString(d.hashCode)}"
        Search.writePartitionedIndex(emb, Search.ivfCell(col("embedding"), centroids), out, bucketCol = "cell")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"),
            Search.ivfProbeCells(col("embedding"), centroids, 2).as("probes"))
        Search.readPrunedProbes(s, out, q, probesCol = "probes", bucketCol = "cell")
          .select(col("vec_id"),
            round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** V2 scale path, end-to-end: the SRP index is WRITTEN `partitionBy
    * (bucket)` and read back pruned — the bucket predicate arrives as a
    * dynamic partition filter at the file listing, so the scan touches one
    * bucket directory instead of the whole index (AnnPruneSpec asserts the
    * file-level pruning). Oracle: identical semantics to v3 (same seed-42
    * hyperplanes baked as literals). */
  val v3bLshPruned: Q = {
    val dim = 64; val bits = 6
    val planes = srpPlanes
    def planeSql(p: Seq[Double]) = p.map(v => f"$v%.17g").mkString("[", ",", "]")
    val bucketSql = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    Q("v3b_lsh_pruned_topk",
      Some(s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
               q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
               SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
               FROM b, q WHERE b.bucket = q.qb
               ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_srp_index_${Integer.toHexString(d.hashCode)}"
        Search.writePartitionedIndex(emb, Search.srpBucket(col("embedding"), dim, bits), out)
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"), Search.srpBucket(col("embedding"), dim, bits).as("bucket"))
        Search.readPruned(s, out, q)
          .select(col("vec_id"),
            round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** IVF variant of the pruned-read path: index written `partitionBy(cell)`. */
  val v4bIvfPruned: Q = {
    val dim = 64
    val centroids = ivfCentroids
    def cSql(c: Seq[Double]) = vecSql(c)
    def d2Sql(c: Seq[Double]) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> (e[i]::DOUBLE - (${cSql(c)})[i]) * (e[i]::DOUBLE - (${cSql(c)})[i])))"
    val dCols = centroids.zipWithIndex.map { case (c, i) => s"${d2Sql(c)} AS d$i" }.mkString(", ")
    val cellSql = """CASE WHEN d0 <= least(d1, d2, d3) THEN 0
                          WHEN d1 <= least(d2, d3) THEN 1
                          WHEN d2 <= d3 THEN 2 ELSE 3 END"""
    Q("v4b_ivf_pruned_topk",
      Some(s"""WITH d AS (SELECT vec_id, embedding AS e, $dCols FROM embeddings),
               c AS (SELECT vec_id, e, $cellSql AS cell FROM d),
               q AS (SELECT e AS qv, cell AS qcell FROM c WHERE vec_id = 0)
               SELECT vec_id, round(list_dot_product(CAST(e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
               FROM c, q WHERE c.cell = q.qcell
               ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_${Integer.toHexString(d.hashCode)}"
        Search.writePartitionedIndex(emb, Search.ivfCell(col("embedding"), centroids), out, bucketCol = "cell")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"), Search.ivfCell(col("embedding"), centroids).as("cell"))
        Search.readPruned(s, out, q, bucketCol = "cell")
          .select(col("vec_id"),
            round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** Trained-IVF end-to-end — the production ANN build loop faiss runs
    * (train a quantizer on the corpus, THEN build the index with it),
    * closing the loop between the d9c Lloyd trainer and the v4b/v4c
    * stored layout: 2 DECIMAL-exact Lloyd iterations from the seeded
    * init → corpus assigned to the TRAINED centroid table (broadcast
    * min_by argmin, map-side combined) → index written
    * `partitionBy(cell)` → the query row ranks the trained cells,
    * carries its top-2 as a probe array, and the pruned multi-probe
    * read lists 2 of the k directories. The oracle unrolls BOTH Lloyd
    * iterations (the d9c chain), re-derives the final assignment, the
    * query's probe ranking, and the top-5 — so training, build and
    * probe are all hash-gated as one contract. Scale: each Lloyd round
    * is one assignment pass + one (cell,pos) aggregate; centroids
    * (k·d rows) broadcast; the stored read is partition-pruned. */
  val v12TrainedIvf: Q = {
    val dim = 64
    val iters = 2
    val distSql = s"""list_sum(list_transform(range(1, ${dim + 1}),
                    i -> (e[i] - centroid[i]) * (e[i] - centroid[i])))"""
    val chain = (1 to iters).map { it =>
      s"""el$it AS (SELECT cell, i, e[i] AS x FROM a${it - 1}, range(1, ${dim + 1}) t(i)),
              cent$it AS (SELECT cell, i,
                  round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
                FROM el$it GROUP BY cell, i),
              cl$it AS (SELECT cell, list(c ORDER BY i) AS centroid FROM cent$it GROUP BY cell),
              dd$it AS (SELECT vec_id, e, cl$it.cell AS cell, $distSql AS d2
                FROM e CROSS JOIN cl$it),
              a$it AS (SELECT vec_id, e, cell FROM (
                  SELECT vec_id, e, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM dd$it) t WHERE rn = 1)"""
    }.mkString(",\n              ")
    Q("v12_trained_ivf",
      Some(s"""${SemDedup.assignCtes},
              $chain,
              q AS (SELECT e AS qv FROM e WHERE vec_id = 0),
              qd AS (SELECT cl$iters.cell AS cell,
                  list_sum(list_transform(range(1, ${dim + 1}),
                    i -> (qv[i] - centroid[i]) * (qv[i] - centroid[i]))) AS d2
                FROM cl$iters CROSS JOIN q),
              qp AS (SELECT cell FROM (
                  SELECT cell, row_number() OVER (ORDER BY d2, cell) AS rn FROM qd)
                WHERE rn <= 2)
              SELECT a.vec_id, round(list_dot_product(a.e, qv), 6) AS score
              FROM a$iters a JOIN qp ON a.cell = qp.cell CROSS JOIN q
              ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val cents = graft.ops.Cluster.lloyd(emb, "embedding", "vec_id",
          SemDedup.init, iterations = iters) // (cell, centroid), checkpointed inside
        val assigned = graft.ops.Cluster.assign(emb, "embedding", "vec_id", cents)
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_tivf_index_${Integer.toHexString(d.hashCode)}"
        assigned.write.mode("overwrite").partitionBy("cell").parquet(out)
        val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val d2q = aggregate(
          zip_with(col("qv"), col("centroid"), (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, x) => acc + x)
        val probes = qv.crossJoin(broadcast(cents))
          .select(struct(d2q.as("d2"), col("cell").as("cell")).as("sc"))
          .agg(transform(slice(sort_array(collect_list(col("sc"))), 1, 2),
            x => x.getField("cell")).as("probes"))
        val qrow = qv.crossJoin(broadcast(probes))
        Search.readPrunedProbes(s, out, qrow, probesCol = "probes", bucketCol = "cell")
          .select(col("vec_id"),
            round(Embed.dot(col("embedding"), transform(col("qv"), x => x.cast("double"))), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** 100 TB distinct-count path: HLL sketch (approx_count_distinct).
    * Engine sketches differ, so no cross-engine oracle — the driver's
    * rows-only check applies; exactness is asserted in ScalaTest against
    * the exact count within HLL error bounds. */
  val a12Approx = Q("a12_approx_distinct", None,
    (s, d) => documents(s, d)
      .groupBy("lang")
      .agg(approx_count_distinct(col("source")).as("approx_sources"),
        approx_count_distinct(col("doc_id"), 0.02).as("approx_docs"))
      .orderBy("lang"))

  /** a12's capability (per-lang approximate distinct sources / docs) on
    * the PORTABLE HLL path ([[graft.ops.Hll]], the sk2 register algebra)
    * instead of Spark's opaque `approx_count_distinct` sketch — so the
    * approx-distinct capability itself carries a strict DuckDB hash gate
    * (the oracle replays registers + estimator bit-for-bit), leaving a12
    * as the documented engine-native alternate. Two register builds, each
    * ONE (lang, bucket) aggregate emitting ≤ langs×256 rows out of any
    * corpus size; distinct-sources sits in the linear-counting regime,
    * distinct-docs in the raw-estimator regime, so both estimator branches
    * are load-bearing in the hash. */
  val a12bApproxPortable: Q = {
    import graft.ops.Hll
    Q("a12b_approx_distinct_portable",
      Some(s"""WITH gs AS (SELECT lang, source AS w FROM documents),
            gd AS (SELECT lang, CAST(doc_id AS VARCHAR) AS w FROM documents),
            rs AS ${Hll.regSql("gs", "lang")},
            rd AS ${Hll.regSql("gd", "lang")},
            es AS ${Hll.estSql("rs", "lang")},
            ed AS ${Hll.estSql("rd", "lang")},
            ex AS (SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS n_sources_exact,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_exact
              FROM documents GROUP BY lang)
            SELECT ex.lang, n_sources_exact, round(es.est, 4) AS est_sources,
              n_docs_exact, round(ed.est, 4) AS est_docs,
              round(abs(round(ed.est, 4) - CAST(n_docs_exact AS DOUBLE))
                / CAST(n_docs_exact AS DOUBLE), 4) AS rel_err_docs
            FROM ex JOIN es ON es.lang = ex.lang JOIN ed ON ed.lang = ex.lang
            ORDER BY ex.lang"""),
      (s, d) => {
        val docs = documents(s, d)
        val gs = docs.select(col("lang"), col("source").as("w"))
        val gd = docs.select(col("lang"), col("doc_id").cast("string").as("w"))
        val es = Hll.estimate(Hll.registers(gs, Seq("lang"), col("w")), Seq("lang"))
          .withColumnRenamed("est_distinct", "est_sources")
        val ed = Hll.estimate(Hll.registers(gd, Seq("lang"), col("w")), Seq("lang"))
          .withColumnRenamed("est_distinct", "est_docs")
        val ex = docs.groupBy("lang").agg(
          countDistinct(col("source")).as("n_sources_exact"),
          countDistinct(col("doc_id")).as("n_docs_exact"))
        ex.join(es, Seq("lang")).join(ed, Seq("lang"))
          .select(col("lang"), col("n_sources_exact"), col("est_sources"),
            col("n_docs_exact"), col("est_docs"),
            round(abs(col("est_docs") - col("n_docs_exact").cast("double"))
              / col("n_docs_exact").cast("double"), 4).as("rel_err_docs"))
          .orderBy("lang")
      })
  }

  /** V2 scale path #3: product quantization — each 64-dim vector becomes 4
    * one-byte codes (argmin centroid per 16-dim subspace), scored against a
    * per-query ADC lookup table; the scan reads only the codes column.
    * Oracle generated from the same seed-11 codebooks; per-subspace argmin
    * mirrored by the v4 CASE/least chain. */
  private val pqSubDim = 16
  private val pqCodebooks: Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(11)
    Seq.fill(4)(Seq.fill(4)(Seq.fill(pqSubDim)(rng.nextGaussian() * 0.2)))
  }

  // ---- shared SQL fragment builders for the PQ family (v5/v5b/v6) ----
  /** per-(subspace, centroid) squared distance, named d<m>_<k>, over `e`. */
  private val pqDCols: String = {
    def d2Sql(mi: Int, c: Seq[Double]) =
      s"list_sum(list_transform(range(1, ${pqSubDim + 1}), i -> (e[${mi * pqSubDim} + i]::DOUBLE - (${vecSql(c)})[i]) * (e[${mi * pqSubDim} + i]::DOUBLE - (${vecSql(c)})[i])))"
    (for (mi <- 0 until 4; ki <- 0 until 4)
      yield s"${d2Sql(mi, pqCodebooks(mi)(ki))} AS d${mi}_$ki").mkString(", ")
  }
  /** per-subspace argmin code (ties → lower), mirroring sort_array. */
  private def pqCodeSql(mi: Int) =
    s"""CASE WHEN d${mi}_0 <= least(d${mi}_1, d${mi}_2, d${mi}_3) THEN 0
             WHEN d${mi}_1 <= least(d${mi}_2, d${mi}_3) THEN 1
             WHEN d${mi}_2 <= d${mi}_3 THEN 2 ELSE 3 END AS code_$mi"""
  private val pqCodeCols: String = (0 until 4).map(pqCodeSql).mkString(", ")
  /** the query-side ADC lookup table over `qv`. */
  private val pqLutCols: String = {
    def lutSql(mi: Int, ki: Int) =
      s"list_sum(list_transform(range(1, ${pqSubDim + 1}), i -> qv[${mi * pqSubDim} + i]::DOUBLE * (${vecSql(pqCodebooks(mi)(ki))})[i])) AS q${mi}_$ki"
    (for (mi <- 0 until 4; ki <- 0 until 4) yield lutSql(mi, ki)).mkString(", ")
  }
  private val pqScoreSql: String = (0 until 4).map(mi =>
    s"(CASE code_$mi WHEN 0 THEN q${mi}_0 WHEN 1 THEN q${mi}_1 WHEN 2 THEN q${mi}_2 ELSE q${mi}_3 END)")
    .mkString(" + ")

  private val pqOracle: String =
    s"""WITH d AS (SELECT vec_id, embedding AS e, $pqDCols FROM embeddings),
        c AS (SELECT vec_id, $pqCodeCols FROM d),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        lut AS (SELECT $pqLutCols FROM q)
        SELECT vec_id, round($pqScoreSql, 6) AS score
        FROM c, lut
        ORDER BY score DESC, vec_id LIMIT 5"""

  // ---- shared IVF fragments over the seed-7 centroids ----
  private val ivfDCols: String = ivfCentroids.zipWithIndex.map { case (c, i) =>
    s"list_sum(list_transform(range(1, 65), i -> (e[i]::DOUBLE - (${vecSql(c)})[i]) * (e[i]::DOUBLE - (${vecSql(c)})[i]))) AS ivfd$i"
  }.mkString(", ")
  private val ivfCellSql: String =
    """CASE WHEN ivfd0 <= least(ivfd1, ivfd2, ivfd3) THEN 0
            WHEN ivfd1 <= least(ivfd2, ivfd3) THEN 1
            WHEN ivfd2 <= ivfd3 THEN 2 ELSE 3 END"""

  /** The production ANN layout, composed end-to-end: IVF cell partitioning
    * for the pruned read (only the query's cell directory is listed) plus
    * PQ codes inside each cell for compressed ADC scoring — the stored
    * index holds 4 tinyint codes per vector and the query never touches a
    * raw corpus embedding. Oracle: the v4 cell chain + the v5 code/LUT
    * chain fused in one statement, same seeded literals. */
  val v6IvfPq: Q = Q("v6_ivf_pq_topk",
    Some(s"""WITH d AS (SELECT vec_id, embedding AS e, $ivfDCols, $pqDCols FROM embeddings),
            c AS (SELECT vec_id, e, $ivfCellSql AS cell, $pqCodeCols FROM d),
            q AS (SELECT e AS qv, cell AS qcell FROM c WHERE vec_id = 0),
            lut AS (SELECT $pqLutCols FROM q)
            SELECT vec_id, round($pqScoreSql, 6) AS score
            FROM c, q, lut WHERE c.cell = q.qcell
            ORDER BY score DESC, vec_id LIMIT 5"""),
    (s, d) => {
      val emb = embeddings(s, d)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_${Integer.toHexString(d.hashCode)}"
      // project embeddings away BEFORE the write: the stored index is
      // (vec_id, codes) under cell directories — nothing else
      val indexDf = emb.select(col("vec_id"),
        Search.pqCodes(col("embedding"), pqCodebooks, pqSubDim).as("codes"),
        Search.ivfCell(col("embedding"), ivfCentroids).as("cell"))
      Search.writePartitionedIndex(indexDf, col("cell"), out, bucketCol = "cell")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), Search.ivfCell(col("embedding"), ivfCentroids).as("cell"))
      Search.readPruned(s, out, q, bucketCol = "cell")
        .select(col("vec_id"),
          round(Search.pqAdcScore(col("codes"), col("qv"), pqCodebooks, pqSubDim), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(5)
    })

  val v5PqTopK: Q = Q("v5_pq_topk", Some(pqOracle),
    (s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.withColumn("codes", Search.pqCodes(col("embedding"), pqCodebooks, pqSubDim))
        .select(col("vec_id"), col("codes"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Search.pqAdcScore(col("codes"), col("qv"), pqCodebooks, pqSubDim), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(5)
    })

  /** The stored form of v5 — the codes table is WRITTEN once (4 tinyint
    * codes per vector instead of 64 floats) and the scoring scan reads ONLY that
    * table: at 100 TB this is the ~60× storage/bandwidth reduction that
    * makes brute-ranking a whole corpus per query feasible. Same oracle as
    * v5 (identical semantics; the raw query vector still comes exact from
    * the source table). */
  val v5bPqStored: Q = Q("v5b_pq_stored_topk", Some(pqOracle),
    (s, d) => {
      val emb = embeddings(s, d)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_pq_codes_${Integer.toHexString(d.hashCode)}"
      emb.select(col("vec_id"), Search.pqCodes(col("embedding"), pqCodebooks, pqSubDim).as("codes"))
        .write.mode("overwrite").parquet(out)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      s.read.parquet(out)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Search.pqAdcScore(col("codes"), col("qv"), pqCodebooks, pqSubDim), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(5)
    })

  /** Benchmark decontamination (GPT-3 appendix-C style): the eval "suite"
    * is a deterministic slice of the corpus (doc_id % 13 = 0); flag every
    * other document sharing a word 4-gram with it, counting the distinct
    * shared grams. Scale shape: eval grams broadcast, train side never
    * shuffles (map-side semi-join at scan bandwidth). */
  val d6Decontaminate = Q("d6_decontaminate",
    Some(s"""WITH t AS (SELECT doc_id AS id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT id, ${OracleSql.shinglesSql(4)} AS sh FROM t),
            g AS (SELECT id, unnest(sh) AS g FROM sh),
            ev AS (SELECT DISTINCT g FROM g WHERE id % 13 = 0)
            SELECT id, CAST(count(*) AS BIGINT) AS n_shared
            FROM g WHERE id % 13 <> 0 AND g IN (SELECT g FROM ev)
            GROUP BY id ORDER BY id"""),
    (s, d) => {
      val docs = documents(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 13 =!= 0),
        docs.filter(col("doc_id") % 13 === 0),
        "doc_id", "text", n = 4)
        .orderBy("id")
    })

  /** Graded contamination (PaLM/Llama-style): per TRAINING doc, the
    * FRACTION of its distinct 4-grams that appear anywhere in the eval
    * split, with the ≥5% drop verdict — the thresholded form real
    * decontamination pipelines apply where d6's any-hit flag is too
    * blunt. Every training doc emits a row (zero-overlap included), so
    * the left-join null path and the short-doc single-gram denominator
    * are both inside the hash. */
  val d15Contamination = Q("d15_contamination_fraction",
    Some(s"""WITH t AS (SELECT doc_id AS id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT id, ${OracleSql.shinglesSql(4)} AS sh FROM t),
            g AS (SELECT id, unnest(sh) AS g FROM sh),
            ev AS (SELECT DISTINCT g FROM g WHERE id % 13 = 0),
            shd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_shared
              FROM g WHERE id % 13 <> 0 AND g IN (SELECT g FROM ev)
              GROUP BY id),
            tr AS (SELECT id, CAST(len(sh) AS BIGINT) AS n_grams FROM sh WHERE id % 13 <> 0)
            SELECT id, n_grams, coalesce(n_shared, 0) AS n_shared,
              round(CAST(coalesce(n_shared, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS frac,
              round(CAST(coalesce(n_shared, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) >= 0.05 AS contaminated
            FROM tr LEFT JOIN shd USING (id) ORDER BY id"""),
    (s, d) => {
      val docs = documents(s, d)
      Dedup.contaminationFraction(
          docs.filter(col("doc_id") % 13 =!= 0),
          docs.filter(col("doc_id") % 13 === 0),
          "doc_id", "text", n = 4)
        .withColumn("contaminated", col("frac") >= 0.05)
        .orderBy("id")
    })

  /** d6's SCALE PATH: identical decontamination result, but the corpus
    * gram stream is prefiltered map-only by a Bloom filter of the eval
    * grams before the exact semi-join — the shape for an eval set too
    * large to broadcast comfortably. The oracle is d6's verbatim: false
    * positives die in the exact join, false negatives are impossible, so
    * the bloom path must hash-match the exact path. */
  val d6bDecontaminateBloom = Q("d6b_decontaminate_bloom",
    Some(s"""WITH t AS (SELECT doc_id AS id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT id, ${OracleSql.shinglesSql(4)} AS sh FROM t),
            g AS (SELECT id, unnest(sh) AS g FROM sh),
            ev AS (SELECT DISTINCT g FROM g WHERE id % 13 = 0)
            SELECT id, CAST(count(*) AS BIGINT) AS n_shared
            FROM g WHERE id % 13 <> 0 AND g IN (SELECT g FROM ev)
            GROUP BY id ORDER BY id"""),
    (s, d) => {
      val docs = documents(s, d)
      Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 13 =!= 0),
        docs.filter(col("doc_id") % 13 === 0),
        "doc_id", "text", n = 4)
        .orderBy("id")
    })

  /** Incremental dedup — the production update loop: a new batch
    * (doc_id % 4 = 0) is deduped AGAINST the standing corpus (the rest)
    * without touching corpus-internal duplicates; exact-hash anti-join
    * first, then cross-set LSH band join with Jaccard verification. */
  val d8Incremental = Q("d8_incremental_dedup",
    Some(s"""WITH b0 AS (SELECT doc_id AS id, text, source FROM documents WHERE doc_id % 4 = 0),
            c0 AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 4 <> 0),
            ch AS (SELECT DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h FROM c0),
            b1 AS (SELECT * FROM b0
                   WHERE md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) NOT IN (SELECT h FROM ch)),
            ${OracleSql.bandedCtes("x", "b1", shingleWidth = 3, numHashes = 6, rows = 2)},
            ${OracleSql.bandedCtes("c", "c0", shingleWidth = 3, numHashes = 6, rows = 2)},
            nd AS (SELECT DISTINCT a.id FROM xbands a JOIN cbands b ON a.band = b.band
                   WHERE ${OracleSql.jaccSql} >= 0.8)
            SELECT id AS doc_id, source FROM b1
            WHERE id NOT IN (SELECT id FROM nd) ORDER BY doc_id"""),
    (s, d) => {
      val docs = documents(s, d)
      Dedup.dedupAgainstCorpus(
        docs.filter(col("doc_id") % 4 === 0),
        docs.filter(col("doc_id") % 4 =!= 0),
        "doc_id", "text")
        .select("doc_id", "source").orderBy("doc_id")
    })

  /** Dedup clustering: connected components over the MinHash+LSH near-dup
    * pair list (the step that turns pairwise duplicates into keep-one
    * groups). Oracle: the d2 pair pipeline + a recursive-CTE transitive
    * closure, min reachable id per vertex. */
  val d7DedupClusters = Q("d7_dedup_clusters",
    Some(s"""WITH RECURSIVE src AS (SELECT doc_id AS id, text FROM documents),
            ${OracleSql.lshPairsCtes("src", shingleWidth = 3, numHashes = 6, rows = 2, threshold = 0.8)},
            ${OracleSql.closureCtes}
            SELECT id, CAST(cluster_id AS BIGINT) AS cluster_id
            FROM labels ORDER BY id"""),
    (s, d) => {
      val pairs = Dedup.minHashDuplicates(graft.ops.TextAnalysis.spreadSmallInput(documents(s, d)), "doc_id", col("text"),
        shingleWidth = 3, numHashes = 6, rowsPerBand = 2, threshold = 0.8)
      Dedup.connectedComponents(pairs).orderBy("id")
    })

  /** Dedup-audit histogram: how big do near-dup clusters get? The report a
    * curation run reads to sanity-check its LSH thresholds (a fat tail =
    * template spam / boilerplate). Cluster sizes count the singleton-free
    * clusters d7 emits; two tiny aggregates on top of the same pair
    * machinery. */
  val d7bClusterHistogram = Q("d7b_cluster_histogram",
    Some(s"""WITH RECURSIVE src AS (SELECT doc_id AS id, text FROM documents),
            ${OracleSql.lshPairsCtes("src", shingleWidth = 3, numHashes = 6, rows = 2, threshold = 0.8)},
            ${OracleSql.closureCtes},
            sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                      FROM labels GROUP BY cluster_id)
            SELECT cluster_size, count(*) AS n_clusters FROM sizes
            GROUP BY cluster_size ORDER BY cluster_size"""),
    (s, d) => {
      val pairs = Dedup.minHashDuplicates(graft.ops.TextAnalysis.spreadSmallInput(documents(s, d)), "doc_id", col("text"),
        shingleWidth = 3, numHashes = 6, rowsPerBand = 2, threshold = 0.8)
      Dedup.connectedComponents(pairs)
        .groupBy("cluster_id").agg(count(lit(1)).cast("long").as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")
    })

  /** SOFT dedup: instead of dropping near-duplicates, downweight them —
    * every member of a near-dup cluster gets sampling weight
    * 1/cluster_size, so each duplicated content unit contributes ~one
    * document's worth of mass to training (the keep-one d9b/c1 decision
    * is the weight→{0,1} special case; soft weighting preserves benign
    * variation that hard dedup throws away). Rides the d7 cluster
    * machinery: one size aggregate + one broadcast-sized join back, then
    * a left join so non-duplicated docs carry weight 1. The weight is a
    * single exact-integer division — identical doubles in both engines. */
  val d12SoftDedup = Q("d12_soft_dedup_weights",
    Some(s"""WITH RECURSIVE src AS (SELECT doc_id AS id, text FROM documents),
            ${OracleSql.lshPairsCtes("src", shingleWidth = 3, numHashes = 6, rows = 2, threshold = 0.8)},
            ${OracleSql.closureCtes},
            sizes AS (SELECT cluster_id, count(*) AS cs FROM labels GROUP BY cluster_id),
            lab AS (SELECT l.id, s.cs FROM labels l JOIN sizes s USING (cluster_id))
            SELECT d.doc_id, CAST(coalesce(cs, 1) AS BIGINT) AS cluster_size,
              1.0 / coalesce(cs, 1) AS weight
            FROM documents d LEFT JOIN lab ON lab.id = d.doc_id
            ORDER BY doc_id"""),
    (s, d) => {
      val pairs = Dedup.minHashDuplicates(graft.ops.TextAnalysis.spreadSmallInput(documents(s, d)), "doc_id", col("text"),
        shingleWidth = 3, numHashes = 6, rowsPerBand = 2, threshold = 0.8)
      val labels = Dedup.connectedComponents(pairs)
      val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cs"))
      val lab = labels.join(sizes, "cluster_id").select(col("id"), col("cs"))
      documents(s, d).select(col("doc_id"))
        .join(lab, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cs"), lit(1L)).cast("long").as("cluster_size"),
          (lit(1.0) / coalesce(col("cs"), lit(1L))).as("weight"))
        .orderBy("doc_id")
    })

  /** SimHash near-dup PAIRS via pigeonhole blocking (Manku-style): a
    * Hamming-≤3 pair over 32 bits must share one of its 4 8-bit signature
    * quarters, so candidates come from a quarter equi-join. Signatures vote over word
    * 3-shingle hashes (unigram votes degenerate on a topically-uniform
    * corpus — see Dedup.simHashDuplicates); the oracle replays the
    * signature, the blocking, and the exact Hamming check. */
  val d3bSimHashPairs = Q("d3b_simhash_pairs",
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT doc_id, ${OracleSql.shinglesSql(3)} AS shingles FROM t),
            hsx AS (SELECT doc_id, list_transform(shingles, x -> md5(x)) AS hs FROM sh),
            s AS (SELECT doc_id, ${OracleSql.simhashSql(32)} AS sig FROM hsx),
            blk AS (
              SELECT doc_id, sig, concat(CAST(q AS VARCHAR), ':', substr(sig, q * 8 + 1, 8)) AS blk
              FROM s, range(0, 4) r(q)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a, b.doc_id AS id_b, b.sig AS sig_b
              FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id),
            h AS (
              SELECT id_a, id_b,
                CAST(len(list_filter(range(1, 33), j -> sig_a[j] <> sig_b[j])) AS BIGINT) AS hamming
              FROM cand)
            SELECT id_a, id_b, hamming FROM h
            WHERE hamming <= 3 ORDER BY id_a, id_b"""),
    (s, d) => Dedup.simHashDuplicates(documents(s, d), col("doc_id"), col("text"),
        shingleWidth = 3, bits = 32, maxHamming = 3)
      .orderBy("id_a", "id_b"))

  /** 64-bit SimHash pairs — the Manku production sizing (64-bit
    * fingerprint, Hamming ≤ 3, four 16-bit quarter blocks). Votes read
    * digest bits rather than hex-char top bits, so one md5 per shingle
    * still fills all 64 positions; the oracle replays the bit-level
    * voting, the 16-char quarter blocking, and the exact Hamming check. */
  val d3cSimHash64Pairs = Q("d3c_simhash64_pairs",
    Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
            sh AS (SELECT doc_id, ${OracleSql.shinglesSql(3)} AS shingles FROM t),
            hsx AS (SELECT doc_id, list_transform(shingles, x -> md5(x)) AS hs FROM sh),
            s AS (SELECT doc_id, ${OracleSql.simhash64Sql(64)} AS sig FROM hsx),
            blk AS (
              SELECT doc_id, sig, concat(CAST(q AS VARCHAR), ':', substr(sig, q * 16 + 1, 16)) AS blk
              FROM s, range(0, 4) r(q)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a, b.doc_id AS id_b, b.sig AS sig_b
              FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id),
            h AS (
              SELECT id_a, id_b,
                CAST(len(list_filter(range(1, 65), j -> sig_a[j] <> sig_b[j])) AS BIGINT) AS hamming
              FROM cand)
            SELECT id_a, id_b, hamming FROM h
            WHERE hamming <= 3 ORDER BY id_a, id_b"""),
    (s, d) => Dedup.simHash64Duplicates(documents(s, d), col("doc_id"), col("text"),
        shingleWidth = 3, bits = 64, maxHamming = 3)
      .orderBy("id_a", "id_b"))

  /** REAL PDF text extraction (S1's front door, no codec needed): every
    * row is wrapped into a structurally honest single-page PDF — raw or
    * FlateDecode content stream by doc parity, show-text as one `Tj` or a
    * kerned `TJ` array, parens escaped — and `Pdf.extractStage` (JDK
    * Inflater + content-stream walk + escape-aware operator parse) must
    * recover the planted text byte-for-byte. The oracle predicts the text
    * from doc_id arithmetic, so a regression anywhere in the stream scan,
    * inflate, operator regex, or unescape hash-fails. */
  val pdf1TextExtract = Q("pdf1_text_extract",
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'raw' ELSE 'flate' END AS encoding,
              concat('Report ', CAST(doc_id AS VARCHAR), ' total ',
                CAST((doc_id * 7) % 1000 AS VARCHAR), ' USD',
                CASE WHEN doc_id % 5 = 0 THEN ' with (escaped) parens' ELSE '' END) AS text_out
            FROM documents ORDER BY doc_id"""),
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        concat(lit("Report "), col("doc_id").cast("string"), lit(" total "),
          ((col("doc_id") * 7) % 1000).cast("string"), lit(" USD"),
          when(col("doc_id") % 5 === 0, lit(" with (escaped) parens"))
            .otherwise(lit(""))).as("t"),
        (col("doc_id") % 3 =!= 0).as("compress"),
        (col("doc_id") % 4 === 0).as("split"))
      val withPdf = graft.ops.Pdf.buildStage(planted, "t", "compress", "split", "payload")
      graft.ops.Pdf.extractStage(withPdf, "payload", "text_out")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, lit("raw")).otherwise(lit("flate")).as("encoding"),
          col("text_out"))
        .orderBy("doc_id")
    })

  /** Frame sampling (video analog): k = 4 evenly-spaced byte offsets per
    * media row, exploded — the oracle replays the offset arithmetic with
    * an explicit floor so double-division truncation matches. */
  val m3FrameSample = Q("m3_frame_sample",
    Some("""SELECT doc_id, CAST(floor(i * length(coalesce(text, '')) / 4.0) AS BIGINT) AS frame_idx
            FROM documents, range(0, 4) t(i)
            ORDER BY doc_id, frame_idx"""),
    (s, d) => graft.ops.Multimodal.sampleFrames(
        graft.ops.Multimodal.asMediaColumn(
          documents(s, d).withColumn("text", coalesce(col("text"), lit(""))), "text", "video"), 4)
      .select(col("doc_id"), col("frame_idx"))
      .orderBy("doc_id", "frame_idx"))

  /** Audio-window planning (m4): 120-byte windows, 50-byte hop over each
    * payload; the oracle replays the integer window arithmetic (count,
    * starts, truncated tail) with the same floor semantics. */
  val m4AudioWindows = Q("m4_audio_windows",
    Some("""WITH m AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n FROM documents),
            w AS (SELECT doc_id, n,
                1 + (greatest(n - 120, 0) + 49) // 50 AS nw
              FROM m),
            e AS (SELECT doc_id, n, unnest(range(0, nw)) AS i FROM w)
            SELECT doc_id, CAST(i * 50 AS BIGINT) AS win_start,
              CAST(least(120, n - i * 50) AS BIGINT) AS win_len
            FROM e ORDER BY doc_id, win_start"""),
    (s, d) => graft.ops.Multimodal.audioWindows(
        graft.ops.Multimodal.asMediaColumn(documents(s, d), "text", "audio"),
        win = 120L, hop = 50L)
      .select(col("doc_id"), col("win_start"), col("win_len"))
      .orderBy("doc_id", "win_start"))

  /** Scalar-quantized ANN top-k (v7): per-dimension [lo, hi] from ONE
    * corpus aggregate, byte codes, asymmetric dequantized scoring against
    * the raw vec_id=0 query — PQ's codebook-free sibling. The oracle
    * replays stats, codes, and the sequential-fold dot. */
  val v7SqTopK: Q = {
    val dim = 64
    val loSql = (1 to dim).map(i => s"min(e[$i])").mkString("[", ", ", "]")
    val hiSql = (1 to dim).map(i => s"max(e[$i])").mkString("[", ", ", "]")
    Q("v7_sq_topk",
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              st AS (SELECT $loSql AS lo, $hiSql AS hi FROM e),
              c AS (SELECT vec_id, list_transform(range(1, ${dim + 1}),
                  i -> CASE WHEN hi[i] > lo[i]
                       THEN CAST(round((e[i] - lo[i]) / (hi[i] - lo[i]) * 255) AS INT)
                       ELSE 0 END) AS codes
                FROM e, st),
              q AS (SELECT e AS qv FROM e WHERE vec_id = 0)
              SELECT vec_id, round(list_sum(list_transform(range(1, ${dim + 1}),
                  i -> (lo[i] + codes[i] * (hi[i] - lo[i]) / 255) * qv[i])), 6) AS score
              FROM c, st, q
              ORDER BY score DESC, vec_id LIMIT 5"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val stats = Search.sqStats(emb, "embedding", dim)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        emb.crossJoin(broadcast(stats)).crossJoin(broadcast(q))
          // fused quantize→dequantize (one transform), then the native dot —
          // materializing codes and folding over them would re-run the
          // 64-step encode inside every fold step (see Search.sqDequantize)
          .withColumn("dq", Search.sqDequantize(col("embedding"), col("lo"), col("hi"), dim))
          .select(col("vec_id"), round(Search.sqDot(col("dq"), col("qv")), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(5)
      })
  }

  /** Hard-negative mining (contrastive batch building): per anchor, the
    * top-2 most-similar DIFFERENT-label vectors, IVF-cell-blocked — the
    * pair scoring never leaves a cell. The oracle replays cell assignment
    * (same seeded centroid literals as v4/v6), the wrong-label pair join,
    * and the rounded-cosine ranking. */
  val hn1HardNeg: Q = Q("hn1_hard_negatives",
    Some(s"""WITH d AS (SELECT vec_id, label, embedding AS e, $ivfDCols FROM embeddings),
            c AS (SELECT vec_id, label, e, $ivfCellSql AS cell FROM d),
            j AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(CAST(a.e AS DOUBLE[]), CAST(b.e AS DOUBLE[])), 4) AS cos
              FROM c a JOIN c b ON a.cell = b.cell AND a.label <> b.label),
            r AS (SELECT id_a, id_b, cos,
                row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rank FROM j)
            SELECT id_a, id_b, CAST(rank AS BIGINT) AS rank, cos
            FROM r WHERE rank <= 2 ORDER BY id_a, rank"""),
    (s, d) => graft.index.Search.hardNegatives(embeddings(s, d), "embedding", "vec_id", "label",
        ivfCentroids, 2)
      .orderBy("id_a", "rank"))

  /** SemDeDup: k-means-blocked embedding near-dup pairs. The oracle
    * replays the ENTIRE pipeline — seeded init (literals below), argmin
    * assignment, the Lloyd centroid update (decimal-exact means, so the
    * shuffle's reduction order can't leak into the result), the
    * reassignment, and the within-cluster cosine pairs — so any
    * divergence in the clustering itself hash-fails the gate, not just
    * the final pair list. */
  /** THE d9 clustering parameters + oracle CTE chain — one construction
    * shared by d9 (the pair list) and d9b (the keep decision) so the two
    * provably describe the same clustering. The chain ends at CTE
    * `p(cell, id_a, id_b, cos)`. */
  private object SemDedup {
    val k = 4; val dim = 64; val threshold = 0.4
    val init: Seq[Seq[Double]] = graft.ops.Cluster.seededCentroids(k, dim, seed = 11, scale = 0.05)
    private def d2Sql(c: Seq[Double]) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> (e[i] - (${vecSql(c)})[i]) * (e[i] - (${vecSql(c)})[i])))"
    private val dCols = init.zipWithIndex.map { case (c, i) => s"${d2Sql(c)} AS d$i" }.mkString(",\n                ")
    private val cellSql = """CASE WHEN d0 <= least(d1, d2, d3) THEN 0
                          WHEN d1 <= least(d2, d3) THEN 1
                          WHEN d2 <= d3 THEN 2 ELSE 3 END"""
    /** Prefix shared with d9c: embeddings cast + literal-centroid argmin
      * assignment (a0) — iteration 0 of every Lloyd unroll. */
    val assignCtes: String =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              d AS (SELECT vec_id, e,
                $dCols
                FROM e),
              a0 AS (SELECT vec_id, e, $cellSql AS cell FROM d)"""
    val ctes: String =
      s"""$assignCtes,
              el AS (SELECT cell, i, e[i] AS x FROM a0, range(1, ${dim + 1}) t(i)),
              cent AS (SELECT cell, i,
                  round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
                FROM el GROUP BY cell, i),
              cl AS (SELECT cell, list(c ORDER BY i) AS centroid FROM cent GROUP BY cell),
              d1 AS (SELECT vec_id, e, cl.cell AS cell,
                  list_sum(list_transform(range(1, ${dim + 1}),
                    i -> (e[i] - centroid[i]) * (e[i] - centroid[i]))) AS d2
                FROM e CROSS JOIN cl),
              a1 AS (SELECT vec_id, e, cell FROM (
                  SELECT vec_id, e, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM d1) t WHERE rn = 1),
              p AS (SELECT a.cell AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
                  list_cosine_similarity(a.e, b.e) AS cos
                FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.e, b.e) >= $threshold)"""
  }

  /** Multi-iteration Lloyd oracle: 3 full assign→decimal-mean rounds
    * unrolled as a CTE chain, gating `Cluster.lloyd`'s production loop
    * end-to-end (d9 unrolls only one round via `lloydOnce`). Every
    * iteration's centroid means are DECIMAL(25,10)-summed and 8-dp-rounded
    * on both sides, so the claim under test — the loop's results are
    * reduction-order-independent and engine-exact — is proven for the
    * iterated case, where a drifting double would compound. Output is the
    * final centroid table flattened to (cell, pos, c). */
  val d9cLloyd3: Q = {
    val iters = 3
    val dim = 64
    val distSql = s"""list_sum(list_transform(range(1, ${dim + 1}),
                    i -> (e[i] - centroid[i]) * (e[i] - centroid[i])))"""
    val chain = (1 to iters).map { it =>
      val means = s"""el$it AS (SELECT cell, i, e[i] AS x FROM a${it - 1}, range(1, ${dim + 1}) t(i)),
              cent$it AS (SELECT cell, i,
                  round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
                FROM el$it GROUP BY cell, i)"""
      val reassign = s""",
              cl$it AS (SELECT cell, list(c ORDER BY i) AS centroid FROM cent$it GROUP BY cell),
              dd$it AS (SELECT vec_id, e, cl$it.cell AS cell, $distSql AS d2
                FROM e CROSS JOIN cl$it),
              a$it AS (SELECT vec_id, e, cell FROM (
                  SELECT vec_id, e, cell,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                  FROM dd$it) t WHERE rn = 1)"""
      if (it < iters) means + reassign else means
    }.mkString(",\n              ")
    Q("d9c_lloyd3_centroids",
      Some(s"""${SemDedup.assignCtes},
              $chain
              SELECT cell, CAST(i - 1 AS INT) AS pos, c FROM cent$iters
              ORDER BY cell, pos"""),
      (s, d) => graft.ops.Cluster.lloyd(embeddings(s, d), "embedding", "vec_id",
          SemDedup.init, iterations = iters)
        .select(col("cell"), posexplode(col("centroid")).as(Seq("pos", "c")))
        .orderBy("cell", "pos"))
  }

  val d9SemDedup: Q =
    Q("d9_semantic_dedup",
      Some(s"""${SemDedup.ctes}
              SELECT cell, id_a, id_b, round(cos, 4) AS cos FROM p
              ORDER BY id_a, id_b"""),
      (s, d) => graft.ops.Cluster.semanticDupPairs(embeddings(s, d), "embedding", "vec_id",
          SemDedup.init, SemDedup.threshold)
        .select(col("cell"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy("id_a", "id_b"))

  /** The SemDeDup DECISION: keep-one-per-near-dup-group, first-wins on the
    * lower id (any vector that pairs with a smaller id is dropped — the
    * same rule curate's MinHash stage applies to text). Survivor list =
    * corpus minus losers via a left anti join. */
  val d9bSemKeep: Q =
    Q("d9b_semantic_keep",
      Some(s"""${SemDedup.ctes},
              losers AS (SELECT DISTINCT id_b AS vec_id FROM p)
              SELECT vec_id, label FROM embeddings
              WHERE vec_id NOT IN (SELECT vec_id FROM losers)
              ORDER BY vec_id"""),
      (s, d) => {
        val emb = embeddings(s, d)
        val losers = graft.ops.Cluster.semanticDupPairs(emb, "embedding", "vec_id",
            SemDedup.init, SemDedup.threshold)
          .select(col("id_b").as("vec_id")).distinct()
        emb.join(losers, Seq("vec_id"), "left_anti")
          .select("vec_id", "label").orderBy("vec_id")
      })

  /** Incremental index maintenance (ref `vector_store.py:165-205`
    * re-upserts per document): the stored IVF+PQ index mutated through
    * the full [[Upsert]] lifecycle and queried, against an oracle that
    * only knows the FINAL logical state — base write where every 10th
    * vector is CORRUPTED (indexed under the zero vector's cell/codes),
    * an upsert segment that fixes them (exercising the cell-move
    * tombstone path whenever the true cell differs from the zero
    * vector's), then a delete segment for every 17th vector. The pruned
    * resolved read must surface exactly what a from-scratch rebuild
    * minus deletions would: any stale row, lost tombstone, or
    * resolution-order bug leaves a corrupted/deleted vector in (or a
    * fixed one out of) the top-k and hash-fails. */
  val v9IndexUpsert: Q = Q("v9_index_upsert",
    Some(s"""WITH d AS (SELECT vec_id, embedding AS e, $ivfDCols, $pqDCols FROM embeddings),
            c AS (SELECT vec_id, e, $ivfCellSql AS cell, $pqCodeCols FROM d),
            q AS (SELECT e AS qv, cell AS qcell FROM c WHERE vec_id = 0),
            lut AS (SELECT $pqLutCols FROM q)
            SELECT vec_id, round($pqScoreSql, 6) AS score
            FROM c, q, lut WHERE c.cell = q.qcell AND vec_id % 17 <> 0
            ORDER BY score DESC, vec_id LIMIT 5"""),
    (s, d) => {
      import graft.index.Upsert
      val emb = embeddings(s, d)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_upsert_${Integer.toHexString(d.hashCode)}"
      val zero = array_repeat(lit(0.0f), 64)
      def indexed(vec: org.apache.spark.sql.Column) = Seq(
        Search.pqCodes(vec, pqCodebooks, pqSubDim).as("codes"),
        Search.ivfCell(vec, ivfCentroids).as("cell"))
      // base: every 10th vector corrupted to the zero vector's cell/codes
      val baseVec = when(col("vec_id") % 10 === 0, zero).otherwise(col("embedding"))
      Upsert.writeBase(emb.select(col("vec_id") +: indexed(baseVec): _*), "cell", out)
      // segment 1: fix the corrupted vectors (inserts nothing new; moves
      // cells wherever the true cell differs from the zero vector's)
      Upsert.upsert(s, out,
        emb.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id") +: indexed(col("embedding")): _*))
      // segment 2: delete every 17th vector
      Upsert.delete(s, out, emb.filter(col("vec_id") % 17 === 0).select("vec_id"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), Search.ivfCell(col("embedding"), ivfCentroids).as("cell"))
      Upsert.readPrunedResolved(s, out, q)
        .select(col("vec_id"),
          round(Search.pqAdcScore(col("codes"), col("qv"), pqCodebooks, pqSubDim), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(5)
    })

  /** REAL PNG pixel decode, oracle-gated end-to-end: complete PNGs
    * (IHDR/PLTE/IDAT/IEND, CRC'd chunks, deflated scanlines) are encoded
    * executor-side from doc_id arithmetic across all four supported color
    * types with the filter type CYCLING per scanline ((y + doc_id) % 5 —
    * every decode exercises Sub/Up/Average/Paeth, not just None), then
    * `Image.decodePng` must recover the planted pixels through
    * inflate + unfilter. The oracle never sees bytes: it predicts
    * pixel_sum (over all unfiltered channel bytes) and the center-pixel
    * gray probe from the same arithmetic, so a wrong unfilter offset, a
    * swapped Paeth tiebreak, or a palette/luma slip hash-fails. Every 7th
    * payload gets one mid-file byte flipped — CRC verification must turn
    * exactly those rows into nulls (fail-to-null, never garbage). */
  val m7PngDecode = Q("m7_png_decode",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 12 + 1 AS INT) AS w,
              CAST((doc_id * 3) % 10 + 1 AS INT) AS h,
              CAST(doc_id % 4 AS INT) AS sel
            FROM documents),
            q AS (SELECT doc_id, w, h, sel,
              CASE sel WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 6 END AS color_type,
              CASE sel WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 4 END AS channels
            FROM p),
            s AS (SELECT doc_id, w, h, sel, color_type, channels,
              CAST(list_sum(list_transform(range(0, CAST(h AS BIGINT) * w * channels, 1), k ->
                CASE WHEN sel = 2
                  THEN ((k % (w * channels)) // channels * 3 + (k // (w * channels)) * 5 + doc_id) % 16
                  ELSE ((k % (w * channels)) // channels * 7 + (k // (w * channels)) * 11 + (k % channels) * 29 + doc_id) % 256
                END)) AS BIGINT) AS pixel_sum,
              w // 2 AS x0, h // 2 AS y0
            FROM q),
            g AS (SELECT doc_id, w, h, sel, color_type, channels, pixel_sum,
              CASE sel
                WHEN 0 THEN (x0 * 7 + y0 * 11 + doc_id) % 256
                WHEN 2 THEN (299 * (((x0 * 3 + y0 * 5 + doc_id) % 16) * 37 % 256)
                           + 587 * (((x0 * 3 + y0 * 5 + doc_id) % 16) * 59 % 256)
                           + 114 * (((x0 * 3 + y0 * 5 + doc_id) % 16) * 83 % 256)) // 1000
                ELSE (299 * ((x0 * 7 + y0 * 11 + doc_id) % 256)
                    + 587 * ((x0 * 7 + y0 * 11 + 29 + doc_id) % 256)
                    + 114 * ((x0 * 7 + y0 * 11 + 58 + doc_id) % 256)) // 1000
              END AS gray_mid
            FROM s)
            SELECT doc_id, doc_id % 7 <> 0 AS ok,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE w END AS width,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE h END AS height,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(color_type AS INT) END AS color_type,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(channels AS INT) END AS channels,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE pixel_sum END AS pixel_sum,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(gray_mid AS INT) END AS gray_mid
            FROM g ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withPng = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val w = (id % 12 + 1).toInt; val h = ((id * 3) % 10 + 1).toInt
        val sel = (id % 4).toInt
        val ct = Seq(0, 2, 3, 6)(sel); val ch = Seq(1, 3, 1, 4)(sel)
        val raw = new Array[Byte](w * h * ch)
        for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
          val v = if (sel == 2) (x * 3 + y * 5 + id) % 16 else (x * 7 + y * 11 + c * 29 + id) % 256
          raw(y * w * ch + x * ch + c) = v.toByte
        }
        val pal = if (sel == 2) Array.tabulate(48) { k =>
          val j = k / 3
          (if (k % 3 == 0) j * 37 % 256 else if (k % 3 == 1) j * 59 % 256 else j * 83 % 256).toByte
        } else null
        val png = graft.ops.Image.encodePng(w, h, ct, raw, y => ((y + id) % 5).toInt, pal)
        // one flipped mid-file byte: always inside a CRC-covered span (the
        // signature is 8 bytes, the midpoint of any complete PNG is past
        // it), so decode must fail closed
        if (id % 7 == 0) png(png.length / 2) = (png(png.length / 2) ^ 0xff).toByte
        Seq(png)
      }
      graft.ops.Image.decodeStatsStage(withPng, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.width").as("width"), col("st.height").as("height"),
          col("st.color_type").as("color_type"), col("st.channels").as("channels"),
          col("st.pixel_sum").as("pixel_sum"), col("st.gray_mid").as("gray_mid"))
        .orderBy("doc_id")
    })

  /** REAL baseline JPEG pixel decode, oracle-gated end-to-end (the last
    * codec-stub seam closed): complete baseline JPEGs — DQT/SOF0/DHT/SOS,
    * Annex-K Huffman entropy coding, FDCT — are encoded executor-side
    * from doc_id arithmetic as per-8×8-block CONSTANT images with a flat
    * quantization step of 8, which makes the lossy DCT round-trip EXACT
    * (constant blocks carry only a DC coefficient, 8·(v−128), integral
    * under /8 — see [[graft.ops.Jpeg]]; JpegSpec pins the same contract
    * through ImageIO's independent decoder). `Jpeg.decode` must recover
    * the planted pixels through Huffman + dequant + IDCT; the oracle
    * predicts pixel_sum and the center probe from the same arithmetic,
    * never seeing bytes. Every 9th payload is truncated mid-scan and
    * MUST fail closed to null. */
  val m12JpegDecode = Q("m12_jpeg_decode",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 21 + 4 AS INT) AS w,
              CAST((doc_id * 3) % 17 + 4 AS INT) AS h
            FROM documents),
            s AS (SELECT doc_id, w, h,
              CAST(list_sum(list_transform(range(0, CAST(h AS BIGINT) * w, 1), k ->
                ((k % w) // 8 * 7 + (k // w) // 8 * 11 + doc_id) % 256)) AS BIGINT) AS pixel_sum,
              ((w // 2) // 8 * 7 + (h // 2) // 8 * 11 + doc_id) % 256 AS gray_mid
            FROM p)
            SELECT doc_id, doc_id % 9 <> 0 AS ok,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE w END AS width,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE h END AS height,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE 1 END AS components,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE pixel_sum END AS pixel_sum,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(gray_mid AS INT) END AS gray_mid
            FROM s ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withJpg = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val w = (id % 21 + 4).toInt; val h = ((id * 3) % 17 + 4).toInt
        val px = Array.tabulate(w * h) { k =>
          val x = k % w; val y = k / w
          (((x / 8) * 7 + (y / 8) * 11 + id) % 256).toByte
        }
        val jpg = graft.ops.Jpeg.encodeGray(w, h, px, qStep = 8)
        Seq(if (id % 9 == 0) java.util.Arrays.copyOf(jpg, jpg.length - 12) else jpg)
      }
      graft.ops.Jpeg.decodeStatsStage(withJpg, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.width").as("width"), col("st.height").as("height"),
          col("st.components").as("components"),
          col("st.pixel_sum").as("pixel_sum"), col("st.gray_mid").as("gray_mid"))
        .orderBy("doc_id")
    })

  /** JPEG near-dup pairs — d18's planted-signature dedup chain running
    * on the web's dominant image format END-TO-END: each doc renders a
    * 72×64 image whose 8×8 BLOCKS are constant at the d18 gradient-walk
    * values (each dHash cell box-averages exactly one block, so resize
    * is exact), encodes it as a REAL baseline JPEG (qStep 8 ⇒ lossless
    * for block constants), and the engine must decode → dHash → band →
    * verify. Identical oracle arithmetic to d18: one wrong Huffman run,
    * IDCT slip, or dHash bit changes pair membership and hash-fails. */
  val m13JpegNearDup = Q("m13_jpeg_neardup_pairs",
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gb, CAST(doc_id % 4 AS INT) AS m FROM documents),
            bits AS (SELECT doc_id, i,
                (((((gb * 48271 + i * 16807) % 1000003) * ((gb * 48271 + i * 16807) % 1000003)) % 1000003) < 500002) <>
                  list_contains(list_transform(range(CAST(m AS BIGINT)), j -> (gb * 7 + j * 19) % 64), i) AS b
              FROM d, range(0, 64, 1) t(i)),
            sig AS (SELECT doc_id, string_agg(CASE WHEN b THEN '1' ELSE '0' END, '' ORDER BY i) AS sig
                    FROM bits GROUP BY doc_id),
            blk AS (SELECT doc_id, sig,
                concat(CAST(q AS VARCHAR), ':', substr(sig, CAST(q * 16 + 1 AS INT), 16)) AS blk
              FROM sig, range(0, 4, 1) t(q)),
            cand AS (SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a, b.doc_id AS id_b, b.sig AS sig_b
                     FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id),
            ham AS (SELECT id_a, id_b,
                CAST(len(list_filter(range(1, 65, 1), i -> sig_a[i] <> sig_b[i])) AS BIGINT) AS hamming
              FROM cand)
            SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withJpg = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val gb = id / 4; val m = (id % 4).toInt
        val bits = Array.tabulate(64) { i =>
          val v = (gb * 48271L + i * 16807L) % 1000003
          v * v % 1000003 < 500002
        }.zipWithIndex.map { case (b0, i) =>
          b0 != (0 until m).exists(j => (gb * 7 + j * 19) % 64 == i)
        }
        val walk = new Array[Int](72)
        for (y <- 0 until 8) {
          walk(y * 9) = 128
          for (x <- 0 until 8)
            walk(y * 9 + x + 1) = walk(y * 9 + x) + (if (bits(y * 8 + x)) 1 else -1)
        }
        // 72×64: dHash target cell (cx, cy) box-averages exactly the 8×8
        // block holding walk(cy*9+cx) — resize is exact, bits are planted
        val px = Array.tabulate(72 * 64) { k =>
          val x = k % 72; val y = k / 72
          walk((y / 8) * 9 + (x / 8)).toByte
        }
        Seq(graft.ops.Jpeg.encodeGray(72, 64, px, qStep = 8))
      }
      val sigs = graft.ops.Jpeg.dhashStage(withJpg, "payload", "sig")
      graft.ops.Image.imageNearDupPairs(sigs, "doc_id", "sig", maxHamming = 3)
        .orderBy("id_a", "id_b")
    })

  /** PROGRESSIVE (SOF2) JPEG pixel decode, oracle-gated end-to-end: the
    * m12 contract on the multi-scan path. Executor-side fixtures are
    * encoded with [[graft.ops.Jpeg.encodeGrayProgressive]]'s three-scan
    * script (DC first pass at Al=1, the 1–63 AC band as a spectral-
    * selection scan, then the DC successive-approximation refinement
    * bit), so a decoder that ignored the refinement scan would be off by
    * one gray level on odd DCs and hash-fail. Block-constant pixels +
    * flat qStep 8 keep the round trip exact (see m12); the oracle
    * predicts pixel_sum and the center probe arithmetically. Every 11th
    * payload is truncated mid-scan and MUST fail closed to null.
    * JpegSpec pins the same decoder against ImageIO's own progressive
    * writer (real AC-refinement scans). */
  val m14ProgressiveDecode = Q("m14_progressive_decode",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 19 + 4 AS INT) AS w,
              CAST((doc_id * 5) % 15 + 4 AS INT) AS h
            FROM documents),
            s AS (SELECT doc_id, w, h,
              CAST(list_sum(list_transform(range(0, CAST(h AS BIGINT) * w, 1), k ->
                ((k % w) // 8 * 13 + (k // w) // 8 * 5 + doc_id) % 256)) AS BIGINT) AS pixel_sum,
              ((w // 2) // 8 * 13 + (h // 2) // 8 * 5 + doc_id) % 256 AS gray_mid
            FROM p)
            SELECT doc_id, doc_id % 11 <> 0 AS ok,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE w END AS width,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE h END AS height,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE 1 END AS components,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE pixel_sum END AS pixel_sum,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE CAST(gray_mid AS INT) END AS gray_mid
            FROM s ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withJpg = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val w = (id % 19 + 4).toInt; val h = ((id * 5) % 15 + 4).toInt
        val px = Array.tabulate(w * h) { k =>
          val x = k % w; val y = k / w
          (((x / 8) * 13 + (y / 8) * 5 + id) % 256).toByte
        }
        val jpg = graft.ops.Jpeg.encodeGrayProgressive(w, h, px, qStep = 8)
        Seq(if (id % 11 == 0) java.util.Arrays.copyOf(jpg, jpg.length - 10) else jpg)
      }
      graft.ops.Jpeg.decodeStatsStage(withJpg, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.width").as("width"), col("st.height").as("height"),
          col("st.components").as("components"),
          col("st.pixel_sum").as("pixel_sum"), col("st.gray_mid").as("gray_mid"))
        .orderBy("doc_id")
    })

  /** REAL video-frame pixel decode, oracle-gated end-to-end: Motion-JPEG
    * in an AVI (RIFF) container — the m12/m14 JPEG stack behind a
    * container walk ([[graft.ops.Avi]]), one output ROW PER FRAME. Each
    * doc builds an AVI with 1–3 planted block-constant frames, baseline
    * and PROGRESSIVE JPEG frames alternating, so one stream exercises
    * both entropy layouts behind one 'vids'/'MJPG' stream header. Both
    * quarantine granularities are gated: every 13th CONTAINER is
    * truncated (one all-null row, container_ok=false) and every 5th
    * doc's LAST FRAME carries corrupt JPEG bytes (frame_ok=false row,
    * container still sound). The oracle predicts per-frame pixel sums
    * and the avih timing/frame-count fields arithmetically. */
  val m15MjpegFrames = Q("m15_mjpeg_frames",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 13 + 4 AS INT) AS w,
              CAST((doc_id * 7) % 11 + 4 AS INT) AS h,
              CAST(doc_id % 3 + 1 AS INT) AS nf,
              CAST(33000 + doc_id % 100 AS INT) AS upf
            FROM documents),
            f AS (SELECT p.*, CAST(t.f AS INT) AS f
                  FROM p, range(0, 3, 1) t(f) WHERE t.f < p.nf AND doc_id % 13 <> 0),
            s AS (SELECT doc_id, w, h, nf, upf, f,
              NOT (doc_id % 5 = 0 AND f = nf - 1) AS fok,
              CAST(list_sum(list_transform(range(0, CAST(h AS BIGINT) * w, 1), k ->
                ((k % w) // 8 * 3 + (k // w) // 8 * 7 + doc_id + 17 * f) % 256)) AS BIGINT) AS ps,
              CAST(((w // 2) // 8 * 3 + (h // 2) // 8 * 7 + doc_id + 17 * f) % 256 AS INT) AS gm
            FROM f)
            SELECT doc_id, true AS container_ok, upf AS us_per_frame,
              nf AS declared_frames, w AS width, h AS height, f AS frame_idx,
              fok AS frame_ok,
              CASE WHEN fok THEN ps END AS pixel_sum,
              CASE WHEN fok THEN gm END AS gray_mid
            FROM s
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 13 = 0
            ORDER BY doc_id, frame_idx"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withAvi = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val w = (id % 13 + 4).toInt; val h = ((id * 7) % 11 + 4).toInt
        val nf = (id % 3 + 1).toInt; val upf = (33000 + id % 100).toInt
        val frames = (0 until nf).map { f =>
          val px = Array.tabulate(w * h) { k =>
            val x = k % w; val y = k / w
            (((x / 8) * 3 + (y / 8) * 7 + id + 17 * f) % 256).toByte
          }
          val jpg = if (f % 2 == 0) graft.ops.Jpeg.encodeGray(w, h, px)
                    else graft.ops.Jpeg.encodeGrayProgressive(w, h, px)
          if (id % 5 == 0 && f == nf - 1) java.util.Arrays.copyOf(jpg, jpg.length - 8)
          else jpg
        }
        val avi = graft.ops.Avi.encodeMjpegAvi(w, h, upf, frames)
        Seq(if (id % 13 == 0) java.util.Arrays.copyOf(avi, avi.length - 8) else avi)
      }
      graft.ops.Avi.frameStatsStage(withAvi, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("container_ok"),
          col("st.us_per_frame").as("us_per_frame"),
          col("st.declared_frames").as("declared_frames"),
          col("st.width").as("width"), col("st.height").as("height"),
          col("st.frame_idx").as("frame_idx"), col("st.frame_ok").as("frame_ok"),
          col("st.pixel_sum").as("pixel_sum"), col("st.gray_mid").as("gray_mid"))
        .orderBy("doc_id", "frame_idx")
    })

  /** DOCX (office-document) text extraction, oracle-gated end-to-end:
    * the enterprise-corpus path. Each doc builds a REAL ZIP
    * ([[graft.ops.Zip]], differential-tested against java.util.zip both
    * directions) holding a deflated `word/document.xml` with 1–4 planted
    * paragraphs (XML entities included, so unescaping is load-bearing);
    * the engine finds the EOCD, walks the central directory, raw-
    * inflates the part, verifies CRC-32, and pulls `<w:t>` run text —
    * the FULL extracted string is a hashed output column. Every 13th
    * container has a corrupt EOCD (whole-payload null); every 7th has a
    * corrupt deflate stream in the document part (text null, member
    * listing still sound). */
  val docx1Text = Q("docx1_text_extract",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS np FROM documents),
            t AS (SELECT doc_id, np,
              string_agg('P' || CAST(j AS VARCHAR) || ' & ' ||
                         repeat('w', CAST((doc_id + j) % 12 AS INT)), chr(10) ORDER BY j) AS text
              FROM p, range(0, 4, 1) r(j) WHERE r.j < p.np GROUP BY doc_id, np)
            SELECT doc_id, doc_id % 13 <> 0 AS zip_ok,
              CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 2 END AS n_members,
              CASE WHEN doc_id % 13 = 0 OR doc_id % 7 = 0 THEN NULL ELSE text END AS text
            FROM t ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withZip = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val np = (id % 4 + 1).toInt
        val paras = (0 until np).map(j =>
          s"<w:p><w:r><w:t>P$j &amp; ${"w" * ((id + j) % 12).toInt}</w:t></w:r></w:p>").mkString
        val xml = s"<w:document><w:body>$paras</w:body></w:document>"
        val zip = graft.ops.Zip.encodeZip(Seq(
          ("[Content_Types].xml", "<Types/>".getBytes("UTF-8"), false),
          ("word/document.xml", xml.getBytes("UTF-8"), true)))
        // member 2's deflate stream starts at a fixed offset for this layout
        if (id % 7 == 0 && id % 13 != 0) zip(104) = (zip(104) ^ 0x04).toByte
        if (id % 13 == 0) zip(zip.length - 20) = (zip(zip.length - 20) ^ 0x40).toByte // EOCD
        Seq(zip)
      }
      graft.ops.Zip.docxStage(withZip, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("zip_ok"),
          col("st.n_members").as("n_members"), col("st.text").as("text"))
        .orderBy("doc_id")
    })

  /** XLSX cell extraction, oracle-gated end-to-end: workbooks are ZIPs
    * of SpreadsheetML parts ([[graft.ops.Xlsx]] over the [[graft.ops.Zip]]
    * walk) — the engine raw-inflates `xl/worksheets/sheet1.xml` AND
    * `xl/sharedStrings.xml`, resolves `t="s"` cells through the string
    * table (entity unescaping load-bearing), decodes A1-style refs to
    * ordinals, and emits one row per cell with string/number values
    * verbatim. Every 5th workbook's A1 cell carries an out-of-range
    * shared-string index (null-VALUE cell, listing sound); every 13th
    * has a corrupt EOCD (whole-payload null). */
  val xlsx1Cells = Q("xlsx1_cells",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 + 2 AS INT) AS nr FROM documents),
            r AS (SELECT p.*, CAST(t.r AS INT) AS r
                  FROM p, range(1, 5, 1) t(r) WHERE t.r <= p.nr AND doc_id % 13 <> 0),
            cells AS (
              SELECT doc_id, 'A' || CAST(r AS VARCHAR) AS ref, r AS row, 1 AS col,
                CASE WHEN doc_id % 5 = 0 AND r = 1 THEN NULL
                     ELSE 's-' || CAST(doc_id AS VARCHAR) || '-' || CAST((r + doc_id) % 3 AS VARCHAR) ||
                          CASE WHEN (r + doc_id) % 3 = 2 THEN ' & co' ELSE '' END END AS str_val,
                CAST(NULL AS VARCHAR) AS num_val
              FROM r
              UNION ALL
              SELECT doc_id, 'B' || CAST(r AS VARCHAR), r, 2, NULL,
                CAST((doc_id * 13 + r) % 1000 AS VARCHAR)
              FROM r)
            SELECT doc_id, true AS xlsx_ok, ref, row, col, str_val, num_val FROM cells
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 13 = 0
            ORDER BY doc_id, row, col"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withXlsx = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val nr = (id % 3 + 2).toInt
        val shared = (0 until 3).map(k => s"s-$id-$k" + (if (k == 2) " & co" else ""))
        val cells = (1 to nr).flatMap { rw =>
          val sIdx = if (id % 5 == 0 && rw == 1) 7 else ((rw + id) % 3).toInt
          Seq(s"A$rw" -> Left(sIdx), s"B$rw" -> Right(((id * 13 + rw) % 1000).toString))
        }
        val xlsx = graft.ops.Xlsx.encodeXlsx(shared, cells)
        if (id % 13 == 0) xlsx(xlsx.length - 20) = (xlsx(xlsx.length - 20) ^ 0x40).toByte
        Seq(xlsx)
      }
      graft.ops.Xlsx.cellStage(withXlsx, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("xlsx_ok"),
          col("st.ref").as("ref"), col("st.row").as("row"), col("st.col").as("col"),
          col("st.str_val").as("str_val"), col("st.num_val").as("num_val"))
        .orderBy("doc_id", "row", "col")
    })

  /** XLSX → reference table pipeline, composed end-to-end: extracted
    * workbook cells assemble into the `array<array<string>>` table shape
    * every reference table operator consumes, then run the REAL P5
    * clean ([[graft.ops.TableOps.cleanRows]] — the planted double-space
    * cells must collapse), the F22 role rule
    * ([[graft.ops.TableOps.tableRole]] — headers planted to hit all
    * three branches), and the J2 content hash
    * ([[graft.ops.TableOps.contentHash]]) whose md5 the oracle
    * reconstructs arithmetically. Proof that a reference user can run
    * their table pipeline on spreadsheet input unchanged. */
  val xlsx2TablePipeline = Q("xlsx2_table_pipeline",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 + 2 AS INT) AS nd FROM documents),
            r AS (SELECT p.*, CAST(t.r AS INT) AS r
                  FROM p, range(2, 7, 1) t(r) WHERE t.r < p.nd + 2),
            blobs AS (SELECT doc_id, nd,
              string_agg('v' || CAST(doc_id AS VARCHAR) || '-' || CAST(r AS VARCHAR) ||
                         CAST((doc_id * 7 + r) % 500 AS VARCHAR), '' ORDER BY r) AS blob
              FROM r GROUP BY doc_id, nd)
            SELECT doc_id,
              CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'transaction_table'
                   WHEN 1 THEN 'summary_table' ELSE 'other_table' END AS role,
              nd AS n_rows, 2 AS width,
              md5(lower(blob)) AS content_hash
            FROM blobs ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withXlsx = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val nd = (id % 3 + 2).toInt
        val headers = (id % 3).toInt match {
          case 0 => Seq("Date", "Amount")
          case 1 => Seq("Summary", "Notes")
          case _ => Seq("Item", "Qty")
        }
        val shared = headers ++ (2 until nd + 2).map(rw => s"v  $id-$rw") // double space: P5 must collapse
        val cells = Seq("A1" -> Left(0), "B1" -> Left(1)) ++
          (2 until nd + 2).flatMap(rw => Seq(
            s"A$rw" -> Left(rw),
            s"B$rw" -> Right(((id * 7 + rw) % 500).toString)))
        Seq(graft.ops.Xlsx.encodeXlsx(shared, cells))
      }
      val cells = graft.ops.Xlsx.cellStage(withXlsx, "payload", "st")
        .filter(col("st").isNotNull)
        .select(col("doc_id"), col("st.row").as("row"), col("st.col").as("c"),
          coalesce(col("st.str_val"), col("st.num_val")).as("v"))
      val rowArrays = cells.groupBy("doc_id", "row")
        .agg(transform(array_sort(collect_list(struct(col("c"), col("v")))),
          x => x.getField("v")).as("cells"))
      val tables = rowArrays.groupBy("doc_id")
        .agg(transform(array_sort(collect_list(struct(col("row"), col("cells")))),
          x => x.getField("cells")).as("rows"))
      val body = expr("slice(rows, 2, size(rows) - 1)")
      val cleaned = graft.ops.TableOps.cleanRows(body)
      tables.select(col("doc_id"),
          graft.ops.TableOps.tableRole(element_at(col("rows"), 1)).as("role"),
          size(cleaned).as("n_rows"),
          size(element_at(cleaned, 1)).as("width"),
          graft.ops.TableOps.contentHash(cleaned).as("content_hash"))
        .orderBy("doc_id")
    })

  /** TFRecord + tf.Example ingestion, oracle-gated end-to-end: the
    * TensorFlow training-data interchange format ([[graft.ops.TfRecord]])
    * — length framing with BOTH masked-CRC32C checksums verified per
    * record, then a real protobuf varint/tag walk pulling the
    * conventional features (label int64, tokens int64 list, text bytes).
    * Both quarantine levels are gated: every 13th shard has a flipped
    * data byte (CRC mismatch → the WHOLE shard nulls, framing is
    * sequential) and every 5th shard carries one CRC-sound record whose
    * protobuf is broken (parsed=false row, the rest of the shard
    * survives). The oracle predicts labels/token sums arithmetically. */
  val tfr1TfExample = Q("tfr1_tfexample_records",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nr FROM documents),
            r AS (SELECT p.*, CAST(t.j AS INT) AS j
                  FROM p, range(0, 3, 1) t(j) WHERE t.j < p.nr AND doc_id % 13 <> 0),
            s AS (SELECT doc_id, j AS record_idx, true AS parsed,
              CAST((doc_id + j) % 10 AS BIGINT) AS label,
              CAST((doc_id + j) % 5 + 1 AS INT) AS n_tokens,
              CAST(list_sum(list_transform(range(0, CAST((doc_id + j) % 5 + 1 AS BIGINT), 1), t ->
                (doc_id * 7 + j * 3 + t) % 1000)) AS BIGINT) AS token_sum,
              CAST((doc_id + j) % 9 + 3 AS INT) AS text_len
            FROM r)
            SELECT doc_id, true AS shard_ok, record_idx, parsed, label,
              n_tokens, token_sum, text_len
            FROM s
            UNION ALL
            SELECT doc_id, true, CAST(doc_id % 3 + 1 AS INT), false,
              NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 5 = 0 AND doc_id % 13 <> 0
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 13 = 0
            ORDER BY doc_id, record_idx"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withShard = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val nr = (id % 3 + 1).toInt
        val recs = (0 until nr).map { j =>
          val nt = ((id + j) % 5 + 1).toInt
          graft.ops.TfRecord.encodeExample((id + j) % 10,
            (0 until nt).map(t => (id * 7 + j * 3 + t) % 1000),
            ("t" * (((id + j) % 9).toInt + 3)).getBytes("UTF-8"))
        }
        val all = if (id % 5 == 0 && id % 13 != 0)
          recs :+ Array[Byte](0x0A, 0xFF.toByte) // CRC-sound frame, broken proto
        else recs
        val shard = graft.ops.TfRecord.encodeShard(all)
        if (id % 13 == 0) shard(14) = (shard(14) ^ 0x40).toByte // data CRC break
        Seq(shard)
      }
      graft.ops.TfRecord.exampleStage(withShard, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("shard_ok"),
          col("st.record_idx").as("record_idx"), col("st.parsed").as("parsed"),
          col("st.label").as("label"), col("st.n_tokens").as("n_tokens"),
          col("st.token_sum").as("token_sum"), col("st.text_len").as("text_len"))
        .orderBy("doc_id", "record_idx")
    })

  /** Avro object-container ingestion, oracle-gated end-to-end: the
    * data-lake / Kafka-archive shard format ([[graft.ops.Avro]]) — a
    * zero-dep container walk (bounded varint/JSON-schema parse,
    * deflate blocks, sync-marker framing) differential-tested BOTH
    * directions against the Apache Avro reference implementation.
    * All three quarantine granularities are gated: every 11th shard
    * has a flipped sync marker (framing lost → the WHOLE shard nulls),
    * every 5th shard (with ≥2 blocks) carries one truncated block
    * (its `parsed=false` row; sibling blocks survive — Avro blocks
    * have no checksum, so corruption is detected structurally and the
    * sync marker resynchronizes), and the rest round-trip both codecs
    * (even ids deflate, odd null). The oracle predicts every value
    * arithmetically. */
  val avro1Records = Q("avro1_records",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 4 + 2 AS INT) AS nr FROM documents),
            r AS (SELECT p.doc_id, p.nr, CAST(t.j AS INT) AS j
                  FROM p, range(0, 5, 1) t(j) WHERE t.j < p.nr),
            keep AS (SELECT * FROM r WHERE doc_id % 11 <> 0
                     AND NOT (doc_id % 5 = 0 AND nr >= 3 AND j IN (2, 3))),
            rws AS (SELECT doc_id, CAST(j // 2 AS INT) AS block_idx,
              CAST(j % 2 AS INT) AS record_idx, true AS parsed,
              doc_id * 10 + j AS id, CAST((doc_id + j) % 7 AS BIGINT) AS label,
              CAST((doc_id + j) % 13 AS INT) AS text_len,
              CAST((doc_id * 3 + j) % 40 AS DOUBLE) / 8 AS score,
              (doc_id + j) % 2 = 0 AS flag
            FROM keep)
            SELECT doc_id, true AS shard_ok, block_idx, record_idx, parsed,
              id, label, text_len, score, flag
            FROM rws
            UNION ALL
            SELECT doc_id, true, 1, NULL, false, NULL, NULL, NULL, NULL, NULL
            FROM p WHERE doc_id % 5 = 0 AND doc_id % 11 <> 0 AND nr >= 3
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 11 = 0
            ORDER BY doc_id, block_idx, record_idx"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops.Avro
      val base = documents(s, d).select("doc_id")
      val fieldsDef = Seq(
        Avro.Field("id", "long", nullable = false),
        Avro.Field("label", "long", nullable = false),
        Avro.Field("text", "string", nullable = false),
        Avro.Field("score", "double", nullable = false),
        Avro.Field("flag", "boolean", nullable = false),
        Avro.Field("payload", "bytes", nullable = true))
      val withShard = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val nr = (id % 4 + 2).toInt
        val recs = (0 until nr).map { j =>
          Seq[Any](id * 10 + j, (id + j) % 7, "t" * (((id + j) % 13).toInt),
            ((id * 3 + j) % 40).toDouble / 8.0, (id + j) % 2 == 0,
            if (j % 3 == 1) null else Array.tabulate(j % 4 + 1)(k => (k * 7 + j).toByte))
        }
        Seq(Avro.encode(fieldsDef, recs,
          codec = if (id % 2 == 0) "deflate" else "null",
          recordsPerBlock = 2, syncSeed = id,
          corruptBlock = if (id % 5 == 0 && nr >= 3) Some(1) else None,
          corruptSync = id % 11 == 0))
      }
      Avro.recordStage(withShard, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("shard_ok"),
          col("st.block_idx").as("block_idx"), col("st.record_idx").as("record_idx"),
          col("st.parsed").as("parsed"), col("st.id").as("id"),
          col("st.label").as("label"), col("st.text_len").as("text_len"),
          col("st.score").as("score"), col("st.flag").as("flag"))
        .orderBy("doc_id", "block_idx", "record_idx")
    })

  /** 7z archive ingestion ([[graft.ops.SevenZip]]): the format the
    * StackExchange data dumps — a canonical pretraining source — ship
    * in, walked through commons-compress on Spark's own classpath under
    * the member/total bomb budgets. The fixture has the REAL shape:
    * one big LZMA2 archive per 50-doc shard (StackExchange ships one
    * archive per site, not per document — and a per-doc archive would
    * pay the LZMA2 encoder-init cost thousands of times). The
    * shard-assembly collect_list is FIXTURE synthesis only (bounded at
    * 50 docs by construction); real ingestion receives archives as
    * payload bytes and runs the map-only walk. Every 8th
    * SHARD has a torn tail and must quarantine whole (7z's member
    * table lives at the END of the file — tearing it is exactly the
    * interrupted-download failure). Full member content is md5-gated. */
  val sz1SevenZip = Q("sz1_7z_members",
    Some("""WITH p AS (SELECT doc_id, doc_id // 50 AS shard_id,
              '<posts>' || array_to_string(list_transform(range(0, CAST(doc_id % 4 + 1 AS BIGINT), 1),
                k -> printf('<row Id="%d"/>', doc_id * 5 + k)), '') || '</posts>' AS posts
            FROM documents)
            SELECT shard_id, true AS shard_ok, printf('doc%08d.xml', doc_id) AS name,
              CAST(length(posts) AS BIGINT) AS size, md5(posts) AS content_md5
            FROM p WHERE shard_id % 8 <> 0
            UNION ALL
            SELECT DISTINCT shard_id, false, NULL, NULL, NULL
            FROM p WHERE shard_id % 8 = 0
            ORDER BY shard_id, name"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops.SevenZip
      val shards = documents(s, d)
        .groupBy(expr("doc_id DIV 50").as("shard_id"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      val withShard = graft.ops.Stages.appendFields(shards,
          Seq(StructField("payload", BinaryType))) { r =>
        val sid = r.getLong(0)
        val ids = r.getSeq[Long](1)
        val members = ids.map { id =>
          val n = (id % 4 + 1).toInt
          val posts = "<posts>" +
            (0 until n).map(k => s"""<row Id="${id * 5 + k}"/>""").mkString + "</posts>"
          f"doc$id%08d.xml" -> posts.getBytes("UTF-8")
        }
        val good = SevenZip.encode(members.toSeq, preset = 0, dictSize = 1 << 12)
        Seq(if (sid % 8 == 0) java.util.Arrays.copyOf(good, good.length - 6) else good)
      }
      SevenZip.memberStage(withShard, "payload", "m")
        .select(col("shard_id"), col("m").isNotNull.as("shard_ok"),
          col("m.name").as("name"), col("m.size").as("size"),
          when(col("m.data").isNotNull, md5(col("m.data"))).as("content_md5"))
        .orderBy("shard_id", "name")
    })

  /** StackExchange-dump pipeline, composed end-to-end: 7z archive walk
    * ([[graft.ops.SevenZip]]) → Posts.xml → per-post `Body` attribute
    * extraction → XML entity unescape → the REAL boilerplate extractor
    * ([[graft.ops.Cleaning.mainContent]], the jusText line-density
    * gate) — the actual shape of turning a StackExchange dump into
    * training text, with every stage the engine's existing operator.
    * Each post body carries a content paragraph plus a link-dense
    * "related" block the density gate must kill; the oracle replays
    * the whole chain (the p15 convention) and the surviving text is
    * md5-gated. One shard-assembly aggregate + one map-only walk + one
    * explode before the output sort. */
  val sz2StackExchange = Q("sz2_stackexchange_pipeline",
    Some("""WITH p AS (SELECT doc_id, text, CAST(doc_id % 3 + 1 AS INT) AS n FROM documents),
            posts AS (SELECT doc_id, CAST(t.k AS INT) AS post_idx,
              concat('<p>', substr(text, CAST(t.k * 40 + 1 AS INT), 60), '</p>', chr(10),
                '<div><a href="/x">Related link one</a> <a href="/y">Related link two</a></div>')
                AS body
              FROM p, range(0, 3, 1) t(k) WHERE t.k < p.n),
            m AS (SELECT doc_id, post_idx,
              coalesce(list_aggregate(list_transform(list_filter(string_split(body, chr(10)),
                line -> length(trim(regexp_replace(line, '<[^>]*>', '', 'g'))) >= 20
                    AND coalesce(list_sum(list_transform(regexp_extract_all(line, '(?i)<a[^>]*>(.*?)</a>', 1),
                          x -> length(regexp_replace(x, '<[^>]*>', '', 'g')))), 0) * 3
                        <= length(trim(regexp_replace(line, '<[^>]*>', '', 'g')))),
                l -> trim(regexp_replace(l, '<[^>]*>', '', 'g'))), 'string_agg', chr(10)), '') AS main_text
            FROM posts)
            SELECT doc_id, post_idx, CAST(length(main_text) AS INT) AS main_len,
              md5(main_text) AS main_md5
            FROM m ORDER BY doc_id, post_idx"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops.{Cleaning, SevenZip}
      // one archive per 50-doc shard (the sz1 rationale), one
      // docNNNNNNNN.xml member per document
      val shards = documents(s, d)
        .groupBy(expr("doc_id DIV 50").as("shard_id"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("docs"))
      val withShard = graft.ops.Stages.appendFields(shards,
          Seq(StructField("payload", BinaryType))) { r =>
        def esc(x: String) = x.replace("&", "&amp;").replace("<", "&lt;")
          .replace(">", "&gt;").replace("\"", "&quot;")
        val docs = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)
        val members = docs.map { dr =>
          val id = dr.getLong(0)
          val text = dr.getString(1)
          val n = (id % 3 + 1).toInt
          val rows = (0 until n).map { k =>
            val from = k * 40
            val chunk = if (from >= text.length) "" else text.substring(from, math.min(from + 60, text.length))
            val body = "<p>" + chunk + "</p>\n" +
              """<div><a href="/x">Related link one</a> <a href="/y">Related link two</a></div>"""
            s"""<row Id="${id * 7 + k}" Body="${esc(body)}"/>"""
          }
          f"doc$id%08d.xml" -> ("<posts>" + rows.mkString + "</posts>").getBytes("UTF-8")
        }
        Seq(SevenZip.encode(members.toSeq, preset = 0, dictSize = 1 << 12))
      }
      val xml = SevenZip.memberStage(withShard, "payload", "m")
        .select(regexp_extract(col("m.name"), "doc(\\d+)\\.xml", 1).cast("long").as("doc_id"),
          col("m.data").cast("string").as("xml"))
      val bodies = xml.select(col("doc_id"),
        posexplode(expr("""regexp_extract_all(xml, 'Body="([^"]*)"', 1)""")).as(Seq("post_idx", "escaped")))
      // entity unescape — &amp; LAST, the standard ordering trap
      val unescaped = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        col("escaped"), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&amp;", "&")
      bodies.select(col("doc_id"), col("post_idx"),
          Cleaning.mainContent(unescaped).as("main_text"))
        .select(col("doc_id"), col("post_idx"),
          length(col("main_text")).cast("int").as("main_len"),
          md5(col("main_text").cast("binary")).as("main_md5"))
        .orderBy("doc_id", "post_idx")
    })

  /** Debian package (.deb) ingestion, composed end-to-end
    * ([[graft.ops.Ar]]): the real nesting — ar archive holding
    * `debian-binary`, `control.tar.gz` (through the EXISTING
    * [[graft.ops.Warc.gunzipMember]] + [[graft.ops.Tar]] walk) and
    * `data.tar.xz` (through [[graft.ops.Codecs.unxz]] + the same tar
    * walk) — the shape a code-training pipeline meets when it ingests
    * distro packages. Every 10th payload has a torn tail and must
    * quarantine whole; control-file text is md5-gated and the data
    * manifest (file count + total bytes) is predicted arithmetically.
    * Map-only per payload. */
  val deb1Package = Q("deb1_package_members",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS n,
              doc_id % 10 = 0 AS corrupt FROM documents),
            t AS (SELECT doc_id, n, corrupt,
              printf('Package: pkg%d', doc_id) || chr(10) ||
                printf('Version: 1.%d', doc_id % 50) || chr(10) AS ctrl,
              CAST(list_sum(list_transform(range(0, CAST(n AS BIGINT), 1),
                k -> (doc_id + k) % 9 + 1)) AS BIGINT) AS total
            FROM p)
            SELECT doc_id, NOT corrupt AS ok,
              CASE WHEN corrupt THEN NULL ELSE md5(ctrl) END AS control_md5,
              CASE WHEN corrupt THEN NULL ELSE n END AS n_data_files,
              CASE WHEN corrupt THEN NULL ELSE total END AS data_bytes
            FROM t ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType, LongType, StringType, StructField, StructType}
      import graft.ops.{Ar, Codecs, Tar, Warc}
      val base = documents(s, d).select("doc_id")
      val withDeb = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val n = (id % 3 + 1).toInt
        val ctrl = s"Package: pkg$id\nVersion: 1.${id % 50}\n"
        val controlTgz = Warc.gzipMember(Tar.encodeTar(Seq("./control" -> ctrl.getBytes("UTF-8"))))
        val dataTxz = Codecs.xz(Tar.encodeTar((0 until n).map { k =>
          s"./usr/share/doc/f$k" -> ("x" * (((id + k) % 9) + 1).toInt).getBytes("UTF-8")
        }), preset = 0, dictSize = 1 << 12)
        val good = Ar.encode(Seq("debian-binary" -> "2.0\n".getBytes,
          "control.tar.gz" -> controlTgz, "data.tar.xz" -> dataTxz))
        Seq(if (id % 10 == 0) java.util.Arrays.copyOf(good, good.length - 5) else good)
      }
      val decoded = graft.ops.Stages.appendFields(withDeb, Seq(
          StructField("st", StructType(Seq(
            StructField("ok", BooleanType), StructField("control", StringType),
            StructField("n_data", IntegerType), StructField("data_bytes", LongType)))))) { r =>
        val b = r.getAs[Array[Byte]](1)
        val st = for {
          ms <- Ar.members(b)
          ctlGz <- ms.find(_.name == "control.tar.gz").map(_.data) if ctlGz != null
          ctlTar <- Warc.gunzipMember(ctlGz)
          ctl <- Tar.listMembers(ctlTar).flatMap(_.find(_.name == "./control"))
          dataXz <- ms.find(_.name == "data.tar.xz").map(_.data) if dataXz != null
          dataTar <- Codecs.unxz(dataXz)
          files <- Tar.listMembers(dataTar)
        } yield org.apache.spark.sql.Row(true,
          new String(ctlTar, ctl.off, ctl.size, java.nio.charset.StandardCharsets.UTF_8),
          files.length, files.map(_.size.toLong).sum)
        Seq(st.getOrElse(org.apache.spark.sql.Row(false, null, null, null)))
      }
      decoded.select(col("doc_id"), col("st.ok").as("ok"),
          when(col("st.control").isNotNull, md5(col("st.control").cast("binary"))).as("control_md5"),
          col("st.n_data").as("n_data_files"), col("st.data_bytes").as("data_bytes"))
        .orderBy("doc_id")
    })

  /** RPM-payload-shaped ingestion ([[graft.ops.Cpio]]): modern RPM
    * packages carry a zstd-compressed cpio(newc) payload — decoded here
    * through the composed engine codecs ([[graft.ops.Codecs.unzstd]] →
    * cpio walk), the distro-package world's other half next to deb1.
    * Every 7th payload has a torn compressed wrapper: detection-by-
    * magic survives, the zstd decode quarantines the shard. Member
    * content is md5-gated, the manifest arithmetic. Map-only. */
  val cpio1Rpm = Q("cpio1_rpm_payload",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS n,
              doc_id % 7 = 0 AS corrupt FROM documents),
            f AS (SELECT doc_id, corrupt, CAST(t.k AS INT) AS k,
              printf('./usr/share/pkg%d/file%d', doc_id, t.k) AS name,
              repeat('d', CAST((doc_id * 2 + t.k) % 11 + 1 AS INT)) AS content
            FROM p, range(0, 3, 1) t(k) WHERE t.k < p.n)
            SELECT doc_id, true AS shard_ok, name,
              CAST(length(content) AS BIGINT) AS size, md5(content) AS content_md5
            FROM f WHERE NOT corrupt
            UNION ALL
            SELECT DISTINCT doc_id, false, NULL, NULL, NULL FROM f WHERE corrupt
            ORDER BY doc_id, name"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops.{Codecs, Cpio}
      val base = documents(s, d).select("doc_id")
      val withPayload = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val n = (id % 3 + 1).toInt
        val ms = (0 until n).map { k =>
          s"./usr/share/pkg$id/file$k" -> ("d" * (((id * 2 + k) % 11) + 1).toInt).getBytes("UTF-8")
        }
        val good = Codecs.zstd(Cpio.encode(ms))
        Seq(if (id % 7 == 0) java.util.Arrays.copyOf(good, good.length - 5) else good)
      }
      val unwrapped = graft.ops.Stages.appendFields(withPayload,
          Seq(StructField("cpio", BinaryType))) { r =>
        Seq(Codecs.unzstd(r.getAs[Array[Byte]](1)).orNull)
      }
      Cpio.memberStage(unwrapped, "cpio", "m")
        .select(col("doc_id"), col("m").isNotNull.as("shard_ok"),
          col("m.name").as("name"), col("m.size").as("size"),
          when(col("m.data").isNotNull, md5(col("m.data"))).as("content_md5"))
        .orderBy("doc_id", "name")
    })

  /** Arrow IPC file ingestion ([[graft.ops.ArrowIpc]]): the format the
    * HuggingFace `datasets` ecosystem memory-maps its corpora into,
    * read through the Arrow reference library on Spark's own classpath
    * under a bounded allocator. Quarantine is STRUCTURAL (Arrow carries
    * no data checksums — documented): every 9th payload has a torn tail
    * and must null the shard; the rest round-trip with batch boundaries
    * (`batch_idx`/`record_idx`) and per-field nulls preserved. The
    * oracle predicts every value arithmetically. */
  val arrow1Records = Q("arrow1_records",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 4 + 2 AS INT) AS nr FROM documents),
            r AS (SELECT p.doc_id, p.nr, CAST(t.j AS INT) AS j
                  FROM p, range(0, 5, 1) t(j) WHERE t.j < p.nr AND doc_id % 9 <> 0)
            SELECT doc_id, true AS shard_ok, CAST(j // 3 AS INT) AS batch_idx,
              CAST(j % 3 AS INT) AS record_idx,
              doc_id * 10 + j AS id, CAST((doc_id + j) % 7 AS BIGINT) AS label,
              CAST((doc_id + j) % 13 AS INT) AS text_len,
              CAST((doc_id * 3 + j) % 40 AS DOUBLE) / 8 AS score,
              (doc_id + j) % 2 = 0 AS flag
            FROM r
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 9 = 0
            ORDER BY doc_id, batch_idx, record_idx"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops.ArrowIpc
      val base = documents(s, d).select("doc_id")
      val withShard = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val nr = (id % 4 + 2).toInt
        val recs = (0 until nr).map { j =>
          ArrowIpc.FixRec(id * 10 + j, (id + j) % 7, "t" * (((id + j) % 13).toInt),
            ((id * 3 + j) % 40).toDouble / 8.0, (id + j) % 2 == 0,
            if (j % 3 == 1) None else Some(Array.tabulate(j % 4 + 1)(k => (k * 7 + j).toByte)))
        }
        val good = ArrowIpc.encode(recs, recordsPerBatch = 3)
        Seq(if (id % 9 == 0) java.util.Arrays.copyOf(good, good.length - 3) else good)
      }
      ArrowIpc.recordStage(withShard, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("shard_ok"),
          col("st.batch_idx").as("batch_idx"), col("st.record_idx").as("record_idx"),
          col("st.id").as("id"), col("st.label").as("label"),
          col("st.text_len").as("text_len"), col("st.score").as("score"),
          col("st.flag").as("flag"))
        .orderBy("doc_id", "batch_idx", "record_idx")
    })

  /** Modern compressed-member ingestion ([[graft.ops.Codecs]]):
    * zstd / LZ4-frame / snappy-framed / xz payloads — the codecs
    * data-lake exports and dataset mirrors ship beyond gzip/bz2 —
    * detected by magic through the [[graft.ops.Sniff]] router (this
    * query IS the routing gate for the four codecs) and decoded through
    * the codec libraries on Spark's own classpath under the
    * bomb-bounded fail-closed contract. Every 5th payload has a torn
    * tail: detection survives (magic intact), decode quarantines
    * (CodecsSpec pins that truncation fails ALL four codecs — lz4,
    * snappy, and xz additionally checksum). The full decoded text is
    * md5-gated. */
  val m20Compressed = Q("m20_compressed_members",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 5 + 2 AS INT) AS n,
              CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'zstd' WHEN 1 THEN 'lz4'
                   WHEN 2 THEN 'snappy' ELSE 'xz' END AS fmt,
              doc_id % 5 = 0 AS corrupt FROM documents),
            t AS (SELECT doc_id, fmt, corrupt, n,
              array_to_string(list_transform(range(0, CAST(n AS BIGINT), 1),
                k -> printf('line-%08d-%d', doc_id, k)), chr(10)) AS txt FROM p)
            SELECT doc_id, fmt AS format, NOT corrupt AS ok,
              CASE WHEN corrupt THEN NULL ELSE length(txt) END AS text_len,
              CASE WHEN corrupt THEN NULL ELSE n END AS n_lines,
              CASE WHEN corrupt THEN NULL ELSE md5(txt) END AS content_md5
            FROM t ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}
      import graft.ops.{Codecs, Sniff}
      val base = documents(s, d).select("doc_id")
      val withPayload = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val n = (id % 5 + 2).toInt
        val text = (0 until n).map(k => f"line-$id%08d-$k").mkString("\n").getBytes("UTF-8")
        val good = (id % 4).toInt match {
          case 0 => Codecs.zstd(text)
          case 1 => Codecs.lz4(text)
          case 2 => Codecs.snappy(text)
          // preset 0: the format (and its CRC64 integrity) is identical,
          // the per-payload encoder init is ~10× cheaper at fixture scale
          case _ => Codecs.xz(text, preset = 0, dictSize = 1 << 12)
        }
        Seq(if (id % 5 == 0) java.util.Arrays.copyOf(good, good.length - 6) else good)
      }
      val decoded = graft.ops.Stages.appendFields(withPayload, Seq(
          StructField("st", StructType(Seq(
            StructField("format", StringType), StructField("text", StringType)))))) { r =>
        val b = r.getAs[Array[Byte]](1)
        val fmt = Sniff.detect(b)
        val dec = fmt match {
          case "zstd" => Codecs.unzstd(b)
          case "lz4" => Codecs.unlz4(b)
          case "snappy" => Codecs.unsnappy(b)
          case "xz" => Codecs.unxz(b)
          case _ => None
        }
        Seq(org.apache.spark.sql.Row(fmt,
          dec.map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).orNull))
      }
      decoded.select(col("doc_id"), col("st.format").as("format"),
          col("st.text").isNotNull.as("ok"),
          length(col("st.text")).as("text_len"),
          size(split(col("st.text"), "\n")).as("n_lines"),
          when(col("st.text").isNotNull, md5(col("st.text").cast("binary"))).as("content_md5"))
        .orderBy("doc_id")
    })

  /** G.711 µ-law/A-law sample decode (WAV format tags 7/6), oracle-gated
    * end-to-end: the telephony/speech-corpus encoding behind most
    * call-center and ASR training audio. Payloads are synthesized
    * executor-side as 8-bit G.711 WAVs; [[graft.ops.Audio.decodeWavPcm]]
    * expands each code with the EXACT integer G.711 formulas (differential-
    * tested against the JDK's independent javax.sound codecs on all 256
    * codes) and the oracle re-derives the expansion arithmetically in
    * SQL — one wrong bias, shift, or sign convention hash-fails. Every
    * 7th payload is garbage and must quarantine to null. */
  val m16G711 = Q("m16_g711_features",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 40 + 20 AS INT) AS f,
              (doc_id % 2 = 0) AS isu FROM documents),
            s AS (SELECT doc_id, f, isu,
              list_transform(
                list_transform(range(0, CAST(f AS BIGINT), 1), k -> (doc_id * 11 + k * 29) % 256),
                b -> CASE WHEN isu THEN
                    CASE WHEN 255 - b >= 128
                      THEN -((((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8)) - 132)
                      ELSE (((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8)) - 132 END
                  ELSE
                    (CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END) *
                    (CASE WHEN ((xor(b, 85) // 16) % 8) = 0 THEN (xor(b, 85) % 16) * 16 + 8
                          ELSE ((xor(b, 85) % 16) * 16 + 264) << (((xor(b, 85) // 16) % 8) - 1) END)
                  END) AS sm
            FROM p),
            feat AS (SELECT doc_id, f, isu,
              CAST(list_max(list_transform(sm, x -> abs(x))) AS INT) AS peak,
              CAST(list_sum(list_transform(sm, x -> x * x)) AS BIGINT) AS sum_sq,
              CAST(len(list_filter(range(1, len(sm), 1),
                k -> (sm[k] < 0) <> (sm[k + 1] < 0))) AS BIGINT) AS zero_cross,
              CAST(len(list_filter(sm, x -> abs(x) < 50)) AS BIGINT) AS silent
            FROM s)
            SELECT doc_id, doc_id % 7 <> 0 AS ok,
              CASE WHEN doc_id % 7 = 0 THEN NULL
                   WHEN isu THEN 'ulaw' ELSE 'alaw' END AS codec,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE f END AS n_frames,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE peak END AS peak,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE sum_sq END AS sum_sq,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE zero_cross END AS zero_cross,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE silent END AS silent
            FROM feat ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withWav = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        if (id % 7 == 0) Seq(Array[Byte](0x13, 0x37))
        else {
          val f = (id % 40 + 20).toInt
          val tag = if (id % 2 == 0) 7 else 6
          val out = new java.io.ByteArrayOutputStream(64 + f)
          def s4(t: String): Unit = out.write(t.getBytes("US-ASCII"))
          def le(v: Long, len: Int): Unit =
            (0 until len).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
          s4("RIFF"); le(36 + f, 4); s4("WAVE")
          s4("fmt "); le(16, 4); le(tag, 2); le(1, 2); le(8000, 4); le(8000, 4); le(1, 2); le(8, 2)
          s4("data"); le(f, 4)
          (0 until f).foreach(k => out.write(((id * 11 + k * 29) % 256).toInt))
          Seq(out.toByteArray)
        }
      }
      graft.ops.Audio.pcmFeatureStage(withWav, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          when(col("st").isNull, lit(null).cast("string"))
            .when(col("doc_id") % 2 === 0, lit("ulaw")).otherwise(lit("alaw")).as("codec"),
          col("st.n_frames").as("n_frames"), col("st.peak").as("peak"),
          col("st.sum_sq").as("sum_sq"), col("st.zero_cross").as("zero_cross"),
          col("st.silent").as("silent"))
        .orderBy("doc_id")
    })

  /** WebP header dims ([[graft.ops.Webp]]) — the modern crawl image
    * format, all three container variants (VP8 lossy 14-bit dims after
    * the start code, VP8L lossless 14+14-bit packing, VP8X 24-bit
    * canvas), oracle-gated like m2/m6. Every 9th payload is truncated
    * mid-header and must null. */
  val m17WebpDims = Q("m17_webp_dims",
    Some("""WITH p AS (SELECT doc_id,
              CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l' ELSE 'vp8x' END AS variant,
              CAST(doc_id % 300 + 1 AS INT) AS w,
              CAST((doc_id * 7) % 200 + 1 AS INT) AS h
            FROM documents)
            SELECT doc_id, doc_id % 9 <> 0 AS ok,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE variant END AS variant,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE w END AS width,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE h END AS height
            FROM p ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withWebp = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val v = Seq("vp8", "vp8l", "vp8x")((id % 3).toInt)
        val webp = graft.ops.Webp.encode(v, (id % 300 + 1).toInt, ((id * 7) % 200 + 1).toInt)
        Seq(if (id % 9 == 0) java.util.Arrays.copyOf(webp, 24) else webp)
      }
      graft.ops.Webp.dimsStage(withWebp, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.variant").as("variant"),
          col("st.width").as("width"), col("st.height").as("height"))
        .orderBy("doc_id")
    })

  /** Compressed-audio metadata decode ([[graft.ops.AudioMeta]]) — the
    * audio twin of the image dims family: MP3 frame-header walks
    * (bitrate/samplerate table lookups, frame-length arithmetic, ID3v2
    * syncsafe skip), FLAC STREAMINFO bit unpacking (20-bit rate, 36-bit
    * totals), and Ogg page walks (lacing tables, final granule), all
    * oracle-predicted arithmetically. Every 9th payload is truncated
    * (a torn final frame/page/block) and must null. */
  val m18AudioMeta = Q("m18_audio_meta",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS f FROM documents),
            m AS (SELECT doc_id, f,
              CASE f WHEN 0 THEN 'mp3' WHEN 1 THEN 'flac' ELSE 'ogg' END AS format,
              CASE WHEN f = 0 THEN CASE CAST((doc_id // 3) % 3 AS INT)
                     WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
                   WHEN f = 1 THEN CAST(doc_id % 96000 + 1000 AS INT)
                   ELSE -1 END AS sample_rate,
              CASE WHEN f = 0 THEN CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
                   WHEN f = 1 THEN CAST(doc_id % 8 + 1 AS INT)
                   ELSE -1 END AS channels,
              CASE WHEN f = 0 THEN CAST(doc_id % 6 + 2 AS BIGINT)
                   WHEN f = 1 THEN CAST(-1 AS BIGINT)
                   ELSE CAST(doc_id % 4 + 1 AS BIGINT) END AS frames,
              CASE WHEN f = 0 THEN CAST((doc_id % 6 + 2) * 1152 AS BIGINT)
                   WHEN f = 1 THEN CAST((doc_id * 977) % 100000000 AS BIGINT)
                   ELSE CAST((doc_id * 31) % 1000000 AS BIGINT) END AS total_samples
            FROM p)
            SELECT doc_id, doc_id % 9 <> 0 AS ok,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE format END AS format,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE sample_rate END AS sample_rate,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE channels END AS channels,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE frames END AS frames,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE total_samples END AS total_samples
            FROM m ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops.AudioMeta
      val base = documents(s, d).select("doc_id")
      val withAudio = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val good: Array[Byte] = (id % 3).toInt match {
          case 0 => AudioMeta.encodeMp3((id % 6 + 2).toInt, brIdx = (id % 14 + 1).toInt,
            srIdx = ((id / 3) % 3).toInt,
            id3Size = if (id % 4 == 0) (id % 50 + 1).toInt else 0,
            stereo = id % 2 == 0)
          case 1 => AudioMeta.encodeFlac((id % 96000 + 1000).toInt, (id % 8 + 1).toInt,
            (id * 977) % 100000000)
          case _ => AudioMeta.encodeOgg(
            (0 until (id % 4 + 1).toInt).map(k => (id % 300 + 37 * k).toInt),
            (id * 31) % 1000000)
        }
        Seq(if (id % 9 == 0) java.util.Arrays.copyOf(good, good.length - 3) else good)
      }
      AudioMeta.metaStage(withAudio, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.format").as("format"), col("st.sample_rate").as("sample_rate"),
          col("st.channels").as("channels"), col("st.frames").as("frames"),
          col("st.total_samples").as("total_samples"))
        .orderBy("doc_id")
    })

  /** MediaWiki dump ingestion ([[graft.ops.Wiki]]) — Wikipedia-style
    * compressed XML export → one row per `<page>`: entity-unescaped
    * title, namespace, the PAGE id (the walk must not grab the
    * revision's own `<id>`), redirect detection with target, and text
    * length. The container rides the engine's existing gzip member path
    * ([[graft.ops.Warc.gunzipMember]], CRC-verified). Every 11th
    * payload has a corrupt deflate body → whole-payload null. */
  val wiki1DumpPages = Q("wiki1_dump_pages",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np FROM documents),
            g AS (SELECT p.*, CAST(t.j AS INT) AS j
                  FROM p, range(0, 3, 1) t(j) WHERE t.j < p.np AND doc_id % 11 <> 0)
            SELECT doc_id, true AS ok,
              CASE WHEN j = 0 THEN 'P&' || CAST(doc_id AS VARCHAR)
                   ELSE 'Page_' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) END AS title,
              CAST((doc_id + j) % 3 * 2 AS INT) AS ns,
              doc_id * 10 + j AS page_id,
              (doc_id + j) % 4 = 0 AS is_redirect,
              CASE WHEN (doc_id + j) % 4 = 0 THEN 'T_' || CAST(doc_id AS VARCHAR) END AS redirect_target,
              CAST((doc_id * 3 + j) % 40 + 1 AS INT) AS text_len
            FROM g
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 11 = 0
            ORDER BY doc_id, page_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withDump = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val np = (id % 3 + 1).toInt
        val pages = (0 until np).map { j =>
          graft.ops.Wiki.PageFixture(
            title = if (j == 0) s"P&$id" else s"Page_${id}_$j",
            ns = ((id + j) % 3 * 2).toInt,
            pageId = id * 10 + j,
            redirect = if ((id + j) % 4 == 0) Some(s"T_$id") else None,
            text = "w" * (((id * 3 + j) % 40).toInt + 1))
        }
        val gz = graft.ops.Warc.gzipMember(
          graft.ops.Wiki.encodeDump(pages).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (id % 11 == 0) gz(15) = (gz(15) ^ 0x24).toByte
        Seq(gz)
      }
      graft.ops.Wiki.pageStage(withDump, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.title").as("title"), col("st.ns").as("ns"),
          col("st.page_id").as("page_id"),
          when(col("st").isNull, lit(null).cast("boolean"))
            .otherwise(col("st.redirect").isNotNull).as("is_redirect"),
          col("st.redirect").as("redirect_target"), col("st.text_len").as("text_len"))
        .orderBy("doc_id", "page_id")
    })

  /** Wikipedia's ACTUAL dump format: bz2-compressed XML, decoded by the
    * engine's own zero-dependency [[graft.ops.Bzip2]] (full container:
    * MTF+RLE2 Huffman groups, inverse BWT, both CRCs — cross-validated
    * against the system bzip2 binary in Bzip2Spec) feeding the same
    * `<page>` walk as wiki1. One flipped mid-stream byte must CRC-fail
    * the whole payload (every 11th doc). */
  val wiki2Bz2Pages = Q("wiki2_bz2_dump_pages",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS np FROM documents),
            g AS (SELECT p.*, CAST(t.j AS INT) AS j
                  FROM p, range(0, 4, 1) t(j) WHERE t.j < p.np AND doc_id % 11 <> 0)
            SELECT doc_id, true AS ok,
              'Art_' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS title,
              CAST((doc_id + j) % 2 * 4 AS INT) AS ns,
              doc_id * 100 + j AS page_id,
              (doc_id + j) % 5 = 0 AS is_redirect,
              CASE WHEN (doc_id + j) % 5 = 0 THEN 'Main_' || CAST(doc_id AS VARCHAR) END AS redirect_target,
              CAST((doc_id * 7 + j * 3) % 60 + 2 AS INT) AS text_len
            FROM g
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 11 = 0
            ORDER BY doc_id, page_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withDump = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val np = (id % 4 + 1).toInt
        val pages = (0 until np).map { j =>
          graft.ops.Wiki.PageFixture(
            title = s"Art_${id}_$j",
            ns = ((id + j) % 2 * 4).toInt,
            pageId = id * 100 + j,
            redirect = if ((id + j) % 5 == 0) Some(s"Main_$id") else None,
            text = "t" * (((id * 7 + j * 3) % 60).toInt + 2))
        }
        val bz = graft.ops.Bzip2.encode(
          graft.ops.Wiki.encodeDump(pages).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (id % 11 == 0) bz(bz.length / 2) = (bz(bz.length / 2) ^ 0x08).toByte
        Seq(bz)
      }
      graft.ops.Wiki.pageStageBz2(withDump, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.title").as("title"), col("st.ns").as("ns"),
          col("st.page_id").as("page_id"),
          when(col("st").isNull, lit(null).cast("boolean"))
            .otherwise(col("st.redirect").isNotNull).as("is_redirect"),
          col("st.redirect").as("redirect_target"), col("st.text_len").as("text_len"))
        .orderBy("doc_id", "page_id")
    })

  /** WebM/Matroska (EBML) metadata walk ([[graft.ops.Ebml]]) — the
    * third video container next to m8's MP4 box walk and m15's AVI:
    * vint id/size tree descent to DocType, Info (TimestampScale +
    * float64 Duration scaled to ms), and per-track Video/Audio params,
    * skipping unknown elements by size (the EBML design point — a Void
    * element is planted in every fixture). Every 9th payload truncated
    * → null. */
  val m19WebmMeta = Q("m19_webm_meta",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 100000 AS BIGINT) AS ticks,
              (doc_id % 2 = 0) AS ms_scale,
              CAST(doc_id % 1900 + 16 AS INT) AS vw,
              CAST(doc_id % 1060 + 16 AS INT) AS vh,
              CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
                   WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
              CAST(doc_id % 8 + 1 AS INT) AS ch
            FROM documents)
            SELECT doc_id, doc_id % 9 <> 0 AS ok,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE 'webm' END AS doc_type,
              CASE WHEN doc_id % 9 = 0 THEN NULL
                   WHEN ms_scale THEN 1000000 ELSE 2000000 END AS timestamp_scale,
              CASE WHEN doc_id % 9 = 0 THEN NULL
                   WHEN ms_scale THEN ticks ELSE ticks * 2 END AS duration_ms,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE vw END AS video_w,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE vh END AS video_h,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE rate END AS audio_rate,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE ch END AS audio_channels
            FROM p ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withWebm = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val webm = graft.ops.Ebml.encodeWebm(
          durationTicks = (id % 100000).toDouble,
          tsScale = if (id % 2 == 0) 1000000L else 2000000L,
          vw = (id % 1900 + 16).toInt, vh = (id % 1060 + 16).toInt,
          audioRate = Seq(8000.0, 16000.0, 22050.0, 44100.0, 48000.0)((id % 5).toInt),
          channels = (id % 8 + 1).toInt)
        Seq(if (id % 9 == 0) java.util.Arrays.copyOf(webm, webm.length - 5) else webm)
      }
      graft.ops.Ebml.metaStage(withWebm, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.doc_type").as("doc_type"),
          col("st.timestamp_scale").cast("int").as("timestamp_scale"),
          col("st.duration_ms").as("duration_ms"),
          col("st.video_w").as("video_w"), col("st.video_h").as("video_h"),
          col("st.audio_rate").as("audio_rate"), col("st.audio_channels").as("audio_channels"))
        .orderBy("doc_id")
    })

  /** Content-based format routing ([[graft.ops.Sniff]]): the ingest
    * front door for a mixed binary corpus — extensions lie at crawl
    * scale, so payloads are sniffed by magic bytes and routed to the
    * matching container/codec walk for a health verdict, one map-only
    * pass over TWENTY-FOUR formats (every fixture encoder in the engine
    * feeds one). Every 5th payload is corrupted in a format-appropriate way:
    * detection survives (the magic is intact) but health fails —
    * except TFRecord, which has NO magic (detected by first-record CRC)
    * and so correctly degrades to `unknown` when corrupt. */
  val sniff1Router = Q("sniff1_format_router",
    Some("""WITH p AS (SELECT doc_id,
              CASE CAST(doc_id % 24 AS INT)
                WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'jpeg'
                WHEN 3 THEN 'wav' WHEN 4 THEN 'avi' WHEN 5 THEN 'webp'
                WHEN 6 THEN 'zip' WHEN 7 THEN 'tar' WHEN 8 THEN 'tfrecord'
                WHEN 9 THEN 'flac' WHEN 10 THEN 'ogg' WHEN 11 THEN 'webm'
                WHEN 12 THEN 'mp3' WHEN 13 THEN 'gzip' WHEN 14 THEN 'bz2'
                WHEN 15 THEN 'avro' WHEN 16 THEN 'zstd' WHEN 17 THEN 'lz4'
                WHEN 18 THEN 'snappy' WHEN 19 THEN 'xz' WHEN 20 THEN '7z'
                WHEN 21 THEN 'ar' WHEN 22 THEN 'cpio'
                ELSE 'arrow' END AS fmt,
              doc_id % 5 = 0 AS corrupt
            FROM documents)
            SELECT doc_id,
              CASE WHEN corrupt AND fmt = 'tfrecord' THEN 'unknown' ELSE fmt END AS format,
              NOT corrupt AS ok
            FROM p ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      import graft.ops._
      val base = documents(s, d).select("doc_id")
      val withPayload = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val v = (id % 251).toInt
        val good: Array[Byte] = (id % 24).toInt match {
          case 0 => Image.encodePng(4, 4, 0, Array.tabulate(16)(k => ((k * 7 + v) % 256).toByte))
          case 1 => Gif.encodeGif(4, 4, Array.tabulate(12)(k => ((k * 21 + v) % 256).toByte),
            Array.fill(16)(((v % 4)).toByte))
          case 2 => Jpeg.encodeGray(8, 8, Array.fill(64)(v.toByte))
          case 3 =>
            val o = new java.io.ByteArrayOutputStream()
            def le(x: Long, n: Int): Unit = (0 until n).foreach(i => o.write(((x >> (8 * i)) & 0xff).toInt))
            o.write("RIFF".getBytes("US-ASCII")); le(36 + 8, 4); o.write("WAVE".getBytes("US-ASCII"))
            o.write("fmt ".getBytes("US-ASCII")); le(16, 4); le(1, 2); le(1, 2); le(8000, 4); le(8000, 4); le(1, 2); le(8, 2)
            o.write("data".getBytes("US-ASCII")); le(8, 4); (0 until 8).foreach(k => o.write((k * 31 + v) % 256))
            o.toByteArray
          case 4 => Avi.encodeMjpegAvi(8, 8, 40000, Seq(Jpeg.encodeGray(8, 8, Array.fill(64)(v.toByte))))
          case 5 => Webp.encode("vp8", (v % 40) + 1, (v % 30) + 1)
          case 6 => Zip.encodeZip(Seq(("a.txt", s"hello-$id".getBytes("UTF-8"), true)))
          case 7 => Tar.encodeTar(Seq(("a.txt", s"hello-$id".getBytes("UTF-8"))))
          case 8 => TfRecord.encodeShard(Seq(TfRecord.encodeExample(id % 10, Seq(v.toLong), "x".getBytes)))
          case 9 => AudioMeta.encodeFlac((v % 48000) + 1000, (v % 8) + 1, v * 977L)
          case 10 => AudioMeta.encodeOgg(Seq((v % 200) + 5, (v % 90) + 3), v * 31L)
          case 11 => Ebml.encodeWebm((v % 5000).toDouble, 1000000L, (v % 640) + 8, (v % 480) + 8, 48000.0, 2)
          case 12 => AudioMeta.encodeMp3((v % 5) + 2, brIdx = (v % 14) + 1, srIdx = v % 3,
            id3Size = (v % 40) + 1)
          case 13 => Warc.gzipMember(s"payload-$id-${"y" * (v % 60 + 4)}".getBytes("UTF-8"))
          case 14 => Bzip2.encode(s"payload-$id-${"z" * (v % 60 + 4)}".getBytes("UTF-8"))
          case 15 => Avro.encode(
            Seq(Avro.Field("id", "long", nullable = false),
              Avro.Field("text", "string", nullable = false)),
            (0 until (v % 4 + 1)).map(k => Seq[Any](id * 4 + k, "a" * (v % 9 + 1))),
            codec = if (id % 2 == 0) "deflate" else "null",
            recordsPerBlock = 2, syncSeed = id)
          case 16 => Codecs.zstd(s"member-$id-${"m" * (v % 50 + 4)}".getBytes("UTF-8"))
          case 17 => Codecs.lz4(s"member-$id-${"n" * (v % 50 + 4)}".getBytes("UTF-8"))
          case 18 => Codecs.snappy(s"member-$id-${"o" * (v % 50 + 4)}".getBytes("UTF-8"))
          case 19 => Codecs.xz(s"member-$id-${"p" * (v % 50 + 4)}".getBytes("UTF-8"), 0, 1 << 12)
          case 20 => SevenZip.encode(
            Seq("Posts.xml" -> s"<posts><row Id=\"$id\"/></posts>".getBytes("UTF-8")),
            preset = 0, dictSize = 1 << 12)
          case 21 => Ar.encode(Seq("debian-binary" -> "2.0\n".getBytes,
            "m.txt" -> s"member-$id".getBytes("UTF-8")))
          case 22 => Cpio.encode(Seq(s"./f$id" -> s"content-$id".getBytes("UTF-8")))
          case _ => ArrowIpc.encode(Seq(
            ArrowIpc.FixRec(id, id % 5, "t" * (v % 7 + 1), (v % 16) / 8.0,
              id % 2 == 0, None)), recordsPerBatch = 1)
        }
        val out = if (id % 5 != 0) good else (id % 24).toInt match {
          case 0 => val b = good.clone(); b(b.length - 8) = (b(b.length - 8) ^ 0x11).toByte; b
          case 1 => java.util.Arrays.copyOf(good, good.length - 4)
          case 2 => java.util.Arrays.copyOf(good, good.length - 12)
          case 3 => java.util.Arrays.copyOf(good, good.length - 3)
          case 4 => java.util.Arrays.copyOf(good, good.length - 8)
          case 5 => val b = good.clone(); b(23) = 0x00; b
          case 6 => val b = good.clone(); b(b.length - 20) = (b(b.length - 20) ^ 0x40).toByte; b
          case 7 => val b = good.clone(); b(1) = (b(1) ^ 0x01).toByte; b
          case 8 => val b = good.clone(); b(14) = (b(14) ^ 0x40).toByte; b
          case 13 | 14 => val b = good.clone() // flip in the CRC trailer region
                          b(b.length - 5) = (b(b.length - 5) ^ 0x21).toByte; b
          case 15 => java.util.Arrays.copyOf(good, good.length - 5) // avro: sync lost
          case 16 | 17 | 18 | 19 | 20 | 21 => // codec/7z/ar: torn tail
            java.util.Arrays.copyOf(good, good.length - 6)
          case 22 => java.util.Arrays.copyOf(good, 113) // cpio: mid first member
          case 23 => val b = good.clone() // arrow: keep both magics, break the footer
                     b(b.length - 10) = 0x7f.toByte; b
          case _ => java.util.Arrays.copyOf(good, good.length - 3) // flac/ogg/webm/mp3: torn tail
        }
        Seq(out)
      }
      graft.ops.Sniff.routeStage(withPayload, "payload", "st")
        .select(col("doc_id"), col("st.format").as("format"), col("st.ok").as("ok"))
        .orderBy("doc_id")
    })

  /** WebDataset shard ingestion, oracle-gated end-to-end: the standard
    * large-scale multimodal training layout — .tar shards whose members
    * group into samples by basename (`<key>.jpg` + `<key>.txt` +
    * `<key>.cls`). Each doc builds a REAL checksummed ustar shard
    * ([[graft.ops.Tar]], differential-tested against GNU tar) holding
    * 2–4 samples; the engine walks members (checksums verified), masks
    * the image bytes through the REAL JPEG decode, and reassembles
    * samples with ONE hash aggregate (conditional pivot on extension —
    * no joins, one shuffle on (shard, key), which is why the layout
    * scales). Every 13th shard has a corrupted header byte and must
    * quarantine whole (shard_ok=false row): a torn shard must never
    * yield silently-partial samples. */
  val wds1WebDataset = Q("wds1_webdataset_samples",
    Some("""WITH p AS (SELECT doc_id, CAST(doc_id % 10 + 4 AS INT) AS w,
              CAST((doc_id * 3) % 9 + 4 AS INT) AS h,
              CAST(doc_id % 3 + 2 AS INT) AS ns FROM documents),
            k AS (SELECT p.*, CAST(t.k AS INT) AS k
                  FROM p, range(0, 4, 1) t(k) WHERE t.k < p.ns AND doc_id % 13 <> 0),
            s AS (SELECT doc_id, w, h, k,
              concat(CAST(doc_id AS VARCHAR), '_', CAST(k AS VARCHAR)) AS sample_key,
              CAST((doc_id + k) % 20 + 5 AS INT) AS caption_len,
              CAST((doc_id + 2 * k) % 10 AS INT) AS label,
              CAST(list_sum(list_transform(range(0, CAST(h AS BIGINT) * w, 1), i ->
                ((i % w) // 8 * 5 + (i // w) // 8 * 3 + doc_id + 7 * k) % 256)) AS BIGINT) AS pixel_sum
            FROM k)
            SELECT doc_id, true AS shard_ok, sample_key, caption_len, label,
              w AS width, h AS height, pixel_sum
            FROM s
            UNION ALL
            SELECT doc_id, false, NULL, NULL, NULL, NULL, NULL, NULL
            FROM documents WHERE doc_id % 13 = 0
            ORDER BY doc_id, sample_key"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withTar = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val w = (id % 10 + 4).toInt; val h = ((id * 3) % 9 + 4).toInt
        val ns = (id % 3 + 2).toInt
        val members = (0 until ns).flatMap { k =>
          val key = s"${id}_$k"
          val px = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            (((x / 8) * 5 + (y / 8) * 3 + id + 7 * k) % 256).toByte
          }
          Seq(s"$key.jpg" -> graft.ops.Jpeg.encodeGray(w, h, px),
            s"$key.txt" -> ("c" * (((id + k) % 20).toInt + 5)).getBytes("UTF-8"),
            s"$key.cls" -> ((id + 2 * k) % 10).toString.getBytes("UTF-8"))
        }
        val tar = graft.ops.Tar.encodeTar(members)
        if (id % 13 == 0) tar(1) = (tar(1) ^ 0x01).toByte // checksum break
        Seq(tar)
      }
      val m = graft.ops.Tar.memberStage(withTar, "payload", "m")
      val bad = m.filter(col("m").isNull).select(col("doc_id"),
        lit(false).as("shard_ok"), lit(null).cast("string").as("sample_key"),
        lit(null).cast("int").as("caption_len"), lit(null).cast("int").as("label"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("bigint").as("pixel_sum"))
      val members = m.filter(col("m").isNotNull)
        .select(col("doc_id"), col("m.sample_key").as("sample_key"),
          col("m.ext").as("ext"), col("m.data").as("data"))
        .withColumn("jpg_data", when(col("ext") === "jpg", col("data")))
      val withSt = graft.ops.Jpeg.decodeStatsStage(members, "jpg_data", "st")
      withSt.groupBy("doc_id", "sample_key").agg(
          max(when(col("ext") === "txt", length(col("data").cast("string")))).as("caption_len"),
          max(when(col("ext") === "cls", col("data").cast("string").cast("int"))).as("label"),
          max(col("st.width")).as("width"), max(col("st.height")).as("height"),
          max(col("st.pixel_sum")).as("pixel_sum"))
        .select(col("doc_id"), lit(true).as("shard_ok"), col("sample_key"),
          col("caption_len"), col("label"), col("width"), col("height"), col("pixel_sum"))
        .unionByName(bad)
        .orderBy("doc_id", "sample_key")
    })

  /** Perceptual-hash image near-dup pairs — the multimodal-dedup operator
    * a training pipeline runs over figure/crawl images, gated end-to-end
    * THROUGH the real PNG decode: each doc renders a 9×8 image whose
    * pixel gradients encode a planted 64-bit signature (groups of 4 docs
    * share a base signature; member m flips m known bits, so in-group
    * Hamming distances are exactly |m₁−m₂| ≤ 3), PNG-encoded with
    * cycling scanline filters and alternating gray/RGB color types. The
    * engine decodes pixels, computes dHash (9×8 is the hash's native
    * grid, so resize is identity and the oracle can predict every bit),
    * and bands the fingerprints pigeonhole-style — the d3c machinery
    * pointed at images. The oracle computes signatures, banding, and
    * Hamming arithmetically; one wrong unfilter or one dHash bit off
    * changes pair membership and hash-fails. */
  val d18ImageNearDup = Q("d18_image_neardup_pairs",
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gb, CAST(doc_id % 4 AS INT) AS m FROM documents),
            bits AS (SELECT doc_id, i,
                (((((gb * 48271 + i * 16807) % 1000003) * ((gb * 48271 + i * 16807) % 1000003)) % 1000003) < 500002) <>
                  list_contains(list_transform(range(CAST(m AS BIGINT)), j -> (gb * 7 + j * 19) % 64), i) AS b
              FROM d, range(0, 64, 1) t(i)),
            sig AS (SELECT doc_id, string_agg(CASE WHEN b THEN '1' ELSE '0' END, '' ORDER BY i) AS sig
                    FROM bits GROUP BY doc_id),
            blk AS (SELECT doc_id, sig,
                concat(CAST(q AS VARCHAR), ':', substr(sig, CAST(q * 16 + 1 AS INT), 16)) AS blk
              FROM sig, range(0, 4, 1) t(q)),
            cand AS (SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a, b.doc_id AS id_b, b.sig AS sig_b
                     FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id),
            ham AS (SELECT id_a, id_b,
                CAST(len(list_filter(range(1, 65, 1), i -> sig_a[i] <> sig_b[i])) AS BIGINT) AS hamming
              FROM cand)
            SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withPng = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val gb = id / 4; val m = (id % 4).toInt
        // squared-residue bits mod a large prime: a LINEAR bit formula
        // walks the modulus in small increments, producing run-structured
        // signatures that nearly-collide across groups (measured 4× pair
        // inflation); squaring decorrelates adjacent i, leaving exactly
        // the 6-per-group planted pairs
        val bits = Array.tabulate(64) { i =>
          val v = (gb * 48271L + i * 16807L) % 1000003
          v * v % 1000003 < 500002
        }.zipWithIndex.map { case (b0, i) =>
          b0 != (0 until m).exists(j => (gb * 7 + j * 19) % 64 == i)
        }
        // gradient walk: p(0,y)=128, each step ±1 by the planted bit, so
        // dHash(p) == bits exactly and stays within byte range (128±8)
        val gray = new Array[Int](72)
        for (y <- 0 until 8) {
          gray(y * 9) = 128
          for (x <- 0 until 8)
            gray(y * 9 + x + 1) = gray(y * 9 + x) + (if (bits(y * 8 + x)) 1 else -1)
        }
        val ct = if (id % 2 == 0) 0 else 2
        val ch = if (ct == 0) 1 else 3
        val raw = new Array[Byte](72 * ch)
        for (i <- 0 until 72; c <- 0 until ch) raw(i * ch + c) = gray(i).toByte
        // r=g=b ⇒ integer luma (299+587+114)p/1000 = p: the RGB path must
        // reproduce the gray path bit-for-bit
        Seq(graft.ops.Image.encodePng(9, 8, ct, raw, y => ((y + id) % 5).toInt))
      }
      val sigs = graft.ops.Image.dhashStage(withPng, "payload", "sig")
      graft.ops.Image.imageNearDupPairs(sigs, "doc_id", "sig", maxHamming = 3)
        .orderBy("id_a", "id_b")
    })

  /** REAL WAV/PCM sample decode + signal features, oracle-gated
    * end-to-end: canonical PCM WAVs are synthesized executor-side from
    * doc_id arithmetic — frames/channels/bit-depth/rate all vary by
    * doc_id, every 4th doc hides fmt behind an odd/even-size JUNK chunk
    * (RIFF pad-byte discipline), every 5th doc stores `data` BEFORE
    * `fmt ` (chunk order is free in RIFF; the walk must collect both),
    * and every 9th is garbage → NULL. `Audio.decodeWavPcm` must recover
    * the planted samples through the chunk walk + LE sample parse; the
    * oracle predicts peak / energy / zero-crossings / silence from the
    * same arithmetic, never seeing bytes — an endianness slip, a signed/
    * unsigned mixup (8-bit is unsigned-centered, 16-bit signed), or an
    * off-by-channel zero-cross pairing hash-fails. RMS is derived from
    * the exact integer sums with the same expression tree both sides. */
  val m9WavPcm = Q("m9_wav_pcm_features",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 50 + 10 AS INT) AS f,
              CAST(doc_id % 2 + 1 AS INT) AS ch,
              (doc_id % 3 = 0) AS is8,
              CAST(doc_id % 48000 + 8000 AS INT) AS rate
            FROM documents),
            s AS (SELECT doc_id, f, ch, is8, rate,
              list_transform(range(0, CAST(f AS BIGINT) * ch, 1), k ->
                CASE WHEN is8 THEN (doc_id * 13 + k * 7) % 256 - 128
                     ELSE (doc_id * 31 + k * 77) % 4001 - 2000 END) AS sm
            FROM p),
            feat AS (SELECT doc_id, f, ch, is8, rate,
              CAST(list_max(list_transform(sm, x -> abs(x))) AS INT) AS peak,
              CAST(list_sum(list_transform(sm, x -> x * x)) AS BIGINT) AS sum_sq,
              CAST(len(list_filter(range(1, len(sm) - ch + 1, 1),
                k -> (sm[k] < 0) <> (sm[k + ch] < 0))) AS BIGINT) AS zero_cross,
              CAST(len(list_filter(sm, x -> abs(x) < 50)) AS BIGINT) AS silent
            FROM s)
            SELECT doc_id, doc_id % 9 <> 0 AS ok,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE rate END AS sample_rate,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE ch END AS channels,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(CASE WHEN is8 THEN 8 ELSE 16 END AS INT) END AS bits,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE f END AS n_frames,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE peak END AS peak,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE sum_sq END AS sum_sq,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE zero_cross END AS zero_cross,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE silent END AS silent,
              CASE WHEN doc_id % 9 = 0 THEN NULL
                   ELSE sqrt(CAST(sum_sq AS DOUBLE) / (f * ch)) END AS rms
            FROM feat ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withWav = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        if (id % 9 == 0) Seq(Array[Byte](0xBA.toByte, 0xDC.toByte, 0x0F.toByte, 0xFE.toByte))
        else {
          val f = (id % 50 + 10).toInt; val ch = (id % 2 + 1).toInt
          val is8 = id % 3 == 0; val rate = (id % 48000 + 8000).toInt
          val bps = if (is8) 1 else 2
          val n = f * ch
          val out = new java.io.ByteArrayOutputStream(64 + n * bps)
          def s4(t: String): Unit = out.write(t.getBytes("US-ASCII"))
          def le(v: Long, len: Int): Unit =
            (0 until len).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
          s4("RIFF"); le(36 + n * bps, 4); s4("WAVE")
          if (id % 4 == 0) { // JUNK of doc-dependent odd/even size + RIFF pad
            val j = (id % 7 + 1).toInt
            s4("JUNK"); le(j, 4); (0 until j).foreach(_ => out.write(0xAB))
            if (j % 2 == 1) out.write(0)
          }
          def writeFmt(): Unit = {
            s4("fmt "); le(16, 4); le(1, 2); le(ch, 2); le(rate, 4)
            le(rate.toLong * ch * bps, 4); le(ch * bps, 2); le(bps * 8, 2)
          }
          def writeData(): Unit = {
            s4("data"); le(n.toLong * bps, 4)
            var k = 0
            while (k < n) {
              if (is8) out.write(((id * 13 + k * 7) % 256).toInt)
              else { val v = ((id * 31 + k * 77) % 4001 - 2000).toInt; le(v & 0xffff, 2) }
              k += 1
            }
          }
          if (id % 5 == 0) { writeData(); writeFmt() } else { writeFmt(); writeData() }
          Seq(out.toByteArray)
        }
      }
      graft.ops.Audio.pcmFeatureStage(withWav, "payload", "a")
        .select(col("doc_id"), col("a").isNotNull.as("ok"),
          col("a.sample_rate").as("sample_rate"), col("a.channels").as("channels"),
          col("a.bits").as("bits"), col("a.n_frames").as("n_frames"),
          col("a.peak").as("peak"), col("a.sum_sq").as("sum_sq"),
          col("a.zero_cross").as("zero_cross"), col("a.silent").as("silent"),
          sqrt(col("a.sum_sq").cast("double") / (col("a.n_frames") * col("a.channels"))).as("rms"))
        .orderBy("doc_id")
    })

  /** REAL GIF decode, oracle-gated end-to-end: complete GIF89a payloads
    * (screen descriptor, global color table, genuinely-LZW-compressed
    * pixel data — dictionary growth, width bumps and all — plus the
    * 4-pass interlace on every 3rd doc) are synthesized executor-side
    * from doc_id arithmetic; `Gif.decodeGif` must recover the planted
    * pixels through the LZW stream and interlace remap. The oracle
    * predicts pixel_sum over RGB bytes and the center-pixel luma from
    * the same arithmetic — a width-bump convention slip, an interlace
    * row-map error, or a palette offset bug hash-fails. Every 7th
    * payload is truncated inside the header → NULL (GIF has no CRC, so
    * the structural class is what fail-to-null can promise; the spec's
    * fuzz sweep pins never-throws for everything else). Encoder and
    * decoder are cross-validated BOTH directions against ImageIO's
    * independent GIF codec in Round7Spec, so this fixture pair cannot
    * share a convention bug. */
  val m10GifDecode = Q("m10_gif_decode",
    Some("""WITH p AS (SELECT doc_id,
              CAST(doc_id % 11 + 1 AS INT) AS w,
              CAST((doc_id * 5) % 9 + 1 AS INT) AS h
            FROM documents),
            s AS (SELECT doc_id, w, h,
              CAST(list_sum(list_transform(range(0, CAST(w AS BIGINT) * h, 1), k ->
                ((((k % w) * 3 + (k // w) * 5 + doc_id) % 16) * 37) % 256
                + ((((k % w) * 3 + (k // w) * 5 + doc_id) % 16) * 59) % 256
                + ((((k % w) * 3 + (k // w) * 5 + doc_id) % 16) * 83) % 256)) AS BIGINT) AS pixel_sum,
              ((w // 2) * 3 + (h // 2) * 5 + doc_id) % 16 AS jm
            FROM p)
            SELECT doc_id, doc_id % 7 <> 0 AS ok,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE w END AS width,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE h END AS height,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE CAST(16 AS INT) END AS n_colors,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 3 = 0 END AS interlaced,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE pixel_sum END AS pixel_sum,
              CASE WHEN doc_id % 7 = 0 THEN NULL
                   ELSE CAST((299 * ((jm * 37) % 256) + 587 * ((jm * 59) % 256)
                            + 114 * ((jm * 83) % 256)) // 1000 AS INT) END AS gray_mid
            FROM s ORDER BY doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.types.{BinaryType, StructField}
      val base = documents(s, d).select("doc_id")
      val withGif = graft.ops.Stages.appendFields(base,
          Seq(StructField("payload", BinaryType))) { r =>
        val id = r.getLong(0)
        val w = (id % 11 + 1).toInt; val h = ((id * 5) % 9 + 1).toInt
        val pal = Array.tabulate(48) { k =>
          val j = k / 3
          (if (k % 3 == 0) j * 37 % 256 else if (k % 3 == 1) j * 59 % 256 else j * 83 % 256).toByte
        }
        val idx = Array.tabulate(w * h)(k => (((k % w) * 3 + (k / w) * 5 + id) % 16).toByte)
        val gif = graft.ops.Gif.encodeGif(w, h, pal, idx, interlace = id % 3 == 0)
        // header-truncation corruption: always inside signature+descriptor+
        // GCT (>= 61 bytes), so decode must fail closed
        Seq(if (id % 7 == 0) java.util.Arrays.copyOf(gif, (8 + id % 5).toInt) else gif)
      }
      graft.ops.Gif.decodeStatsStage(withGif, "payload", "st")
        .select(col("doc_id"), col("st").isNotNull.as("ok"),
          col("st.width").as("width"), col("st.height").as("height"),
          col("st.n_colors").as("n_colors"), col("st.interlaced").as("interlaced"),
          col("st.pixel_sum").as("pixel_sum"), col("st.gray_mid").as("gray_mid"))
        .orderBy("doc_id")
    })

  /** ColBERT-style late-interaction retrieval — score = Σ_q max_d
    * cos(e_q, e_d) over TOKEN-level embeddings (md5-bucketed char-bigram
    * profiles, the V1 deterministic stand-in), so morphological cousins
    * match without query expansion: the query terms here ('sparkly',
    * 'joining', 'streams') appear NOWHERE in the corpus — every nonzero
    * score comes from bigram overlap with 'spark'/'join'/'stream' etc.,
    * which is exactly the late-interaction property the operator exists
    * for. Embeddings per DISTINCT (doc, token), query vectors broadcast,
    * one map-side-combined max aggregate, TakeOrdered top-k; per-term
    * maxes 6-dp-rounded before ranking (BM25 convention), summed in
    * fixed order. */
  val v11MaxSim: Q = {
    val terms = Seq("sparkly", "joining", "streams")
    val k = 10
    def vecSql(t: String) =
      s"""list_transform(range(0, 16, 1), j -> CAST(len(list_filter(
            CASE WHEN length($t) >= 2
                 THEN list_transform(range(1, length($t)), i -> substr($t, CAST(i AS INT), 2))
                 ELSE [$t] END,
            g -> strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1 = j)) AS DOUBLE))"""
    def normSql(v: String) =
      s"""list_transform($v, x -> CASE WHEN sqrt(list_sum(list_transform($v, y -> y * y))) > 0
            THEN x / sqrt(list_sum(list_transform($v, y -> y * y))) ELSE 0.0 END)"""
    val qCtes = terms.zipWithIndex.map { case (t, i) =>
      s"q$i AS (SELECT ${normSql(s"(${vecSql(s"'$t'")})")} AS qv)"
    }.mkString(",\n            ")
    val simCols = terms.indices.map(i =>
      s"round(list_dot_product(nv, q$i.qv), 6) AS s_$i").mkString(", ")
    val qJoins = terms.indices.map(i => s"CROSS JOIN q$i").mkString(" ")
    val maxCols = terms.indices.map(i => s"max(s_$i) AS sim_$i").mkString(", ")
    val sumExpr = terms.indices.map(i => s"sim_$i").mkString(" + ")
    Q("v11_maxsim_topk",
      Some(s"""WITH t AS (SELECT doc_id, ${OracleSql.toksSql} AS toks FROM documents),
            tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t),
            e AS (SELECT doc_id, tok, ${normSql(s"(${vecSql("tok")})")} AS nv FROM tok),
            $qCtes,
            sims AS (SELECT doc_id, $simCols FROM e $qJoins),
            m AS (SELECT doc_id, $maxCols FROM sims GROUP BY doc_id),
            top AS (SELECT doc_id, ${terms.indices.map(i => s"sim_$i").mkString(", ")},
                round($sumExpr, 6) AS score
              FROM m ORDER BY score DESC, doc_id LIMIT $k)
            SELECT * FROM top ORDER BY score DESC, doc_id"""),
      (s, d) => {
        graft.index.LateInteraction.maxSimTopK(documents(s, d), "doc_id", "text", terms, k)
          .select(col("id").as("doc_id") +:
            (terms.indices.map(i => col(s"sim_$i")) :+ col("score")): _*)
          .orderBy(col("score").desc, col("doc_id"))
      })
  }

  /** EXIF orientation decode (the m2/m5/m8 header-walk family, applied
    * to the one EXIF field pixel pipelines MUST honor): JPEG marker walk
    * to APP1/"Exif\0\0", then a TIFF IFD scan whose ENDIANNESS comes
    * from the payload itself — every 5th doc stores the TIFF big-endian
    * (MM), every 4th hides APP1 behind an APP0/JFIF segment, a leading
    * ImageDescription entry must be scanned past, and every 9th is
    * garbage → NULL. The oracle knows only doc_id % 8 + 1; a byte-order
    * slip, a wrong IFD offset base, or a value-field misread
    * hash-fails. */
  val m11ExifOrientation = Q("m11_exif_orientation",
    Some("""SELECT doc_id,
              CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(doc_id % 8 + 1 AS INT) END AS orientation
            FROM documents ORDER BY doc_id"""),
    (s, d) => {
      def be16hex(v: org.apache.spark.sql.Column) = lpad(hex(v), 4, "0")
      def le16hex(v: org.apache.spark.sql.Column) = {
        val bx = lpad(hex(v), 4, "0")
        concat(substring(bx, 3, 2), substring(bx, 1, 2))
      }
      val v = col("doc_id") % 8 + 1
      val isMM = col("doc_id") % 5 === 0
      // II TIFF: header(8) + count(2) + 2 entries(24) + next-ifd(4) = 38 bytes
      val tiffII = concat(lit("49492A0008000000"), lit("0200"),
        lit("0E01"), lit("0200"), lit("04000000"), lit("64657363"), // ImageDescription "desc"
        lit("1201"), lit("0300"), lit("01000000"), le16hex(v), lit("0000"),
        lit("00000000"))
      val tiffMM = concat(lit("4D4D002A00000008"), lit("0002"),
        lit("010E"), lit("0002"), lit("00000004"), lit("64657363"),
        lit("0112"), lit("0003"), lit("00000001"), be16hex(v), lit("0000"),
        lit("00000000"))
      val tiff = when(isMM, tiffMM).otherwise(tiffII)
      // APP1: marker(2) + len(2, includes itself) + 'Exif\0\0'(6) + tiff(38) → len 46
      val app1 = concat(lit("FFE1002E"), lit("457869660000"), tiff)
      val jfif = concat(lit("FFE00010"), lit("4A46494600"),
        expr("repeat('00', 9)")) // len 16: 'JFIF\0' + 9 zero bytes
      val payloadHex = concat(lit("FFD8"),
        when(col("doc_id") % 4 === 0, jfif).otherwise(lit("")), app1)
      val payload = when(col("doc_id") % 9 === 0, unhex(lit("BADC0FFE")))
        .otherwise(unhex(payloadHex))
      val base = documents(s, d).select(col("doc_id")).withColumn("payload", payload)
      graft.ops.Image.exifStage(base, "payload", "orientation")
        .select(col("doc_id"), col("orientation"))
        .orderBy("doc_id")
    })

  /** Dedup operating curve — the threshold-selection table a pipeline
    * owner reads before committing a near-dup cutoff: the d4 similarity
    * stream swept against a threshold ladder in ONE pass (conditional
    * counters, no per-threshold rescans), emitting pair counts, the
    * retained-corpus fraction, and the marginal pairs each step adds.
    * Picking 0.8 vs 0.7 on a 100 TB crawl is a billions-of-docs
    * decision; this is the evidence table, at the cost of one aggregate
    * over an existing stream. */
  val dom9DedupCurve: Q = {
    val cuts = Seq(0.5, 0.7, 0.8, 0.9)
    val cntSql = cuts.map(c =>
      s"CAST(sum(CASE WHEN jacc >= $c THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_${(c * 100).toInt}")
      .mkString(", ")
    Q("dom9_dedup_curve",
      Some(s"""WITH g AS (
              SELECT doc_id, list_distinct(list_transform(range(1, length(lower(text)) - 1),
                       i -> substr(lower(text), CAST(i AS INT), 3))) AS grams
              FROM documents),
            p AS (SELECT CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                    len(list_distinct(list_concat(a.grams, b.grams))) AS jacc
              FROM g a JOIN g b ON b.doc_id = a.doc_id + 1),
            m AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, $cntSql FROM p)
            SELECT * FROM (
            ${cuts.map(c => s"""SELECT CAST($c AS DOUBLE) AS threshold, n_ge_${(c * 100).toInt} AS n_dup_pairs,
              round(1.0 - CAST(n_ge_${(c * 100).toInt} AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6) AS keep_frac
            FROM m""").mkString("\n            UNION ALL\n            ")})
            ORDER BY threshold"""),
      (s, d) => {
        val g = documents(s, d)
          .select(col("doc_id"), Dedup.charNgrams(lower(col("text")), 3).as("grams"))
          .localCheckpoint()
        val a = g.select(col("doc_id").as("id_a"), col("grams").as("ga"))
        val b = g.select(col("doc_id").as("id_b"), col("grams").as("gb"))
        val p = a.join(b, col("id_b") === col("id_a") + 1)
          .select((size(array_intersect(col("ga"), col("gb"))).cast("double") /
            size(array_union(col("ga"), col("gb")))).as("jacc"))
        // single-row frame feeding four projections - checkpoint so the
        // pair aggregate runs once, not once per threshold row
        val aggCols = count(lit(1)).as("n_pairs") +:
          cuts.map(c => sum(when(col("jacc") >= c, 1L).otherwise(0L))
            .as(s"n_ge_${(c * 100).toInt}"))
        val m = p.agg(aggCols.head, aggCols.tail: _*).localCheckpoint()
        cuts.map { c =>
          m.select(lit(c).as("threshold"), col(s"n_ge_${(c * 100).toInt}").as("n_dup_pairs"),
            round(lit(1.0) - col(s"n_ge_${(c * 100).toInt}").cast("double")
              / col("n_pairs").cast("double"), 6).as("keep_frac"))
        }.reduce(_ union _).orderBy("threshold")
      })
  }

  /** nprobe auto-planning (the round-12 verdict's #6): the operating
    * decision a 100 TB ANN deployment actually makes — given a target
    * recall (0.9), choose the MINIMAL nprobe whose measured curve meets
    * it, on BOTH regimes: the isotropic driver embeddings (v10b's honest
    * worst case — the knee is late) and the clustered fixture (v13's
    * best case — nprobe 1 suffices). The engine re-runs both gated curve
    * pipelines (composition, not re-derivation) and selects with exact
    * integer hit counts (total_hits ≥ 90 of 100 ⇔ recall ≥ 0.9); each
    * chosen row carries its scanned fraction — the price of the chosen
    * operating point — and the runner_up row (the largest nprobe BELOW
    * the choice) is the minimality witness: its hits hash-pin that the
    * next-cheaper setting missed the target. The clustered fixture's
    * choice is the smallest probe, so it has no runner_up row — the
    * 3-row shape is itself load-bearing. Oracle: both curves re-derived
    * under namespaced CTEs + the same integer selection. */
  /** Two-stage PQ retrieval — ADC shortlist, exact re-rank (the
    * production shape every quantized ANN deployment runs: the
    * compressed scan is cheap but lossy, so the top-C=25 ADC candidates
    * are re-scored against their RAW vectors and the final top-5 ranks
    * on exact dot products; at 100 TB the exact pass touches 25 vectors,
    * not the corpus — the full-corpus exact frame here exists only for
    * the recall AUDIT rows). `refined` pins the re-ranked top-5 with
    * exact scores; `audit_refined` / `audit_adc` pin overlap@5 against
    * the exact brute-force truth — the refinement's value is the pinned
    * gap (ADC alone ranks quantized, refined recovers the exact head).
    * Both stages rank on ROUNDED scores with vec_id ties (the v5
    * cross-engine determinism rule). */
  val v15PqRefine: Q = Q("v15_pq_refine",
    Some(s"""WITH d AS (SELECT vec_id, embedding AS e, $pqDCols FROM embeddings),
            c AS (SELECT vec_id, $pqCodeCols FROM d),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            lut AS (SELECT $pqLutCols FROM q),
            adc AS (SELECT vec_id, round($pqScoreSql, 6) AS adc FROM c, lut),
            cand AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 25),
            exact AS (
              SELECT e2.vec_id,
                round(list_dot_product(CAST(e2.embedding AS DOUBLE[]),
                  CAST(qv AS DOUBLE[])), 6) AS score
              FROM embeddings e2, q),
            refined AS (
              SELECT x.vec_id, x.score FROM exact x JOIN cand USING (vec_id)
              ORDER BY x.score DESC, x.vec_id LIMIT 5),
            truth AS (SELECT vec_id FROM exact ORDER BY score DESC, vec_id LIMIT 5),
            adc5 AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 5)
            SELECT section, vec_id, score, hits FROM (
              SELECT 'refined' AS section, vec_id, score, CAST(0 AS BIGINT) AS hits
              FROM refined
              UNION ALL SELECT 'audit_adc', CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE),
                (SELECT CAST(count(*) AS BIGINT) FROM adc5 a JOIN truth t USING (vec_id))
              UNION ALL SELECT 'audit_refined', CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE),
                (SELECT CAST(count(*) AS BIGINT) FROM refined r JOIN truth t USING (vec_id))
            ) t ORDER BY section, vec_id"""),
    (s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      // stage 1: compressed scan — 4 tinyint codes per vector, LUT ADC
      val adc = emb.withColumn("codes", Search.pqCodes(col("embedding"), pqCodebooks, pqSubDim))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Search.pqAdcScore(col("codes"), col("qv"), pqCodebooks, pqSubDim), 6).as("adc"))
        .localCheckpoint() // feeds the shortlist AND the audit's adc5 cut
      val cand = adc.orderBy(col("adc").desc, col("vec_id")).limit(25).select("vec_id")
      // full exact frame ONLY for the truth audit; the refined read joins
      // the broadcast 25-id shortlist (the 100 TB path fetches 25 rows)
      val exact = emb.crossJoin(broadcast(q))
        .select(col("vec_id"), round(Embed.dot(col("embedding"), col("qv")), 6).as("score"))
        .localCheckpoint()
      val refined = exact.join(broadcast(cand), Seq("vec_id"))
        .orderBy(col("score").desc, col("vec_id")).limit(5)
        .localCheckpoint() // output rows AND the audit overlap
      val truth = exact.orderBy(col("score").desc, col("vec_id")).limit(5)
        .select(col("vec_id").as("t_id"))
      val adc5 = adc.orderBy(col("adc").desc, col("vec_id")).limit(5).select("vec_id")
      def overlap(cut: org.apache.spark.sql.DataFrame, tag: String) =
        cut.join(broadcast(truth), col("vec_id") === col("t_id"))
          .agg(count(lit(1)).cast("long").as("hits"))
          .select(lit(tag).as("section"), lit(0L).as("vec_id"),
            lit(0.0).as("score"), col("hits"))
      refined.select(lit("refined").as("section"), col("vec_id"),
          col("score").cast("double").as("score"), lit(0L).as("hits"))
        .unionByName(overlap(adc5, "audit_adc"))
        .unionByName(overlap(refined.select("vec_id"), "audit_refined"))
        .orderBy("section", "vec_id")
    })

  /** Trained PQ codebooks (v16 — the v12/v13b trained-vs-seeded lesson
    * applied to product quantization, faiss's `train()` for PQ): the
    * clustered fixture's subvectors are k-means-trained per 8-dim
    * subspace, k = 8 codes (Forgy init from the 8 planted clusters'
    * subvectors, ONE decimal-exact Lloyd step — the d9 order-independent
    * update, so the oracle reproduces the centroids bit-for-bit), then
    * ADC recall@5 over 20 queries is measured for the TRAINED codebooks
    * against seed-11 data-blind gaussian ones at the SAME code budget.
    * The configuration is measured, not guessed: 4×16-dim subspaces with
    * k=4 LOSE to random codebooks on this fixture (the Lloyd step
    * collapses 6 of 8 clusters onto two near-zero centroids — recall
    * 0.31 vs 0.44); aligning subspaces with the 8-dim cluster blocks at
    * k=8 reaches recall 1.00 vs untrained ~0.8. The gate pins the
    * trained centroid table (per-(subspace, code) element sum + assigned
    * population), both recall rows, the recall DELTA, and both
    * QUANTIZATION DISTORTIONS (the actual k-means training objective,
    * summed exactly in DECIMAL) — training must cut distortion by an
    * order of magnitude and the margin is hash-pinned, not asserted.
    * Scale: training is one assignment pass + one (m,code,pos)
    * aggregate; codebooks stay k·d broadcast rows; the ADC scan reads 8
    * tinyint codes per vector. */
  val v16TrainedPq: Q = {
    val nSub = 8; val sDim = 8; val kPq = 8
    def fixVal(v: Int, i: Int): Double =
      (if (i / 8 == v % 8) 2.0 else 0.0) + ((v * 31 + i * 17) % 11 - 5) / 10.0
    val initLits: Seq[(Int, Int, Seq[Double])] =
      (for (m <- 0 until nSub; k <- 0 until kPq)
        yield (m, k, Seq.tabulate(sDim)(j => fixVal(k, m * sDim + j)))).toSeq
    val ubLits: Seq[(Int, Int, Seq[Double])] = {
      val rng = new scala.util.Random(11)
      val cb = Seq.fill(nSub)(Seq.fill(kPq)(Seq.fill(sDim)(rng.nextGaussian() * 0.2)))
      (for (m <- 0 until nSub; k <- 0 until kPq) yield (m, k, cb(m)(k))).toSeq
    }
    def valuesSql(rows: Seq[(Int, Int, Seq[Double])]) =
      rows.map { case (m, k, c) => s"($m, $k, CAST(${vecSql(c)} AS DOUBLE[]))" }
        .mkString(",\n              ")
    val adcSumSql = (0 until nSub)
      .map(m => s"max(CASE WHEN m = $m THEN l END)").mkString(" + ")
    Q("v16_trained_pq",
      Some(s"""WITH fix AS (
              SELECT vec_id, list_transform(range(0, 64), i ->
                (CASE WHEN i // 8 = vec_id % 8 THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                + ((vec_id * 31 + i * 17) % 11 - 5) / 10.0) AS e
              FROM embeddings),
            sub AS (SELECT vec_id, m, list_slice(e, m*$sDim + 1, m*$sDim + $sDim) AS sv
              FROM fix, range(0, $nSub) t(m)),
            q AS (SELECT vec_id AS qid, e AS qv FROM fix WHERE vec_id < 20),
            qsub AS (SELECT qid, m, list_slice(qv, m*$sDim + 1, m*$sDim + $sDim) AS qsv
              FROM q, range(0, $nSub) t(m)),
            ub(m, k, cv) AS (VALUES ${valuesSql(ubLits)}),
            ini(m, k, cv) AS (VALUES ${valuesSql(initLits)}),
            d0 AS (SELECT s.vec_id, s.m, i.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM sub s JOIN ini i ON i.m = s.m),
            a0 AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM d0) z
              WHERE rn = 1),
            el AS (SELECT a0.m, a0.k, j, sv[j] AS x
              FROM a0 JOIN sub USING (vec_id, m), range(1, ${sDim + 1}) t(j)),
            tcel AS (SELECT m, k, j,
                round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
              FROM el GROUP BY m, k, j),
            tcl AS (SELECT m, k, list(c ORDER BY j) AS cv FROM tcel GROUP BY m, k),
            dt AS (SELECT s.vec_id, s.m, t.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM sub s JOIN tcl t ON t.m = s.m),
            ct AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM dt) z
              WHERE rn = 1),
            du AS (SELECT s.vec_id, s.m, u.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM sub s JOIN ub u ON u.m = s.m),
            cu AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM du) z
              WHERE rn = 1),
            lt AS (SELECT qid, t.m, t.k,
                round(list_sum(list_transform(range(1, ${sDim + 1}), j -> qsv[j] * cv[j])), 6) AS l
              FROM qsub qs JOIN tcl t ON t.m = qs.m),
            lu AS (SELECT qid, u.m, u.k,
                round(list_sum(list_transform(range(1, ${sDim + 1}), j -> qsv[j] * cv[j])), 6) AS l
              FROM qsub qs JOIN ub u ON u.m = qs.m),
            st AS (SELECT qid, vec_id, round($adcSumSql, 6) AS score
              FROM ct JOIN lt USING (m, k) GROUP BY qid, vec_id),
            su AS (SELECT qid, vec_id, round($adcSumSql, 6) AS score
              FROM cu JOIN lu USING (m, k) GROUP BY qid, vec_id),
            ex AS (SELECT qid, f.vec_id, round(list_dot_product(f.e, qv), 6) AS score
              FROM fix f CROSS JOIN q WHERE f.vec_id <> q.qid),
            exr AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM ex) z WHERE rn <= 5),
            tr5 AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM st WHERE vec_id <> qid) z WHERE rn <= 5),
            ur5 AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM su WHERE vec_id <> qid) z WHERE rn <= 5),
            ht AS (SELECT CAST(count(*) AS BIGINT) AS h FROM tr5 JOIN exr USING (qid, vec_id)),
            hu AS (SELECT CAST(count(*) AS BIGINT) AS h FROM ur5 JOIN exr USING (qid, vec_id)),
            distt AS (SELECT CAST(sum(CAST(md AS DECIMAL(25,10))) AS DOUBLE) AS dsum FROM (
                SELECT vec_id, m, round(min(d2), 6) AS md FROM dt GROUP BY vec_id, m) z),
            distu AS (SELECT CAST(sum(CAST(md AS DECIMAL(25,10))) AS DOUBLE) AS dsum FROM (
                SELECT vec_id, m, round(min(d2), 6) AS md FROM du GROUP BY vec_id, m) z),
            grid AS (SELECT m, k FROM range(0, $nSub) t(m), range(0, $kPq) t2(k)),
            csum AS (SELECT m, k, round(list_sum(cv), 6) + 0.0 AS cs FROM tcl),
            cnt AS (SELECT m, k, CAST(count(*) AS BIGINT) AS n FROM ct GROUP BY m, k)
            SELECT section, m, k, val, n FROM (
              SELECT 'centroid' AS section, CAST(g.m AS BIGINT) AS m,
                CAST(g.k AS BIGINT) AS k, coalesce(cs, 0.0) AS val,
                coalesce(n, 0) AS n
              FROM grid g LEFT JOIN csum USING (m, k) LEFT JOIN cnt USING (m, k)
              UNION ALL SELECT 'recall_trained', -1, -1, CAST(h AS DOUBLE) / 100.0, h FROM ht
              UNION ALL SELECT 'recall_untrained', -1, -1, CAST(h AS DOUBLE) / 100.0, h FROM hu
              UNION ALL SELECT 'delta', -1, -1, CAST(t.h - u.h AS DOUBLE) / 100.0, t.h - u.h
              FROM ht t, hu u
              UNION ALL SELECT 'distortion_trained', -1, -1, round(dsum, 4), 0 FROM distt
              UNION ALL SELECT 'distortion_untrained', -1, -1, round(dsum, 4), 0 FROM distu
            ) z ORDER BY section, m, k"""),
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val fix = embeddings(s, d).select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            when(floor(i / 8) === col("vec_id") % 8, lit(2.0)).otherwise(lit(0.0))
              + ((col("vec_id") * 31 + i * 17) % 11 - 5).cast("double") / lit(10.0)).as("e"))
          .localCheckpoint()
        // subvector rows (vec_id, m, sv) — feeds the train pass AND both
        // code assignments
        val sub = fix.select(col("vec_id"), posexplode(array((0 until nSub).map(m =>
            slice(col("e"), m * sDim + 1, sDim)): _*)))
          .withColumnRenamed("pos", "m").withColumnRenamed("col", "sv")
          .localCheckpoint()
        val iniDf = initLits.toDF("m", "k", "cv")
        val ubDf = ubLits.toDF("m", "k", "cv")
        val d2 = aggregate(zip_with(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x)
        // both codebook arms (arm 0 = trained, arm 1 = data-blind seed-11)
        // ride ONE tagged frame through coding, scoring and auditing — the
        // v18 fusion: the arms are independent and structurally identical,
        // so fusing halves the job count; every aggregate below groups by
        // `arm`, keeping per-arm arithmetic bit-identical.
        def dists(cb: org.apache.spark.sql.DataFrame) = sub.join(broadcast(cb), Seq("m"))
          .withColumn("d2", d2)
        def argminOf(dd: org.apache.spark.sql.DataFrame) = dd
          .withColumn("rn", row_number().over(
            Window.partitionBy("arm", "vec_id", "m").orderBy(col("d2"), col("k"))))
          .filter(col("rn") === 1).select("arm", "vec_id", "m", "k")
        // ONE decimal-exact Lloyd step per subspace (the d9 update shape)
        val tcl = argminOf(dists(iniDf.withColumn("arm", lit(0)))).join(sub, Seq("vec_id", "m"))
          .select(col("m"), col("k"), posexplode(col("sv")))
          .groupBy("m", "k", "pos")
          .agg(round(sum(col("col").cast("decimal(25,10)")).cast("double")
            / count(lit(1)), 8).as("c"))
          .groupBy("m", "k")
          .agg(transform(array_sort(collect_list(struct(col("pos").as("p"), col("c").as("c")))),
            x => x.getField("c")).as("cv"))
          .localCheckpoint()
        val cbs = tcl.withColumn("arm", lit(0)).unionByName(ubDf.withColumn("arm", lit(1)))
        val dBoth = dists(cbs).localCheckpoint() // feeds both codes AND distortion
        val cBoth = argminOf(dBoth).localCheckpoint()
        val ct = cBoth.filter(col("arm") === 0).drop("arm") // feeds usage counts
        val q = fix.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qv"))
        val qsub = q.select(col("qid"), posexplode(array((0 until nSub).map(m =>
            slice(col("qv"), m * sDim + 1, sDim)): _*)))
          .withColumnRenamed("pos", "m").withColumnRenamed("col", "qsv")
        val luts = qsub.join(broadcast(cbs), Seq("m"))
          .select(col("arm"), col("qid"), col("m"), col("k"),
            round(aggregate(zip_with(col("qsv"), col("cv"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x), 6).as("l"))
        // ADC score: the LUT terms summed in FIXED subspace order (a
        // group-by sum would float with reduction order), then top-5
        val adcSum = round((0 until nSub).map(m => max(when(col("m") === m, col("l"))))
          .reduce(_ + _), 6)
        val top5Both = cBoth.join(broadcast(luts), Seq("arm", "m", "k"))
          .groupBy("arm", "qid", "vec_id")
          .agg(adcSum.as("score"))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("arm", "qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("arm", "qid", "vec_id")
        val exr = fix.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("e"), col("qv")), 6).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("qid", "vec_id").localCheckpoint()
        // both arms' recall in ONE pass; the static arm frame keeps a
        // zero-hit arm as an explicit h=0 row (groupBy would drop it)
        val hitsAll = Seq(0, 1).toDF("arm")
          .join(top5Both.join(exr, Seq("qid", "vec_id"))
            .groupBy("arm").agg(count(lit(1)).cast("long").as("h")), Seq("arm"), "left")
          .select(col("arm"), coalesce(col("h"), lit(0L)).as("h")).localCheckpoint()
        val hT = hitsAll.filter(col("arm") === 0).select("h")
        val hU = hitsAll.filter(col("arm") === 1).select("h")
        // quantization distortion — the k-means training objective: per
        // (vector, subspace) min d², rounded then summed EXACTLY in
        // decimal (a double sum would float with reduction order)
        val distBoth = dBoth.groupBy("arm", "vec_id", "m").agg(round(min("d2"), 6).as("md"))
          .groupBy("arm").agg(sum(col("md").cast("decimal(25,10)")).cast("double").as("dsum"))
          .select(when(col("arm") === 0, lit("distortion_trained"))
            .otherwise(lit("distortion_untrained")).as("section"),
            lit(-1L).as("m"), lit(-1L).as("k"),
            round(col("dsum"), 4).as("val"), lit(0L).as("n"))
        val grid = s.range(nSub).select(col("id").as("m"))
          .crossJoin(s.range(kPq).select(col("id").as("k")))
        // + 0.0 normalizes IEEE −0.0 (a possible round() output when the
        // element sum is a tiny negative) to +0.0 on BOTH engines
        val csum = tcl.select(col("m"), col("k"),
          (round(aggregate(col("cv"), lit(0.0), (a, x) => a + x), 6) + lit(0.0)).as("cs"))
        val cnt = ct.groupBy("m", "k").agg(count(lit(1)).as("n"))
        val centroidRows = grid.join(csum, Seq("m", "k"), "left")
          .join(cnt, Seq("m", "k"), "left")
          .select(lit("centroid").as("section"), col("m").cast("long").as("m"),
            col("k").cast("long").as("k"), coalesce(col("cs"), lit(0.0)).as("val"),
            coalesce(col("n"), lit(0L)).as("n"))
        def recallRow(h: org.apache.spark.sql.DataFrame, tag: String) =
          h.select(lit(tag).as("section"), lit(-1L).as("m"), lit(-1L).as("k"),
            (col("h").cast("double") / 100.0).as("val"), col("h").as("n"))
        val delta = hT.select(col("h").as("ht")).crossJoin(hU.select(col("h").as("hu")))
          .select(lit("delta").as("section"), lit(-1L).as("m"), lit(-1L).as("k"),
            ((col("ht") - col("hu")).cast("double") / 100.0).as("val"),
            (col("ht") - col("hu")).as("n"))
        centroidRows.unionByName(recallRow(hT, "recall_trained"))
          .unionByName(recallRow(hU, "recall_untrained")).unionByName(delta)
          .unionByName(distBoth)
          .orderBy("section", "m", "k")
      })
  }

  /** Filtered ANN (v17 — the ref's dual filtered-search path
    * `backend/services/vector_store.py:286-341` made scale-correct):
    * top-k under a metadata predicate (attr = 1, i.e. P8's isin filter
    * composed INTO the probe path). Two plans over the SAME stored
    * partitioned index (cell dirs, attr column inside):
    * PRE-FILTER — the predicate rides the DPP-pruned cell read (parquet
    * PushedFilters under the pruned directories), exact rank of the
    * survivors; POST-FILTER — rank 3k unfiltered, filter, keep k (the
    * overfetch gamble every post-filter engine makes). The gate pins the
    * pre-filter top-5 rows, both paths' recall vs brute-force-FILTERED
    * truth, and the scanned-row audit — at 100 TB the pre-filter path
    * ranks selectivity·cells rows and never loses recall to the fetch
    * budget, which is exactly what the pinned numbers show. */
  val v17FilteredAnn: Q = {
    val spineCents: Seq[Seq[Double]] =
      Seq.tabulate(8)(c => Seq.tabulate(64)(i => if (i / 8 == c) 2.0 else 0.0))
    Q("v17_filtered_ann",
      Some(s"""WITH fix AS (
              SELECT vec_id, list_transform(range(0, 64), i ->
                (CASE WHEN i // 8 = vec_id % 8 THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                + ((vec_id * 31 + i * 17) % 11 - 5) / 10.0) AS e
              FROM embeddings),
            attrs AS (SELECT vec_id, e, vec_id % 3 AS attr FROM fix),
            cents AS (SELECT cell, list_transform(range(0, 64), i ->
                CASE WHEN i // 8 = cell THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS cv
              FROM (SELECT unnest(range(0, 8)) AS cell)),
            dd AS (SELECT vec_id, e, attr, cell,
                list_sum(list_transform(range(1, 65), i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS d2
              FROM attrs CROSS JOIN cents),
            ranked AS (SELECT vec_id, e, attr, cell,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS crank FROM dd),
            assign AS (SELECT vec_id, e, attr, cell FROM ranked WHERE crank = 1),
            q AS (SELECT vec_id AS qid, e AS qv FROM fix WHERE vec_id < 20),
            qrank AS (SELECT vec_id AS qid, cell FROM ranked
              WHERE vec_id < 20 AND crank <= 2),
            cand AS (SELECT qr.qid, a.vec_id, a.attr,
                round(list_dot_product(a.e, q.qv), 6) AS score
              FROM assign a JOIN qrank qr ON a.cell = qr.cell JOIN q ON q.qid = qr.qid
              WHERE a.vec_id <> qr.qid),
            pre5 AS (SELECT qid, vec_id, score, rn FROM (
                SELECT qid, vec_id, score,
                  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM cand WHERE attr = 1) z WHERE rn <= 5),
            post15 AS (SELECT qid, vec_id, attr, score FROM (
                SELECT qid, vec_id, attr, score,
                  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM cand) z WHERE rn <= 15),
            post5 AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM post15 WHERE attr = 1) z WHERE rn <= 5),
            truth AS (SELECT qid, vec_id FROM (
                SELECT q.qid, a.vec_id,
                  row_number() OVER (PARTITION BY q.qid
                    ORDER BY round(list_dot_product(a.e, q.qv), 6) DESC, a.vec_id) AS rn
                FROM attrs a CROSS JOIN q WHERE a.attr = 1 AND a.vec_id <> q.qid) z
              WHERE rn <= 5),
            hp AS (SELECT CAST(count(*) AS BIGINT) AS h FROM pre5 JOIN truth USING (qid, vec_id)),
            ho AS (SELECT CAST(count(*) AS BIGINT) AS h FROM post5 JOIN truth USING (qid, vec_id)),
            sp AS (SELECT CAST(count(*) AS BIGINT) AS sc FROM cand WHERE attr = 1),
            so AS (SELECT CAST(count(*) AS BIGINT) AS sc FROM cand),
            n AS (SELECT count(*) AS n_vec FROM fix)
            SELECT section, qid, vec_id, score, n FROM (
              SELECT 'topk' AS section, CAST(qid AS BIGINT) AS qid,
                CAST(vec_id AS BIGINT) AS vec_id, score, CAST(rn AS BIGINT) AS n FROM pre5
              UNION ALL SELECT 'audit_prefilter', -1, -1, CAST(h AS DOUBLE) / 100.0, h FROM hp
              UNION ALL SELECT 'audit_postfilter', -1, -1, CAST(h AS DOUBLE) / 100.0, h FROM ho
              UNION ALL SELECT 'scan_prefilter', -1, -1,
                round(CAST(sc AS DOUBLE) / (20.0 * n_vec), 6), sc FROM sp, n
              UNION ALL SELECT 'scan_postfilter', -1, -1,
                round(CAST(sc AS DOUBLE) / (20.0 * n_vec), 6), sc FROM so, n
            ) z ORDER BY section, qid, vec_id"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val fix = embeddings(s, d).select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            when(floor(i / 8) === col("vec_id") % 8, lit(2.0)).otherwise(lit(0.0))
              + ((col("vec_id") * 31 + i * 17) % 11 - 5).cast("double") / lit(10.0)).as("e"))
          .localCheckpoint()
        // the STORED index: (vec_id, attr, e) under cell directories —
        // the metadata column lives inside the index so the predicate can
        // ride the pruned read
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_v17_${Integer.toHexString(d.hashCode)}"
        val indexDf = fix.select(col("vec_id"), (col("vec_id") % 3).as("attr"), col("e"))
        Search.writePartitionedIndex(indexDf, Search.ivfCell(col("e"), spineCents), out,
          bucketCol = "cell")
        val q = fix.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qv"),
            Search.ivfProbeCells(col("e"), spineCents, 2).as("probes"))
        // ONE pruned read feeds both plans: the probe join's dynamic
        // partition filter lists the probed cell dirs; pre-filter adds
        // attr = 1 as a pushed parquet filter on that same scan
        val cand = Search.readPrunedProbes(s, out, q, "probes", "cell")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("attr"),
            round(Embed.dot(col("e"), col("qv")), 6).as("score"))
          .localCheckpoint()
        val wq = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
        val pre5 = cand.filter(col("attr") === 1)
          .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 5)
          .localCheckpoint()
        val post5 = cand.withColumn("rn", row_number().over(wq)).filter(col("rn") <= 15)
          .filter(col("attr") === 1).drop("rn")
          .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 5)
          .select("qid", "vec_id")
        val truth = fix.withColumn("attr", col("vec_id") % 3).filter(col("attr") === 1)
          .crossJoin(broadcast(q.select("qid", "qv")))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("e"), col("qv")), 6).as("score"))
          .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 5)
          .select("qid", "vec_id").localCheckpoint()
        def auditRow(t5: org.apache.spark.sql.DataFrame, tag: String) =
          t5.join(truth, Seq("qid", "vec_id"))
            .agg(count(lit(1)).cast("long").as("h"))
            .select(lit(tag).as("section"), lit(-1L).as("qid"), lit(-1L).as("vec_id"),
              (col("h").cast("double") / 100.0).as("score"), col("h").as("n"))
        val nVec = fix.agg(count(lit(1)).as("n_vec"))
        def scanRow(c: org.apache.spark.sql.DataFrame, tag: String) =
          c.agg(count(lit(1)).cast("long").as("sc")).crossJoin(broadcast(nVec))
            .select(lit(tag).as("section"), lit(-1L).as("qid"), lit(-1L).as("vec_id"),
              round(col("sc").cast("double") / (lit(20.0) * col("n_vec")), 6).as("score"),
              col("sc").as("n"))
        val topk = pre5.select(lit("topk").as("section"), col("qid").cast("long").as("qid"),
          col("vec_id").cast("long").as("vec_id"), col("score"),
          col("rn").cast("long").as("n"))
        topk.unionByName(auditRow(pre5.select("qid", "vec_id"), "audit_prefilter"))
          .unionByName(auditRow(post5, "audit_postfilter"))
          .unionByName(scanRow(cand.filter(col("attr") === 1), "scan_prefilter"))
          .unionByName(scanRow(cand, "scan_postfilter"))
          .orderBy("section", "qid", "vec_id")
      })
  }

  val v14NprobePlan: Q = {
    val isoCentroids = ivfCentroids8
    val isoCentVals = isoCentroids.zipWithIndex
      .map { case (c, i) => s"($i, CAST(${vecSql(c)} AS DOUBLE[]))" }
      .mkString(",\n              ")
    Q("v14_nprobe_plan",
      Some(s"""WITH i_cents(cell, cv) AS (VALUES $isoCentVals),
            i_d AS (SELECT vec_id, embedding AS e FROM embeddings),
            i_dist AS (SELECT vec_id, e, cell,
                list_sum(list_transform(range(1, 65), i -> (e[i]::DOUBLE - cv[i]) * (e[i]::DOUBLE - cv[i]))) AS d2
              FROM i_d CROSS JOIN i_cents),
            i_ranked AS (SELECT vec_id, e, cell,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS crank FROM i_dist),
            i_assign AS (SELECT vec_id, e, cell FROM i_ranked WHERE crank = 1),
            i_q AS (SELECT vec_id AS qid, e AS qv FROM i_assign WHERE vec_id < 20),
            i_qrank AS (SELECT vec_id AS qid, cell, crank FROM i_ranked WHERE vec_id < 20),
            i_ex AS (SELECT qid, a.vec_id,
                round(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) AS score
              FROM i_assign a CROSS JOIN i_q WHERE a.vec_id <> i_q.qid),
            i_exr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM i_ex) WHERE rn <= 5),
            i_cand AS (SELECT qr.qid, a.vec_id, qr.crank,
                round(list_dot_product(CAST(a.e AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS score
              FROM i_assign a JOIN i_qrank qr ON a.cell = qr.cell JOIN i_q q ON q.qid = qr.qid
              WHERE a.vec_id <> qr.qid),
            i_probes(nprobe) AS (VALUES (1), (2), (4), (6), (7), (8)),
            i_pc AS (SELECT nprobe, qid, vec_id, score FROM i_cand CROSS JOIN i_probes WHERE crank <= nprobe),
            i_ivr AS (SELECT nprobe, qid, vec_id FROM (
                SELECT nprobe, qid, vec_id, row_number() OVER (PARTITION BY nprobe, qid ORDER BY score DESC, vec_id) AS rn
                FROM i_pc) WHERE rn <= 5),
            i_hits AS (SELECT nprobe, count(*) AS total_hits
              FROM i_ivr i JOIN i_exr e ON i.qid = e.qid AND i.vec_id = e.vec_id GROUP BY nprobe),
            i_scans AS (SELECT nprobe, count(*) AS scanned FROM i_pc GROUP BY nprobe),
            i_n AS (SELECT count(*) AS n_vec FROM i_d),
            i_curve AS (SELECT p.nprobe AS nprobe,
                CAST(coalesce(total_hits, 0) AS INT) AS total_hits,
                CAST(coalesce(scanned, 0) AS BIGINT) AS scanned, n_vec
              FROM i_probes p LEFT JOIN i_hits USING (nprobe)
              LEFT JOIN i_scans USING (nprobe) CROSS JOIN i_n),
            c_fix AS (
              SELECT vec_id, list_transform(range(0, 64), i ->
                (CASE WHEN i // 8 = vec_id % 8 THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                + ((vec_id * 31 + i * 17) % 11 - 5) / 10.0) AS e
              FROM embeddings),
            c_cents AS (
              SELECT cell, list_transform(range(0, 64), i ->
                CASE WHEN i // 8 = cell THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS cv
              FROM (SELECT unnest(range(0, 8)) AS cell)),
            c_dist AS (SELECT vec_id, e, cell,
                list_sum(list_transform(range(1, 65), i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS d2
              FROM c_fix CROSS JOIN c_cents),
            c_ranked AS (SELECT vec_id, e, cell,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS crank FROM c_dist),
            c_assign AS (SELECT vec_id, e, cell FROM c_ranked WHERE crank = 1),
            c_q AS (SELECT vec_id AS qid, e AS qv FROM c_assign WHERE vec_id < 20),
            c_qrank AS (SELECT vec_id AS qid, cell, crank FROM c_ranked WHERE vec_id < 20),
            c_ex AS (SELECT qid, a.vec_id,
                round(list_dot_product(a.e, qv), 6) AS score
              FROM c_assign a CROSS JOIN c_q WHERE a.vec_id <> c_q.qid),
            c_exr AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM c_ex) WHERE rn <= 5),
            c_cand AS (SELECT qr.qid, a.vec_id, qr.crank,
                round(list_dot_product(a.e, q.qv), 6) AS score
              FROM c_assign a JOIN c_qrank qr ON a.cell = qr.cell JOIN c_q q ON q.qid = qr.qid
              WHERE a.vec_id <> qr.qid),
            c_probes(nprobe) AS (VALUES (1), (2), (4), (8)),
            c_pc AS (SELECT nprobe, qid, vec_id, score FROM c_cand CROSS JOIN c_probes WHERE crank <= nprobe),
            c_ivr AS (SELECT nprobe, qid, vec_id FROM (
                SELECT nprobe, qid, vec_id, row_number() OVER (PARTITION BY nprobe, qid ORDER BY score DESC, vec_id) AS rn
                FROM c_pc) WHERE rn <= 5),
            c_hits AS (SELECT nprobe, count(*) AS total_hits
              FROM c_ivr i JOIN c_exr e ON i.qid = e.qid AND i.vec_id = e.vec_id GROUP BY nprobe),
            c_scans AS (SELECT nprobe, count(*) AS scanned FROM c_pc GROUP BY nprobe),
            c_n AS (SELECT count(*) AS n_vec FROM c_fix),
            c_curve AS (SELECT p.nprobe AS nprobe,
                CAST(coalesce(total_hits, 0) AS INT) AS total_hits,
                CAST(coalesce(scanned, 0) AS BIGINT) AS scanned, n_vec
              FROM c_probes p LEFT JOIN c_hits USING (nprobe)
              LEFT JOIN c_scans USING (nprobe) CROSS JOIN c_n),
            curves AS (
              SELECT 'isotropic' AS fixture, nprobe, total_hits, scanned, n_vec FROM i_curve
              UNION ALL SELECT 'clustered', nprobe, total_hits, scanned, n_vec FROM c_curve),
            chosen AS (SELECT fixture, min(nprobe) AS np FROM curves
              WHERE total_hits >= 90 GROUP BY fixture),
            runner AS (SELECT c.fixture, max(c.nprobe) AS np FROM curves c
              JOIN chosen ch ON ch.fixture = c.fixture WHERE c.nprobe < ch.np GROUP BY c.fixture)
            SELECT item, nprobe, total_hits, mean_recall_at_5, scanned_frac FROM (
              SELECT c.fixture || ':chosen' AS item, c.nprobe, c.total_hits,
                  CAST(c.total_hits AS DOUBLE) / CAST(100 AS DOUBLE) AS mean_recall_at_5,
                  CAST(c.scanned AS DOUBLE) / CAST(20 * c.n_vec AS DOUBLE) AS scanned_frac
                FROM curves c JOIN chosen ch ON ch.fixture = c.fixture AND c.nprobe = ch.np
              UNION ALL
              SELECT c.fixture || ':runner_up', c.nprobe, c.total_hits,
                  CAST(c.total_hits AS DOUBLE) / CAST(100 AS DOUBLE),
                  CAST(c.scanned AS DOUBLE) / CAST(20 * c.n_vec AS DOUBLE)
                FROM curves c JOIN runner r ON r.fixture = c.fixture AND c.nprobe = r.np
            ) t ORDER BY item"""),
      (s, d) => {
        // COMPOSE the two gated curve pipelines — planning is a selection
        // layer over measured curves, never a re-derivation
        val curves = v10bNprobeCurve.fn(s, d).withColumn("fixture", lit("isotropic"))
          .unionByName(v13ClusteredNprobe.fn(s, d).withColumn("fixture", lit("clustered")))
          .localCheckpoint() // 10 rows; feeds chosen, runner, and both output joins
        // exact integer selection: hits >= 90 of 100 <=> recall >= 0.9
        val chosen = curves.filter(col("total_hits") >= 90)
          .groupBy("fixture").agg(min("nprobe").as("nprobe"))
        val chosenRows = curves.join(broadcast(chosen), Seq("fixture", "nprobe"))
          .select(concat(col("fixture"), lit(":chosen")).as("item"), col("nprobe"),
            col("total_hits"), col("mean_recall_at_5"), col("scanned_frac"))
        val runner = curves
          .join(broadcast(chosen.withColumnRenamed("nprobe", "np")), Seq("fixture"))
          .filter(col("nprobe") < col("np"))
          .groupBy("fixture").agg(max("nprobe").as("nprobe"))
        val runnerRows = curves.join(broadcast(runner), Seq("fixture", "nprobe"))
          .select(concat(col("fixture"), lit(":runner_up")).as("item"), col("nprobe"),
            col("total_hits"), col("mean_recall_at_5"), col("scanned_frac"))
        chosenRows.unionByName(runnerRows).orderBy("item")
      })
  }

  /** Residual IVF-PQ / IVFADC (v18 — Jégou et al. 2011, the FAISS
    * 100 TB standard; the v12 × v16 composition): instead of
    * PQ-encoding raw vectors, encode each vector's RESIDUAL against its
    * assigned coarse centroid — the coarse quantizer absorbs the
    * between-cluster structure, so the per-subspace codebooks spend
    * their whole budget on the within-cluster noise and the codes land
    * tighter at the same bit cost. ADC composes as
    * dot(q, c_cell) + Σ_m LUT(q_m, residual codeword) — one extra
    * 16-entry coarse table per query, nothing else changes at scan time.
    * The gate trains BOTH arms with the same one-step DECIMAL-exact
    * Lloyd at the SAME code budget (8 subspaces × 8 codewords) on the
    * clustered fixture and pins: the residual codebook (per-(m,k)
    * centroid sums + usage counts), per-cell coarse assignment counts,
    * recall@5 of residual vs raw ADC against brute-force truth (the
    * residual arm's margin is the verb's payoff), and both quantization
    * distortions (residual ≪ raw — the training objective the margin
    * comes from). */
  val v18ResidualPq: Q = {
    val nSub = 8; val sDim = 8; val kPq = 8; val nCells = 16
    // 16 dense pseudo-random cluster centers touching EVERY subspace —
    // more clusters than codewords per subspace, and deliberately NOT
    // axis-aligned with the PQ split (an axis-aligned spine lets raw PQ
    // dedicate one codeword per cluster and erases the residual margin;
    // real embedding clusters are never subspace-aligned)
    def center(c: Int, i: Int): Double = ((c * 7 + i * 11) % 17 - 8) / 2.0
    def rVal(k: Int, i: Int): Double = (((k * 37 + i * 13) % 11) - 5) / 10.0
    // the raw arm's init covers HALF the centers (the best an 8-codeword
    // budget could hope for); the residual arm's init is noise-scale
    val iniLits: Seq[(Int, Int, Seq[Double])] =
      (for (m <- 0 until nSub; k <- 0 until kPq)
        yield (m, k, Seq.tabulate(sDim)(j => center(2 * k, m * sDim + j)))).toSeq
    val rIniLits: Seq[(Int, Int, Seq[Double])] =
      (for (m <- 0 until nSub; k <- 0 until kPq)
        yield (m, k, Seq.tabulate(sDim)(j => rVal(k, m * sDim + j)))).toSeq
    def valuesSql(rows: Seq[(Int, Int, Seq[Double])]) =
      rows.map { case (m, k, c) => s"($m, $k, CAST(${vecSql(c)} AS DOUBLE[]))" }
        .mkString(",\n              ")
    val adcSumSql = (0 until nSub)
      .map(m => s"max(CASE WHEN m = $m THEN l END)").mkString(" + ")
    Q("v18_residual_pq",
      Some(s"""WITH fix AS (
              SELECT vec_id, list_transform(range(0, 64), i ->
                CAST((((vec_id % $nCells) * 7 + i * 11) % 17 - 8) AS DOUBLE) / 2.0
                + ((vec_id * 31 + i * 17) % 11 - 5) / 10.0) AS e
              FROM embeddings),
            cents AS (SELECT cell, list_transform(range(0, 64), i ->
                CAST(((cell * 7 + i * 11) % 17 - 8) AS DOUBLE) / 2.0) AS cv
              FROM (SELECT unnest(range(0, $nCells)) AS cell)),
            dd AS (SELECT vec_id, e, cell,
                list_sum(list_transform(range(1, 65), i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS d2
              FROM fix CROSS JOIN cents),
            assign AS (SELECT vec_id, e, cell FROM (SELECT vec_id, e, cell,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM dd) z
              WHERE rn = 1),
            res AS (SELECT a.vec_id, a.cell,
                list_transform(range(1, 65), i -> a.e[i] - c.cv[i]) AS r
              FROM assign a JOIN cents c USING (cell)),
            rsub AS (SELECT vec_id, m, list_slice(r, m*$sDim + 1, m*$sDim + $sDim) AS sv
              FROM res, range(0, $nSub) t(m)),
            sub AS (SELECT vec_id, m, list_slice(e, m*$sDim + 1, m*$sDim + $sDim) AS sv
              FROM fix, range(0, $nSub) t(m)),
            rini(m, k, cv) AS (VALUES ${valuesSql(rIniLits)}),
            ini(m, k, cv) AS (VALUES ${valuesSql(iniLits)}),
            rd0 AS (SELECT s.vec_id, s.m, i.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM rsub s JOIN rini i ON i.m = s.m),
            ra0 AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM rd0) z
              WHERE rn = 1),
            rel AS (SELECT ra0.m, ra0.k, j, sv[j] AS x
              FROM ra0 JOIN rsub USING (vec_id, m), range(1, ${sDim + 1}) t(j)),
            rcel AS (SELECT m, k, j,
                round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
              FROM rel GROUP BY m, k, j),
            rcl AS (SELECT m, k, list(c ORDER BY j) AS cv FROM rcel GROUP BY m, k),
            d0 AS (SELECT s.vec_id, s.m, i.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM sub s JOIN ini i ON i.m = s.m),
            a0 AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM d0) z
              WHERE rn = 1),
            el AS (SELECT a0.m, a0.k, j, sv[j] AS x
              FROM a0 JOIN sub USING (vec_id, m), range(1, ${sDim + 1}) t(j)),
            tcel AS (SELECT m, k, j,
                round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*), 8) AS c
              FROM el GROUP BY m, k, j),
            tcl AS (SELECT m, k, list(c ORDER BY j) AS cv FROM tcel GROUP BY m, k),
            rdt AS (SELECT s.vec_id, s.m, t.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM rsub s JOIN rcl t ON t.m = s.m),
            rct AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM rdt) z
              WHERE rn = 1),
            dt AS (SELECT s.vec_id, s.m, t.k,
                list_sum(list_transform(range(1, ${sDim + 1}), j -> (sv[j] - cv[j]) * (sv[j] - cv[j]))) AS d2
              FROM sub s JOIN tcl t ON t.m = s.m),
            ct AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn FROM dt) z
              WHERE rn = 1),
            q AS (SELECT vec_id AS qid, e AS qv FROM fix WHERE vec_id < 20),
            qsub AS (SELECT qid, m, list_slice(qv, m*$sDim + 1, m*$sDim + $sDim) AS qsv
              FROM q, range(0, $nSub) t(m)),
            lr AS (SELECT qid, t.m, t.k,
                round(list_sum(list_transform(range(1, ${sDim + 1}), j -> qsv[j] * cv[j])), 6) AS l
              FROM qsub qs JOIN rcl t ON t.m = qs.m),
            lraw AS (SELECT qid, t.m, t.k,
                round(list_sum(list_transform(range(1, ${sDim + 1}), j -> qsv[j] * cv[j])), 6) AS l
              FROM qsub qs JOIN tcl t ON t.m = qs.m),
            qc AS (SELECT qid, cell, round(list_dot_product(qv, cv), 6) AS qcs
              FROM q CROSS JOIN cents),
            sresadc AS (SELECT qid, vec_id, round($adcSumSql, 6) AS adc
              FROM rct JOIN lr USING (m, k) GROUP BY qid, vec_id),
            sres AS (SELECT s.qid, s.vec_id, round(qc.qcs + s.adc, 6) AS score
              FROM sresadc s JOIN assign a ON a.vec_id = s.vec_id
              JOIN qc ON qc.qid = s.qid AND qc.cell = a.cell),
            sraw AS (SELECT qid, vec_id, round($adcSumSql, 6) AS score
              FROM ct JOIN lraw USING (m, k) GROUP BY qid, vec_id),
            ex AS (SELECT qid, f.vec_id, round(list_dot_product(f.e, qv), 6) AS score
              FROM fix f CROSS JOIN q WHERE f.vec_id <> q.qid),
            exr AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM ex) z WHERE rn <= 5),
            rr5 AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM sres WHERE vec_id <> qid) z WHERE rn <= 5),
            wr5 AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                FROM sraw WHERE vec_id <> qid) z WHERE rn <= 5),
            hr AS (SELECT CAST(count(*) AS BIGINT) AS h FROM rr5 JOIN exr USING (qid, vec_id)),
            hw AS (SELECT CAST(count(*) AS BIGINT) AS h FROM wr5 JOIN exr USING (qid, vec_id)),
            distr AS (SELECT CAST(sum(CAST(md AS DECIMAL(25,10))) AS DOUBLE) AS dsum FROM (
                SELECT vec_id, m, round(min(d2), 6) AS md FROM rdt GROUP BY vec_id, m) z),
            distw AS (SELECT CAST(sum(CAST(md AS DECIMAL(25,10))) AS DOUBLE) AS dsum FROM (
                SELECT vec_id, m, round(min(d2), 6) AS md FROM dt GROUP BY vec_id, m) z),
            grid AS (SELECT m, k FROM range(0, $nSub) t(m), range(0, $kPq) t2(k)),
            csum AS (SELECT m, k, round(list_sum(cv), 6) + 0.0 AS cs FROM rcl),
            cnt AS (SELECT m, k, CAST(count(*) AS BIGINT) AS n FROM rct GROUP BY m, k),
            coarse AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM assign GROUP BY cell)
            SELECT section, m, k, val, n FROM (
              SELECT 'centroid' AS section, CAST(g.m AS BIGINT) AS m,
                CAST(g.k AS BIGINT) AS k, coalesce(cs, 0.0) AS val, coalesce(n, 0) AS n
              FROM grid g LEFT JOIN csum USING (m, k) LEFT JOIN cnt USING (m, k)
              UNION ALL SELECT 'coarse', CAST(cell AS BIGINT), -1, 0.0, n FROM coarse
              UNION ALL SELECT 'recall_residual', -1, -1, CAST(h AS DOUBLE) / 100.0, h FROM hr
              UNION ALL SELECT 'recall_raw', -1, -1, CAST(h AS DOUBLE) / 100.0, h FROM hw
              UNION ALL SELECT 'delta', -1, -1, CAST(r.h - w.h AS DOUBLE) / 100.0, r.h - w.h
              FROM hr r, hw w
              UNION ALL SELECT 'distortion_residual', -1, -1, round(dsum, 4), 0 FROM distr
              UNION ALL SELECT 'distortion_raw', -1, -1, round(dsum, 4), 0 FROM distw
            ) z ORDER BY section, m, k"""),
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val fix = embeddings(s, d).select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            (((col("vec_id") % nCells) * 7 + i * 11) % 17 - 8).cast("double") / lit(2.0)
              + ((col("vec_id") * 31 + i * 17) % 11 - 5).cast("double") / lit(10.0)).as("e"))
          .localCheckpoint()
        val centsDf = (0 until nCells).map(c =>
            (c, Seq.tabulate(64)(i => center(c, i))))
          .toDF("cell", "cv")
        val dist64 = aggregate(zip_with(col("e"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x)
        // coarse assignment: exact argmin over the 8 spine centroids
        val assign = fix.crossJoin(broadcast(centsDf)).withColumn("d2", dist64)
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("d2"), col("cell"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cell"), col("e"),
            zip_with(col("e"), col("cv"), (x, y) => x - y).as("r"))
          .localCheckpoint()
        // BOTH PQ arms (arm 0 = residual, arm 1 = raw) ride ONE tagged
        // frame through training, coding, scoring, and auditing: the two
        // arms are structurally identical and independent, so fusing them
        // halves the gate's job count (each had its own Lloyd step, dists
        // checkpoint, argmin, LUT, top-5 and distortion chain — pure
        // scheduling floors on a 2000-vector fixture). Every aggregate
        // below groups by `arm`, so per-arm arithmetic (DECIMAL sums,
        // rounding points) is bit-identical to the unfused form.
        def subOf(src: org.apache.spark.sql.DataFrame, vcol: String) =
          src.select(col("vec_id"), posexplode(array((0 until nSub).map(m =>
              slice(col(vcol), m * sDim + 1, sDim)): _*)))
            .withColumnRenamed("pos", "m").withColumnRenamed("col", "sv")
        val subs = subOf(assign, "r").withColumn("arm", lit(0))
          .unionByName(subOf(fix, "e").withColumn("arm", lit(1)))
          .localCheckpoint()
        val iniAll = rIniLits.toDF("m", "k", "cv").withColumn("arm", lit(0))
          .unionByName(iniLits.toDF("m", "k", "cv").withColumn("arm", lit(1)))
        val d2 = aggregate(zip_with(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x)
        def dists(src: org.apache.spark.sql.DataFrame, cb: org.apache.spark.sql.DataFrame) =
          src.join(broadcast(cb), Seq("arm", "m")).withColumn("d2", d2)
        def argminOf(dd: org.apache.spark.sql.DataFrame) = dd
          .withColumn("rn", row_number().over(
            Window.partitionBy("arm", "vec_id", "m").orderBy(col("d2"), col("k"))))
          .filter(col("rn") === 1).select("arm", "vec_id", "m", "k")
        // ONE decimal-exact Lloyd step covering both arms (the v16 shape)
        val cls = argminOf(dists(subs, iniAll)).join(subs, Seq("arm", "vec_id", "m"))
          .select(col("arm"), col("m"), col("k"), posexplode(col("sv")))
          .groupBy("arm", "m", "k", "pos")
          .agg(round(sum(col("col").cast("decimal(25,10)")).cast("double")
            / count(lit(1)), 8).as("c"))
          .groupBy("arm", "m", "k")
          .agg(transform(array_sort(collect_list(struct(col("pos").as("p"), col("c").as("c")))),
            x => x.getField("c")).as("cv"))
          .localCheckpoint()
        val dt2 = dists(subs, cls).localCheckpoint() // codes + distortion, both arms
        val cts = argminOf(dt2).localCheckpoint()    // also feeds usage counts
        val rcl = cls.filter(col("arm") === 0).drop("arm")
        val rct = cts.filter(col("arm") === 0).drop("arm")
        val q = fix.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qv")).localCheckpoint()
        val qsub = q.select(col("qid"), posexplode(array((0 until nSub).map(m =>
            slice(col("qv"), m * sDim + 1, sDim)): _*)))
          .withColumnRenamed("pos", "m").withColumnRenamed("col", "qsv")
        val luts = qsub.join(broadcast(cls), Seq("m"))
          .select(col("arm"), col("qid"), col("m"), col("k"),
            round(aggregate(zip_with(col("qsv"), col("cv"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x), 6).as("l"))
        val adcSum = round((0 until nSub).map(m => max(when(col("m") === m, col("l"))))
          .reduce(_ + _), 6)
        def top5(scored: org.apache.spark.sql.DataFrame) = scored
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("arm", "qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("arm", "qid", "vec_id")
        // residual ADC: the coarse dot table (8 entries per query) plus the
        // residual LUT sum — scored against EVERY vector's (cell, codes);
        // the raw arm's score is the LUT sum alone (same fused pass, the
        // coarse term gated by arm)
        val qcTab = q.crossJoin(broadcast(centsDf))
          .select(col("qid"), col("cell"),
            round(aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x), 6).as("qcs"))
        val scoredBoth = cts.join(broadcast(luts), Seq("arm", "m", "k"))
          .groupBy("arm", "qid", "vec_id").agg(adcSum.as("adc"))
          .join(assign.select("vec_id", "cell"), Seq("vec_id"))
          .join(broadcast(qcTab), Seq("qid", "cell"))
          .select(col("arm"), col("qid"), col("vec_id"),
            when(col("arm") === 0, round(col("qcs") + col("adc"), 6))
              .otherwise(col("adc")).as("score"))
        val exr = fix.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), round(Embed.dot(col("e"), col("qv")), 6).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 5).select("qid", "vec_id").localCheckpoint()
        // both arms' recall in ONE pass; the static arm frame keeps a
        // zero-hit arm as an explicit h=0 row (groupBy would drop it)
        val hitsAll = Seq(0, 1).toDF("arm")
          .join(top5(scoredBoth).join(exr, Seq("qid", "vec_id"))
            .groupBy("arm").agg(count(lit(1)).cast("long").as("h")), Seq("arm"), "left")
          .select(col("arm"), coalesce(col("h"), lit(0L)).as("h")).localCheckpoint()
        val hR = hitsAll.filter(col("arm") === 0).select("h")
        val hW = hitsAll.filter(col("arm") === 1).select("h")
        val distBoth = dt2.groupBy("arm", "vec_id", "m").agg(round(min("d2"), 6).as("md"))
          .groupBy("arm").agg(sum(col("md").cast("decimal(25,10)")).cast("double").as("dsum"))
          .select(when(col("arm") === 0, lit("distortion_residual"))
            .otherwise(lit("distortion_raw")).as("section"),
            lit(-1L).as("m"), lit(-1L).as("k"),
            round(col("dsum"), 4).as("val"), lit(0L).as("n"))
        val grid = s.range(nSub).select(col("id").as("m"))
          .crossJoin(s.range(kPq).select(col("id").as("k")))
        val csum = rcl.select(col("m"), col("k"),
          (round(aggregate(col("cv"), lit(0.0), (a, x) => a + x), 6) + lit(0.0)).as("cs"))
        val cnt = rct.groupBy("m", "k").agg(count(lit(1)).as("n"))
        val centroidRows = grid.join(csum, Seq("m", "k"), "left")
          .join(cnt, Seq("m", "k"), "left")
          .select(lit("centroid").as("section"), col("m").cast("long").as("m"),
            col("k").cast("long").as("k"), coalesce(col("cs"), lit(0.0)).as("val"),
            coalesce(col("n"), lit(0L)).as("n"))
        val coarseRows = assign.groupBy("cell").agg(count(lit(1)).as("n"))
          .select(lit("coarse").as("section"), col("cell").cast("long").as("m"),
            lit(-1L).as("k"), lit(0.0).as("val"), col("n").cast("long").as("n"))
        def recallRow(h: org.apache.spark.sql.DataFrame, tag: String) =
          h.select(lit(tag).as("section"), lit(-1L).as("m"), lit(-1L).as("k"),
            (col("h").cast("double") / 100.0).as("val"), col("h").as("n"))
        val delta = hR.select(col("h").as("hr")).crossJoin(hW.select(col("h").as("hw")))
          .select(lit("delta").as("section"), lit(-1L).as("m"), lit(-1L).as("k"),
            ((col("hr") - col("hw")).cast("double") / 100.0).as("val"),
            (col("hr") - col("hw")).as("n"))
        centroidRows.unionByName(coarseRows)
          .unionByName(recallRow(hR, "recall_residual"))
          .unionByName(recallRow(hW, "recall_raw")).unionByName(delta)
          .unionByName(distBoth)
          .orderBy("section", "m", "k")
      })
  }

  /** Streaming index maintenance with exactly-once epochs (v19 — the
    * ref's full S8 loop `backend/main.py:233-332` ending where it
    * actually ends: upload → ingest → INDEX; Delta-backed vector stores
    * run exactly this shape): each upstream commit becomes one epoch of
    * LSM maintenance against the stored cell-partitioned index —
    * inserts, payload updates (cell moves write their old-cell
    * tombstone), deletes, and a re-insert after a delete — fenced by a
    * MANIFEST log whose txn marker rides the same commit as the
    * segment inventory. The manifest is load-bearing, not bookkeeping:
    * segment numbers are DERIVED from it (at 100 TB the next seg id
    * cannot come from a max() scan of the physical index —
    * [[graft.index.Upsert.upsertSeg]]), the per-cell write inventory is
    * committed from the write's own one-pass aggregate (never a file
    * re-listing), and a re-delivered epoch (what a checkpoint restart
    * does) is `skipped_duplicate` from the manifest ALONE — the replay
    * consumes NO segment number, which the seg:3 manifest row pins
    * (a blind re-apply would shift every later segment id). Freshness
    * is pinned per epoch, not just at the end: the segment numbering
    * gives the index time travel for free (state at epoch e = segments
    * ≤ e), so one scan + one epoch-grid resolution yields each epoch's
    * live state, and the gate pins per-epoch live counts/cell spreads
    * AND the top-3 search answer for a pinned query as it CHANGES
    * under the updates — the "search results track upstream commits"
    * claim, recomputed independently by the oracle from the wave
    * formulas.
    *
    * Scope: the fence here is the SINGLE-WRITER streaming form (one
    * maintenance pipeline owns the index — the ref's shape; the epoch
    * check is one log-sized lastTxnVersion probe). Racing maintenance
    * writers would commit the same manifest rows through
    * [[graft.ops.DeltaLog.commitEpochIdempotent]] instead — the OCC +
    * fence composition dl33/dl38 already gate — with zero change to the
    * segment layout, since seg ids come from the manifest either way. */
  val v19StreamingIndex: Q = {
    val centroids = ivfCentroids8
    val centVals = centroids.zipWithIndex
      .map { case (c, i) => s"($i, CAST(${vecSql(c)} AS DOUBLE[]))" }
      .mkString(",\n              ")
    def cellRank(dcol: String, name: String) =
      s"""$name AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
              row_number() OVER (PARTITION BY vec_id ORDER BY $dcol, cell) AS rn
            FROM dd) z WHERE rn = 1)"""
    Q("v19_streaming_index",
      Some(s"""WITH cents(cell, cv) AS (VALUES $centVals),
            pay AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS eo,
                list_transform(CAST(embedding AS DOUBLE[]), x -> -x) AS en,
                list_transform(CAST(embedding AS DOUBLE[]), x -> 2 * x) AS ed
              FROM embeddings),
            dd AS (SELECT vec_id, cell,
                list_sum(list_transform(range(1, 65), i -> (eo[i] - cv[i]) * (eo[i] - cv[i]))) AS do2,
                list_sum(list_transform(range(1, 65), i -> (en[i] - cv[i]) * (en[i] - cv[i]))) AS dn2,
                list_sum(list_transform(range(1, 65), i -> (ed[i] - cv[i]) * (ed[i] - cv[i]))) AS dd2
              FROM pay CROSS JOIN cents),
            ${cellRank("do2", "co")}, ${cellRank("dn2", "cn")}, ${cellRank("dd2", "cd")},
            cells AS (SELECT p.vec_id, co.cell AS cello, cn.cell AS celln, cd.cell AS celld
              FROM pay p JOIN co ON co.vec_id = p.vec_id
              JOIN cn ON cn.vec_id = p.vec_id JOIN cd ON cd.vec_id = p.vec_id),
            -- current (id, cell) after epoch 1: everything is live
            cur1 AS (SELECT vec_id,
                CASE WHEN vec_id % 7 = 0 AND vec_id % 5 <> 4 THEN celln ELSE cello END AS cell
              FROM cells),
            s0rows AS (SELECT vec_id, cello AS cell, 1 AS live FROM cells WHERE vec_id % 5 <> 4),
            s1rows AS (
              SELECT vec_id, cello AS cell, 1 AS live FROM cells WHERE vec_id % 5 = 4
              UNION ALL SELECT vec_id, celln, 1 FROM cells
                WHERE vec_id % 7 = 0 AND vec_id % 5 <> 4
              UNION ALL SELECT vec_id, cello, 0 FROM cells
                WHERE vec_id % 7 = 0 AND vec_id % 5 <> 4 AND celln <> cello),
            s2rows AS (SELECT vec_id, cell, 0 AS live FROM cur1 WHERE vec_id % 11 = 0),
            s3rows AS (
              SELECT vec_id, celld AS cell, 1 AS live FROM cells WHERE vec_id % 13 = 0
              UNION ALL SELECT c.vec_id, u.cell, 0 FROM cells c JOIN cur1 u USING (vec_id)
                WHERE c.vec_id % 13 = 0 AND c.vec_id % 11 <> 0 AND u.cell <> c.celld),
            manifest AS (
              SELECT 'seg:0' AS item, CAST(sum(live) AS BIGINT) AS a,
                CAST(count(*) - sum(live) AS BIGINT) AS b,
                CAST(count(DISTINCT cell) AS DOUBLE) AS val FROM s0rows
              UNION ALL SELECT 'seg:1', CAST(sum(live) AS BIGINT),
                CAST(count(*) - sum(live) AS BIGINT),
                CAST(count(DISTINCT cell) AS DOUBLE) FROM s1rows
              UNION ALL SELECT 'seg:2', CAST(sum(live) AS BIGINT),
                CAST(count(*) - sum(live) AS BIGINT),
                CAST(count(DISTINCT cell) AS DOUBLE) FROM s2rows
              UNION ALL SELECT 'seg:3', CAST(sum(live) AS BIGINT),
                CAST(count(*) - sum(live) AS BIGINT),
                CAST(count(DISTINCT cell) AS DOUBLE) FROM s3rows),
            -- per-epoch live state (vec_id, cell, payload)
            pv AS (
              SELECT vec_id, 0 AS epoch, cello AS cell, eo AS e FROM pay
                JOIN cells USING (vec_id) WHERE vec_id % 5 <> 4
              UNION ALL SELECT vec_id, 1, u.cell,
                CASE WHEN vec_id % 7 = 0 AND vec_id % 5 <> 4 THEN en ELSE eo END
              FROM pay JOIN cur1 u USING (vec_id)
              UNION ALL SELECT vec_id, 2, u.cell,
                CASE WHEN vec_id % 7 = 0 AND vec_id % 5 <> 4 THEN en ELSE eo END
              FROM pay JOIN cur1 u USING (vec_id) WHERE vec_id % 11 <> 0
              UNION ALL SELECT p.vec_id, 3,
                CASE WHEN p.vec_id % 13 = 0 THEN c.celld ELSE u.cell END,
                CASE WHEN p.vec_id % 13 = 0 THEN ed
                     WHEN p.vec_id % 7 = 0 AND p.vec_id % 5 <> 4 THEN en ELSE eo END
              FROM pay p JOIN cells c USING (vec_id) JOIN cur1 u USING (vec_id)
              WHERE p.vec_id % 11 <> 0 OR p.vec_id % 13 = 0),
            state AS (SELECT 'e' || CAST(epoch AS VARCHAR) AS item,
                CAST(count(*) AS BIGINT) AS a, CAST(sum(vec_id) AS BIGINT) AS b,
                CAST(count(DISTINCT cell) AS DOUBLE) AS val
              FROM pv GROUP BY epoch),
            q AS (SELECT epoch, e AS qv FROM pv WHERE vec_id = 1),
            sc AS (SELECT pv.epoch, pv.vec_id,
                round(list_dot_product(pv.e, q.qv), 6) AS score
              FROM pv JOIN q USING (epoch) WHERE pv.vec_id <> 1),
            fresh AS (SELECT 'e' || CAST(epoch AS VARCHAR) || ':r' || CAST(rn AS VARCHAR) AS item,
                CAST(vec_id AS BIGINT) AS a, CAST(rn AS BIGINT) AS b, score AS val
              FROM (SELECT epoch, vec_id, score,
                  row_number() OVER (PARTITION BY epoch ORDER BY score DESC, vec_id) AS rn
                FROM sc) z WHERE rn <= 3),
            dec(item, a, b) AS (VALUES
              ('e0:committed', 0, 1), ('e1:committed', 1, 1), ('e2:committed', 2, 1),
              ('e2:skipped_duplicate', 2, 0), ('e3:committed', 3, 1))
            SELECT section, item, a, b, val FROM (
              SELECT 'decision' AS section, item, CAST(a AS BIGINT) AS a,
                CAST(b AS BIGINT) AS b, CAST(0 AS DOUBLE) AS val FROM dec
              UNION ALL SELECT 'manifest', item, a, b, val FROM manifest
              UNION ALL SELECT 'state', item, a, b, val FROM state
              UNION ALL SELECT 'fresh', item, a, b, val FROM fresh
            ) t ORDER BY section, item"""),
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_v19s_${Integer.toHexString(d.hashCode)}"
        val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
        def cellOf(e: Column) = Search.ivfCell(e.cast("array<double>"), centroids)
        val negv = emb.select(col("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"))
        val dblv = emb.select(col("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        def currentIds() = Upsert.resolveView(
          s.read.parquet(dir).select(col("vec_id"), col("cell"), col("seg"), col("deleted")),
          "vec_id")
        // ---- the epoch loop: manifest-fenced, seg id = epoch's manifest row
        var man = DeltaLog.metaAction(s, 0, 0, "v19-index").coalesce(1).localCheckpoint()
        val outcomes = scala.collection.mutable.Buffer.empty[(String, Long, Long)]
        def commitEpoch(epoch: Int, mk: () => org.apache.spark.sql.DataFrame): Unit = {
          val last = DeltaLog.lastTxnVersion(man, "v19idx").head().getLong(0)
          if (epoch <= last) outcomes += ((s"e$epoch:skipped_duplicate", epoch.toLong, 0L))
          else {
            val inv = mk() // the physical write; returns (cell, n_live, n_tombstones)
            val adds = DeltaLog.addActions(
              inv.select(concat(lit(s"seg:$epoch/cell:"), col("cell")).as("path"),
                (col("cell") + 1).as("ordinal"), array(col("cell").cast("long")).as("buckets"),
                (col("n_live") + col("n_tombstones")).as("n_rows"),
                col("n_live").as("min_key"), col("n_tombstones").as("max_key"),
                lit(0L).as("cents")), epoch)
            man = man.unionByName(adds)
              .unionByName(DeltaLog.txnAction(s, epoch, 9999, "v19idx", epoch.toLong))
              .coalesce(1).localCheckpoint()
            outcomes += ((s"e$epoch:committed", epoch.toLong, 1L))
          }
        }
        commitEpoch(0, () => { // base build
          val base = emb.filter(col("vec_id") % 5 =!= 4)
            .withColumn("cell", cellOf(col("embedding"))).localCheckpoint()
          Upsert.writeBase(base, "cell", dir)
          base.groupBy("cell").agg(count(lit(1)).as("n_live"),
            lit(0L).as("n_tombstones"))
        })
        val batch1 = emb.filter(col("vec_id") % 5 === 4)
          .unionByName(negv.filter(col("vec_id") % 7 === 0 && col("vec_id") % 5 =!= 4))
          .withColumn("cell", cellOf(col("embedding")))
        commitEpoch(1, () => Upsert.upsertSeg(batch1, currentIds(), 1L, dir))
        commitEpoch(2, () => Upsert.deleteSeg(
          currentIds().filter(col("vec_id") % 11 === 0).select("vec_id", "cell"),
          batch1, 2L, dir))
        commitEpoch(2, () => sys.error("a skipped epoch must never write")) // the replay
        val batch3 = dblv.filter(col("vec_id") % 13 === 0)
          .withColumn("cell", cellOf(col("embedding")))
        commitEpoch(3, () => Upsert.upsertSeg(batch3, currentIds(), 3L, dir))
        // ---- one scan, every epoch: segment numbering is time travel
        val epochs = s.range(0, 4).select(col("id").cast("int").as("epoch"))
        val segs = s.read.parquet(dir)
          .select(col("vec_id"), col("cell"), col("seg"), col("deleted"), col("embedding"))
        val w = Window.partitionBy(col("epoch"), col("vec_id"))
          .orderBy(col("seg").desc, col("deleted").asc)
        val resolved = segs.crossJoin(broadcast(epochs)).filter(col("seg") <= col("epoch"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1 && !col("deleted"))
          .select("epoch", "vec_id", "cell", "embedding").localCheckpoint()
        val stateRows = resolved.groupBy("epoch").agg(count(lit(1)).as("a"),
            sum("vec_id").as("b"), countDistinct("cell").cast("double").as("val"))
          .select(lit("state").as("section"), concat(lit("e"), col("epoch")).as("item"),
            col("a").cast("long").as("a"), col("b").cast("long").as("b"), col("val"))
        val qv = resolved.filter(col("vec_id") === 1)
          .select(col("epoch"), col("embedding").as("qv"))
        val freshRows = resolved.filter(col("vec_id") =!= 1)
          .join(broadcast(qv), Seq("epoch"))
          .select(col("epoch"), col("vec_id"),
            round(Embed.dot(col("embedding").cast("array<double>"),
              col("qv").cast("array<double>")), 6).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("epoch").orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") <= 3)
          .select(lit("fresh").as("section"),
            concat(lit("e"), col("epoch"), lit(":r"), col("rn")).as("item"),
            col("vec_id").cast("long").as("a"), col("rn").cast("long").as("b"),
            col("score").as("val"))
        // the manifest section reads the LOG, not the files
        val manRows = man.filter(col("op") === "add")
          .groupBy("version").agg(sum("min_key").as("a"), sum("max_key").as("b"),
            count(lit(1)).cast("double").as("val"))
          .select(lit("manifest").as("section"),
            concat(lit("seg:"), col("version")).as("item"),
            col("a").cast("long").as("a"), col("b").cast("long").as("b"), col("val"))
        val decRows = outcomes.toSeq.toDF("item", "a", "b")
          .select(lit("decision").as("section"), col("item"), col("a"), col("b"),
            lit(0.0).as("val"))
        decRows.unionByName(manRows).unionByName(stateRows).unionByName(freshRows)
          .orderBy("section", "item")
      })
  }

  def all: Seq[Q] = Seq(v1Embed, v2AnnTopK, v3LshTopK, v4IvfTopK, v3bLshPruned, v4bIvfPruned,
    v5PqTopK, v5bPqStored, v6IvfPq, a12Approx, a12bApproxPortable,
    d5EmbedDup, d1Exact, d2MinHash,
    d2MinHashPairs, d3SimHash, d4NgramJaccard, d6Decontaminate, d6bDecontaminateBloom, d15Contamination, d7DedupClusters,
    d7bClusterHistogram, d8Incremental, d9SemDedup, d9bSemKeep, d9cLloyd3, hn1HardNeg,
    d3bSimHashPairs, d3cSimHash64Pairs, m3FrameSample, m4AudioWindows, v7SqTopK, x4Fingerprint,
    m1Binary, m2ImageDims, pdf1TextExtract, d12SoftDedup, m5WavMeta, v8PcaTop,
    rrf1Hybrid, mmr1Diverse, ask4Hybrid, d13PrefixJaccard, m6TiffDims, d14Outliers, d16LshRecall, d17Containment,
    m7PngDecode, d18ImageNearDup, v9IndexUpsert, m8Mp4Meta, v10IvfRecall, v10bNprobeCurve,
    v4cIvfMultiprobePruned, v12TrainedIvf, v13ClusteredNprobe, v13bTrainedClustered, m9WavPcm,
    m10GifDecode, v11MaxSim, m11ExifOrientation, dom9DedupCurve, m12JpegDecode,
    m13JpegNearDup, d20SkewedDedup, m14ProgressiveDecode, m15MjpegFrames,
    wds1WebDataset, m16G711, tfr1TfExample, avro1Records, arrow1Records, m20Compressed, sz1SevenZip, sz2StackExchange, deb1Package, cpio1Rpm, docx1Text, xlsx1Cells, m17WebpDims,
    sniff1Router, xlsx2TablePipeline, m18AudioMeta, m19WebmMeta, wiki1DumpPages,
    wiki2Bz2Pages, v14NprobePlan, v15PqRefine, v16TrainedPq, v17FilteredAnn, v18ResidualPq,
    v19StreamingIndex)
}
