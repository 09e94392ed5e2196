package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.index.{Embed, Search}

class DedupSearchSpec extends SparkSpec {
  import spark.implicits._

  test("MinHash+LSH surfaces planted near-duplicates, not unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (3L, "completely different content about spark sql window functions and joins"),
      (4L, "yet another unrelated document mentioning vectors and embeddings only")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashDuplicates(docs, "doc_id", col("text"),
      shingleWidth = 3, numHashes = 12, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("SimHash fingerprints of near-identical texts are hamming-close") {
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val fps = Seq(
      ("a", "the quick brown fox jumps over the lazy dog every single morning"),
      ("b", "the quick brown fox jumps over the lazy dog every single evening"),
      ("c", "spark catalyst optimizer rewrites logical plans into physical plans")
    ).toDF("id", "t").select(col("id"), Dedup.simHash(col("t"), 16).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hamming(fps("a"), fps("b")) <= 4)
    assert(hamming(fps("a"), fps("c")) > hamming(fps("a"), fps("b")))
  }

  test("brute-force top-k ranks the query vector itself first") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val top = Search.bruteForceTopK(emb.crossJoin(broadcast(q)), "embedding", "vec_id",
      transform(col("qv"), x => x.cast("double")), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top.head == 7L)
  }

  test("LSH top-k returns the query's bucket-mates ranked exactly; query first") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val top = Search.lshTopK(emb.crossJoin(broadcast(q)), "embedding", "vec_id",
      transform(col("qv"), x => x.cast("double")), dim = 64, bits = 6, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top.nonEmpty && top.head == 7L)
  }

  test("IVF top-k finds the query in its own cell, ranked first") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val centroids = {
      val rng = new scala.util.Random(7)
      Seq.fill(4)(Seq.fill(64)(rng.nextGaussian() * 0.05))
    }
    val top = Search.ivfTopK(emb.crossJoin(broadcast(q)), "embedding", "vec_id",
      transform(col("qv"), x => x.cast("double")), centroids, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top.nonEmpty && top.head == 3L)
  }

  test("exact dedup keeps first-seen row per normalized content") {
    val df = Seq((1L, "Same  Text"), (2L, "same text"), (3L, "other")).toDF("id", "t")
    val kept = Dedup.exact(df, lower(col("t")), col("id")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("LSH-banded near-dup pairs are a verified subset of brute-force pairs") {
    val emb = graft.tables.TestTables.embeddings(spark, sf)
    val banded = Search.lshNearDuplicatePairs(emb, "embedding", "vec_id",
      dim = 64, bitsPerBand = 4, numBands = 4, threshold = 0.42, seed = 43)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(banded.nonEmpty, "banding must retain some qualifying pairs (vacuous otherwise)")
    assert(banded.forall(_._3 >= 0.42), "every emitted pair is exact-cosine verified")
    // subset of the exact all-pairs result (blocking can only drop, never invent)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Embed.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.42)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.forall(p => brute.contains((p._1, p._2))))
  }

  test("embedding cosine of identical vectors is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(1.0f, 2.0f, 2.0f))).toDF("a", "b")
    val c = df.select(Embed.cosine(col("a"), col("b")).as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("PQ codes pick the argmin centroid per subspace; ADC scores via the code's LUT entry") {
    // 2 subspaces of 2 dims, 2 centroids each — codes and score computable by hand
    val codebooks = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (2L, Seq(0.1f, 0.9f, 0.8f, 0.1f)))
      .toDF("id", "v")
      .withColumn("codes", Search.pqCodes(col("v"), codebooks, subDim = 2))
    val codes = df.collect().map(r => r.getLong(0) -> r.getSeq[Byte](2).map(_.toInt)).toMap
    assert(codes(1L) == Seq(0, 1)) // [1,0]→centroid0, [0,1]→centroid1
    assert(codes(2L) == Seq(1, 0)) // [.1,.9]→centroid1, [.8,.1]→centroid0
    // ADC for doc 1 with query [2,3,4,5]: dot([2,3],[1,0]) + dot([4,5],[0,1]) = 2 + 5
    val score = df.filter(col("id") === 1)
      .select(Search.pqAdcScore(col("codes"),
        typedLit(Seq(2.0, 3.0, 4.0, 5.0)), codebooks, subDim = 2).as("s"))
      .head().getDouble(0)
    assert(score == 7.0)
  }
}
