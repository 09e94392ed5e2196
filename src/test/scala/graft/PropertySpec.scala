package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Dedup, Chunking}

/** Property-style tests for the parser/normalizer surface (SURVEY.md §5
  * plan): money-parse round-trip, normalization idempotence, fingerprint
  * stability, exact-chunker invariants — seeded random sampling through
  * the same Catalyst path production uses. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  test("parseMoney round-trips formatted positive and accounting-negative amounts") {
    val vs = Seq.fill(200)(rng.nextLong(9999999900L).abs / 100.0)
    val formatted = vs.map(v => f"$$${v}%,.2f") ++ vs.map(v => f"(${v}%,.2f)")
    val out = formatted.toDF("t").select(Cleaning.parseMoney(col("t")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    val expected = vs.map(v => Some(v)) ++ vs.map(v => Some(-v))
    assert(out == expected)
  }

  test("normalizeText is idempotent on random printable strings") {
    val alphabet = "ab c\t\nd.,  e"
    val ss = Seq.fill(300)((0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val once = ss.toDF("t").select(Cleaning.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("t").select(Cleaning.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once)
  }

  test("fingerprint is stable and collision-free across distinct inputs (sampled)") {
    val ss = (1 to 200).map(i => s"content body $i")
    def fps = ss.toDF("t").select(Chunking.fingerprint(col("t")).as("f"))
      .collect().map(_.getString(0)).toSeq
    val a = fps
    assert(a.distinct.size == ss.size)
    assert(a == fps)
  }

  test("chunkIdExact: ids monotone by +0/+1; no multi-row chunk exceeds the budget") {
    (1 to 5).foreach { _ =>
      val ls = Seq.fill(40)(1L + rng.nextInt(800))
      val rows = ls.zipWithIndex.map { case (l, i) => ("k", i.toLong, l, false) }
      val out = Chunking.chunkIdExact(rows.toDF("k", "ord", "len", "brk"),
        "k", "ord", "len", "brk", maxChars = 1200)
        .orderBy("ord").collect().map(_.getLong(2)).toSeq
      assert(out.zip(out.drop(1)).forall { case (a, b) => b == a || b == a + 1 })
      val byChunk = ls.zip(out).groupBy(_._2).values.toSeq
      byChunk.foreach { chunk =>
        val s = chunk.map(_._1).sum
        assert(s <= 1200 || chunk.size == 1, s"chunk sum $s over budget with ${chunk.size} rows")
      }
    }
  }

  test("wordShingles produces n-w+1 distinct shingles for long texts") {
    val out = Seq("a b c d e f g").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3).as("s")).collect()(0).getSeq[String](0)
    assert(out.size == 5 && out.head == "a b c")
  }

  test("approx_count_distinct stays within HLL error of exact") {
    val docs = graft.tables.TestTables.documents(spark, sf)
    val approx = docs.agg(approx_count_distinct(col("doc_id"), 0.02)).collect()(0).getLong(0)
    val exact = docs.select(col("doc_id")).distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }
}
