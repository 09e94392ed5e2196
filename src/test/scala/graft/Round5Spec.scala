package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Round-5 operators: the iterative BPE merge loop + encoder. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // --- BPE merge training -------------------------------------------------

  test("bpeTrain learns the classic merges with exact weighted counts") {
    // the Sennrich et al. worked example: low×2, lower×1, newest×3, widest×1
    // pair counts round 1: (e,s)=4 and (s,t)=4 tie → lexicographic → (e,s);
    // round 2: (es,t)=4 wins.
    val docs = Seq("low low newest newest", "newest widest lower").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 2).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "e", "s", 4L), (2, "es", "t", 4L)))
  }

  test("bpe merge application is greedy left-to-right, non-overlapping") {
    val syms = Seq("aaa").toDF("w")
      .select(TextAnalysis.bpeEncode(col("w"), Seq(("a", "a"))).as("syms"))
      .head().getSeq[String](0)
    assert(syms == Seq("aa", "a"), "rule (a,a) on 'aaa' must consume left-first")
  }

  test("bpeEncode replays learned merges; 1-char words survive the loop") {
    val enc = Seq("newest").toDF("w")
      .select(TextAnalysis.bpeEncode(col("w"), Seq(("e", "s"), ("es", "t"))).as("syms"))
      .head().getSeq[String](0)
    assert(enc == Seq("n", "e", "w", "est"))
    // a corpus of only 1-char words has zero pairs: training must stop
    // cleanly (empty merge table), not crash on sequence(0, -2)
    val m = TextAnalysis.bpeTrain(Seq("a b a b").toDF("text"), col("text"), nMerges = 3)
    assert(m.count() == 0)
  }

  test("bpeTrain ignores non-alphabetic tokens and weights by frequency") {
    // "ab" appears 3×, "cd" 2×, "a1b!" filtered out entirely
    val docs = Seq("ab ab ab cd", "cd a1b!").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq(("a", "b", 3L)))
  }
}
