package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Pii}

/** Fixture tests for the round-3 training-pipeline additions: PII
  * scrubbing, benchmark decontamination, near-dup clustering. */
class PiiDedupSpec extends SparkSpec {
  import spark.implicits._

  test("Pii.redact replaces email, IPv4, and phone with typed placeholders") {
    val out = Seq("mail bob.smith+x@corp.example.org from 192.168.0.1 call +1-202-555-0143 now")
      .toDF("t").select(Pii.redact(col("t")).as("r")).head().getString(0)
    assert(out == "mail <EMAIL> from <IP> call <PHONE> now")
    // space-separated digit groups are a documented non-match: the phone
    // class deliberately excludes ' ' to avoid swallowing digit runs
    val spaced = Seq("call +1 (202) 555-0143 now")
      .toDF("t").select(Pii.redact(col("t")).as("r")).head().getString(0)
    assert(spaced == "call +1 (202) <PHONE> now")
  }

  test("Pii ordering: IPs are not eaten by the phone pattern, emails keep their domains") {
    val rows = Seq(
      ("ip-only", "server at 10.0.0.7 responded"),
      ("dotted-phone", "dial 202.555.0143 today"),
      ("email-with-digits", "a9@b2.co is short"),
      ("clean", "no identifiers here at all")
    ).toDF("id", "t")
      .select(col("id"), Pii.scrub(col("t")).as("s"))
      .select(col("id"), col("s.text"), col("s.n_emails"), col("s.n_ips"), col("s.n_phones"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(rows("ip-only") == (("server at <IP> responded", 0, 1, 0)))
    assert(rows("dotted-phone") == (("dial <PHONE> today", 0, 0, 1)))
    assert(rows("email-with-digits") == (("<EMAIL> is short", 1, 0, 0)))
    assert(rows("clean") == (("no identifiers here at all", 0, 0, 0)))
  }

  test("decontaminate flags only train docs sharing an n-gram with the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about catalyst plans"),
      (3L, "quick brown fox jumps high and the lazy dog sleeps")
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "watch the quick brown fox jumps over fences")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps",
    // "fox jumps over"; doc 3 shares "quick brown fox", "brown fox jumps";
    // doc 2 shares none
    assert(out == Map(1L -> 4L, 3L -> 2L))
  }

  test("connectedComponents labels every vertex with the component's min id") {
    // components: {1,2,3,4} (chain + extra edge), {10,11}, {20,21,22} (triangle)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 2L),
      (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedupAgainstCorpus drops exact and near copies of corpus docs, keeps novel ones") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different corpus content about catalyst optimizer rules")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick  brown fox jumps over the lazy dog near the river bank"), // exact mod whitespace
      (11L, "the quick brown fox jumps over the lazy dog near the river bank today"), // near dup
      (12L, "a genuinely novel batch document with fresh words and new phrasing"),
      (13L, "a genuinely novel batch document with fresh words and new phrasing") // batch-internal dup: KEPT
    ).toDF("doc_id", "text")
    val kept = graft.ops.Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 13L))
  }

  test("empty inputs flow through the new operators without errors") {
    val empty = spark.emptyDataFrame.select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0)
    assert(graft.ops.Dedup.connectedComponents(empty).count() == 0)
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val noDocs = docs.limit(0)
    // empty eval set → nothing contaminated; empty train → empty result
    assert(graft.ops.Dedup.decontaminate(docs, noDocs, "doc_id", "text", 3).count() == 0)
    assert(graft.ops.Dedup.decontaminate(noDocs, docs, "doc_id", "text", 3).count() == 0)
    // empty corpus → the whole batch is admitted
    assert(graft.ops.Dedup.dedupAgainstCorpus(docs, noDocs, "doc_id", "text").count() == 1)
    val noIntervals = Seq((1L, 2L, 3L)).toDF("iid", "s", "e").limit(0)
    assert(graft.ops.Temporal.rangeJoin(Seq(Tuple1(5L)).toDF("t"), noIntervals,
      "t", "s", "e", 10L).count() == 0)
  }

  test("connectedComponents converges on a long chain (diameter > 2 rounds)") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 12 && out.values.forall(_ == 1L))
  }
}
