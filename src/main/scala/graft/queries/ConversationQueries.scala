package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.TestTables._

/** Conversation / chat-format inventory — the instruction-tuning data
  * ops a training pipeline runs between raw logs and the tokenizer:
  * assemble ordered multi-turn conversations, render them into a chat
  * template, validate role structure, and pack them into a context
  * window (drop-oldest truncation). Each conversation is one user's
  * event stream; every query is ONE shuffle on the conversation key
  * with per-key-bounded work — the ts2/w4 scale shape.
  *
  * Shared turn model (one definition feeding both engines): turns are
  * (ts, event_id)-ordered events; role = 'user' for view/signup/error
  * events, 'assistant' otherwise (a mapping that yields genuinely
  * irregular role sequences, so validation is non-vacuous); turn text =
  * `<type> #<event_id>`; token cost = 1 + length(text)/4 (the
  * chars-per-token heuristic, exact integer division).
  */
object ConversationQueries extends QuerySet {

  private val roleSql =
    "CASE WHEN event_type IN ('view', 'signup', 'error') THEN 'user' ELSE 'assistant' END"
  private def roleCol = when(col("event_type").isin("view", "signup", "error"), "user")
    .otherwise("assistant")
  private val textSql = "event_type || ' #' || CAST(event_id AS VARCHAR)"
  private def textCol = concat(col("event_type"), lit(" #"), col("event_id").cast("string"))

  /** Turn CTE shared by all three gates. */
  private val turnsSql =
    s"""turns AS (
         SELECT user_id AS conv_id, event_id, epoch_us(ts) AS ts_us,
           $roleSql AS role, $textSql AS txt,
           CAST(1 + length($textSql) // 4 AS BIGINT) AS ntok
         FROM events)"""

  private def turnsDf(s: org.apache.spark.sql.SparkSession, d: String) =
    events(s, d).select(col("user_id").as("conv_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), roleCol.as("role"), textCol.as("txt"),
      (lit(1L) + floor(length(textCol) / 4)).cast("long").as("ntok"))

  /** cv1: chat-template rendering — every conversation's turns in
    * (ts, event_id) order, rendered `<|role|>\ntext<|end|>\n` and
    * concatenated (the ChatML-style serialization a SFT data builder
    * emits), plus turn/token totals. Ordered aggregation via
    * sort_array(collect_list(struct…)) — the pdf3 reading-order shape —
    * so no window is needed at all. */
  val cv1Render = Q("cv1_chat_render",
    Some(s"""WITH $turnsSql
            SELECT conv_id,
              CAST(count(*) AS BIGINT) AS n_turns,
              CAST(sum(ntok) AS BIGINT) AS total_tokens,
              string_agg('<|' || role || '|>' || chr(10) || txt || '<|end|>' || chr(10), ''
                ORDER BY ts_us, event_id) AS rendered
            FROM turns GROUP BY conv_id ORDER BY conv_id"""),
    (s, d) => turnsDf(s, d)
      .select(col("conv_id"), col("ntok"),
        struct(col("ts_us"), col("event_id"),
          concat(lit("<|"), col("role"), lit("|>\n"), col("txt"), lit("<|end|>\n")).as("piece")).as("t"))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"), sum("ntok").as("total_tokens"),
        array_join(transform(array_sort(collect_list(col("t"))), x => x.getField("piece")), "")
          .as("rendered"))
      .orderBy("conv_id"))

  /** cv2: role-structure validation — consecutive same-role turns are
    * alternation violations (the malformed-sample filter every SFT
    * pipeline runs before templating); a well-formed conversation opens
    * with a user turn and never repeats a role back-to-back. Every
    * conv_id % 7 == 0 conversation is PLANTED with index-alternating
    * roles so the positive branch genuinely fires (event-derived roles
    * alone violate everywhere and the flag would be vacuous). Two
    * stacked windows over the same (conv, ts, event_id) spec — one
    * shuffle. */
  val cv2Validate = Q("cv2_role_validation",
    Some(s"""WITH $turnsSql,
            ranked AS (
              SELECT conv_id, role AS role0, ts_us, event_id,
                row_number() OVER (PARTITION BY conv_id ORDER BY ts_us, event_id) AS rn
              FROM turns),
            r2 AS (
              SELECT conv_id, rn, ts_us, event_id,
                CASE WHEN conv_id % 7 = 0
                     THEN CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END
                     ELSE role0 END AS role
              FROM ranked),
            lagged AS (
              SELECT conv_id, rn, role,
                lag(role) OVER (PARTITION BY conv_id ORDER BY ts_us, event_id) AS prev_role
              FROM r2)
            SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
              CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
              CAST(max(CASE WHEN rn = 1 AND role = 'user' THEN 1 ELSE 0 END) AS INT) AS starts_user,
              CASE WHEN sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) = 0
                    AND max(CASE WHEN rn = 1 AND role = 'user' THEN 1 ELSE 0 END) = 1
                   THEN 1 ELSE 0 END AS well_formed
            FROM lagged GROUP BY conv_id ORDER BY conv_id"""),
    (s, d) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("ts_us"), col("event_id"))
      val ranked = turnsDf(s, d)
        .select(col("conv_id"), col("role").as("role0"), col("ts_us"), col("event_id"),
          row_number().over(w).as("rn"))
        .withColumn("role",
          when(col("conv_id") % 7 === 0,
            when(col("rn") % 2 === 1, "user").otherwise("assistant"))
            .otherwise(col("role0")))
      ranked
        .select(col("conv_id"), col("rn"), col("role"),
          lag(col("role"), 1).over(w).as("prev_role"))
        .groupBy("conv_id")
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("role") === col("prev_role"), 1L).otherwise(0L)).as("n_violations"),
          max(when(col("rn") === 1 && col("role") === "user", 1).otherwise(0)).as("starts_user"))
        .select(col("conv_id"), col("n_turns"), col("n_violations"), col("starts_user"),
          when(col("n_violations") === 0 && col("starts_user") === 1, 1).otherwise(0)
            .as("well_formed"))
        .orderBy("conv_id")
    })

  /** cv3: context-window packing — keep the longest SUFFIX of turns
    * whose token total fits the budget (drop-oldest truncation, the
    * standard chat-history policy): one reverse-ordered running sum per
    * conversation, a turn survives iff its reverse-cumulative total ≤
    * budget. Exact integers end to end. Budget 64 forces real drops on
    * most conversations (fixture turns average ~5 tokens × ~50 turns). */
  val cv3Pack = {
    val budget = 64
    Q("cv3_context_pack",
      Some(s"""WITH $turnsSql,
              rc AS (
                SELECT conv_id, ntok,
                  sum(ntok) OVER (PARTITION BY conv_id ORDER BY ts_us DESC, event_id DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revcum
                FROM turns)
              SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                CAST(sum(CASE WHEN revcum <= $budget THEN 1 ELSE 0 END) AS BIGINT) AS kept_turns,
                CAST(sum(CASE WHEN revcum <= $budget THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens,
                CAST(sum(CASE WHEN revcum <= $budget THEN 0 ELSE 1 END) AS BIGINT) AS dropped_turns
              FROM rc GROUP BY conv_id ORDER BY conv_id"""),
      (s, d) => {
        val w = Window.partitionBy(col("conv_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        turnsDf(s, d)
          .select(col("conv_id"), col("ntok"), sum(col("ntok")).over(w).as("revcum"))
          .groupBy("conv_id")
          .agg(count(lit(1)).as("n_turns"),
            sum(when(col("revcum") <= budget, 1L).otherwise(0L)).as("kept_turns"),
            sum(when(col("revcum") <= budget, col("ntok")).otherwise(0L)).as("kept_tokens"),
            sum(when(col("revcum") <= budget, 0L).otherwise(1L)).as("dropped_turns"))
          .orderBy("conv_id")
      })
  }

  def all: Seq[Q] = Seq(cv1Render, cv2Validate, cv3Pack)
}
