package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.TestTables._
import graft.ops.{TableOps, Chunking, Cleaning}

/** Table-block operator inventory — `columns: array<string>` /
  * `rows: array<array<string>>` semantics exercised over deterministic
  * array tables built from the star schema (SURVEY.md §2.2 P5/P6,
  * §2.3 J2, §2.4 A2, §2.8 F12/F19, §2.11 explode-transactions).
  *
  * The "tables" are nations grouped by region: columns = (name, comment),
  * rows = one per nation, with deterministic dirt (padding, empty cells)
  * injected so the cleaning operators have real work.
  */
object TableQueries extends QuerySet {

  /** Shared deterministic dirty-table construction (Spark side). */
  private def dirtyTables(s: org.apache.spark.sql.SparkSession, d: String) = {
    val n = nation(s, d)
    // cell dirt: pad name with spaces; blank out every 5th nationkey's name
    val cells = array(
      when(col("n_nationkey") % 5 === 0, lit("")).otherwise(concat(lit("  "), col("n_name"), lit("   "))),
      when(col("n_nationkey") % 7 === 0, lit("")).otherwise(concat(lit("nk "), col("n_nationkey").cast("string"))))
    n.groupBy(col("n_regionkey"))
      .agg(sort_array(collect_list(struct(col("n_nationkey").as("k"), cells.as("r"))))
        .getField("r").as("rows"))
      .withColumn("columns", array(lit("name"), lit("key")))
  }

  private val dirtyTablesSql =
    """SELECT n_regionkey,
         list(
           [CASE WHEN n_nationkey % 5 = 0 THEN '' ELSE concat('  ', n_name, '   ') END,
            CASE WHEN n_nationkey % 7 = 0 THEN '' ELSE concat('nk ', CAST(n_nationkey AS VARCHAR)) END]
           ORDER BY n_nationkey) AS rows,
         ['name', 'key'] AS columns
       FROM nation GROUP BY n_regionkey"""

  /** P5: cell normalize + drop all-empty rows, serialized for comparison. */
  val tb1Clean = Q("p5_table_clean",
    Some(s"""WITH t AS ($dirtyTablesSql),
             c AS (SELECT n_regionkey,
                     list_filter(
                       list_transform(rows, r -> list_transform(r, x -> trim(regexp_replace(coalesce(x, ''), '\\s+', ' ', 'g')))),
                       r -> len(list_filter(r, x -> x <> '')) > 0) AS cleaned
                   FROM t)
             SELECT n_regionkey,
               list_aggregate(list_transform(cleaned, r -> list_aggregate(r, 'string_agg', ',')), 'string_agg', ';') AS table_ser
             FROM c ORDER BY n_regionkey"""),
    (s, d) => dirtyTables(s, d)
      .select(col("n_regionkey"),
        concat_ws(";", transform(TableOps.cleanRows(col("rows")), r => concat_ws(",", r))).as("table_ser"))
      .orderBy("n_regionkey"))

  /** P6: junk-table predicate — size thresholds + junk-phrase scan. */
  val tb2Junk = Q("p6_junk_filter",
    Some(s"""WITH t AS ($dirtyTablesSql)
             SELECT n_regionkey,
               (len(rows) <= 1 OR len(columns) <= 1
                OR len(list_filter(rows, r -> len(list_filter(r, c -> contains(lower(c), 'algeria'))) > 0)) > 0) AS is_junk
             FROM t ORDER BY n_regionkey"""),
    (s, d) => dirtyTables(s, d)
      .select(col("n_regionkey"),
        TableOps.isJunkTable(col("columns"), col("rows"), Seq("algeria")).as("is_junk"))
      .orderBy("n_regionkey"))

  /** J2: content-hash dedup with deterministic first-wins priority —
    * two extractor variants of the same tables, lattice preferred. */
  val j2HashDedup = Q("j2_hash_dedup",
    Some(s"""WITH t AS ($dirtyTablesSql),
             variants AS (
               SELECT n_regionkey, 'lattice' AS method, 1 AS priority, rows FROM t
               UNION ALL
               SELECT n_regionkey, 'stream' AS method, 2 AS priority, rows FROM t),
             hashed AS (
               SELECT n_regionkey, method, priority,
                 md5(lower(regexp_replace(list_aggregate(flatten(rows), 'string_agg', ''), '[\\s\\x{200B}]+', '', 'g'))) AS h
               FROM variants),
             ranked AS (
               SELECT n_regionkey, method, h,
                 row_number() OVER (PARTITION BY h ORDER BY priority, n_regionkey) AS rn
               FROM hashed)
             SELECT n_regionkey, method, h FROM ranked WHERE rn = 1 ORDER BY n_regionkey, method"""),
    (s, d) => {
      val t = dirtyTables(s, d)
      val variants = t.withColumn("method", lit("lattice")).withColumn("priority", lit(1))
        .unionByName(t.withColumn("method", lit("stream")).withColumn("priority", lit(2)))
      val hashed = variants.withColumn("h", TableOps.contentHash(col("rows")))
      TableOps.dedupByHash(hashed, col("h"), col("priority"), col("n_regionkey"))
        .select("n_regionkey", "method", "h")
        .orderBy("n_regionkey", "method")
    })

  /** A2: numeric aggregate over exploded table cells (money-parsed). */
  val a2TableCompute = Q("a2_table_compute",
    Some("""WITH t AS (
              SELECT o_custkey,
                list([CAST(o_orderkey AS VARCHAR), concat('$', printf('%.2f', o_totalprice))]
                     ORDER BY o_orderkey) AS rows
              FROM orders GROUP BY o_custkey),
            x AS (SELECT o_custkey, unnest(rows) AS r FROM t),
            p AS (SELECT o_custkey,
                    CAST(regexp_replace(regexp_replace(r[2], '[,฿$\s]|(บาท)|(baht)', '', 'g'), '[()]', '', 'g') AS DOUBLE) AS v
                  FROM x)
            SELECT o_custkey AS table_id,
              CAST(sum(CAST(v AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_v_cents,
              CAST(sum(CAST(round(v * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / count(*) AS avg_v,
              round(max(v), 2) AS max_v, count(*) AS n
            FROM p GROUP BY o_custkey ORDER BY table_id"""),
    (s, d) => {
      val t = orders(s, d).groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(struct(col("o_orderkey").as("k"),
          array(col("o_orderkey").cast("string"),
            concat(lit("$"), format_string("%.2f", col("o_totalprice")))).as("r"))))
          .getField("r").as("rows"))
      // avg via exact integer cents, then deterministic double division —
      // round(avg(double)) diverges across engines at scale boundaries
      t.select(col("o_custkey").as("table_id"), explode(col("rows")).as("r"))
        .select(col("table_id"), Cleaning.parseMoney(element_at(col("r"), 2)).as("v"))
        .groupBy("table_id")
        .agg((sum(col("v").cast("decimal(18,2)")) * 100).cast("long").as("sum_v_cents"),
          (sum(round(col("v") * 100, 0).cast("bigint")).cast("double") / 100 / count(lit(1))).as("avg_v"),
          round(max(col("v")), 2).as("max_v"),
          count(lit(1)).as("n"))
        .orderBy("table_id")
    })

  /** HTML→(columns, rows) parsing — the vision-table ingestion step. The
    * Spark side RENDERS deterministic HTML per region (with per-region
    * dirt: ragged rows, extra cells, a body colspan, a header rowspan,
    * nested tags, entities) and parses it back with
    * `TableOps.parseHtmlTable`; the oracle derives the expected parse
    * directly from the base nation columns — an independent ground truth
    * that fails if any parsing step (tr/cell extraction, entity decode,
    * pad/truncate, complex-flag forcing) is wrong. */
  val p12HtmlParse = Q("p12_html_table_parse",
    Some("""WITH exp AS (
              SELECT n_regionkey,
                string_agg(
                  CASE WHEN n_nationkey = 0 THEN 'merged0,'
                       WHEN n_regionkey = 1 AND n_nationkey % 2 = 1 THEN concat(n_name, ',')
                       ELSE concat(n_name, ',c ', CAST(n_nationkey AS VARCHAR)) END,
                  ';' ORDER BY n_nationkey) AS rows_all,
                count(*) AS n_all
              FROM nation GROUP BY n_regionkey)
            SELECT n_regionkey,
              CASE WHEN n_regionkey = 3 THEN '' ELSE 'name|comment&note' END AS cols,
              CASE WHEN n_regionkey = 3 THEN 0 ELSE n_all END AS n_rows,
              CASE WHEN n_regionkey = 3 THEN '' ELSE rows_all END AS rows_ser,
              (n_regionkey = 3) AS has_complex_body,
              (n_regionkey IN (2, 4)) AS has_complex_header
            FROM exp ORDER BY n_regionkey"""),
    (s, d) => {
      val n = nation(s, d)
      val headerHtml = when(col("n_regionkey") === 4,
          lit("<tr><th rowspan=\"2\"> name </th><th>comment&amp;note</th></tr>"))
        .otherwise(lit("<tr><th> name </th><th>comment&amp;note</th></tr>"))
      val td2 = concat(lit("<td>c "), col("n_nationkey").cast("string"), lit("</td>"))
      val rowHtml =
        when(col("n_nationkey") === 13, // region 3: merged LATER body row → complex body
          lit("<tr><td colspan=\"2\">merged</td></tr>"))
        // region 0's FIRST body row carries a colspan — reference header-
        // territory rule: extracted flat, no complex flag
        .when(col("n_nationkey") === 0,
          lit("<tr><td colspan=\"2\">merged0</td></tr>"))
        // region 2's FIRST body row carries a rowspan — header territory:
        // flags has_complex_header, row still extracted
        .when(col("n_nationkey") === 2,
          concat(lit("<tr><td rowspan=\"2\"><b>"), col("n_name"), lit("</b></td>"), td2, lit("<td>extra</td></tr>")))
        .when(col("n_regionkey") === 1 && col("n_nationkey") % 2 === 1,
          concat(lit("<tr><td><b>"), col("n_name"), lit("</b></td></tr>")))
        .when(col("n_regionkey") === 2,
          concat(lit("<tr><td><b>"), col("n_name"), lit("</b></td>"), td2, lit("<td>extra</td></tr>")))
        .otherwise(concat(lit("<tr><td><b>"), col("n_name"), lit("</b></td>"), td2, lit("</tr>")))
      val assembled = n
        .groupBy(col("n_regionkey"), headerHtml.as("hdr"))
        .agg(concat_ws("", sort_array(collect_list(struct(col("n_nationkey").as("k"), rowHtml.as("h"))))
          .getField("h")).as("body"))
        .select(col("n_regionkey"), concat(lit("<table>"), col("hdr"), col("body"), lit("</table>")).as("html"))
      assembled
        .withColumn("t", TableOps.parseHtmlTable(col("html")))
        .select(col("n_regionkey"),
          concat_ws("|", col("t.columns")).as("cols"),
          size(col("t.rows")).cast("long").as("n_rows"),
          concat_ws(";", transform(col("t.rows"), r => concat_ws(",", r))).as("rows_ser"),
          col("t.has_complex_body"), col("t.has_complex_header"))
        .orderBy("n_regionkey")
    })

  /** F22: table-role classification (ref `semantic_enricher.py:433-451`) —
    * per-region synthetic headers exercise the transaction (date+amount,
    * incl. Thai keywords), summary, and fallback branches; the oracle
    * derives the expected role directly from the region key. */
  val f22TableRole = Q("f22_table_role",
    Some("""SELECT r_regionkey,
              CASE r_regionkey
                WHEN 0 THEN 'transaction_table'
                WHEN 1 THEN 'summary_table'
                WHEN 3 THEN 'transaction_table'
                WHEN 4 THEN 'summary_table'
                ELSE 'other_table' END AS role
            FROM region ORDER BY r_regionkey"""),
    (s, d) => {
      val headers =
        when(col("r_regionkey") === 0, array(lit("Date"), lit("Amount"), lit("Notes")))
        .when(col("r_regionkey") === 1, array(lit("Item"), lit("Grand Total")))
        .when(col("r_regionkey") === 3, array(lit("วันที่"), lit("Balance")))
        .when(col("r_regionkey") === 4, array(lit("สรุปยอด"), lit("x")))
        .otherwise(array(lit("name"), lit("key")))
      region(s, d).select(col("r_regionkey"), TableOps.tableRole(headers).as("role"))
        .orderBy("r_regionkey")
    })

  /** F12: markdown rendering of a (columns, rows) table. */
  val f12Markdown = Q("f12_markdown_render",
    Some(s"""WITH t AS ($dirtyTablesSql)
             SELECT n_regionkey, concat(
               '| ', list_aggregate(columns, 'string_agg', ' | '), ' |', chr(10),
               '|', list_aggregate(list_transform(columns, c -> ' --- '), 'string_agg', '|'), '|', chr(10),
               list_aggregate(list_transform(rows, r -> concat('| ', list_aggregate(r, 'string_agg', ' | '), ' |')), 'string_agg', chr(10))) AS md
             FROM t ORDER BY n_regionkey"""),
    (s, d) => dirtyTables(s, d)
      .select(col("n_regionkey"), TableOps.toMarkdown(col("columns"), col("rows")).as("md"))
      .orderBy("n_regionkey"))

  /** F19: semantic row serialization `col=val | col=val` with caps. */
  val f19Serialize = Q("f19_row_serialize",
    Some("""SELECT p_partkey, list_aggregate(list_transform(
              list_filter([struct_pack(n := 'type', v := p_type),
                           struct_pack(n := 'brand', v := p_brand),
                           struct_pack(n := 'size', v := CAST(p_size AS VARCHAR))],
                          s -> length(s.v) <= 100),
              s -> concat(s.n, '=', s.v)), 'string_agg', ' | ') AS record
            FROM part ORDER BY p_partkey"""),
    (s, d) => part(s, d)
      .select(col("p_partkey"),
        Chunking.serializeRow(
          array(lit("type"), lit("brand"), lit("size")),
          array(col("p_type"), col("p_brand"), col("p_size").cast("string"))).as("record"))
      .orderBy("p_partkey"))

  /** §2.11 explode-transactions: rows → one named record per row. */
  val tx1Explode = Q("tx1_explode_transactions",
    Some("""WITH t AS (
              SELECT o_custkey,
                ['order', 'total'] AS cols,
                list([CAST(o_orderkey AS VARCHAR), printf('%.2f', o_totalprice)] ORDER BY o_orderkey) AS rows
              FROM orders GROUP BY o_custkey),
            x AS (SELECT o_custkey,
                    unnest(list_transform(range(1, len(rows) + 1),
                      i -> struct_pack(idx := i - 1, r := rows[i]))) AS u
                  FROM t)
            SELECT o_custkey AS table_id, u.idx AS row_idx,
              concat('order=', u.r[1], ' | total=', u.r[2]) AS record
            FROM x ORDER BY table_id, row_idx"""),
    (s, d) => {
      val t = orders(s, d).groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(struct(col("o_orderkey").as("k"),
          array(col("o_orderkey").cast("string"), format_string("%.2f", col("o_totalprice"))).as("r"))))
          .getField("r").as("rows"))
        .withColumn("columns", array(lit("order"), lit("total")))
      TableOps.explodeTransactions(t, col("o_custkey"), col("columns"), col("rows"))
        .withColumnRenamed("table_id", "table_id")
        .orderBy("table_id", "row_idx")
    })

  /** W5: sub-table split on header rows (array form) — rows whose first
    * cell matches the header pattern open a named sub-table. */
  val w5SubTable = Q("w5_subtable_split",
    Some("""WITH t AS (
              SELECT o_custkey,
                list(CASE WHEN o_orderstatus = 'O' THEN ['HDR open', '']
                          ELSE [CAST(o_orderkey AS VARCHAR), o_orderstatus] END
                     ORDER BY o_orderkey) AS rows
              FROM orders GROUP BY o_custkey),
            x AS (SELECT o_custkey AS table_id,
                    unnest(list_transform(range(1, len(rows) + 1),
                      i -> struct_pack(ord := i - 1, r := rows[i]))) AS u
                  FROM t),
            h AS (SELECT table_id, u.ord AS ord, u.r AS r,
                    CASE WHEN regexp_matches(u.r[1], '^HDR') THEN u.r[1] END AS hdr FROM x),
            f AS (SELECT table_id, ord, r, hdr,
                    last_value(hdr IGNORE NULLS) OVER (PARTITION BY table_id ORDER BY ord
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sub_table
                  FROM h)
            SELECT table_id, ord, r[1] AS first_cell, sub_table
            FROM f WHERE hdr IS NULL ORDER BY table_id, ord"""),
    (s, d) => {
      val t = orders(s, d).groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(struct(col("o_orderkey").as("k"),
          when(col("o_orderstatus") === "O", array(lit("HDR open"), lit("")))
            .otherwise(array(col("o_orderkey").cast("string"), col("o_orderstatus"))).as("r"))))
          .getField("r").as("rows"))
      TableOps.splitSubTables(t, col("o_custkey"), col("rows"), "^HDR")
        .select(col("table_id"), col("ord"), element_at(col("r"), 1).as("first_cell"), col("sub_table"))
        .orderBy("table_id", "ord")
    })

  def all: Seq[Q] = Seq(tb1Clean, tb2Junk, j2HashDedup, a2TableCompute, f12Markdown,
    f19Serialize, tx1Explode, w5SubTable, p12HtmlParse, f22TableRole)
}
