package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309) evaluation — the crawl-politeness gate every
  * fetch passes before it can become a WARC record: per (host, path),
  * the longest matching Allow/Disallow pattern of the applicable
  * user-agent group wins, Allow winning length ties; no matching rule
  * means allowed.
  *
  * Scale shape: the verdict is a host-keyed equi-join (URLs shuffle by
  * host exactly once — rule sets are small per host and naturally
  * broadcastable when the host list is) followed by a
  * `max_by(struct(...))` aggregate per URL — map-side combinable, no
  * window, no per-URL rule loop. Pattern matching and the
  * pattern→regex translation are column expressions evaluated
  * identically in any engine (the translation is regexp_replace chains
  * on the COLUMN, not Scala-side string math, so the oracle replays the
  * same tree).
  */
object Robots {

  /** Parse a sitemaps.org XML blob into an array of (loc, lastmod,
    * priority) structs — the discovery half of the crawl frontier (rob1
    * gates fetches; sitemaps SEED them). Regex-based by design (the
    * sitemap schema is flat; a DOM is overkill and engine-specific):
    * `<url>` blocks, then per-block fields, absent optional fields →
    * null. RE2-safe patterns, map-only, identical trees in any engine. */
  def parseSitemap(xml: Column): Column =
    transform(regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)), u => {
      def field(tag: String) = {
        val v = regexp_extract(u, s"<$tag>\\s*([^<]*?)\\s*</$tag>", 1)
        when(v === "", lit(null).cast("string")).otherwise(v)
      }
      struct(field("loc").as("loc"), field("lastmod").as("lastmod"),
        field("priority").as("priority"))
    })

  /** Translate a robots path pattern to an anchored regex, as a column
    * expression: regex metacharacters escaped, `*` → `.*`, a trailing
    * literal `$` (already escaped to `\$` by step 1) restored to the
    * end anchor. Prefix semantics: match is anchored at ^ only. */
  def patternRegex(pattern: Column): Column = {
    val escaped = regexp_replace(pattern, """([.^$+?()\[\]{}|\\])""", """\\$1""")
    val wild = regexp_replace(escaped, """\*""", ".*")
    val anchored = regexp_replace(wild, """\\\$$""", "\\$")
    concat(lit("^"), anchored)
  }

  /** Per-URL crawl verdict. `urls`: (host, path, …); `rules`:
    * (host, allow: boolean, pattern). Longest pattern wins, Allow wins
    * ties, no match → allowed. The precedence key is the single integer
    * `2·len(pattern) + allow` (longest dominates; Allow adds the tie
    * bit), so `max_by` needs no struct comparison; equal-key rules carry
    * the same verdict by construction, keeping the argmax deterministic. */
  def decide(urls: DataFrame, rules: DataFrame): DataFrame = {
    val verdicts = urls.select("host", "path").distinct()
      .join(rules, Seq("host"))
      .filter(regexp_like(col("path"), patternRegex(col("pattern"))))
      .groupBy("host", "path")
      .agg(max_by(col("allow"),
        length(col("pattern")) * 2 + col("allow").cast("int")).as("_verdict"))
    urls.join(verdicts, Seq("host", "path"), "left")
      .withColumn("allowed", coalesce(col("_verdict"), lit(true)))
      .drop("_verdict")
  }

  /** Parse the `User-agent: *` group's Allow/Disallow rules out of a raw
    * robots.txt body: lines between the `User-agent: *` line and the next
    * `User-agent:` line after it (stacked agent lines directly above a
    * shared rule block are out of scope — documented simplification).
    * Returns an array of `struct(allow, pattern)`; comments and unknown
    * directives are skipped, patterns are trimmed. */
  def parseStarGroup(robots: Column): Column = {
    val lines = split(robots, "\r?\n")
    val n = size(lines)
    val idx = sequence(lit(1), n)
    val uaStar = filter(idx, i =>
      lower(element_at(lines, i)).rlike("^user-agent:\\s*\\*"))
    val start = coalesce(element_at(uaStar, 1), n + 1)
    val uaAfter = filter(idx, i =>
      i > start && lower(element_at(lines, i)).startsWith("user-agent:"))
    val end = coalesce(element_at(uaAfter, 1), n + 1)
    val inGroup = filter(idx, i => i > start && i < end)
    val rules = transform(inGroup, i => {
      val line = regexp_replace(element_at(lines, i), "#.*$", "")
      val allow = lower(line).startsWith("allow:")
      val dis = lower(line).startsWith("disallow:")
      when(allow || dis, struct(allow.as("allow"),
        trim(regexp_replace(line, "(?i)^(allow|disallow):", "")).as("pattern")))
        .otherwise(lit(null))
    })
    filter(rules, r => r.isNotNull && r.getField("pattern") =!= "")
  }
}
