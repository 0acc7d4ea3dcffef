package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * robots.txt stage — the fetch-POLICY gate of a crawl pipeline (RFC 9309):
 * per-domain exclusion rules decide which URLs the fetcher may request at
 * all, one stage before the content-quality URL gate ([[UrlOps.urlFilter]]).
 * The reference consumes Kafka records and has no crawl stage (extension-
 * brief surface, like the rest of the web front end).
 *
 * Bounded dialect (stated, spec-witnessed): groups are separated by blank
 * lines with ONE `User-agent:` line each (the fixture's and the dominant
 * real-world shape); rules are `Allow:`/`Disallow:` path PREFIXES (`*`/`$`
 * wildcards out of scope); `Crawl-delay:` is read per group. Decision per
 * RFC 9309: the most specific (LONGEST) matching prefix wins, ties break
 * toward allow, no match means allowed; an agent-exact group, when present
 * for a domain, REPLACES the `*` group entirely.
 *
 * Scale shape: robots tables are per-DOMAIN (bounded — millions of rows at
 * worst, kilobytes each), so the gate is one broadcast-ready equi-join of
 * pages against exploded rules plus one page-keyed max — no shuffle of the
 * page table beyond the aggregate, and the aggregate carries one struct
 * per (page, matching rule), bounded by rules-per-domain.
 */
object Robots {

  /** Deterministic per-domain robots.txt render (fixture twin of
    * [[UrlOps.pageUrls]] — the shared testdata carries no crawls). With
    * `L = length(registered_domain)`:
    *
    *   - every `*` group disallows `/casino-bonus/` and sets
    *     `Crawl-delay: (L % 7) + 1`;
    *   - `L % 3 == 0`: also `Disallow: /de/` + `Allow: /de/article-`
    *     (the longest-match witness — article pages survive a blocked
    *     language section);
    *   - `L % 3 == 1`: also `Disallow: /private/` (matches no fixture
    *     path — the no-op rule witness);
    *   - `L % 4 == 0`: an additional `User-agent: graftbot` group with
    *     `Allow: /` and no crawl-delay (the group-override witness — for
    *     the graftbot agent these domains allow EVERYTHING, including the
    *     casino paths the `*` group blocks).
    *
    * Output `(registered_domain, robots_txt)`, one row per distinct
    * domain of the parsed pages. */
  def robotsTxt(parsedPages: DataFrame): DataFrame = {
    val dom = col("registered_domain")
    val l = length(dom)
    val star = concat(
      lit("User-agent: *\nDisallow: /casino-bonus/"),
      when(l % 3 === 0, "\nDisallow: /de/\nAllow: /de/article-")
        .when(l % 3 === 1, "\nDisallow: /private/").otherwise(""),
      lit("\nCrawl-delay: "), ((l % 7) + 1).cast("string"))
    val bot = when(l % 4 === 0, lit("\n\nUser-agent: graftbot\nAllow: /"))
      .otherwise("")
    parsedPages.select(dom).distinct()
      .select(dom, concat(star, bot).as("robots_txt"))
  }

  /** Parse robots.txt content into one row per rule:
    * `(registered_domain, agent, rule_type 'allow'|'disallow', prefix,
    * crawl_delay)` — group split on blank lines, the group's `User-agent:`
    * line names the agent, `Crawl-delay:` rides on every rule row of its
    * group (nullable). A group with no Allow/Disallow lines still yields
    * one null-rule row so its agent + delay survive. Pure expressions —
    * split/filter/transform/explode fused into the robots scan. */
  def parseRobots(robots: DataFrame): DataFrame = {
    val grp = col("grp")
    val lines = split(grp, "\n")
    val agent = trim(regexp_extract(grp, "(?m)^User-agent:(.*)$", 1))
    val delayStr = regexp_extract(grp, "(?m)^Crawl-delay: (\\d+)$", 1)
    val delay = when(delayStr === "", lit(null).cast("int"))
      .otherwise(delayStr.cast("int"))
    val ruleLines = filter(lines, l =>
      l.startsWith("Allow:") || l.startsWith("Disallow:"))
    val rules = transform(ruleLines, l => struct(
      when(l.startsWith("Allow:"), "allow").otherwise("disallow")
        .as("rule_type"),
      // strip the directive up to the FIRST colon only — a path prefix may
      // itself contain ':' (substring_index from the right would truncate it)
      trim(regexp_replace(l, "^[A-Za-z-]+:", "")).as("prefix")))
    robots
      .select(col("registered_domain"),
        explode(split(col("robots_txt"), "\n\n")).as("grp"))
      .select(col("registered_domain"), agent.as("agent"), delay.as("crawl_delay"),
        explode_outer(rules).as("r"))
      .select(col("registered_domain"), col("agent"), col("crawl_delay"),
        col("r.rule_type").as("rule_type"), col("r.prefix").as("prefix"))
  }

  /** Fetch-policy decision over PARSED pages (`(doc_id, url,
    * registered_domain, path, …)` — [[UrlOps.urls]]' shape) against a
    * `(registered_domain, robots_txt)` table, for one crawler `agent`:
    * output = pages + `robots_allowed`, the matched `robots_rule` prefix
    * (null when no rule matched) and the governing group's `crawl_delay`.
    *
    * Group selection: a domain carrying an agent-exact group uses ONLY
    * that group; otherwise the `*` group applies. Decision: longest
    * matching prefix wins, tie → allow, no match → allowed — encoded as a
    * fold to the `(match_len, is_allow)`-lexicographic max (allow outranks
    * disallow at equal length).
    *
    * Scale shape: every aggregation here runs on the DOMAIN-level rule
    * table (bounded — millions of rows at worst); the governing group's
    * rules collapse to ONE array row per domain, that table broadcast-gates
    * onto pages, and the decision fold is a pure PROJECTION over the
    * joined row. The page table is never shuffled — the whole gate fuses
    * into the page scan plus one (broadcast) join, the shape that holds at
    * 100 TB of pages. */
  def robotsGate(parsedPages: DataFrame, robots: DataFrame,
      agent: String = "graftbot"): DataFrame = {
    val rules = parseRobots(robots)
      .filter(col("agent").isin(agent, "*"))
    // domains where an agent-exact group exists: that group REPLACES '*'
    val hasExact = rules.filter(col("agent") === agent)
      .select(col("registered_domain")).distinct()
      .withColumn("has_exact", lit(true))
    // one row per domain: the governing group's rules as an array + delay
    val perDomain = rules.join(hasExact, Seq("registered_domain"), "left")
      .filter(when(col("has_exact"), col("agent") === agent)
        .otherwise(col("agent") === "*"))
      .groupBy(col("registered_domain"))
      .agg(
        // an EMPTY prefix is RFC 9309's "no restriction" form ("Disallow:"
        // with no value = everything allowed) — it must NOT enter the fold
        // as a length-0 match, or a lone empty Disallow would block the site
        collect_list(when(col("prefix").isNotNull && col("prefix") =!= "",
          struct(col("rule_type"), col("prefix")))).as("rules"),
        max(col("crawl_delay")).as("crawl_delay"))
    // the decision as a fold over the matching rules — runs per PAGE ROW
    // after the broadcast join, no page-side shuffle
    val bestT = "struct<len:int,is_allow:boolean,prefix:string>"
    val matching = filter(col("rules"),
      r => startswith(col("path"), r.getField("prefix")))
    val best = aggregate(matching, lit(null).cast(bestT), (acc, r) => {
      val cand = struct(
        length(r.getField("prefix")).as("len"),
        (r.getField("rule_type") === "allow").as("is_allow"),
        r.getField("prefix").as("prefix"))
      when(acc.isNull || cand > acc, cand).otherwise(acc)
    })
    parsedPages
      .join(Par.maybeBroadcast(perDomain), Seq("registered_domain"), "left")
      .withColumn("__best", when(col("rules").isNotNull, best))
      .drop("rules")
      .withColumn("robots_allowed",
        col("__best").isNull || col("__best.is_allow"))
      .withColumn("robots_rule", col("__best.prefix"))
      .drop("__best")
  }

  /** The composed fixture query: render per-domain robots, parse them
    * back, and gate the rendered page URLs for the `graftbot` agent — the
    * render→parse→decide round trip the oracle checks (the oracle states
    * the DECISION generatively from the same rule recipe; the engine must
    * reach it through its real parser). */
  def webRobots(docs: DataFrame): DataFrame = {
    val pages = UrlOps.urls(UrlOps.pageUrls(docs))
      .select(col("doc_id"), col("url"), col("registered_domain"), col("path"))
    robotsGate(pages, robotsTxt(pages))
  }

  /** The fixture robots table for a docs frame — what the composed prep
    * recipes pass as their `robots` input (a real deployment passes its
    * fetched robots corpus instead). */
  def fixtureRobots(docs: DataFrame): DataFrame =
    robotsTxt(UrlOps.urls(UrlOps.pageUrls(docs))
      .select(col("registered_domain")))
}
