package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl front-end's politeness
  * gate, completing the WARC → gzip → HTML ingest family: given a raw
  * robots.txt body, a user-agent product token, and a URL path, decide
  * whether fetching is allowed. Per-row native expression (a crawl frame
  * joins each candidate URL against its host's cached robots body — an
  * equi-join on host, then this narrow gate).
  *
  * Semantics implemented (the RFC core, matching the major public
  * implementations):
  *   - groups are runs of `User-agent:` lines sharing the rules that
  *     follow; agent match is case-insensitive token equality, `*` is the
  *     fallback group; a specific-agent group beats `*`;
  *   - rule patterns support `*` (any run) and a final `$` (end anchor);
  *     matching is case-sensitive on the path (RFC);
  *   - the MOST SPECIFIC (longest pattern string) matching rule wins;
  *     equal lengths → Allow wins; no matching rule (or no group) →
  *     allowed; empty `Disallow:` lines mean allow-everything.
  */
object RobotsExprs {

  /** Does `pattern` (with `*` wildcards, optional trailing `$`) match a
    * prefix of `path`? Greedy left-to-right: the first segment anchors at
    * position 0, later segments take their EARLIEST occurrence (earliest-
    * match is complete here because only a prefix/end condition follows,
    * never another anchored segment). */
  private[functions] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val segs = p.split("\\*", -1) // keep empties: "a*" → ["a", ""]
    if (!path.startsWith(segs.head)) return false
    var pos = segs.head.length
    var i = 1
    while (i < segs.length) {
      val seg = segs(i)
      if (seg.isEmpty) pos = path.length // '*' with nothing after consumes all
      else if (i == segs.length - 1 && anchored) {
        // last segment under '$': must match at the very END, at/after pos
        if (path.length - seg.length < pos || !path.endsWith(seg)) return false
        pos = path.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Evaluate (robotsBody, agent, path) → allowed. */
  def allowed(robots: String, agent: String, path: String): Boolean = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // parse into groups: (agents, rules[(isAllow, pattern)])
    final case class Group(agents: Seq[String], rules: Seq[(Boolean, String)])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = scala.collection.mutable.ArrayBuffer.empty[String]
    var curRules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var inAgents = true
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups += Group(curAgents.toSeq, curRules.toSeq)
      curAgents = scala.collection.mutable.ArrayBuffer.empty
      curRules = scala.collection.mutable.ArrayBuffer.empty
    }
    robots.split('\n').foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            curAgents += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if curAgents.nonEmpty =>
            inAgents = false
            curRules += ((key == "allow", value))
          case _ => // crawl-delay/sitemap/unknown: ignored for the gate
        }
      }
    }
    flush()
    val specific = groups.filter(_.agents.contains(agentLc))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    if (chosen.isEmpty) return true
    // empty Disallow/Allow values are "no rule" (RFC: empty Disallow
    // allows everything); among matching rules the longest pattern wins,
    // and at equal length ANY matching Allow beats the Disallows
    val matches = chosen.flatMap(_.rules).filter { case (_, pat) =>
      pat.nonEmpty && patternMatches(pat, path)
    }
    if (matches.isEmpty) true
    else {
      val maxLen = matches.map(_._2.length).max
      matches.filter(_._2.length == maxLen).exists(_._1)
    }
  }

  /** (robotsTxt, agent, urlPath) → allowed boolean (null on null input). */
  case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "robots_allowed"
    override protected def nullSafeEval(r: Any, a: Any, p: Any): Any =
      allowed(r.asInstanceOf[UTF8String].toString,
        a.asInstanceOf[UTF8String].toString,
        p.asInstanceOf[UTF8String].toString)
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): RobotsAllowed =
      copy(first = f, second = s, third = t)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def robotsAllowed(robots: Column, agent: Column, path: Column): Column =
    column(RobotsAllowed(expression(robots), expression(agent), expression(path)))
}
