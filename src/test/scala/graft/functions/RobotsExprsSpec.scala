package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsExprsSpec extends SparkSpec {
  import spark.implicits._

  private val policy = Seq(
    "# crawl policy",
    "User-agent: GraftBot",   // case-insensitive agent match
    "Disallow: /private/",
    "Allow: /private/ok/",
    "Disallow: /*.pdf$",
    "Allow: /",
    "",
    "User-agent: *",
    "Disallow: /").mkString("\r\n") // CRLF endings must parse

  private def ok(agent: String, path: String): Boolean =
    RobotsExprs.allowed(policy, agent, path)

  test("pattern matching: wildcards, anchors, case sensitivity") {
    assert(RobotsExprs.patternMatches("/a/*/c", "/a/b/c"))
    assert(RobotsExprs.patternMatches("/a/*/c", "/a/x/y/cz")) // prefix match
    assert(!RobotsExprs.patternMatches("/a/*/c", "/a/b"))
    assert(RobotsExprs.patternMatches("/*.pdf$", "/x/y.pdf"))
    assert(!RobotsExprs.patternMatches("/*.pdf$", "/x/y.pdfx"))
    assert(!RobotsExprs.patternMatches("/*.pdf$", "/x/y.PDF")) // paths case-sensitive
    assert(RobotsExprs.patternMatches("/a$", "/a"))
    assert(!RobotsExprs.patternMatches("/a$", "/ab"))
    assert(RobotsExprs.patternMatches("/a*", "/a-anything"))
  }

  test("longest match wins; equal-length ties prefer Allow") {
    assert(!ok("graftbot", "/private/x"))     // Disallow /private/ beats Allow /
    assert(ok("graftbot", "/private/ok/y"))   // longer Allow overrides
    assert(!ok("graftbot", "/doc/a.pdf"))     // anchored wildcard disallow
    assert(ok("graftbot", "/doc/a.pdfx"))     // anchor fails → Allow /
    assert(ok("graftbot", "/private"))        // '/private/' needs the slash
    // equal length tie → Allow
    val tie = "User-agent: a\nDisallow: /x/\nAllow: /x*\n"
    assert(RobotsExprs.allowed(tie, "a", "/x/q")) // both length 3 → allow wins
  }

  test("group selection: specific agent beats *, absent agent falls to *") {
    assert(ok("GRAFTBOT", "/public/a"))   // case-insensitive specific group
    assert(!ok("otherbot", "/public/a"))  // * group: deny all
    assert(!ok("otherbot", "/"))
    // no * group and no match → allowed
    val openPolicy = "User-agent: special\nDisallow: /\n"
    assert(RobotsExprs.allowed(openPolicy, "anyone", "/whatever"))
  }

  test("empty Disallow allows everything; garbage lines are ignored") {
    val p = "User-agent: *\nDisallow:\nnoise without colon\nSitemap: https://x/s.xml\n"
    assert(RobotsExprs.allowed(p, "bot", "/anything"))
    assert(RobotsExprs.allowed("", "bot", "/anything"))
  }

  test("expression evaluates on DataFrames") {
    val r = Seq(("/private/x", "graftbot"), ("/", "graftbot"))
      .toDF("path", "agent")
      .select(RobotsExprs.robotsAllowed(lit(policy), col("agent"), col("path")).as("a"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r === Seq(false, true))
  }
}
