package graft.sql

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction}

/** MULTI-TABLE DML SYNTAX — `UPDATE t SET … FROM s WHERE …` and
  * `DELETE FROM t USING s WHERE …` (the Postgres/Delta join-DML surface).
  * Spark's grammar has neither form, so [[GraftViewParser]] falls back
  * here when the native parse fails: the statement splits at its
  * top-level keywords (quote- and paren-aware — a `FROM` inside a
  * subquery or string never splits) and re-assembles as the equivalent
  * matched-only [[MergeIntoTable]]:
  *
  * {{{
  *   UPDATE t SET c = s.v FROM src s WHERE t.k = s.k AND t.b < 5
  *     ≡ MERGE INTO t USING src s ON t.k = s.k AND t.b < 5
  *         WHEN MATCHED THEN UPDATE SET c = s.v
  *   DELETE FROM t USING src s WHERE t.k = s.k AND s.op = 'D'
  *     ≡ MERGE INTO t USING src s ON … WHEN MATCHED THEN DELETE
  * }}}
  *
  * The equivalence is exact for matched-only merges: rows matching the
  * full condition mutate, everything else is untouched. Spark's analyzer
  * resolves the merge like any hand-written one; [[GraftDmlRule]]'s
  * join-shape decomposition then routes the mixed equality + residual ON
  * onto the keyed gate chain, where an ambiguous source match (two
  * source rows feeding one target row's SET) errors — the Delta MERGE
  * cardinality semantic, not Postgres's pick-any.
  *
  * Every component (target, source, SET expressions, WHERE) parses
  * through the DELEGATE parser, so expression syntax is exactly Spark's.
  * A statement that doesn't match the two shapes returns None and the
  * original ParseException stands. */
private[sql] object GraftJoinDml {

  def tryParse(sql: String, delegate: ParserInterface): Option[LogicalPlan] = {
    val s = sql.trim.stripSuffix(";").trim
    val up = s.toUpperCase(java.util.Locale.ROOT)
    if (up.startsWith("UPDATE") && wordBoundary(s, 6)) parseUpdateFrom(s, delegate)
    else if (up.startsWith("DELETE") && wordBoundary(s, 6)) parseDeleteUsing(s, delegate)
    else None
  }

  private def parseUpdateFrom(s: String, p: ParserInterface): Option[LogicalPlan] = {
    val iSet = findTopLevelWord(s, "SET", 6)
    if (iSet < 0) return None
    val iFrom = findTopLevelWord(s, "FROM", iSet + 3)
    if (iFrom < 0) return None // a plain UPDATE: not ours, original error stands
    val iWhere = findTopLevelWord(s, "WHERE", iFrom + 4)
    if (iWhere < 0) throw new UnsupportedOperationException(
      "UPDATE … FROM requires a WHERE joining the target to the source " +
        "(an unconstrained cross join would match every source row to " +
        "every target row)")
    for {
      target <- parseRelation(s.substring(6, iSet), p)
      source <- parseRelation(s.substring(iFrom + 4, iWhere), p)
      assigns <- parseAssignments(s.substring(iSet + 3, iFrom), p)
    } yield MergeIntoTable(target, source,
      p.parseExpression(s.substring(iWhere + 5)),
      Seq(UpdateAction(None, assigns)), Nil, Nil, withSchemaEvolution = false)
  }

  private def parseDeleteUsing(s: String, p: ParserInterface): Option[LogicalPlan] = {
    val iFrom = findTopLevelWord(s, "FROM", 6)
    if (iFrom < 0 || s.substring(6, iFrom).trim.nonEmpty) return None
    val iUsing = findTopLevelWord(s, "USING", iFrom + 4)
    if (iUsing < 0) return None // a plain DELETE: not ours
    val iWhere = findTopLevelWord(s, "WHERE", iUsing + 5)
    if (iWhere < 0) throw new UnsupportedOperationException(
      "DELETE … USING requires a WHERE joining the target to the source " +
        "(an unconstrained cross join would delete every row any source " +
        "row exists for)")
    for {
      target <- parseRelation(s.substring(iFrom + 4, iUsing), p)
      source <- parseRelation(s.substring(iUsing + 5, iWhere), p)
    } yield MergeIntoTable(target, source,
      p.parseExpression(s.substring(iWhere + 5)),
      Seq(DeleteAction(None)), Nil, Nil, withSchemaEvolution = false)
  }

  /** `tbl [AS] [alias]` or `(subquery) [AS] [alias]`. */
  private def parseRelation(text: String, p: ParserInterface): Option[LogicalPlan] = {
    val t = text.trim
    if (t.isEmpty) return None
    if (t.startsWith("(")) {
      val close = matchingParen(t, 0)
      if (close < 0) return None
      val plan = p.parseQuery(t.substring(1, close))
      aliasOf(t.substring(close + 1)) match {
        case Some(Some(a)) => Some(SubqueryAlias(a, plan))
        case Some(None)    => Some(plan)
        case None          => None
      }
    } else {
      val cut = identifierEnd(t)
      val rel = UnresolvedRelation(p.parseMultipartIdentifier(t.substring(0, cut)))
      aliasOf(t.substring(cut)) match {
        case Some(Some(a)) => Some(SubqueryAlias(a, rel))
        case Some(None)    => Some(rel)
        case None          => None
      }
    }
  }

  /** Some(Some(a)) = alias a; Some(None) = no alias; None = malformed. */
  private def aliasOf(rest: String): Option[Option[String]] = {
    val toks = rest.trim.split("\\s+").filter(_.nonEmpty).toSeq
    toks match {
      case Seq()                                => Some(None)
      case Seq(a)                               => Some(Some(unquote(a)))
      case Seq(as, a) if as.equalsIgnoreCase("AS") => Some(Some(unquote(a)))
      case _                                    => None
    }
  }

  private def unquote(id: String): String =
    if (id.length >= 2 && id.head == '`' && id.last == '`')
      id.substring(1, id.length - 1).replace("``", "`")
    else id

  /** `c1 = e1, c2 = e2, …` — top-level commas separate assignments, the
    * FIRST top-level `=` in each splits key from value (the key is an
    * identifier, so it cannot itself contain `=`). */
  private def parseAssignments(text: String,
                               p: ParserInterface): Option[Seq[Assignment]] = {
    val pieces = splitTopLevel(text, ',')
    if (pieces.isEmpty) return None
    val out = pieces.map { piece =>
      val eq = findTopLevelChar(piece, '=')
      if (eq <= 0) return None
      val key = piece.substring(0, eq).trim
      val value = piece.substring(eq + 1).trim
      if (key.isEmpty || value.isEmpty) return None
      Assignment(UnresolvedAttribute(p.parseMultipartIdentifier(key)),
        p.parseExpression(value))
    }
    Some(out)
  }

  // ---- quote/paren-aware text scanning ----------------------------------

  /** Mask of positions at paren depth 0 and outside '…' / "…" / `…` /
    * line comments. */
  private def topLevelMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) {
          // '' / `` escape doubles the quote char
          if (i + 1 < s.length && s.charAt(i + 1) == quote) i += 1
          else quote = 0
        } else if (c == '\\' && quote == '\'') i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '('              => depth += 1
        case ')'              => depth -= 1
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case _ =>
          mask(i) = depth == 0
      }
      i += 1
    }
    mask
  }

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  private def wordBoundary(s: String, i: Int): Boolean =
    i >= s.length || !isWordChar(s.charAt(i))

  /** First top-level, word-bounded, case-insensitive occurrence of `word`
    * at or after `from`; -1 if none. */
  private def findTopLevelWord(s: String, word: String, from: Int): Int = {
    val mask = topLevelMask(s)
    val up = s.toUpperCase(java.util.Locale.ROOT)
    var i = math.max(from, 0)
    while (i >= 0) {
      i = up.indexOf(word, i)
      if (i < 0) return -1
      val bounded = (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        wordBoundary(s, i + word.length)
      if (bounded && mask(i)) return i
      i += 1
    }
    -1
  }

  private def findTopLevelChar(s: String, c: Char): Int = {
    val mask = topLevelMask(s)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == c && mask(i)) return i
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val mask = topLevelMask(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep && mask(i)) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Index of the ')' closing the '(' at `open`; -1 if unbalanced. */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var quote: Char = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) i += 1
          else quote = 0
        } else if (c == '\\' && quote == '\'') i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '('              => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** End of the leading (possibly multipart, possibly backtick-quoted)
    * identifier: first unquoted whitespace. */
  private def identifierEnd(s: String): Int = {
    var i = 0
    var tick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '`') tick = !tick
      else if (!tick && Character.isWhitespace(c)) return i
      i += 1
    }
    s.length
  }
}
