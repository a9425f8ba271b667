package graft.sql

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.DmlShim
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}

import graft.io.Snapshots

/** SQL ROW-LEVEL DML on catalog tables — `UPDATE`, `MERGE INTO`, and
  * full-expression `DELETE` routed to the library's transactional
  * operators through one injected resolution rule:
  *
  * {{{
  *   spark.conf: spark.sql.extensions = graft.sql.GraftExtensions
  *   UPDATE graft.t SET m = m * 2 WHERE id BETWEEN 10 AND 20
  *   DELETE FROM graft.t WHERE id % 10 = 7        -- not v1-translatable;
  *                                                -- works here anyway
  *   MERGE INTO graft.t USING updates s ON t.id = s.id
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark 4's native path for these statements
  * (`SupportsRowLevelOperations`) hands the connector a DSv2 scan/write
  * pair and replans the rewrite itself; this engine's mutation discipline
  * — zone-map candidate pruning, match-checked copy-on-write, optimistic
  * commits, dv folding — already lives in [[Snapshots.updateWhere]] /
  * [[Snapshots.deleteWhere]] / [[Snapshots.mergeInto]], so the rule
  * intercepts the ANALYZED logical command (the Delta-connector pattern:
  * post-hoc resolution, before CheckAnalysis would reject the
  * unsupported-operation node) and re-enters the library. Expressions
  * cross the boundary by UN-RESOLVING attribute references to column
  * names: the library re-resolves them against its own pruned reads, so
  * one rule serves every file layout the table will ever have.
  *
  * Scale posture: UPDATE/DELETE conditions contribute conjunct-derived
  * zone-map bounds ([[GraftDmlRule.pruneBound]]) — `WHERE id BETWEEN a
  * AND b` opens O(overlapping files); MERGE passes its first key as
  * `pruneOn`, the CDC-batch discipline. All three retry on
  * [[Snapshots.ConcurrentCommitException]] (re-derive against the fresh
  * version — the optimistic-concurrency contract every library mutator
  * documents).
  *
  * MERGE takes the FULL clause algebra: conditioned actions (`WHEN
  * MATCHED AND s.op = 'D' THEN DELETE`), multiple ordered matched
  * clauses (first applicable wins), partial-row `SET c = expr` over the
  * `t.`/`s.` namespace, and conditioned inserts — the unconditioned
  * full-row shapes keep the cheaper keyed-upsert fast path
  * ([[Snapshots.mergeInto]]); everything else routes to
  * [[Snapshots.mergeIntoWhen]].
  *
  * Subqueries: `IN (SELECT …)` / correlated `EXISTS` rewrite onto the
  * keyed-merge semi-join, `NOT IN` / `NOT EXISTS` onto the anti-join
  * mutator (each with its SQL null algebra), and uncorrelated SCALAR
  * subqueries in SET/WHERE evaluate once at run time and substitute as
  * typed literals. `WHEN NOT MATCHED BY SOURCE` maps two ways: the
  * unconditioned-DELETE + star triple is the full-sync overwrite swap;
  * every other combination (conditioned DELETE, UPDATE sweeps) routes
  * to the clause algebra with the match gate inverted. Deliberate
  * refusals (loud, with the rewrite to use instead): non-aggregate
  * correlated scalars with >1 row per key, and nested-field
  * assignments — each has no defined mapping onto the library's
  * keyed-merge algebra.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => GraftDmlRule)
    // logical views: parser interception (view DDL) + read expansion —
    // see [[GraftViewDdl]] for why OSS Spark can't route these natively
    ext.injectParser((_, delegate) => new GraftViewParser(delegate))
    ext.injectResolutionRule(s => GraftViewReadRule(s))
  }
}

object GraftDmlRule extends Rule[LogicalPlan] {

  /** The pinned graft table under the DML target (through its alias). */
  private def graftTarget(plan: LogicalPlan): Option[GraftTable] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some(t)
      case _             => None
    }
    case _ => None
  }

  /** Resolved attribute references become name references: the library
    * re-resolves them against its own reads of the same table, so the
    * expression survives the plan boundary. Subqueries cannot (their
    * plans are bound to THIS query's analysis) — refuse loudly. */
  private def unresolve(e: Expression): Expression = {
    // BETWEEN et al. resolve to `With`/common-expression dedup nodes whose
    // refs carry resolved dataTypes — they cannot survive an attribute
    // unresolve (dataType calls on the rewritten tree throw). Inline the
    // definitions first: the library re-optimizes the expression anyway.
    inlineWith(e).transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
  }

  private def inlineWith(e: Expression): Expression = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        "graft SQL DML does not support subqueries in SET or WHERE; " +
          "materialize the subquery (temp view + MERGE) instead")
    inlineWithOnly(e)
  }

  /** [[unresolve]] for the MATERIALIZE fallback: attribute references
    * OUTSIDE subquery plans unresolve as usual, but uncorrelated subquery
    * expressions stay — their plans are self-contained analyzed subtrees
    * (transform never descends into a `PlanExpression`'s plan), staged
    * once per statement at run time ([[GraftStager]]) and re-planned by
    * Spark's own subquery machinery inside the library's reads. */
  private def unresolveKeepSubq(e: Expression): Expression =
    inlineWithOnly(e).transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }

  private[sql] def inlineWithOnly(e: Expression): Expression =
    e.transformUp {
      // BETWEEN et al. are RuntimeReplaceable — their semantics live in
      // `replacement` (often a With/common-expression tree); expand first
      // so the conjunct matchers below see plain >= / <= nodes
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        r.replacement
    }.transformUp {
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            defs(r.id)
        }
    }

  /** [[unresolve]] for the MERGE clause namespace: target attributes
    * re-qualify as `t.<name>`, source attributes as `s.<name>` — the
    * aliases [[Snapshots.mergeIntoWhen]] resolves its clause Columns
    * against. Same With-inlining and subquery refusal. */
  private def unresolveMerge(e: Expression, target: AttributeSet,
                             source: AttributeSet): Expression =
    inlineWith(e).transform {
      case a: AttributeReference if target.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if source.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** Lift UNCORRELATED scalar subqueries out of a DML expression: each
    * becomes a `__graft_scalar_<i>` placeholder the command evaluates ONCE
    * at run time and substitutes as a typed literal (SQL scalar-subquery
    * semantics: >1 row errors, 0 rows yields NULL). Correlated scalars
    * keep refusing — per-row evaluation has no keyed rewrite. */
  private def stripScalars(e: Expression,
      acc: scala.collection.mutable.ArrayBuffer[LogicalPlan]): Expression =
    e.transformUp {
      case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
          if sq.outerAttrs.isEmpty =>
        acc += sq.plan
        UnresolvedAttribute.quoted(s"__graft_scalar_${acc.size - 1}")
    }

  /** ENGINE-GOVERNED columns (IDENTITY, GENERATED) have write-path
    * invariants only the INSERT path enforces (minting, expression
    * recomputation) — a keyed MERGE or an UPDATE assignment would bypass
    * them and silently corrupt the very invariants the features promise
    * (duplicate ids past a stale watermark, generated values diverging
    * from their expressions). Refuse loudly with the rewrite to use. */
  private def governedFields(t: GraftTable) = {
    import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
    t.schema.fields.filter(f =>
      IdentityColumn.isIdentityColumn(f) || GeneratedColumn.isGeneratedColumn(f))
  }

  private def guardUpdateGoverned(t: GraftTable,
                                  assigned: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.util.GeneratedColumn
    val g = governedFields(t).map(_.name).toSet
    assigned.filter(g).foreach { c =>
      throw new UnsupportedOperationException(
        s"UPDATE may not assign engine-governed column '$c' (IDENTITY " +
          "values mint at INSERT; GENERATED values are derived)")
    }
    // updating a column a generation expression READS is fine: every
    // UPDATE-shaped rewrite recomputes generated columns from the row's
    // NEW values (Snapshots.updateProjection — the Delta semantic)
  }

  /** The keyed rewrite a DML subquery predicate decomposed into: the
    * subquery-derived source plan whose rows become the key set, the
    * target key column names, and the statement's PLAIN outer conjuncts
    * (raw — each call site re-qualifies for its namespace) plus the
    * zone-map bound they imply. `SemiShape` mutates rows whose key IS in
    * the set (`IN` / correlated `EXISTS` → [[GraftDmlInCommand]]);
    * `AntiShape` mutates rows whose key is NOT (`NOT IN` / `NOT EXISTS`
    * → [[GraftDmlAntiCommand]]), carrying each form's null algebra. */
  private sealed trait SubShape {
    def sub: LogicalPlan; def keys: Seq[String]
    def plain: Option[Expression]; def bound: Option[(String, String, String)]
  }
  private case class SemiShape(sub: LogicalPlan, keys: Seq[String],
      plain: Option[Expression], bound: Option[(String, String, String)])
      extends SubShape
  private case class AntiShape(sub: LogicalPlan, keys: Seq[String],
      nullKeyMutates: Boolean, checkSourceNulls: Boolean,
      plain: Option[Expression], bound: Option[(String, String, String)])
      extends SubShape

  /** Decorrelate an `EXISTS (SELECT … WHERE inner = outer AND …)` plan
    * whose correlation is a conjunction of equality predicates in its
    * top Filter: the correlated equalities lift out as the join keys
    * (outer target column names), the rest of the subquery becomes the
    * key-set source projected to the inner sides. Any correlation this
    * shape can't express — an outer reference below the top Filter,
    * under OR, in a non-equality — refuses loudly (no sound keyed
    * mapping). */
  private def existsShape(plan: LogicalPlan, target: AttributeSet)
      : (LogicalPlan, Seq[String]) = {
    import org.apache.spark.sql.catalyst.expressions.OuterReference
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    def refuse(why: String) = throw new UnsupportedOperationException(
      s"graft SQL DML supports correlated EXISTS/NOT EXISTS only when the " +
        s"correlation is a conjunction of `inner = outer` equalities in the " +
        s"subquery's top-level WHERE ($why); materialize the subquery " +
        "(temp view + MERGE) instead")
    def peel(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => peel(c)
      case Project(_, c)       => peel(c) // EXISTS cares about cardinality only
      case other               => other
    }
    def hasOuter(p: LogicalPlan): Boolean =
      p.collectFirst { case n if n.expressions
        .exists(_.exists(_.isInstanceOf[OuterReference])) => n }.nonEmpty
    peel(plan) match {
      case Filter(cond, child) =>
        val pairs = scala.collection.mutable.ArrayBuffer
          .empty[(AttributeReference, String)]
        val rest = conjuncts(cond).filter {
          case EqualTo(i: AttributeReference, OuterReference(o: AttributeReference))
              if target.contains(o) && child.outputSet.contains(i) =>
            pairs += ((i, o.name)); false
          case EqualTo(OuterReference(o: AttributeReference), i: AttributeReference)
              if target.contains(o) && child.outputSet.contains(i) =>
            pairs += ((i, o.name)); false
          case _ => true
        }
        if (pairs.isEmpty) refuse("no correlated equality found")
        if (rest.exists(_.exists(_.isInstanceOf[OuterReference])))
          refuse("an outer reference survives outside the equalities")
        if (hasOuter(child))
          refuse("an outer reference sits below the top-level WHERE")
        val outers = pairs.map(_._2).toSeq
        if (outers.distinct != outers)
          refuse("one target column correlates against two inner columns")
        val src = rest.reduceOption(And).map(Filter(_, child)).getOrElse(child)
        (Project(pairs.map(_._1).toSeq, src), outers)
      case _ => refuse("the subquery has no top-level WHERE")
    }
  }

  /** The multi-conjunct keyed shape: several subquery conjuncts ANDed in
    * one DML WHERE, each independently in keyed form — composed as one
    * [[Snapshots.mutateKeyed]] gate chain (semi- AND anti-join the
    * target in one transactional rewrite). */
  private case class MultiShape(
      semis: Seq[(LogicalPlan, Seq[String])],
      antis: Seq[(LogicalPlan, Seq[String], Boolean, Boolean)],
      plain: Option[Expression], bound: Option[(String, String, String)])

  private sealed trait DmlShapes
  private case class Single(shape: SubShape) extends DmlShapes
  private case class Multi(shape: MultiShape) extends DmlShapes
  /** No keyed mapping, but every subquery is uncorrelated: stage each
    * subquery result and evaluate the predicate in place (conf-gated
    * fallback — the automated form of the old "materialize the subquery"
    * refusal message). */
  private case object Materialize extends DmlShapes

  /** Classify ONE subquery conjunct into its keyed form — uncorrelated
    * `(k, …) IN (SELECT …)` over target columns, single-column
    * uncorrelated `k NOT IN (SELECT …)`, or correlated `EXISTS` /
    * `NOT EXISTS` with equality correlation ([[existsShape]]). Left =
    * semi (plan, keys); Right = anti (plan, keys, nullKeyMutates,
    * checkSourceNulls). None = not a keyed form. */
  private def classifyConjunct(c: Expression, target: AttributeSet)
      : Option[Either[(LogicalPlan, Seq[String]),
                      (LogicalPlan, Seq[String], Boolean, Boolean)]] = {
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, ListQuery, Not}
    def targetKeys(values: Seq[Expression]): Option[Seq[String]] =
      if (values.forall(v => v.isInstanceOf[AttributeReference] &&
          target.contains(v.asInstanceOf[AttributeReference])))
        Some(values.map(_.asInstanceOf[AttributeReference].name))
      else None
    c match {
      case InSubquery(values, q: ListQuery) if q.outerAttrs.isEmpty &&
          targetKeys(values).isDefined =>
        Some(Left((q.plan, targetKeys(values).get)))
      case e: Exists if e.outerAttrs.nonEmpty =>
        // equality correlation → keyed; range/other correlation falls to
        // the staged transplant when the shape allows it (None → the
        // caller's Materialize fallback), else the refusal stands
        try {
          val (src, keys) = existsShape(e.plan, target)
          Some(Left((src, keys)))
        } catch {
          case ex: UnsupportedOperationException
              if GraftStager.transplantable(e, target) => None
        }
      case Not(InSubquery(values, q: ListQuery)) if q.outerAttrs.isEmpty &&
          values.length == 1 && targetKeys(values).isDefined =>
        // NOT IN's three-valued null rules: a null subquery value voids
        // the statement (checked at run time), a null target key never
        // mutates. Tuple NOT IN (per-column null mixing) stages instead.
        Some(Right((q.plan, targetKeys(values).get, false, true)))
      case Not(e: Exists) if e.outerAttrs.nonEmpty =>
        // NOT EXISTS: a null target key equality-matches nothing, so the
        // row IS unmatched and mutates
        try {
          val (src, keys) = existsShape(e.plan, target)
          Some(Right((src, keys, true, false)))
        } catch {
          case ex: UnsupportedOperationException
              if GraftStager.transplantable(e, target) => None
        }
      case _ => None
    }
  }

  /** Decompose a DML WHERE containing subqueries: every top-level
    * subquery conjunct in keyed form ([[classifyConjunct]]) maps onto the
    * keyed-merge semi/anti algebra — ONE conjunct keeps the specialized
    * single-shape commands, several compose as a [[MultiShape]] gate
    * chain. Shapes with no keyed mapping (tuple NOT IN, a subquery under
    * OR) fall back to [[Materialize]] when every subquery is uncorrelated
    * (stage + evaluate in place); non-equality correlation refuses —
    * an outer-referencing plan cannot be transplanted. */
  private def subqueryShape(cond: Expression, target: AttributeSet): DmlShapes = {
    val parts = conjuncts(cond)
    val (subs, plain) = parts.partition(_.exists(_.isInstanceOf[SubqueryExpression]))
    val plainE = plain.reduceOption(And)
    val bound = plainE.flatMap(pruneBound)
    val classified = subs.map(c => classifyConjunct(c, target))
    if (classified.nonEmpty && classified.forall(_.isDefined)) {
      val shapes = classified.map(_.get)
      if (shapes.length == 1) Single(shapes.head match {
        case Left((p, k)) => SemiShape(p, k, plainE, bound)
        case Right((p, k, nm, cs)) => AntiShape(p, k, nm, cs, plainE, bound)
      })
      else Multi(MultiShape(
        shapes.collect { case Left(x) => x },
        shapes.collect { case Right(x) => x }, plainE, bound))
    } else {
      // no keyed mapping: stage-and-evaluate works iff every subquery is
      // self-contained — uncorrelated, or a correlated EXISTS whose
      // correlation TRANSPLANTS (outer refs confined to the top-level
      // WHERE under names the library's re-read can re-bind)
      val allStageable = cond.collect {
        case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
          sq.outerAttrs.isEmpty
        case q: org.apache.spark.sql.catalyst.expressions.ListQuery =>
          q.outerAttrs.isEmpty
        case e: org.apache.spark.sql.catalyst.expressions.Exists =>
          e.outerAttrs.isEmpty || GraftStager.transplantable(e, target)
        case _: SubqueryExpression => false
      }.forall(identity)
      if (allStageable && conf.getConfString(
          "spark.sql.graft.dml.materializeSubqueries", "true") == "true")
        Materialize
      else throw new UnsupportedOperationException(
        "graft SQL DML supports subquery conjuncts in keyed form: " +
          "`(k, …) IN (SELECT …)` / single-column `k NOT IN (SELECT …)` " +
          "(both uncorrelated) over table columns, or EXISTS / NOT EXISTS " +
          "correlated by equality — rewritten to the keyed-merge " +
          "semi/anti-join (several such conjuncts compose). Uncorrelated " +
          "tuple NOT IN / OR-nested subqueries and range-correlated " +
          "EXISTS (outer references in the subquery's top-level WHERE " +
          "under non-shadowed names) auto-materialize unless " +
          "spark.sql.graft.dml.materializeSubqueries=false; other " +
          "correlation shapes have no sound mapping — materialize the " +
          "subquery (temp view + MERGE) instead")
    }
  }

  /** One decorrelated scalar-subquery enrichment for an UPDATE SET (the
    * `SET v = (SELECT agg FROM s WHERE s.k = t.k)` shape): `plan` outputs
    * the correlation keys (reserved `__graft_ck*` aliases) plus ONE value
    * column, key-unique when the subquery aggregates; `emptyPlan`
    * evaluates the aggregate over an EMPTY input once at run time — the
    * exact SQL value an unmatched key sees (NULL for max/min/sum, 0 for
    * count — the classic COUNT-bug handled by construction, not by a
    * hardcoded aggregate list). */
  private[sql] case class DmlEnrichSource(plan: LogicalPlan,
      keys: Seq[String], valueName: String,
      emptyPlan: Option[LogicalPlan],
      valueType: org.apache.spark.sql.types.DataType,
      what: String = "correlated scalar subquery")

  /** Decorrelate a scalar subquery in UPDATE SET whose correlation is a
    * conjunction of `inner = outer` equalities in its top-level WHERE —
    * the two standard enrichment shapes:
    *
    *  - `(SELECT agg(expr) FROM s WHERE s.k = t.k [AND …])` → group the
    *    filtered subquery by the inner keys (one row per key by
    *    construction);
    *  - `(SELECT expr FROM s WHERE s.k = t.k [AND …])` → the raw keyed
    *    rows; SQL's >1-row-per-key error enforces inside
    *    [[Snapshots.mutateKeyed]]'s key-uniqueness check (slightly eager:
    *    it errors on any duplicated subquery key, matched or not).
    *
    * Anything else — outer refs below the WHERE / under OR / in the
    * select list, non-equality correlation — refuses loudly. */
  private def corrScalarShape(
      sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery,
      target: AttributeSet, idx: Int): DmlEnrichSource = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression, OuterReference}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, Project}
    def refuse(why: String) = throw new UnsupportedOperationException(
      "graft SQL UPDATE supports a correlated scalar subquery in SET only " +
        "as `(SELECT [agg(]expr[)] FROM s WHERE s.k = t.k [AND …])` — " +
        s"equality correlation in the subquery's top-level WHERE ($why); " +
        "materialize the subquery (temp view + MERGE) instead")
    def peel(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => peel(c)
      case other               => other
    }
    def hasOuter(p: LogicalPlan): Boolean =
      p.collectFirst { case n if n.expressions
        .exists(_.exists(_.isInstanceOf[OuterReference])) => n }.nonEmpty
    // lift the correlation equalities out of the filter condition
    def lift(cond: Expression, child: LogicalPlan)
        : (Seq[(AttributeReference, String)], Option[Expression]) = {
      val pairs = scala.collection.mutable.ArrayBuffer
        .empty[(AttributeReference, String)]
      val rest = conjuncts(cond).filter {
        case EqualTo(i: AttributeReference, OuterReference(o: AttributeReference))
            if target.contains(o) && child.outputSet.contains(i) =>
          pairs += ((i, o.name)); false
        case EqualTo(OuterReference(o: AttributeReference), i: AttributeReference)
            if target.contains(o) && child.outputSet.contains(i) =>
          pairs += ((i, o.name)); false
        case _ => true
      }
      if (pairs.isEmpty) refuse("no correlated equality found")
      if (rest.exists(_.exists(_.isInstanceOf[OuterReference])))
        refuse("an outer reference survives outside the equalities")
      if (hasOuter(child))
        refuse("an outer reference sits below the top-level WHERE")
      val outers = pairs.map(_._2).toSeq
      if (outers.distinct != outers)
        refuse("one target column correlates against two inner columns")
      (pairs.toSeq, rest.reduceOption(And))
    }
    def keyAliases(pairs: Seq[(AttributeReference, String)]): Seq[NamedExpression] =
      pairs.zipWithIndex.map { case ((i, _), j) => Alias(i, s"__graft_ck$j")() }
    val valueName = s"__graft_csq_$idx"
    peel(sq.plan) match {
      case Aggregate(Seq(), Seq(aggExpr: NamedExpression), fchild, _) =>
        peel(fchild) match {
          case Filter(cond, child) =>
            if (aggExpr.exists(_.isInstanceOf[OuterReference]))
              refuse("an outer reference inside the aggregate expression")
            val (pairs, rest) = lift(cond, child)
            val src = rest.map(Filter(_, child)).getOrElse(child)
            DmlEnrichSource(
              Aggregate(pairs.map(_._1), keyAliases(pairs) :+ aggExpr, src),
              pairs.map(_._2), valueName,
              Some(Aggregate(Nil, Seq(aggExpr), LocalRelation(child.output))),
              sq.dataType)
          case _ => refuse("the aggregate has no top-level WHERE")
        }
      case Project(Seq(valueExpr: NamedExpression), fchild) =>
        peel(fchild) match {
          case Filter(cond, child) =>
            if (valueExpr.exists(_.isInstanceOf[OuterReference]))
              refuse("an outer reference inside the select list")
            val (pairs, rest) = lift(cond, child)
            val src = rest.map(Filter(_, child)).getOrElse(child)
            DmlEnrichSource(
              Project(keyAliases(pairs) :+ valueExpr, src),
              pairs.map(_._2), valueName, None, sq.dataType)
          case _ => refuse("the subquery has no top-level WHERE")
        }
      case _ => refuse("unsupported subquery shape")
    }
  }

  /** Lift CORRELATED scalar subqueries out of an UPDATE SET expression:
    * each decorrelates ([[corrScalarShape]]) into an enrich source and
    * leaves a reserved value-name reference behind — re-resolved against
    * the enrich join inside [[Snapshots.mutateKeyed]]. */
  private def stripCorrScalars(e: Expression, target: AttributeSet,
      acc: scala.collection.mutable.ArrayBuffer[DmlEnrichSource]): Expression =
    e.transformUp {
      case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
          if sq.outerAttrs.nonEmpty =>
        val shape = corrScalarShape(sq, target, acc.size)
        acc += shape
        UnresolvedAttribute.quoted(shape.valueName)
    }

  /** A literal rendered in the zone-map stat encoding, ONLY for types
    * whose Catalyst-internal value prints the same way the stats were
    * recorded (`cast("string")`): plain numerics and strings. Timestamps
    * / dates / decimals hold internal representations (micros, days,
    * Decimal) whose toString diverges — un-encodable, never pruned on. */
  private def literalStat(l: Literal): Option[String] = l.dataType match {
    case LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | StringType => Option(l.value).map(_.toString)
    case _ => None
  }

  /** Matches any CONSTANT side of a comparison as a folded Literal — the
    * analyzer leaves literals behind type-coercion Casts
    * (`id >= CAST(1 AS BIGINT)`), which a bare `l: Literal` pattern
    * misses and the bound silently degrades to unpruned. */
  private object FoldedLit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case _ if e.foldable && e.deterministic =>
        try Some(Literal.create(
          e.eval(org.apache.spark.sql.catalyst.InternalRow.empty), e.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  /** A column reference by NAME — resolved (AttributeReference) or the
    * single-part unresolved form the scalar-substitution path re-derives
    * bounds from after run-time literal substitution. */
  private object AttrName {
    def unapply(e: Expression): Option[(String, org.apache.spark.sql.types.DataType)] =
      e match {
        case a: AttributeReference => Some((a.name, a.dataType))
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          Some((a.name, org.apache.spark.sql.types.NullType))
        case _ => None
      }
  }

  /** A SOUND zone-map prune bound implied by the condition: from the
    * top-level conjuncts (each MUST hold), per-column closed bounds —
    * equality gives [v, v], a >=/<= pair gives [lo, hi]. The first column
    * with both sides wins. Sound by construction: cond ⇒ col ∈ [lo, hi],
    * so files outside it cannot hold a matching row; files without stats
    * stay candidates inside [[Snapshots.pruneFiles]] regardless. */
  private[sql] def pruneBound(cond: Expression): Option[(String, String, String)] = {
    val lo = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val hi = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // BETWEEN analyzes to a With/common-expression node — inline it so
    // its >= / <= conjuncts are visible to the matcher below
    conjuncts(inlineWithOnly(cond)).foreach {
      // a literal IN-list implies col ∈ [min, max] of the list — the
      // point-DML case (`WHERE id IN (5, 9)` rewrites O(overlapping
      // files)); numeric lists order numerically, strings refuse a mixed
      // bound only through literalStat's encodability gate
      case org.apache.spark.sql.catalyst.expressions.In(
          a: AttributeReference, values) if values.nonEmpty &&
          values.forall(v => FoldedLit.unapply(v).exists(l =>
            l.value != null && literalStat(l).isDefined)) =>
        val enc = values.flatMap(v => FoldedLit.unapply(v).flatMap(literalStat))
        val ordered = a.dataType match {
          // integral lists sort as longs (a double sort loses precision
          // above 2^53 and can INVERT the bound — wrong pruning)
          case LongType | IntegerType | ShortType | ByteType =>
            enc.sortBy(_.toLong)
          case DoubleType | FloatType => enc.sortBy(_.toDouble)
          case _ => enc.sorted
        }
        lo(a.name) = ordered.head; hi(a.name) = ordered.last
      case EqualTo(AttrName(n, _), FoldedLit(l)) =>
        literalStat(l).foreach { v => lo(n) = v; hi(n) = v }
      case EqualTo(FoldedLit(l), AttrName(n, _)) =>
        literalStat(l).foreach { v => lo(n) = v; hi(n) = v }
      case GreaterThan(AttrName(n, _), FoldedLit(l)) =>
        literalStat(l).foreach(lo(n) = _)
      case GreaterThanOrEqual(AttrName(n, _), FoldedLit(l)) =>
        literalStat(l).foreach(lo(n) = _)
      case LessThan(AttrName(n, _), FoldedLit(l)) =>
        literalStat(l).foreach(hi(n) = _)
      case LessThanOrEqual(AttrName(n, _), FoldedLit(l)) =>
        literalStat(l).foreach(hi(n) = _)
      case LessThan(FoldedLit(l), AttrName(n, _)) =>
        literalStat(l).foreach(lo(n) = _)
      case LessThanOrEqual(FoldedLit(l), AttrName(n, _)) =>
        literalStat(l).foreach(lo(n) = _)
      case GreaterThan(FoldedLit(l), AttrName(n, _)) =>
        literalStat(l).foreach(hi(n) = _)
      case GreaterThanOrEqual(FoldedLit(l), AttrName(n, _)) =>
        literalStat(l).foreach(hi(n) = _)
      case _ =>
    }
    lo.keys.find(hi.contains).map(c => (c, lo(c), hi(c)))
  }

  /** MERGE ON must be a conjunction of same-name target=source column
    * equalities — the keyed-merge contract ([[Snapshots.mergeInto]] joins
    * by name). Returns the key column names. */
  private def mergeKeys(cond: Expression, target: AttributeSet,
                        source: AttributeSet): Seq[String] =
    conjuncts(cond).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        val (t, s) =
          if (target.contains(x) && source.contains(y)) (x, y)
          else if (target.contains(y) && source.contains(x)) (y, x)
          else throw new UnsupportedOperationException(
            s"MERGE ON clause term must compare a target column to a " +
              s"source column, got ${x.name} = ${y.name}")
        if (t.name != s.name) throw new UnsupportedOperationException(
          s"MERGE ON joins by NAME here (got ${t.name} = ${s.name}); " +
            "alias the source column in the USING subquery")
        t.name
      case other => throw new UnsupportedOperationException(
        s"MERGE ON clause must be a conjunction of column equalities, " +
          s"got $other — pre-shape the source in the USING subquery")
    }.distinct

  /** JOIN-SHAPE DML — the matched-only merge whose ON is not the pure
    * same-name equi conjunction [[mergeKeys]] demands: `target = source`
    * equality pairs under ANY names plus one-sided residual conjuncts.
    * This is what `UPDATE … FROM` / `DELETE … USING` desugar to
    * ([[GraftJoinDml]]), and it widens hand-written matched-only MERGE
    * the same way. Decomposes onto ONE [[Snapshots.mutateKeyed]] gate
    * chain:
    *
    *  - the equality pairs form a compound-key [[Snapshots.SemiGate]]
    *    (one distributed semi join decides membership — never per-row);
    *  - source-only residuals filter the source BEFORE the gates, so
    *    they narrow membership AND the ambiguity check;
    *  - target-only residuals gate per-row and zone-map-prune candidate
    *    files ([[pruneBound]]);
    *  - a mixed target×source residual refuses loudly — a per-pair
    *    predicate has no keyed mapping (use MERGE clause conditions);
    *  - each source column a SET expression reads joins in as an
    *    [[Snapshots.EnrichGate]], whose key-uniqueness check IS the
    *    multi-match refusal (the Delta MERGE semantic: error when two
    *    source rows would feed one target row's SET). A multi-match
    *    that feeds nothing — DELETE, or a SET reading no source
    *    column — is unambiguous and allowed (the Postgres behavior).
    *
    * None = not the matched-only single-unconditioned-action shape
    * (the caller rethrows [[mergeKeys]]' refusal, which names the
    * clause-algebra alternatives). */
  private def joinShapeDml(m: MergeIntoTable, t: GraftTable,
      target: LogicalPlan, source: LogicalPlan): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    if (m.notMatchedActions.nonEmpty || m.notMatchedBySourceActions.nonEmpty ||
        m.withSchemaEvolution) return None
    val action: Either[Seq[Assignment], Unit] = m.matchedActions match {
      case Seq(a: UpdateAction) if a.condition.isEmpty => Left(a.assignments)
      case Seq(a: DeleteAction) if a.condition.isEmpty => Right(())
      case _                                           => return None
    }
    if (m.mergeCondition.exists(_.isInstanceOf[SubqueryExpression])) return None
    val ts = target.outputSet; val ss = source.outputSet
    def refuse(why: String) = throw new UnsupportedOperationException(
      s"join-DML (UPDATE … FROM / DELETE … USING / matched-only MERGE) $why")
    val pairs = scala.collection.mutable.ArrayBuffer
      .empty[(String, AttributeReference)]
    val srcRes = scala.collection.mutable.ArrayBuffer.empty[Expression]
    val tgtRes = scala.collection.mutable.ArrayBuffer.empty[Expression]
    conjuncts(inlineWithOnly(m.mergeCondition)).foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if ts.contains(a) && ss.contains(b) => pairs += ((a.name, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if ts.contains(a) && ss.contains(b) => pairs += ((a.name, b))
      case e if e.references.subsetOf(ts) => tgtRes += e
      case e if e.references.subsetOf(ss) => srcRes += e
      case e => refuse(s"cannot map the mixed target×source conjunct " +
        s"`${e.sql}`: only `target = source` equalities join the two " +
        "sides; pre-shape the comparison into the source subquery or " +
        "use MERGE with clause conditions")
    }
    if (pairs.isEmpty) refuse(
      "needs at least one `target = source` column equality join key")
    val tNames = pairs.map(_._1).toSeq
    if (tNames.distinct.size != tNames.size) refuse(
      "joins one target column against two source columns — " +
        "deduplicate the equalities in the source subquery")
    val filteredSrc = srcRes.reduceOption(And)
      .map(Filter(_, source)).getOrElse(source)
    val semiPlan = Project(pairs.map(_._2).toSeq, filteredSrc)
    val plainE = tgtRes.reduceOption(And)
    val plainCol = plainE.map(e => DmlShim.column(unresolve(e)))
    val bound = plainE.flatMap(pruneBound)
    action match {
      case Right(_) =>
        Some(GraftDmlMultiCommand(t.path, Seq((semiPlan, tNames)), Nil,
          Nil, Nil, plainCol, bound))
      case Left(assignments) =>
        guardUpdateGoverned(t, assignments.map(_.key).collect {
          case a: AttributeReference => a.name })
        // each DISTINCT source column the SET reads becomes one enrich
        // join under a reserved name; the assignment expressions rewrite
        // onto those names and re-resolve against the enriched candidates
        val srcRefs = scala.collection.mutable.LinkedHashMap
          .empty[org.apache.spark.sql.catalyst.expressions.ExprId,
                 (AttributeReference, String)]
        assignments.foreach(_.value.foreach {
          case a: AttributeReference if ss.contains(a) =>
            if (!srcRefs.contains(a.exprId))
              srcRefs(a.exprId) = (a, s"__graft_jsrc_${srcRefs.size}")
          case _ =>
        })
        val keyAliases = pairs.toSeq.zipWithIndex.map {
          case ((_, sa), j) => Alias(sa, s"__graft_ck$j")() }
        val enrich = srcRefs.values.toSeq.map { case (attr, name) =>
          DmlEnrichSource(
            Project(keyAliases :+ Alias(attr, name)(), filteredSrc),
            tNames, name, None, attr.dataType,
            what = "UPDATE … FROM: ambiguous source match — the source")
        }
        val setList = assignments.map {
          case Assignment(k: AttributeReference, v) =>
            val subbed = v.transform {
              case a: AttributeReference if ss.contains(a) =>
                UnresolvedAttribute.quoted(srcRefs(a.exprId)._2)
            }
            k.name -> DmlShim.column(unresolve(subbed))
          case Assignment(other, _) => throw new UnsupportedOperationException(
            s"graft SQL UPDATE assigns top-level columns only, got $other")
        }
        Some(GraftDmlMultiCommand(t.path, Seq((semiPlan, tNames)), Nil,
          enrich, setList, plainCol, bound))
    }
  }

  /** Is this assignment list the identity full-row copy `c = s.c`?
    * (What the analyzer expands `UPDATE SET *` / `INSERT *` into when it
    * aligns the command, and what a user writes by hand.) */
  private def identityAssignments(as: Seq[Assignment],
                                  source: AttributeSet): Boolean =
    as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        source.contains(v) && k.name == v.name
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {

    case u @ UpdateTable(target, assignments, condition)
        if graftTarget(target).isDefined && target.resolved &&
          assignments.forall(a => a.key.resolved && a.value.resolved) &&
          condition.forall(_.resolved) =>
      val t = graftTarget(target).get
      guardUpdateGoverned(t, assignments.map(_.key).collect {
        case a: AttributeReference => a.name })
      // uncorrelated SCALAR subqueries in SET or WHERE lift out first
      // (evaluate once at run time, substitute as typed literals); then
      // CORRELATED scalars in SET decorrelate into enrich sources
      val scalarPlans = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
      val enrichShapes = scala.collection.mutable.ArrayBuffer.empty[DmlEnrichSource]
      val sAssignments = assignments.map(a => Assignment(a.key,
        stripCorrScalars(stripScalars(a.value, scalarPlans), target.outputSet,
          enrichShapes)))
      val sCondition = condition.map(stripScalars(_, scalarPlans))
      if (scalarPlans.nonEmpty &&
          (enrichShapes.nonEmpty ||
            sCondition.exists(_.exists(_.isInstanceOf[SubqueryExpression])) ||
            sAssignments.exists(_.value.exists(_.isInstanceOf[SubqueryExpression]))))
        throw new UnsupportedOperationException(
          "graft SQL UPDATE supports uncorrelated scalar subqueries OR " +
            "keyed/correlated subquery forms, not both in one statement; " +
            "materialize one side (temp view) instead")
      def plainSet: Seq[(String, org.apache.spark.sql.Column)] =
        sAssignments.map {
          case Assignment(k: AttributeReference, v) =>
            k.name -> DmlShim.column(unresolve(v))
          case Assignment(other, _) => throw new UnsupportedOperationException(
            s"graft SQL UPDATE assigns top-level columns only, got $other")
        }
      if (enrichShapes.nonEmpty) {
        // `SET v = (SELECT agg FROM s WHERE s.k = t.k)` — the enrichment
        // update: decorrelated per-key sources left-join in and the
        // assignments read the per-row value (NULL / the aggregate's
        // empty-input value for unmatched keys). Composes with keyed
        // WHERE subqueries — everything is one mutateKeyed gate chain.
        val (semis, antis, plainE, bound) = sCondition match {
          case Some(c) if c.exists(_.isInstanceOf[SubqueryExpression]) =>
            subqueryShape(c, target.outputSet) match {
              case Single(SemiShape(p, k, pe, b)) => (Seq((p, k)), Nil, pe, b)
              case Single(AntiShape(p, k, nm, cs, pe, b)) =>
                (Nil, Seq((p, k, nm, cs)), pe, b)
              case Multi(ms) => (ms.semis, ms.antis, ms.plain, ms.bound)
              case Materialize => throw new UnsupportedOperationException(
                "a correlated scalar in SET cannot combine with non-keyed " +
                  "WHERE subqueries; materialize one side (temp view) instead")
            }
          case c => (Nil, Nil, c, c.flatMap(pruneBound))
        }
        GraftDmlMultiCommand(t.path, semis, antis, enrichShapes.toSeq,
          plainSet, plainE.map(e => DmlShim.column(unresolve(e))), bound)
      } else sCondition.filter(_.exists(_.isInstanceOf[SubqueryExpression])) match {
        case Some(cond) =>
          // `UPDATE ... WHERE k [NOT] IN (SELECT ...) / [NOT] EXISTS (...)`
          // → keyed-merge semi/anti rewrite. Assigning the
          // decomposition's own key column is valid SQL (`SET a = a + 1
          // WHERE a IN (SELECT …)` — membership reads the OLD row): the
          // keyed-MERGE rewrite forbids key assignment, so that one
          // shape re-routes through the mutateKeyed gate chain — the
          // same distributed semi join, membership decided before the
          // simultaneous projection, no key restriction (the anti and
          // multi paths already run there).
          val assignedNames = assignments.map(_.key).collect {
            case a: AttributeReference => a.name }.toSet
          (subqueryShape(cond, target.outputSet) match {
            case Single(s: SemiShape) if s.keys.exists(assignedNames) =>
              Multi(MultiShape(Seq((s.sub, s.keys)), Nil, s.plain, s.bound))
            case other => other
          }) match {
            case Single(SemiShape(sub, keys, plainE, bound)) =>
              val plainOpt = plainE.map(e => DmlShim.column(
                unresolveMerge(e, target.outputSet, AttributeSet.empty)))
              val set = assignments.map {
                case Assignment(k: AttributeReference, value) =>
                  k.name -> DmlShim.column(
                    unresolveMerge(value, target.outputSet, AttributeSet.empty))
                case Assignment(other, _) => throw new UnsupportedOperationException(
                  s"graft SQL UPDATE assigns top-level columns only, got $other")
              }.toMap
              GraftDmlInCommand(t.path, sub, keys,
                Seq(Snapshots.MatchedUpdate(plainOpt, set)), bound)
            case Single(AntiShape(sub, keys, nullMut, srcNulls, plainE, bound)) =>
              // anti side resolves against the plain target namespace
              // ([[Snapshots.mutateAnti]] — no t./s. aliases)
              GraftDmlAntiCommand(t.path, sub, keys, plainSet,
                plainE.map(e => DmlShim.column(unresolve(e))), bound,
                nullKeyMutates = nullMut, checkSourceNulls = srcNulls)
            case Multi(ms) =>
              // several keyed conjuncts → one mutateKeyed gate chain
              GraftDmlMultiCommand(t.path, ms.semis, ms.antis, Nil, plainSet,
                ms.plain.map(e => DmlShim.column(unresolve(e))), ms.bound)
            case Materialize =>
              // stage each uncorrelated subquery and evaluate in place
              GraftDmlStagedCommand(t.path, plainSet,
                DmlShim.column(unresolveKeepSubq(cond)), pruneBound(cond))
          }
        case None =>
          GraftUpdateCommand(t.path, plainSet,
            sCondition.map(e => DmlShim.column(unresolve(e))),
            sCondition.flatMap(pruneBound), scalars = scalarPlans.toSeq)
      }

    case DeleteFromTable(target, condition)
        if graftTarget(target).isDefined && target.resolved && condition.resolved =>
      val delScalars = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
      val delCond = stripScalars(condition, delScalars)
      if (delScalars.nonEmpty &&
          delCond.exists(_.isInstanceOf[SubqueryExpression]))
        throw new UnsupportedOperationException(
          "graft SQL DELETE supports scalar subqueries OR one keyed " +
            "IN/EXISTS predicate, not both in one statement; " +
            "materialize one side (temp view) instead")
      if (delCond.exists(_.isInstanceOf[SubqueryExpression])) {
        // `DELETE FROM t WHERE k [NOT] IN (SELECT ...) / [NOT] EXISTS (…)`
        // → the keyed semi/anti-join source shape MERGE already uses: the
        // subquery's distinct values become the source, the plain outer
        // conjuncts ride as the clause condition AND as an extra zone-map
        // bound on the candidate set
        val t = graftTarget(target).get
        subqueryShape(condition, target.outputSet) match {
          case Single(SemiShape(sub, keys, plainE, bound)) =>
            val plainOpt = plainE.map(e => DmlShim.column(
              unresolveMerge(e, target.outputSet, AttributeSet.empty)))
            GraftDmlInCommand(t.path, sub, keys,
              Seq(Snapshots.MatchedDelete(plainOpt)), bound)
          case Single(AntiShape(sub, keys, nullMut, srcNulls, plainE, bound)) =>
            GraftDmlAntiCommand(t.path, sub, keys, Nil,
              plainE.map(e => DmlShim.column(unresolve(e))), bound,
              nullKeyMutates = nullMut, checkSourceNulls = srcNulls)
          case Multi(ms) =>
            GraftDmlMultiCommand(t.path, ms.semis, ms.antis, Nil, Nil,
              ms.plain.map(e => DmlShim.column(unresolve(e))), ms.bound)
          case Materialize =>
            GraftDmlStagedCommand(t.path, Nil,
              DmlShim.column(unresolveKeepSubq(condition)),
              pruneBound(condition))
        }
      } else
        // the SupportsDelete path only accepts exactly-translatable v1
        // predicates; this command carries the FULL Catalyst expression, so
        // `WHERE id % 10 = 7` deletes instead of refusing. Uncorrelated
        // scalar subqueries lifted out above substitute at run time.
        GraftDeleteCommand(graftTarget(target).get.path,
          DmlShim.column(unresolve(delCond)), pruneBound(delCond),
          scalars = delScalars.toSeq)

    case m @ MergeIntoTable(target, source, cond, matched, notMatched, bySource, _)
        if graftTarget(target).isDefined && target.resolved &&
          source.resolved && cond.resolved =>
      val t = graftTarget(target).get
      // IDENTITY/GENERATED targets take MERGE through the general clause
      // path, where the library mints/computes on the insert arm exactly
      // like INSERT (watermark advanced in the same commit), recomputes
      // generated values on update arms, and refuses update-arm
      // assignments to governed columns. Star shapes the analyzer could
      // expand arrive as explicit assignments and flow through the same
      // guards (an expanded `seq = s.seq` on ALWAYS identity refuses per
      // row; BY DEFAULT accepts it like INSERT).
      val governed = governedFields(t)
      // An unconditioned BY SOURCE DELETE alongside the star shapes is
      // the FULL-SYNC triple (UPDATE SET * + INSERT * + BY SOURCE
      // DELETE): matched rows come from the source, unmatched targets
      // drop, unmatched sources insert — the result IS the source, so
      // the statement maps to one overwrite swap commit. Every other BY
      // SOURCE combination (conditioned DELETE, UPDATE sweeps) routes to
      // the general clause algebra below.
      val fullSync = bySource match {
        case Seq(d: DeleteAction) if d.condition.isEmpty => true
        case _ => false
      }
      val keysOrErr =
        try Right(mergeKeys(cond, target.outputSet, source.outputSet))
        catch { case e: UnsupportedOperationException => Left(e) }
      keysOrErr match {
        // ON is not the same-name equi conjunction: matched-only merges
        // (including the UPDATE … FROM / DELETE … USING desugarings)
        // decompose onto the keyed gate chain instead
        case Left(err) => joinShapeDml(m, t, target, source).getOrElse(throw err)
        case Right(keys) =>
      // FAST PATH — the unconditioned full-row shapes ([[Snapshots
      // .mergeInto]]'s keyed upsert, no clause algebra, no outer join):
      // one star/identity UPDATE, one star/identity INSERT, or both
      val simpleUpdate = matched match {
        case Seq() => Some(false)
        case Seq(a: UpdateStarAction) if a.condition.isEmpty => Some(true)
        case Seq(a: UpdateAction) if a.condition.isEmpty &&
            identityAssignments(a.assignments, source.outputSet) => Some(true)
        case _ => None
      }
      val simpleInsert = notMatched match {
        case Seq() => Some(false)
        case Seq(a: InsertStarAction) if a.condition.isEmpty => Some(true)
        case Seq(a: InsertAction) if a.condition.isEmpty &&
            identityAssignments(a.assignments, source.outputSet) => Some(true)
        case _ => None
      }
      (simpleUpdate, simpleInsert) match {
        // the complete full-sync triple maps to ONE overwrite swap (the
        // result IS the source); lesser BY SOURCE combinations fall to
        // the general clause algebra below
        case (Some(true), Some(true)) if fullSync && governed.isEmpty =>
          GraftMergeCommand(t.path, source, keys, "full_sync",
            evolveSchema = m.withSchemaEvolution)
        case (Some(du), Some(di)) if (du || di) && bySource.isEmpty &&
            governed.isEmpty =>
          val mode =
            if (du && di) "both"
            else if (du) "matched_only"
            else "insert_only"
          GraftMergeCommand(t.path, source, keys, mode,
            evolveSchema = m.withSchemaEvolution)
        case (Some(false), Some(false)) if bySource.isEmpty =>
          throw new UnsupportedOperationException(
            "MERGE needs at least one WHEN MATCHED or WHEN NOT MATCHED action")
        case _ =>
          // GENERAL PATH — conditioned / multi-action / partial-row /
          // BY SOURCE clauses route to [[Snapshots.mergeIntoWhen]]'s
          // clause algebra
          if (m.withSchemaEvolution) throw new UnsupportedOperationException(
            "MERGE WITH SCHEMA EVOLUTION supports the unconditioned " +
              "star shapes (UPDATE SET * / INSERT *) only — conditioned " +
              "or partial clauses were analyzed against the pre-evolution " +
              "shape; ALTER TABLE ADD COLUMNS first, then MERGE")
          val ts = target.outputSet; val ss = source.outputSet
          def qcol(e: Expression): org.apache.spark.sql.Column =
            DmlShim.column(unresolveMerge(e, ts, ss))
          // a key assigned its own matched source value (`id = s.id` —
          // what SET * expands to) is the identity under the ON equality
          // and drops silently; any OTHER key assignment refuses inside
          // the library (key rewrites have no keyed-merge mapping)
          def keyIdentity(k: AttributeReference, v: Expression): Boolean =
            keys.contains(k.name) && (v match {
              case a: AttributeReference => ss.contains(a) && a.name == k.name
              case _                     => false
            })
          def setOf(as: Seq[Assignment], what: String,
                    dropKeyIdentity: Boolean): Map[String, org.apache.spark.sql.Column] =
            as.collect {
              case Assignment(k: AttributeReference, value)
                  if !(dropKeyIdentity && keyIdentity(k, value)) =>
                k.name -> qcol(value)
              case Assignment(other, _) if !other.isInstanceOf[AttributeReference] =>
                throw new UnsupportedOperationException(
                  s"graft MERGE $what assigns top-level columns only, got $other")
            }.toMap
          def starSet(dropKeys: Boolean): Map[String, org.apache.spark.sql.Column] =
            target.output.filterNot(a => dropKeys && keys.contains(a.name))
              .map(a => a.name ->
                DmlShim.column(UnresolvedAttribute(Seq("s", a.name)))).toMap
          val mts: Seq[Snapshots.MatchedClause] = matched.map {
            case a: UpdateStarAction =>
              Snapshots.MatchedUpdate(a.condition.map(qcol), starSet(dropKeys = true))
            case a: UpdateAction =>
              Snapshots.MatchedUpdate(a.condition.map(qcol),
                setOf(a.assignments, "UPDATE", dropKeyIdentity = true))
            case a: DeleteAction =>
              Snapshots.MatchedDelete(a.condition.map(qcol))
            case other => throw new UnsupportedOperationException(
              s"unsupported WHEN MATCHED action $other")
          }
          val nms: Seq[Snapshots.NotMatchedInsert] = notMatched.map {
            case a: InsertStarAction =>
              Snapshots.NotMatchedInsert(a.condition.map(qcol), starSet(dropKeys = false))
            case a: InsertAction =>
              Snapshots.NotMatchedInsert(a.condition.map(qcol),
                setOf(a.assignments, "INSERT", dropKeyIdentity = false))
            case other => throw new UnsupportedOperationException(
              s"unsupported WHEN NOT MATCHED action $other")
          }
          // BY SOURCE clauses see target columns only (Spark's analyzer
          // enforces it); the library inverts the match gate for them
          val bss: Seq[Snapshots.MatchedClause] = bySource.map {
            case a: DeleteAction =>
              Snapshots.MatchedDelete(a.condition.map(qcol))
            case a: UpdateAction =>
              Snapshots.MatchedUpdate(a.condition.map(qcol),
                setOf(a.assignments, "BY SOURCE UPDATE", dropKeyIdentity = false))
            case other => throw new UnsupportedOperationException(
              s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
          }
          GraftMergeWhenCommand(t.path, source, keys, mts, nms, bss)
      }
      }
  }
}

/** Shared optimistic-retry shape: every library mutator commits against
  * the version its reads resolved at and throws on a racing writer; the
  * SQL command re-derives and retries, like every in-library consumer. */
private object GraftDmlRetry {
  def retry(body: => Unit): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try { body; done = true }
      catch {
        case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
          attempts += 1
      }
    }
  }
}

/** `UPDATE graft.t SET … WHERE …` → [[Snapshots.updateWhere]]: zone-map
  * pruned candidates, match-checked copy-on-write, one commit. */
case class GraftUpdateCommand(path: String,
                              assignments: Seq[(String, org.apache.spark.sql.Column)],
                              condition: Option[org.apache.spark.sql.Column],
                              prune: Option[(String, String, String)],
                              scalars: Seq[LogicalPlan] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = scalars

  // the name-referencing Columns ride as OPAQUE values (never Expression
  // fields: CheckAnalysis walks a command's expressions and would reject
  // the deliberately-unresolved attribute names the library re-resolves)
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "UPDATE")
    val sub = GraftScalars.substitutor(spark, scalars)
    val cond = sub(condition.getOrElse(lit(true)))
    // scalar substitution can expose a bound plan time couldn't see
    // (`WHERE id <= (SELECT …)` becomes `id <= <literal>`): re-derive so
    // the mutation prunes O(overlapping files), not O(table)
    val bound =
      if (scalars.isEmpty) prune
      else prune.orElse(GraftDmlRule.pruneBound(DmlShim.expression(cond)))
    GraftDmlRetry.retry {
      Snapshots.updateWhere(spark, path, cond,
        assignments.map { case (n, c) => n -> sub(c) }, bound)
    }
    Seq.empty
  }
}

/** Run-time evaluation of lifted scalar subqueries (SQL semantics: one
  * column, at most one row — zero rows yields NULL), substituted into
  * the statement's Columns as typed literals. Each scalar evaluates
  * ONCE per statement and the value is reused across optimistic
  * retries — SQL's read-once-at-statement-snapshot contract. */
private object GraftScalars {
  def substitutor(spark: SparkSession,
                  scalars: Seq[LogicalPlan])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    if (scalars.isEmpty) identity
    else {
      val lits: Map[String, Expression] = scalars.zipWithIndex.map {
        case (plan, i) =>
          val df = DmlShim.ofRows(spark, plan)
          require(df.columns.length == 1,
            s"scalar subquery must return one column, got ${df.columns.length}")
          val rows = df.limit(2).collect()
          if (rows.length > 1) throw new IllegalArgumentException(
            "scalar subquery returned more than one row")
          val dt = df.schema.fields(0).dataType
          val v = if (rows.isEmpty || rows(0).isNullAt(0)) null else rows(0).get(0)
          s"__graft_scalar_$i" -> Literal.create(v, dt)
      }.toMap
      c => DmlShim.column(DmlShim.expression(c).transformUp {
        case a: UnresolvedAttribute if a.nameParts.length == 1 &&
            lits.contains(a.name) => lits(a.name)
      })
    }
  }
}

/** `DELETE FROM graft.t WHERE …` with the full Catalyst predicate →
  * [[Snapshots.deleteWhere]] (same CoW transaction the SupportsDelete
  * path runs, minus the v1-translatability ceiling). */
case class GraftDeleteCommand(path: String,
                              condition: org.apache.spark.sql.Column,
                              prune: Option[(String, String, String)],
                              scalars: Seq[LogicalPlan] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = scalars

  override def run(spark: SparkSession): Seq[Row] = {
    val sub = GraftScalars.substitutor(spark, scalars)
    val cond = sub(condition)
    val bound =
      if (scalars.isEmpty) prune
      else prune.orElse(GraftDmlRule.pruneBound(DmlShim.expression(cond)))
    GraftDmlRetry.retry {
      GraftTable.sqlDelete(spark, path, cond, bound)
    }
    Seq.empty
  }
}

/** `MERGE INTO graft.t USING src ON keys …` → [[Snapshots.mergeInto]].
  * `mode` narrows the source for single-action merges: `matched_only`
  * semi-joins the source to existing keys (update, never insert),
  * `insert_only` anti-joins (insert, never touch matched rows); `both`
  * is the plain upsert. The key-uniqueness check enforces the standard
  * SQL MERGE error on a source that matches one target row twice — one
  * aggregation over the CHANGE-sized source, never the table. */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             keys: Seq[String], mode: String,
                             evolveSchema: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "MERGE INTO")
    val src = DmlShim.ofRows(spark, source)
    // MERGE WITH SCHEMA EVOLUTION: source columns the table lacks evolve
    // the schema stamp first (nullable, one metadata commit with the
    // ADD COLUMNS resurrection guards) — existing rows read the new
    // columns as NULL, then the ordinary keyed merge lands the data
    if (evolveSchema) GraftDmlRetry.retry {
      val have = Snapshots.tableSchema(spark, path).map(_.fieldNames.toSet)
        .getOrElse(Set.empty)
      val missing = src.schema.fields.filterNot(f => have(f.name)).toSeq
      if (missing.nonEmpty) Snapshots.addColumns(spark, path, missing)
    }
    val cols = Snapshots.tableSchema(spark, path).map(_.fieldNames.toSeq)
      .getOrElse(src.columns.toSeq)
    require(cols.forall(src.columns.contains),
      s"MERGE source must provide every table column " +
        s"(${cols.mkString(", ")}); shape it in the USING subquery")
    val up0 = src.select(cols.map(col): _*)
    val dups = up0.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    if (dups.nonEmpty) throw new IllegalArgumentException(
      s"MERGE source has duplicate keys (${keys.mkString(", ")} = " +
        s"${dups.head.toSeq.init.mkString(",")}): a target row would be " +
        "updated twice (standard SQL MERGE cardinality violation)")
    if (mode == "full_sync") {
      // t := source, one swap commit (retries live inside overwrite)
      GraftTable.overwrite(spark, path, up0)
      return Seq.empty
    }
    GraftDmlRetry.retry {
      val up = mode match {
        case "both" => up0
        case "matched_only" =>
          up0.join(graft.io.Snapshots.readAt(spark, path)
            .select(keys.map(col): _*).distinct(), keys, "left_semi")
        case "insert_only" =>
          up0.join(graft.io.Snapshots.readAt(spark, path)
            .select(keys.map(col): _*).distinct(), keys, "left_anti")
      }
      Snapshots.mergeInto(spark, path, up, keys, pruneOn = Some(keys.head))
    }
    Seq.empty
  }
}

/** `DELETE FROM t WHERE k IN (SELECT …)` / `UPDATE t SET … WHERE k IN
  * (SELECT …)` → [[Snapshots.mergeIntoWhen]] with the subquery's DISTINCT
  * rows as the merge source and a single matched clause (DELETE or the
  * UPDATE's assignments) carrying the plain outer conjuncts as its
  * condition. The source's own key bounds prune candidates (`pruneOn`),
  * the outer conjuncts' bound intersects them (`prune`) — a subquery
  * naming a narrow key range rewrites O(overlapping files), not
  * O(table). Null subquery values drop (IN's equality never holds on
  * null); distinct() satisfies the keyed-merge cardinality rule. */
case class GraftDmlInCommand(path: String, sub: LogicalPlan,
                             keys: Seq[String],
                             matched: Seq[Snapshots.MatchedClause],
                             prune: Option[(String, String, String)])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(sub)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "subquery DML")
    val raw = DmlShim.ofRows(spark, sub)
    require(raw.columns.length == keys.length,
      s"IN subquery returns ${raw.columns.length} columns for " +
        s"${keys.length} key columns (${keys.mkString(", ")})")
    val src = raw.toDF(keys: _*).na.drop("any", keys).distinct()
    GraftDmlRetry.retry {
      Snapshots.mergeIntoWhen(spark, path, src, keys, matched, Nil,
        pruneOn = Some(keys.head), prune = prune)
    }
    Seq.empty
  }
}

/** `DELETE FROM t WHERE k NOT IN (SELECT …)` / `… WHERE NOT EXISTS (…)`
  * (and the UPDATE twins) → [[Snapshots.mutateAnti]]: the subquery's
  * distinct values become the anti-join key set, rows WITHOUT a match
  * mutate. Each form's null algebra rides in: NOT IN's
  * whole-statement-voiding null check runs here against the CHANGE-sized
  * source (one short-circuit scan), its null-target-key immunity and NOT
  * EXISTS's opposite rule ride as `nullKeyMutates`. The plain outer
  * conjuncts gate per-row and prune candidate files by zone maps — the
  * source's own bounds cannot (a missing key can be anywhere). */
case class GraftDmlAntiCommand(path: String, sub: LogicalPlan,
                               keys: Seq[String],
                               assignments: Seq[(String, org.apache.spark.sql.Column)],
                               plainCond: Option[org.apache.spark.sql.Column],
                               prune: Option[(String, String, String)],
                               nullKeyMutates: Boolean,
                               checkSourceNulls: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(sub)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "subquery DML")
    val raw = DmlShim.ofRows(spark, sub)
    require(raw.columns.length == keys.length,
      s"subquery returns ${raw.columns.length} columns for " +
        s"${keys.length} key columns (${keys.mkString(", ")})")
    // SQL NOT IN three-valued rule: one NULL in the subquery makes
    // `k NOT IN (…)` never TRUE — the whole statement is a no-op
    if (checkSourceNulls && !raw.filter(
        raw.columns.map(c => col(c).isNull).reduce(_ || _)).isEmpty)
      return Seq.empty
    GraftDmlRetry.retry {
      Snapshots.mutateAnti(spark, path, raw, keys, nullKeyMutates,
        plainCond, assignments, prune)
    }
    Seq.empty
  }
}

/** MULTI-GATE keyed DML — several subquery conjuncts ANDed in one WHERE
  * (`WHERE k IN (SELECT …) AND k2 NOT IN (SELECT …) AND plain`) and/or
  * correlated scalars in SET → ONE [[Snapshots.mutateKeyed]] call: each
  * semi/anti conjunct becomes a gate (its own distributed key-set join),
  * each correlated scalar an enrich gate, the plain conjuncts gate
  * per-row and bound the candidate files; empty `assignments` deletes.
  * Null algebra per gate matches the single-shape commands: `NOT IN`'s
  * statement-voiding source-null rule short-circuits here (one
  * change-sized scan per NOT IN source), the per-gate null-key rules ride
  * into the gates. */
case class GraftDmlMultiCommand(path: String,
    semis: Seq[(LogicalPlan, Seq[String])],
    antis: Seq[(LogicalPlan, Seq[String], Boolean, Boolean)],
    enrich: Seq[GraftDmlRule.DmlEnrichSource],
    assignments: Seq[(String, org.apache.spark.sql.Column)],
    plainCond: Option[org.apache.spark.sql.Column],
    prune: Option[(String, String, String)])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] =
    semis.map(_._1) ++ antis.map(_._1) ++ enrich.map(_.plan)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "subquery DML")
    val semiGates = semis.map { case (plan, keys) =>
      val raw = DmlShim.ofRows(spark, plan)
      require(raw.columns.length == keys.length,
        s"IN subquery returns ${raw.columns.length} columns for " +
          s"${keys.length} key columns (${keys.mkString(", ")})")
      Snapshots.SemiGate(raw, keys)
    }
    val antiGates = antis.map { case (plan, keys, nullMut, srcNulls) =>
      val raw = DmlShim.ofRows(spark, plan)
      require(raw.columns.length == keys.length,
        s"subquery returns ${raw.columns.length} columns for " +
          s"${keys.length} key columns (${keys.mkString(", ")})")
      // SQL NOT IN three-valued rule: one NULL in the subquery makes the
      // conjunct never TRUE — the whole ANDed statement is a no-op
      if (srcNulls && !raw.filter(
          raw.columns.map(c => col(c).isNull).reduce(_ || _)).isEmpty)
        return Seq.empty
      Snapshots.AntiGate(raw, keys, nullKeyMutates = nullMut)
    }
    val enrichGates = enrich.map { e =>
      val raw = DmlShim.ofRows(spark, e.plan) // __graft_ck*…, value (last)
      val emptyVal: org.apache.spark.sql.Column = e.emptyPlan match {
        case Some(p) =>
          // the aggregate over EMPTY input — evaluated once, the exact
          // SQL value an unmatched correlation key sees
          val r = DmlShim.ofRows(spark, p).first()
          DmlShim.column(Literal.create(
            if (r.isNullAt(0)) null else r.get(0), e.valueType))
        case None => lit(null).cast(e.valueType)
      }
      Snapshots.EnrichGate(raw, e.keys, e.valueName, emptyVal, e.what)
    }
    GraftDmlRetry.retry {
      Snapshots.mutateKeyed(spark, path,
        semiGates ++ antiGates ++ enrichGates, plainCond, assignments, prune)
    }
    Seq.empty
  }
}

/** STAGED-SUBQUERY DML — the materialize fallback for uncorrelated
  * subquery shapes with no keyed mapping (tuple `NOT IN` with its
  * per-column null mixing, subqueries under `OR`): each subquery plan
  * stages ONCE per statement ([[GraftStager]] — local checkpoint, SQL's
  * read-once-at-statement-snapshot contract, reused across optimistic
  * retries), then the FULL predicate evaluates in place inside the
  * library's candidate reads — Spark's own subquery planning turns each
  * membership test into a distributed join. The automated form of the
  * old "materialize the subquery (temp view + MERGE)" refusal;
  * `spark.sql.graft.dml.materializeSubqueries=false` restores the
  * refusal. */
case class GraftDmlStagedCommand(path: String,
    assignments: Seq[(String, org.apache.spark.sql.Column)],
    condition: org.apache.spark.sql.Column,
    prune: Option[(String, String, String)])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "subquery DML")
    val staged = GraftStager.stage(spark, condition)
    GraftDmlRetry.retry {
      Snapshots.mutateStaged(spark, path, staged, assignments, prune)
    }
    Seq.empty
  }
}

/** Stage every uncorrelated subquery inside a DML predicate: evaluate its
  * plan to an eager local checkpoint and swap the checkpointed plan in —
  * self-contained (no exprIds shared with the original statement's
  * analysis), stable across re-evaluations and optimistic retries.
  *
  * Tuple (and OR-nested single-column) IN/NOT IN additionally DECOMPOSE
  * into hash-joinable form: Spark plans a multi-column null-aware anti
  * join as BroadcastNestedLoopJoin — O(candidates × subquery), a
  * measured 51× cliff at 10× data (ProbeStaged) — so the staged
  * membership test rewrites into its exact three-valued expansion over
  * NULL PATTERNS, every term an EQUI semi join on a struct of the
  * non-null columns:
  *
  *   IN = CASE WHEN <all vals non-null AND exact match in the fully
  *                   non-null subquery rows>                 THEN true
  *             WHEN <some (P,Q) pattern pair possibly-matches: the
  *                   subquery rows with null pattern P equal the row on
  *                   every column outside P∪Q, Q = the row's own null
  *                   pattern>                                THEN null
  *             ELSE false END
  *
  * P ranges over patterns PRESENT in the staged result (one cheap
  * aggregation over the checkpoint — almost always just "no nulls"),
  * Q over all 2^k outer patterns, gated per row by IS NULL checks, so
  * Spark plans one hash ExistenceJoin per term instead of one nested
  * loop over everything. Arity is capped (terms ≤ 32); beyond it the
  * original in-place shape stands. */
private[sql] object GraftStager {
  import org.apache.spark.sql.catalyst.expressions.{And, CaseWhen, CreateNamedStruct, Exists, Expression, InSubquery, IsNotNull, IsNull, ListQuery, Literal, Or}
  def stage(spark: SparkSession,
            c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    DmlShim.column(DmlShim.expression(c).transformUp {
      case q: ListQuery if q.outerAttrs.isEmpty =>
        q.copy(plan =
          DmlShim.ofRows(spark, q.plan).localCheckpoint().queryExecution.analyzed)
      case e: Exists if e.outerAttrs.isEmpty =>
        e.copy(plan =
          DmlShim.ofRows(spark, e.plan).localCheckpoint().queryExecution.analyzed)
      case e: Exists if e.outerAttrs.nonEmpty =>
        transplant(spark, e)
      // transformUp: the ListQuery child was checkpoint-staged above
      case in @ InSubquery(values, q) if q.outerAttrs.isEmpty &&
          values.length >= 1 && values.length <= 4 =>
        decompose(spark, values, q).getOrElse(in)
    })

  /** RANGE-CORRELATED EXISTS shape: peel alias/Project wrappers (EXISTS
    * cares about cardinality only — refuse if a peeled Project itself
    * reads the outer row), then the top-level `Filter(cond, child)` where
    * ALL outer references live in `cond`, each names a TARGET column, and
    * no outer name is shadowed by a `child` output column (the transplant
    * re-binds by NAME; a shadowing inner column would silently capture
    * it). `child` is fully uncorrelated. */
  private def shapeOf(e: Exists,
      target: Option[AttributeSet]): Option[(Expression, LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.OuterReference
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    def hasOuter(p: LogicalPlan): Boolean =
      p.collectFirst { case n if n.expressions
        .exists(_.exists(_.isInstanceOf[OuterReference])) => n }.nonEmpty
    def peel(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => peel(c)
      case pr @ Project(list, c)
          if !list.exists(_.exists(_.isInstanceOf[OuterReference])) => peel(c)
      case other => other
    }
    peel(e.plan) match {
      case Filter(cond, child) if !hasOuter(child) =>
        val outers = cond.collect {
          case OuterReference(a: AttributeReference) => a
        }
        val childNames = child.output.map(_.name).toSet
        val ok = outers.nonEmpty &&
          outers.forall(a => target.forall(_.contains(a)) && !childNames(a.name))
        if (ok) Some((cond, child)) else None
      case _ => None
    }
  }

  /** Can this correlated EXISTS evaluate inside the library's own reads
    * after a by-name re-bind? (The classification gate for the staged
    * fallback — [[transplant]] is the run-time counterpart.) */
  def transplantable(e: Exists, target: AttributeSet): Boolean =
    shapeOf(e, Some(target)).isDefined

  /** Stage a RANGE-CORRELATED EXISTS: checkpoint the uncorrelated child
    * once (SQL's read-once-at-statement-snapshot contract, reused across
    * optimistic retries), un-resolve each outer reference to its bare
    * column NAME, and hand back an Exists the library's candidate reads
    * re-analyze — Spark's own subquery resolution re-binds the names
    * against the new outer scope and plans the membership test as a
    * join. Scale note: a non-equi correlation plans as a nested-loop
    * join over O(candidates × staged source); zone maps still bound the
    * candidates, and the equality-correlated forms keep their keyed
    * hash-join rewrite — this path exists for the shapes that previously
    * refused outright. */
  private def transplant(spark: SparkSession, e: Exists): Exists = {
    import org.apache.spark.sql.catalyst.expressions.OuterReference
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // membership of the outer refs in the TARGET was validated at rule
    // time (transplantable); by run time unresolveKeepSubq may have
    // rewritten the outerAttrs field, so only the shape re-checks here
    val (cond, child) = shapeOf(e, None).getOrElse(
      throw new UnsupportedOperationException(
      "graft SQL DML supports a non-equality-correlated EXISTS only when " +
        "every outer reference sits in the subquery's top-level WHERE " +
        "under a name no subquery column shadows; materialize the " +
        "subquery (temp view + MERGE) instead"))
    val ck = DmlShim.ofRows(spark, child).localCheckpoint()
      .queryExecution.analyzed
    val cond2 = GraftDmlRule.inlineWithOnly(cond).transform {
      case OuterReference(a: AttributeReference) =>
        UnresolvedAttribute.quoted(a.name)
    }
    e.copy(plan = Filter(cond2, ck), outerAttrs = Nil)
  }

  private def decompose(spark: SparkSession, values: Seq[Expression],
                        q: ListQuery): Option[Expression] = {
    import org.apache.spark.sql.functions.{col, isnull, struct}
    val ck = DmlShim.ofRows(spark, q.plan) // LogicalRDD: already materialized
    val scols = ck.columns.toSeq
    val k = values.length
    if (scols.length != k) return None
    // null patterns PRESENT in the staged result (small: ≤ 2^k rows out)
    val pats: Seq[Seq[Boolean]] = ck
      .groupBy(scols.zipWithIndex.map { case (c, i) =>
        isnull(col(c)).as(s"__n$i") }: _*)
      .count().collect().toSeq.map(r => (0 until k).map(r.getBoolean))
    if (pats.size * (1 << k) > 32) return None // arity cap: keep in-place
    def subqueryPlan(p: Seq[Boolean], keep: Seq[Int]) =
      ck.filter((0 until k).map(i =>
          if (p(i)) col(scols(i)).isNull else col(scols(i)).isNotNull)
          .reduce(_ && _))
        .select(struct(keep.map(i => col(scols(i)).as(s"f$i")): _*).as("__t"))
        .distinct().queryExecution.analyzed
    def inTerm(p: Seq[Boolean], keep: Seq[Int]): Expression =
      InSubquery(
        Seq(CreateNamedStruct(
          keep.toSeq.flatMap(i => Seq(Literal(s"f$i"), values(i))))),
        ListQuery(subqueryPlan(p, keep)))
    val allNN = values.map(IsNotNull(_): Expression).reduceLeft(And(_, _))
    val noNulls = Seq.fill(k)(false)
    val existsEq: Expression =
      if (pats.contains(noNulls)) And(allNN, inTerm(noNulls, 0 until k))
      else Literal.FalseLiteral
    val qSubsets = (0 until (1 << k)).map(m =>
      (0 until k).filter(i => (m & (1 << i)) != 0))
    val possTerms: Seq[Expression] = for {
      p <- pats
      qs <- qSubsets
      if !(p == noNulls && qs.isEmpty) // that term IS existsEq
    } yield {
      val qcheck = (0 until k).map(i =>
        if (qs.contains(i)) IsNull(values(i)): Expression
        else IsNotNull(values(i)): Expression).reduceLeft(And(_, _))
      val keep = (0 until k).filter(i => !p(i) && !qs.contains(i))
      if (keep.isEmpty) qcheck // any row of this P-slice possibly matches
      else And(qcheck, inTerm(p, keep))
    }
    val poss = possTerms.reduceOption(Or(_, _)).getOrElse(Literal.FalseLiteral)
    Some(CaseWhen(
      Seq(existsEq -> Literal.TrueLiteral,
        poss -> Literal(null, org.apache.spark.sql.types.BooleanType)),
      Some(Literal.FalseLiteral)))
  }
}

/** Conditioned / multi-action / partial-row `MERGE INTO` →
  * [[Snapshots.mergeIntoWhen]]: the full SQL clause algebra (`WHEN
  * MATCHED AND cond THEN DELETE`, ordered clause precedence, partial
  * `SET c = expr`, conditioned inserts) with the same one-commit /
  * zone-map-pruned file discipline as the fast path. Clause conditions
  * and expressions ride as opaque Columns over the `t.` / `s.` merge
  * namespace (re-resolved by the library against its own pruned reads —
  * the [[GraftUpdateCommand]] pattern); the source plan is this query's
  * analyzed USING subquery. Cardinality and key-assignment rules enforce
  * inside the library call. */
case class GraftMergeWhenCommand(path: String, source: LogicalPlan,
                                 keys: Seq[String],
                                 matched: Seq[Snapshots.MatchedClause],
                                 notMatched: Seq[Snapshots.NotMatchedInsert],
                                 bySource: Seq[Snapshots.MatchedClause] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable.refuseMvDml(spark, path, "MERGE INTO")
    val src = DmlShim.ofRows(spark, source)
    GraftDmlRetry.retry {
      Snapshots.mergeIntoWhen(spark, path, src, keys, matched, notMatched,
        pruneOn = Some(keys.head), bySource = bySource)
    }
    Seq.empty
  }
}
