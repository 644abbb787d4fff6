package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.sources.{GraftBatchScan, GraftPolicies, GraftTable}

/**
 * RELY PK/FK join elimination (B231) — the informational-constraint
 * optimization every warehouse ships (Oracle `RELY NOVALIDATE`, Snowflake
 * `RELY`, Databricks `RELY` on primary/foreign keys): when the user DECLARES
 * referential integrity the engine cannot afford to verify at 100 TB, an
 * inner PK-FK join whose dimension side contributes no columns is provably a
 * no-op and is removed from the plan entirely — the scan of the dimension
 * table, its shuffle/broadcast, and the join operator all disappear.
 *
 * Declaration rides ordinary table properties on graft-catalog tables (one
 * metadata commit, `ALTER TABLE ... SET TBLPROPERTIES`); COMPOSITE keys are
 * comma-separated, paired positionally:
 *
 *   - dimension:  'graft.primaryKey'        = 'pk1, pk2 RELY'
 *   - fact:       'graft.foreignKey.<name>' = 'fk1, fk2 REFERENCES dim_table (pk1, pk2) RELY'
 *
 * `RELY` is the user's signed statement that (a) the pk column set is unique
 * and non-null in the dimension and (b) every fk tuple with ALL components
 * non-null exists in it (SQL MATCH SIMPLE). The rule trusts the declaration
 * and never scans to check — that is the entire point of RELY (the validated
 * alternative is B146's data-quality battery). A declaration without the
 * literal RELY keyword is documentation only and never fires.
 *
 * A join qualifies when ALL of:
 *   1. inner join whose condition is a conjunction of bare-attribute
 *      equalities `fact.fk_i = dim.pk_i` covering the declared PK set
 *      EXACTLY (every pk column equated once, nothing else — a PARTIAL key
 *      match has no uniqueness guarantee and never fires);
 *   2. the dimension side is a bare scan of a graft table declaring
 *      `graft.primaryKey = 'pk… RELY'` (optionally under an attribute-only
 *      Project — no Filter: a filtered dimension CAN drop fact rows);
 *   3. the fact-side keys resolve (by exprId) to the declared FK columns of
 *      a graft table in the fact subtree whose `graft.foreignKey.*` property
 *      REFERENCES that dimension table with the same positional pairing;
 *   4. nothing above the join uses any dimension column except pk columns —
 *      pk occurrences are rewritten to their paired fact FK (equal on every
 *      surviving row by the join predicate), preserving the original exprId
 *      via Alias.
 *
 * The rewrite keeps inner-join row semantics exactly: an inner equi-join
 * drops fact rows with ANY NULL fk component, so each nullable FK gains a
 * `fk IS NOT NULL` filter (a non-nullable FK gains nothing at all).
 *
 * SEMI/ANTI joins (the EXISTS / NOT EXISTS shapes) eliminate too: under the
 * FK RELY a fact row has a match iff every fk component is non-null, so
 * LEFT SEMI becomes `fk… IS NOT NULL` and LEFT ANTI becomes
 * `fk… IS NULL OR …` — the dimension scan vanishes for a null check. No
 * substitution leg exists (no dim column is in scope above a semi/anti).
 *
 * OUTER-join substitution and composite keys: a LEFT/RIGHT OUTER row is
 * unmatched iff SOME fk component is null (MATCH SIMPLE) — with a single-
 * column key that means fk IS NULL, so substituting the null-extended pk
 * with the fk is exact; with a MULTI-column key an unmatched row can carry
 * one non-null fk next to a null one, and substituting that pk (null-
 * extended) with the non-null fk would fabricate a value. Composite outer
 * elimination with a USED pk is therefore refused (it would need a proof
 * that every paired fk is non-null, and the catalog's DDL schema codec
 * reads every column back nullable); unused-dim composite outer
 * elimination stays sound from PK uniqueness alone and fires.
 *
 * Matched parent shapes are `Project(_, Join)` and `Aggregate(_, _, Join)` —
 * after column pruning these are the shapes a no-dimension-column join can
 * appear in; matching the parent is what proves condition 4 locally.
 *
 * Registered via [[GraftExtensions]] (spark.sql.extensions) and attachable to
 * a running session through `experimental.extraOptimizations` (the
 * [[org.apache.spark.sql.GraftBridge.addOptimization]] runtime twin). It
 * therefore sees relations either pre-pushdown ([[DataSourceV2Relation]]) or
 * post-pushdown ([[DataSourceV2ScanRelation]]) and handles both.
 */
case class RelyJoinEliminationRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import RelyConstraints._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist, j: Join) =>
      eliminate(j, plist).map { case (newList, child) =>
        Project(newList.map(_.asInstanceOf[NamedExpression]), child)
      }.getOrElse(p)
    case a @ Aggregate(groups, aggs, j: Join, hint) =>
      // Group and aggregate expressions together are everything the parent
      // reads from the join — rewrite both through the same substitution.
      eliminate(j, groups ++ aggs).map { case (newExprs, child) =>
        val (g, ae) = newExprs.splitAt(groups.size)
        Aggregate(g, ae.map(_.asInstanceOf[NamedExpression]), child, hint)
      }.getOrElse(a)
    // DISTINCT elimination over a declared RELY PK: a grouping that COVERS
    // the PK set, with pure key-passthrough output, groups rows that are
    // already unique — the whole hash aggregate (and its shuffle) is a
    // no-op. Uniqueness is a row-level property, so ANY filtering above the
    // scan (Filter nodes, pushed predicates, partition pruning) preserves
    // it — unlike the join legs, no bare-scan proof is needed; only
    // policies refuse (a masked grouping column collapses values, so the
    // distinct is real again).
    case a @ Aggregate(ges, aes, child, _) =>
      distinctElim(ges, aes, child).getOrElse(a)
  }

  /** SELECT DISTINCT pk…, extras FROM dim → Project, when the grouping
    * covers a declared RELY PK of the (possibly filtered) underlying scan
    * and every output is a grouping-attribute passthrough. */
  private def distinctElim(ges: Seq[Expression], aes: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val geAttrs = ges.map {
      case ar: AttributeReference => ar
      case _ => return None
    }
    val geIds = geAttrs.map(_.exprId).toSet
    // Pure distinct: every output echoes a grouping attribute.
    aes.foreach {
      case ar: AttributeReference if geIds.contains(ar.exprId) =>
      case Alias(ar: AttributeReference, _) if geIds.contains(ar.exprId) =>
      case _ => return None
    }
    // Peel any Filters and attribute-only Projects down to one graft scan.
    def relationOf(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
      case r: DataSourceV2Relation => Some(r)
      case s: DataSourceV2ScanRelation => Some(s.relation)
      case Filter(_, inner) => relationOf(inner)
      case Project(es, inner) if es.forall(_.isInstanceOf[AttributeReference]) =>
        relationOf(inner)
      case _ => None
    }
    val rel = relationOf(child).getOrElse(return None)
    if (!rel.table.isInstanceOf[GraftTable] || policed(rel)) return None
    val pkNames = primaryKeyCols(rel).getOrElse(return None)
    // The grouping must COVER the full PK set, resolved by exprId against
    // the relation's own output (an aliased/derived key is not the key).
    val covered = pkNames.forall { n =>
      rel.output.exists(a => a.name.equalsIgnoreCase(n) &&
        geIds.contains(a.exprId))
    }
    if (!covered) return None
    Some(Project(aes, child))
  }

  /** Try both join orientations; returns the rewritten (expressions, child). */
  private def eliminate(j: Join, used: Seq[Expression])
      : Option[(Seq[Expression], LogicalPlan)] = j match {
    case Join(l, r, Inner, Some(cond), _) =>
      attempt(l, r, cond, used, outer = false)
        .orElse(attempt(r, l, cond, used, outer = false))
    // LEFT OUTER to a unique key preserves every fact row exactly once, so
    // elimination needs only the PK declaration when no dimension column is
    // used; a pk reference substitutes to the fk under the FK declaration
    // (matched rows: pk = fk by the condition; unmatched rows: RELY says
    // every non-null fk matches, so unmatched means fk IS NULL means the
    // null-extended pk equals it). No IS NOT NULL guard — outer joins drop
    // nothing. The preserved side is the fact; only that orientation exists.
    case Join(l, r, LeftOuter, Some(cond), _) =>
      attempt(l, r, cond, used, outer = true)
    case Join(l, r, RightOuter, Some(cond), _) =>
      attempt(r, l, cond, used, outer = true)
    // SEMI/ANTI to a declared PK-FK dimension — the EXISTS / NOT EXISTS
    // shape. Under the FK RELY (every fk tuple with ALL components non-null
    // exists in the dimension — MATCH SIMPLE), a match exists for a fact
    // row iff every fk component is non-null, so:
    //   LEFT SEMI  ≡ Filter(fk1 IS NOT NULL AND … AND fkn IS NOT NULL)
    //   LEFT ANTI  ≡ Filter(fk1 IS NULL OR … OR fkn IS NULL)
    // (a null component makes the equi-condition non-true, which is exactly
    // what keeps the row in an anti join). No dimension column is in scope
    // above a semi/anti join, so there is no substitution leg at all — the
    // dim scan and its shuffle/broadcast vanish for the cost of a null
    // check. PK uniqueness isn't even needed for the row counts; the PK
    // declaration is still required because the FK's REFERENCES leg is
    // validated against it (and an undeclared dim was never RELY-trusted).
    case Join(l, r, LeftSemi, Some(cond), _) =>
      attemptExistence(l, r, cond, used, anti = false)
    case Join(l, r, LeftAnti, Some(cond), _) =>
      attemptExistence(l, r, cond, used, anti = true)
    case _ => None
  }

  /** The shared qualification kernel (conditions 1+2 of the class doc):
    * bare declared-PK dimension (inert IsNotNull(pk) filters only, pushed
    * or residual), and a condition that is a bare-attribute equality
    * conjunction covering the declared PK set EXACTLY. Returns the dim
    * relation and the (fact fk, dim pk) pairs. */
  private def qualify(fact: LogicalPlan, dim: LogicalPlan, cond: Expression)
      : Option[(DataSourceV2Relation,
                Seq[(AttributeReference, AttributeReference)])] = {
    // 2. dimension side: bare relation (possibly attribute-only Project,
    // possibly under a Filter that only asserts IsNotNull of the pk — the
    // exact filter InferFiltersFromConstraints derives from the join
    // condition itself; null pks can't match any fact row, so such a filter
    // never drops a JOINING dimension row and elimination stays exact).
    val (dimInner, dimFilter) = dim match {
      case Filter(c, child) => (child, Some(c))
      case other => (other, None)
    }
    val (dimRel, pushedData) = bareRelation(dimInner).getOrElse(return None)
    val pkNames = primaryKeyCols(dimRel).getOrElse(return None)
    val pkAttrs = pkNames.map(n =>
      dim.output.find(a => a.name.equalsIgnoreCase(n)).getOrElse(return None))
    val pkIds = pkAttrs.map(_.exprId).toSet
    dimFilter.foreach { c =>
      val ok = splitConjunctivePredicates(c).forall {
        case IsNotNull(a: AttributeReference) => pkIds.contains(a.exprId)
        case _ => false
      }
      if (!ok) return None
    }
    // Pushed data filters mirror the residual set and can only row-group-skip
    // rows those same predicates exclude — harmless iff they're the exact
    // whitelist the residual-Filter check allows: IsNotNull of a pk column.
    val pushedOk = pushedData.forall {
      case org.apache.spark.sql.sources.IsNotNull(c) =>
        pkNames.exists(_.equalsIgnoreCase(c))
      case _ => false
    }
    if (!pushedOk) return None

    // 1. condition is a conjunction of `fact.fk_i = dim.pk_i` covering the
    // declared PK set EXACTLY — a partial key has no uniqueness guarantee.
    val pairs: Seq[(AttributeReference, AttributeReference)] =
      splitConjunctivePredicates(cond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if fact.outputSet.contains(a) && pkIds.contains(b.exprId) => (a, b)
        case EqualTo(b: AttributeReference, a: AttributeReference)
            if fact.outputSet.contains(a) && pkIds.contains(b.exprId) => (a, b)
        case _ => return None
      }
    val eqPkIds = pairs.map(_._2.exprId)
    if (eqPkIds.distinct.size != eqPkIds.size || eqPkIds.toSet != pkIds)
      return None
    Some((dimRel, pairs))
  }

  /** The declared-FK proof (condition 3): some graft relation in the fact
    * subtree declares a positionally-matching FK against this dimension. */
  private def fkDeclared(fact: LogicalPlan, dimRel: DataSourceV2Relation,
      pairs: Seq[(AttributeReference, AttributeReference)]): Boolean =
    factRelations(fact).exists { r =>
      foreignKeys(r).exists { fk =>
        fk.pkCols.size == pairs.size &&
          tableMatches(dimRel, r, fk.refTable) &&
          fk.pkCols.indices.forall { i =>
            pairs.exists { case (fa, pa) =>
              pa.name.equalsIgnoreCase(fk.pkCols(i)) &&
                r.output.exists(a => a.exprId == fa.exprId &&
                  a.name.equalsIgnoreCase(fk.fkCols(i)))
            }
          }
      }
    }

  private def name(r: DataSourceV2Relation): String =
    r.identifier.map(id => (id.namespace() :+ id.name()).mkString("."))
      .getOrElse(r.table.name())

  /** LEFT SEMI / LEFT ANTI to a declared PK-FK dimension: existence reduces
    * to fk null checks (see the `eliminate` doc) — no substitution leg. */
  private def attemptExistence(fact: LogicalPlan, dim: LogicalPlan,
      cond: Expression, used: Seq[Expression], anti: Boolean)
      : Option[(Seq[Expression], LogicalPlan)] = {
    val (dimRel, pairs) = qualify(fact, dim, cond).getOrElse(return None)
    // Existence itself is the claim being replaced — the FK declaration is
    // always required here (PK uniqueness alone says nothing about which
    // fact rows match).
    if (!fkDeclared(fact, dimRel, pairs)) return None
    val nullable = pairs.map(_._1).filter(_.nullable).distinctBy(_.exprId)
    val child =
      if (!anti) {
        // SEMI: keep iff every fk component non-null.
        if (nullable.isEmpty) fact
        else Filter(nullable.map(IsNotNull(_): Expression).reduce(And), fact)
      } else {
        // ANTI: keep iff some fk component is null; provably-non-null
        // components can never contribute.
        if (nullable.isEmpty) Filter(Literal.FalseLiteral, fact)
        else Filter(nullable.map(IsNull(_): Expression).reduce(Or), fact)
      }
    Some((used, child))
  }

  private def attempt(fact: LogicalPlan, dim: LogicalPlan, cond: Expression,
                      used: Seq[Expression], outer: Boolean)
      : Option[(Seq[Expression], LogicalPlan)] = {
    val (dimRel, pairs) = qualify(fact, dim, cond).getOrElse(return None)
    val pkIds = pairs.map(_._2.exprId).toSet
    val subst: Map[ExprId, AttributeReference] =
      pairs.map(p => p._2.exprId -> p._1).toMap

    // 4. nothing above uses dim columns except pk columns; rewrite pk -> its
    // paired fk keeping the original exprId so parent references stay valid.
    val dimOut = dim.outputSet
    val usedDim = used.flatMap(_.references).filter(dimOut.contains).distinct
    val nonPk = usedDim.filterNot(a => pkIds.contains(a.exprId))

    // 3. the FK declaration: an INNER join always needs it (elimination
    // keeps fact rows the join would only keep under referential
    // integrity), an OUTER join needs it only to substitute a used pk
    // (unused-dim outer elimination is sound from PK uniqueness alone).
    // Composite declarations pair positionally: every declared
    // (fk_i REFERENCES pk_i) leg must be one of the equated pairs on the
    // SAME fact relation's attributes. Checked BEFORE the payload refusal
    // so the payload note's advice ("drop the payload column") is only
    // issued when following it would actually let elimination fire.
    val needsFk = !outer || usedDim.nonEmpty
    if (needsFk && !fkDeclared(fact, dimRel, pairs)) {
      RelyDiagnostics.note(m => logInfo(m), s"join to ${name(dimRel)} kept: no " +
        "RELY foreign-key declaration on the fact side REFERENCES this " +
        "dimension with the equated column pairing")
      return None
    }

    if (nonPk.nonEmpty) {
      // Everything else QUALIFIED (declared-PK dim, exact key cover, FK
      // declared) and only the payload reference blocks — the one refusal a
      // user can act on (drop the payload column, or denormalize it onto
      // the fact).
      RelyDiagnostics.note(m => logInfo(m), s"join to ${name(dimRel)} kept: " +
        s"non-key dimension column(s) ${nonPk.map(_.name).sorted.mkString(", ")} " +
        "are referenced above the join — elimination requires the query to " +
        "read only the declared PK (rewritten to the fact FK)")
      return None
    }

    // Composite OUTER with a used pk: refused — sound only when unmatched
    // rows cannot exist (every paired fk provably non-null; see the class
    // doc's MATCH SIMPLE discussion), and the catalog's DDL schema codec
    // reads every column back nullable, so that proof is never available
    // here. Single-column keys substitute exactly as-is.
    if (outer && usedDim.nonEmpty && pairs.size > 1) {
      RelyDiagnostics.note(m => logInfo(m), s"outer join to ${name(dimRel)} kept: " +
        "composite-key pk substitution is unsound under MATCH SIMPLE " +
        "(an unmatched row can carry a non-null fk beside a null one)")
      return None
    }
    val newUsed = used.map { e =>
      e.transform {
        case a: AttributeReference if subst.contains(a.exprId) =>
          if (e.isInstanceOf[AttributeReference])
            Alias(subst(a.exprId), a.name)(exprId = a.exprId)
          else subst(a.exprId)
      } match {
        // A bare top-level pk reference must keep its exprId as an Alias.
        case a: AttributeReference if subst.contains(a.exprId) =>
          Alias(subst(a.exprId), a.name)(exprId = a.exprId)
        case other => other
      }
    }
    // Inner equi-join drops fact rows with ANY NULL key component — preserve
    // that exactly. Outer joins preserve every fact row: no guard.
    val guards = pairs.map(_._1).filter(_.nullable)
      .distinctBy(_.exprId).map(IsNotNull(_): Expression)
    val child =
      if (!outer && guards.nonEmpty) Filter(guards.reduce(And), fact) else fact
    Some((newUsed, child))
  }
}

/**
 * Near-miss diagnostics ring for the graft optimizer rules: when a plan
 * QUALIFIES for a rewrite but a fixable condition blocks it, the rule logs
 * why (the Databricks/Oracle posture — transparent optimizations are
 * invisible when they don't fire, so the "why not" is the product surface).
 * Notes also land in a bounded ring the session can read programmatically
 * (`.recent`) — that is what the specs pin; the optimizer may re-run a rule
 * across iterations, so entries de-duplicate by message. Diagnostic-only
 * state: bounded, thread-safe, JVM-global by design (diagnostics, like
 * driver logs, are per-process), never read by any rewrite itself.
 */
class DiagnosticsRing(prefix: String) {
  private val max = 64
  private val ring = new java.util.ArrayDeque[String]
  // The lock keeps the contains-then-add dedup atomic under concurrent plan
  // compilations. Logging stays outside the lock.
  def note(log: String => Unit, msg: String): Unit = {
    val full = s"$prefix: $msg"
    log(full)
    ring.synchronized {
      if (!ring.contains(full)) {
        ring.addLast(full)
        while (ring.size > max) ring.pollFirst()
      }
    }
  }
  def recent: Seq[String] = ring.synchronized {
    import scala.jdk.CollectionConverters._
    ring.iterator().asScala.toSeq
  }
  def clear(): Unit = ring.synchronized(ring.clear())
}

/** The RELY rule's ring (see [[RelyJoinEliminationRule]]'s refusal notes). */
object RelyDiagnostics extends DiagnosticsRing("RELY elimination skipped")

/** The mview-rewrite rule's ring: today it carries the one refusal a user
  * can act on without changing the query — a matching view that is merely
  * STALE, named together with the refresh call that resumes serving. */
object MviewDiagnostics extends DiagnosticsRing("mview rewrite skipped")

/** Parsing and relation plumbing for the RELY informational constraints. */
object RelyConstraints {

  final case class ForeignKey(fkCols: Seq[String], refTable: String,
      pkCols: Seq[String])

  private val ColList = """[\w$]+(?:\s*,\s*[\w$]+)*"""
  private val FkPattern =
    s"""(?is)^\\s*($ColList)\\s+REFERENCES\\s+([\\w$$.]+)\\s*\\(\\s*($ColList)\\s*\\)\\s+RELY\\s*$$""".r
  private val PkPattern = s"""(?is)^\\s*($ColList)\\s+RELY\\s*$$""".r

  private def cols(csv: String): Seq[String] =
    csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** The declared RELY primary-key column(s) of a relation's table, if any
    * (composite keys comma-separated). Distinctness is part of the grammar:
    * a duplicated column is a malformed declaration, never trusted. */
  def primaryKeyCols(rel: DataSourceV2Relation): Option[Seq[String]] =
    Option(rel.table.properties().get("graft.primaryKey")).flatMap {
      case PkPattern(cs) =>
        val c = cols(cs)
        if (c.map(_.toLowerCase).distinct.size == c.size) Some(c) else None
      case _ => None // no RELY keyword -> documentation only, never trusted
    }

  /** All declared RELY foreign keys of a relation's table. Composite legs
    * pair positionally; mismatched arity or duplicated columns on either
    * side make the declaration malformed — dropped, never trusted. */
  def foreignKeys(rel: DataSourceV2Relation): Seq[ForeignKey] = {
    import scala.jdk.CollectionConverters._
    rel.table.properties().asScala.toSeq.collect {
      case (k, FkPattern(fk, ref, pk)) if k.startsWith("graft.foreignKey.") =>
        ForeignKey(cols(fk), ref, cols(pk))
    }.filter { f =>
      f.fkCols.size == f.pkCols.size &&
        f.fkCols.map(_.toLowerCase).distinct.size == f.fkCols.size &&
        f.pkCols.map(_.toLowerCase).distinct.size == f.pkCols.size
    }
  }

  /** The relation under an attribute-only Project, pre- or post-pushdown,
    * plus the scan's pushed V1 data filters (empty pre-pushdown). A Filter
    * (or anything else) on the dimension disqualifies: a filtered dimension
    * can legitimately drop fact rows, so the join is not a no-op.
    *
    * The post-pushdown arm must prove the scan is FULL-table, not merely
    * that no Filter node sits above it: the graft catalog FULLY handles
    * partition-key predicates ([[graft.sources.GraftScanBuilder]] returns
    * them out of the residual set), so Spark deletes the Filter node and a
    * partition-pruned dimension arrives here looking bare while its scan
    * silently drops partitions. Eliminating that join would resurrect fact
    * rows whose dimension rows were filtered away. Same guard shape as
    * [[MviewRewriteRule.baseOf]]: the scan's entry list must equal the
    * table's full manifest (entry-level pruning is the ONLY way a
    * fully-handled partition filter drops rows — spec-uniform partition
    * values live in the path, so an unpruned entry list means no row was
    * dropped by them). Pushed DATA filters are returned to the caller: they
    * stay residual too (Spark re-checks above the scan), so they are
    * harmless exactly when the residual-Filter validation says so — the
    * caller checks them against the same IsNotNull(pk) whitelist. Non-graft
    * tables are refused outright in BOTH vintages — pre-pushdown nothing is
    * pushed yet, but the stated contract (we only trust scans whose pruning
    * behavior we can prove) applies to the table, not the plan node shape.
    *
    * A dimension declaring row/column policies (B233) is refused in BOTH
    * vintages: policy enforcement happens inside the scan, invisibly to the
    * plan, so a policed dim can drop fact rows even when it looks bare. */
  def bareRelation(p: LogicalPlan)
      : Option[(DataSourceV2Relation, Array[org.apache.spark.sql.sources.Filter])] =
    p match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !policed(r) =>
        Some((r, Array.empty))
      case s: DataSourceV2ScanRelation if !policed(s.relation) =>
        (s.relation.table, s.scan) match {
          case (t: GraftTable, sc: GraftBatchScan)
              if sc.entries.size == t.manifest.entries.size =>
            Some((s.relation, sc.dataFilters))
          case _ => None
        }
      case Project(es, child) if es.forall(_.isInstanceOf[AttributeReference]) =>
        bareRelation(child)
      case _ => None
    }

  def policed(r: DataSourceV2Relation): Boolean = r.table match {
    case t: GraftTable => GraftPolicies.declared(t.manifest.props)
    case _ => false
  }

  /** Every graft relation anywhere in the fact subtree (both node vintages). */
  def factRelations(p: LogicalPlan): Seq[DataSourceV2Relation] = p.collect {
    case r: DataSourceV2Relation => Seq(r)
    case s: DataSourceV2ScanRelation => Seq(s.relation)
  }.flatten

  /** Does the FK declaration's REFERENCES target name this dimension table?
    * A qualified declaration (`ns.dim`) must resolve to an EXACT identifier:
    * either the dimension's full `namespace.name` as declared (absolute), or
    * the declaring fact table's own namespace prepended to it (relative) —
    * never a mere suffix, which would let `other.dim` also validate a
    * deeper-nested `a.other.dim` carrying its own PK RELY (the same
    * wrong-table hole the leaf-name rule closes, one level up). An
    * UNQUALIFIED declaration resolves in the declaring fact table's own
    * namespace — the dimension must live there too. Both relations must
    * also come from the same catalog: the declaration is catalog-scoped. */
  def tableMatches(dimRel: DataSourceV2Relation, factRel: DataSourceV2Relation,
                   refTable: String): Boolean = {
    val sameCatalog =
      dimRel.catalog.map(_.name()) == factRel.catalog.map(_.name())
    sameCatalog && dimRel.identifier.exists { id =>
      val dimFull = (id.namespace().toSeq :+ id.name()).map(_.toLowerCase)
      val declared = refTable.split('.').toSeq.map(_.trim.toLowerCase)
      lazy val factNs = factRel.identifier.map(
        _.namespace().toSeq.map(_.toLowerCase))
      if (declared.length > 1)
        dimFull == declared || factNs.exists(ns => dimFull == ns ++ declared)
      else declared.last.equalsIgnoreCase(id.name()) &&
        factNs.contains(id.namespace().toSeq.map(_.toLowerCase))
    }
  }
}
