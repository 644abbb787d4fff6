package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.TableCatalog
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{GraftBatchScan, GraftCatalogOps, GraftPolicies, GraftTable}

/**
 * AUTOMATIC MATERIALIZED-VIEW QUERY REWRITE (B234 — the Oracle QUERY REWRITE
 * / BigQuery smart-tuning / Snowflake mview-rewrite design): a user writes
 * the NATURAL aggregate over the base table,
 *
 *   SELECT k1, k2, count(*), sum(x) FROM big GROUP BY k1, k2
 *
 * and the optimizer transparently answers it from a registered incremental
 * materialized view (B198 `create_mview`) whenever one is PROVABLY FRESH —
 * the view's fold floor (the source generation its last refresh folded to,
 * read from its own txn ledger) equals the exact generation the query's scan
 * is bound to. At 100 TB this turns the dominant reporting aggregate from a
 * full fact-table scan into a key-count-sized view read, with zero query
 * changes and zero staleness risk: one source commit past the floor and the
 * rewrite simply stops firing until the next refresh.
 *
 * A rewrite fires only when it is provably the SAME computation:
 *   - the aggregate sits on a FULL scan of the source (no partition/`_file`
 *     pruning — checked against the bound scan's own entry list), either
 *     unfiltered or under ONE Filter whose condition is a deterministic,
 *     subquery-free predicate over VIEW KEY columns — such a predicate is
 *     constant within each view group, so it selects WHOLE groups and
 *     replays exactly on the view's key columns (`GROUP BY k1 WHERE k2 = 5`
 *     from a (k1,k2) view filters the view then rolls up); any data-column
 *     predicate still refuses;
 *   - grouping is the view's declared key set (bare attributes, any order)
 *     — or a PROPER SUBSET of it, in which case the rewrite re-aggregates
 *     the view (ROLLUP: `GROUP BY k1` answered from a `(k1,k2)` view by
 *     summing the partials — exact because the view partitions the base
 *     rows) — and every aggregate expression is one the view maintains:
 *     `count(*)`/`count(1)` → `mv_count`, `sum(<declared sum col>)` →
 *     `mv_sum` (the self-maintainable abelian set — B198 deliberately
 *     maintains nothing else);
 *   - the base table declares no row/column policies (B233): the view holds
 *     UNFILTERED, UNMASKED aggregates, so serving it to a policed session
 *     would leak what the scan hides;
 *   - the view lives in the same catalog and is FRESH (fold floor == the
 *     scan's bound generation — time-travel reads of older generations
 *     therefore never match a newer view).
 *
 * The replacement preserves the Aggregate's exact output (names, exprIds,
 * types) via an aliasing Project over a manually-built scan of the view, so
 * parent operators never notice. Registered like the other graft rules —
 * extensions-injected or runtime-attached — and handles both relation
 * vintages.
 */
case class MviewRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a @ Aggregate(ges, aes, child, _) =>
      rewrite(a, ges, aes, child).getOrElse(a)
  }

  /** The base graft table + its bound scan's full-table proof + at most one
    * residual Filter, if `child` is a full scan under attribute-only
    * Projects and at most one Filter. The Filter is returned to the caller,
    * which only accepts it when its condition is a deterministic predicate
    * over VIEW KEY columns — such a predicate is constant within each view
    * group (group key values equal row values), so it selects WHOLE groups
    * and commutes with the view substitution exactly. */
  private def baseOf(child: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftTable, Option[Expression])] =
    child match {
      case r: DataSourceV2Relation =>
        r.table match { case t: GraftTable => Some((r, t, None)); case _ => None }
      case s: DataSourceV2ScanRelation =>
        (s.relation.table, s.scan) match {
          case (t: GraftTable, sc: GraftBatchScan)
              // FULL entry list only: a pruned entry list means partition
              // (or stats) pruning dropped rows the view still aggregates.
              // Pushed DATA filters are acceptable only under a residual
              // Filter that re-states them — the caller validates that the
              // residual covers every pushed column, and the view path never
              // reads this scan, so row-group skipping inside it is moot.
              if sc.entries.size == t.manifest.entries.size =>
            Some((s.relation, t, None))
          case _ => None
        }
      case Project(es, inner) if es.forall(_.isInstanceOf[AttributeReference]) =>
        baseOf(inner)
      case Filter(cond, inner) =>
        baseOf(inner).flatMap {
          // At most ONE Filter, above the Projects or directly on the scan.
          case (r, t, None) => Some((r, t, Some(cond)))
          case _ => None
        }
      case _ => None
    }

  private def rewrite(a: Aggregate, ges: Seq[Expression],
      aes: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    // Grouping: bare attributes only.
    val keyAttrs = ges.map {
      case ar: AttributeReference => ar
      case _ => return None
    }
    val (baseRel, baseTable, baseFilter) = baseOf(child).getOrElse(return None)
    if (GraftPolicies.declared(baseTable.manifest.props)) return None
    // Filter validation, part 1 (view-independent): deterministic, no
    // subqueries, bare-attribute references only. Part 2 (references ⊆ the
    // candidate view's keys) happens during candidate selection.
    baseFilter.foreach { c =>
      if (!c.deterministic) return None
      if (c.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
        return None
    }
    val filterCols: Set[String] =
      baseFilter.map(_.references.map(_.name.toLowerCase).toSet)
        .getOrElse(Set.empty)
    // A pushed data filter mirrors a residual conjunct for graft scans; any
    // pushed column outside the validated residual set refuses.
    child.collectFirst { case s: DataSourceV2ScanRelation => s }.foreach { s =>
      s.scan match {
        case sc: GraftBatchScan =>
          if (!sc.dataFilters.forall(_.references.forall(r =>
            filterCols.contains(r.toLowerCase)))) return None
        case _ =>
      }
    }

    // Aggregates: every output must be a key passthrough, count(*), or
    // sum(<col>); collect the sum column to match against the view's.
    sealed trait Out
    // KeyOut keeps the Aggregate OUTPUT's name and exprId separately from
    // the underlying key attribute: `k AS foo` must re-emit `foo` under the
    // alias's exprId or parent references to it stop resolving.
    case class KeyOut(a: AttributeReference, outName: String,
        outId: ExprId) extends Out
    case class CountOut(al: Alias) extends Out
    case class SumOut(al: Alias, col: String) extends Out
    case class AvgOut(al: Alias, col: String) extends Out
    val keyIds = keyAttrs.map(_.exprId).toSet
    val outs: Seq[Out] = aes.map {
      case ar: AttributeReference if keyIds.contains(ar.exprId) =>
        KeyOut(ar, ar.name, ar.exprId)
      case al @ Alias(ar: AttributeReference, _) if keyIds.contains(ar.exprId) =>
        KeyOut(ar, al.name, al.exprId)
      case al @ Alias(AggregateExpression(Count(cs), Complete, false, None, _), _)
          if cs.forall(c => c.foldable && c.eval() != null) => CountOut(al)
      // TRY-mode aggregates (try_sum/try_avg) answer NULL on overflow where
      // the view holds a concrete value — never the same computation.
      case al @ Alias(AggregateExpression(sm @ Sum(sa: AttributeReference, _),
          Complete, false, None, _), _) if sm.evalContext.evalMode != EvalMode.TRY =>
        SumOut(al, sa.name)
      // AVG derives exactly: avg(x) = sum(x) / count(x) — count of
      // NON-NULL x, which is the view's mv_nncount column (mv_count counts
      // all rows and diverges the moment a group holds a NULL). Both are
      // exact longs, and Spark's own Average-of-long evaluates
      // sum.toDouble / count.toDouble — the replacement reproduces that
      // expression bit-for-bit. A view predating the mv_nncount column
      // refuses the AVG rewrite (schema probe below).
      case al @ Alias(AggregateExpression(av @ Average(sa: AttributeReference, _),
          Complete, false, None, _), _)
          if av.evalMode != EvalMode.TRY &&
            Set[org.apache.spark.sql.types.DataType](
            org.apache.spark.sql.types.LongType,
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.ShortType)(sa.dataType) =>
        AvgOut(al, sa.name)
      case _ => return None
    }
    val sumCols = outs.collect {
      case SumOut(_, c) => c
      case AvgOut(_, c) => c
    }.distinct
    if (sumCols.size > 1) return None

    // A fresh view for this (source, keys, sum) in the same catalog. View
    // DECLARATIONS come from a short-TTL cache (MviewRewriteRule.viewIndex):
    // enumerating + loading every table in the namespace per qualifying
    // aggregate would make PLANNING O(catalog size). Freshness is NEVER
    // cached — each candidate's manifest is re-loaded and its fold floor
    // compared against this scan's bound generation, so a stale cache can
    // only delay noticing a NEW view (rewrite silently off for up to the
    // TTL — plans stay correct), never serve a stale one.
    val tc = baseRel.catalog.getOrElse(return None) match {
      case t: TableCatalog => t
      case _ => return None
    }
    val srcIdent = baseRel.identifier.getOrElse(return None)
    val keyNames = keyAttrs.map(_.name.toLowerCase).toSet
    // Candidates: any fresh view whose key set CONTAINS the query's keys.
    // Exact match serves as a plain projection; a PROPER superset serves via
    // ROLLUP — re-aggregating the view's finer groups is provably exact for
    // the abelian set the view maintains (count(*) = SUM(mv_count),
    // sum(x) = SUM(mv_sum), avg derives from both) because every base row
    // lands in exactly one view group. Prefer exact (no re-aggregation);
    // among rollup candidates prefer the FEWEST keys (coarsest view = fewest
    // rows to re-aggregate).
    // Declarations filter first (cached, no IO); loadTable + manifest-read
    // freshness verification is LAZY in preference order — exact key match
    // first, then rollup candidates coarsest-first — so the common
    // exact-match case pays exactly one verification however many views the
    // namespace holds.
    val declared = MviewRewriteRule.candidateViews(tc, srcIdent.namespace())
      .filter { case (_, source, keys, sum) =>
        source == srcIdent.name() && keyNames.subsetOf(keys) &&
          filterCols.subsetOf(keys) && sumCols.forall(_.equalsIgnoreCase(sum))
      }
    def verified(id: org.apache.spark.sql.connector.catalog.Identifier,
        keys: Set[String])
        : Option[(org.apache.spark.sql.connector.catalog.Identifier,
            GraftTable, Set[String])] =
      try {
        tc.loadTable(id) match {
          case v: GraftTable
              if v.manifest.props.get("mview.source").contains(srcIdent.name()) &&
                // The cached DECLARATION can be stale across a cross-process
                // drop/recreate inside the TTL: re-check keys and sum against
                // the reloaded table — a view recreated with different keys
                // would otherwise serve PARTIAL rows as final groups.
                v.manifest.props.get("mview.keys").exists(
                  _.split(',').map(_.trim.toLowerCase).toSet == keys) &&
                v.manifest.props.get("mview.sum").exists(vs =>
                  sumCols.forall(_.equalsIgnoreCase(vs))) &&
                // Never serve a view with no committed WRITE (gen 0): V2
                // CTAS registers the target table BEFORE running the seed
                // query, and the pre-seeded fold floor would make the
                // empty shell look fresh — the rule would rewrite the
                // view's own seed aggregate into a read of its empty self.
                v.manifest.gen >= 1 =>
            // FRESH: folded exactly to the generation this scan reads. The
            // stale case is THE near-miss a user can fix without touching
            // the query — name the refresh call that resumes serving.
            val floor = GraftCatalogOps.mviewFoldFloor(v.manifest)
            if (floor == baseTable.manifest.gen) Some((id, v, keys))
            else {
              MviewDiagnostics.note(m => logInfo(m),
                s"view ${id.name()} matches this aggregate but is STALE " +
                  s"(folded to source generation $floor, the scan reads " +
                  s"${baseTable.manifest.gen}) — " +
                  s"CALL graft.system.refresh_mview(name => '${id.name()}') " +
                  "to resume serving it")
              None
            }
          case _ => None
        }
      } catch { case _: Exception => None }
    val (vIdent, vTable, vKeys) =
      (declared.filter(_._3 == keyNames) ++
        declared.filterNot(_._3 == keyNames).sortBy(_._3.size))
        .iterator.flatMap { case (id, _, keys, _) => verified(id, keys) }
        .nextOption()
        .getOrElse(return None)

    // Build the view scan by hand (this rule may run after the engine's own
    // scan-planning batch, so a raw relation would never get planned).
    val vRel = DataSourceV2Relation.create(vTable, baseRel.catalog, Some(vIdent))
    val needsCount = outs.exists(_.isInstanceOf[CountOut])
    val needsAvg = outs.exists(_.isInstanceOf[AvgOut])
    val needsSum = outs.exists(o =>
      o.isInstanceOf[SumOut] || o.isInstanceOf[AvgOut])
    // AVG needs the non-null count; a view created before that column
    // existed cannot serve it.
    if (needsAvg &&
        !vTable.schema().fieldNames.exists(_.equalsIgnoreCase("mv_nncount")))
      return None
    val wanted = keyAttrs.map(_.name.toLowerCase).toSet ++ filterCols ++
      (if (needsCount) Set("mv_count") else Set.empty) ++
      (if (needsAvg) Set("mv_nncount") else Set.empty) ++
      (if (needsSum) Set("mv_sum") else Set.empty)
    val needed = StructType(
      vTable.schema().fields.filter(f => wanted.contains(f.name.toLowerCase)))
    val sb = vTable.newScanBuilder(CaseInsensitiveStringMap.empty())
    sb match {
      case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
        p.pruneColumns(needed)
      case _ =>
    }
    val scan = sb.build()
    val vOut = vRel.output.filter(a2 => needed.fieldNames.contains(a2.name))
    val vScan = DataSourceV2ScanRelation(vRel, scan, vOut)
    def vAttr(name: String): AttributeReference =
      vOut.find(_.name.equalsIgnoreCase(name)).get

    // Key-only filters commute with the view substitution: replay them on
    // the VIEW's key columns (every reference is a view key by the candidate
    // gate above).
    val vInput: LogicalPlan = baseFilter match {
      case Some(c) => Filter(c.transform {
        case ar: AttributeReference => vAttr(ar.name)
      }, vScan)
      case None => vScan
    }

    if (vKeys == keyNames) {
      // Exact key match: the view IS the aggregate — preserve the
      // Aggregate's exact output (names + exprIds) with a projection.
      val projList: Seq[NamedExpression] = outs.map {
        case KeyOut(ar, n, id) => Alias(vAttr(ar.name), n)(exprId = id)
        case CountOut(al) => Alias(vAttr("mv_count"), al.name)(exprId = al.exprId)
        case SumOut(al, _) => Alias(vAttr("mv_sum"), al.name)(exprId = al.exprId)
        case AvgOut(al, _) =>
          import org.apache.spark.sql.types.DoubleType
          // LEGACY divide: Average hardcodes failOnError=false in its own
          // evaluateExpression, so an all-NULL group (mv_nncount = 0) must
          // answer NULL here too — the conf-derived ANSI Divide would turn
          // a succeeding query into a DIVIDE_BY_ZERO failure post-rewrite.
          Alias(Divide(Cast(vAttr("mv_sum"), DoubleType),
            Cast(vAttr("mv_nncount"), DoubleType),
            NumericEvalContext(EvalMode.LEGACY,
              org.apache.spark.sql.internal.SQLConf.get.decimalOperationsAllowPrecisionLoss)),
            al.name)(exprId = al.exprId)
      }
      Some(Project(projList, vInput))
    } else {
      // ROLLUP (query keys ⊂ view keys): re-aggregate the view's finer
      // groups. Exact because the view partitions the base rows: each base
      // row contributes to exactly one (finer) view group, so summing the
      // partials over the coarser keys reproduces the coarser aggregate —
      // count(*) = SUM(mv_count) (coalesced to the non-null 0 of an empty
      // input, matching count's non-nullable output), sum(x) = SUM(mv_sum)
      // (null iff every partial is null, exactly sum's semantics), and avg
      // divides the two exact longs the way Average-of-long itself does.
      // Type gate: only the LONG-typed mv columns re-sum to the SAME result
      // type the original aggregate produced (a decimal would widen its
      // precision a second time) — B198 maintains exactly those.
      import org.apache.spark.sql.types.{DoubleType, LongType}
      if (outs.exists(_.isInstanceOf[CountOut]) &&
        vAttr("mv_count").dataType != LongType) return None
      if (outs.exists(_.isInstanceOf[AvgOut]) &&
        vAttr("mv_nncount").dataType != LongType) return None
      if (outs.exists(o => o.isInstanceOf[SumOut] || o.isInstanceOf[AvgOut]) &&
        vAttr("mv_sum").dataType != LongType) return None
      def reSum(name: String): Expression = AggregateExpression(
        Sum(vAttr(name)), Complete, isDistinct = false)
      val aggList: Seq[NamedExpression] = outs.map {
        case KeyOut(ar, n, id) => Alias(vAttr(ar.name), n)(exprId = id)
        case CountOut(al) => Alias(Coalesce(Seq(reSum("mv_count"),
          Literal(0L))), al.name)(exprId = al.exprId)
        case SumOut(al, _) => Alias(reSum("mv_sum"), al.name)(exprId = al.exprId)
        case AvgOut(al, _) => Alias(Divide(Cast(reSum("mv_sum"), DoubleType),
          Cast(reSum("mv_nncount"), DoubleType),
          NumericEvalContext(EvalMode.LEGACY,
            org.apache.spark.sql.internal.SQLConf.get.decimalOperationsAllowPrecisionLoss)),
          al.name)(exprId = al.exprId)
      }
      Some(Aggregate(keyAttrs.map(ka => vAttr(ka.name)), aggList, vInput))
    }
  }
}

object MviewRewriteRule {
  import org.apache.spark.sql.connector.catalog.Identifier

  /** (view ident, mview.source, lowercased key set, mview.sum) */
  private type Decl = (Identifier, String, Set[String], String)
  private final case class Cached(at: Long, decls: Seq[Decl])
  private val index = new java.util.concurrent.ConcurrentHashMap[String, Cached]()
  private val TtlNanos = 30L * 1000 * 1000 * 1000

  /** The namespace's materialized-view DECLARATIONS, cached for 30 s -- the
    * identity facts (source / keys / sum column) that never change after
    * CREATE. Freshness and existence are re-verified per use by the caller
    * (loadTable + fold-floor equality), so the cache bounds only how soon a
    * brand-new view starts serving, never correctness. */
  def candidateViews(tc: org.apache.spark.sql.connector.catalog.TableCatalog,
                     namespace: Array[String]): Seq[Decl] = {
    val key = tc.name() + " " + namespace.mkString(" ")
    val now = System.nanoTime()
    val hit = index.get(key)
    if (hit != null && now - hit.at < TtlNanos) return hit.decls
    val decls: Seq[Decl] =
      try {
        tc.listTables(namespace).toSeq.flatMap { id =>
          try {
            val props = tc.loadTable(id).properties()
            val src = props.get("mview.source")
            val keys = props.get("mview.keys")
            val sum = props.get("mview.sum")
            if (src == null || keys == null || sum == null) None
            else Some((id, src,
              keys.split(',').map(_.trim.toLowerCase).toSet, sum))
          } catch { case _: Exception => None }
        }
      } catch { case _: Exception => Seq.empty }
    index.put(key, Cached(now, decls))
    decls
  }

  /** Drop every cached namespace listing. Called by `create_mview` so a
    * just-created view starts serving immediately instead of after the TTL —
    * the cache bounds discovery of views created OUTSIDE this process only. */
  def invalidateCache(): Unit = index.clear()
}
