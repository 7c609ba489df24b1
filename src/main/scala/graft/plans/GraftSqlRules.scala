package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{expr, lit}

import graft.etl.{GraftSnapshotTable, Snapshot, SnapshotSource}

/** Analysis-time SQL routing for catalog snapshot tables
  * ([[graft.etl.GraftCatalog]]) — the Delta pattern: the catalog's
  * `Table` object is a thin name card, and injected analyzer rules
  * turn the plans Spark builds around it into this engine's native
  * operations.
  *
  *  - [[GraftDmlRule]] (resolution batch): `UPDATE` / `MERGE INTO`
  *    statements — which DataSource V2 only supports for tables
  *    implementing the full row-level-operation write protocol —
  *    become eager commands over [[Snapshot.updateWhere]] /
  *    [[Snapshot.mergeInto]], the same manifest surgery the Scala API
  *    performs. (`DELETE FROM` needs no rule: the table's
  *    `SupportsDelete` receives the pushed filters natively.)
  *  - [[GraftReadRule]] (post-hoc): every remaining pure-read
  *    [[DataSourceV2Relation]] over a snapshot table is replaced by
  *    [[SnapshotSource.relationFor]]'s HadoopFsRelation — native
  *    vectorized parquet with manifest-stats file pruning — under the
  *    SAME output attributes, so parent operators re-bind for free.
  *    `DeleteFromTable` targets are left untouched (the v2 relation
  *    is what routes the delete to `SupportsDelete`), as are write
  *    targets (a `V2WriteCommand`'s table is a field, not a child,
  *    so the transform never reaches it).
  *
  * Predicates and assignment values cross from resolved Catalyst
  * expressions into the engine's public `Column` API via their SQL
  * form — re-parsed and re-resolved against the table's own fresh
  * read inside updateWhere/mergeInto, which keeps the commands free
  * of foreign attribute ids.
  */
object GraftSqlRules {

  /** SQL form with attribute QUALIFIERS stripped: a resolved catalog
    * column prints as `graft`.`db`.`t`.`c`, which cannot re-resolve
    * against the bare table read inside updateWhere/mergeInto — the
    * commands re-bind by column name only.
    */
  private[plans] def sqlOf(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql

  /** Top-level column name of an assignment key, or a loud error for
    * nested-field assignment (not supported on snapshot tables).
    */
  private[plans] def keyName(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      "graft UPDATE/MERGE supports top-level column assignment only, " +
        s"got: ${other.sql}")
  }
}

/** Resolution-batch rule: intercept resolved UPDATE / MERGE plans
  * whose target is a catalog snapshot table and replace them with
  * eager commands before Spark's row-level-operation machinery (which
  * the table does not implement) can reject them.
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import GraftSqlRules._

  private def graftTarget(plan: LogicalPlan): Option[GraftSnapshotTable] =
    plan match {
      case DataSourceV2Relation(t: GraftSnapshotTable, _, _, _, _, _) =>
        Some(t)
      case SubqueryAlias(_, child) => graftTarget(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftTarget(target).isDefined =>
      val t = graftTarget(target).get
      require(t.pinnedVersion.isEmpty,
        s"cannot UPDATE ${t.name()}: a time-travelled table is read-only")
      GraftUpdateCommand(t.path,
        condition.map(sqlOf),
        assignments.map(a => keyName(a.key) -> sqlOf(a.value)))

    case m @ MergeIntoTable(target, source, cond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if m.resolved && graftTarget(target).isDefined =>
      val t = graftTarget(target).get
      require(t.pinnedVersion.isEmpty,
        s"cannot MERGE into ${t.name()}: a time-travelled table is read-only")
      require(!withSchemaEvolution,
        "MERGE WITH SCHEMA EVOLUTION is not supported on snapshot tables")
      val targetAttrs = target.outputSet
      val sourceAttrs = source.outputSet

      // equi-key extraction: the ON clause must be a conjunction of
      // target.k = source.k pairs over SAME-NAMED columns — the keyed
      // contract of Snapshot.mergeInto / Upsert.merge
      def keysOf(e: Expression): Seq[String] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          keysOf(l) ++ keysOf(r)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if (targetAttrs.contains(a) && sourceAttrs.contains(b)) ||
              (targetAttrs.contains(b) && sourceAttrs.contains(a)) =>
          val (tAttr, sAttr) =
            if (targetAttrs.contains(a)) (a, b) else (b, a)
          require(spark.sessionState.analyzer.resolver(tAttr.name, sAttr.name),
            "MERGE ON must join same-named key columns " +
              s"(got ${tAttr.name} = ${sAttr.name})")
          Seq(tAttr.name)
        case other => throw new UnsupportedOperationException(
          "graft MERGE supports a conjunction of target.k = source.k " +
            s"equi-conditions only, got: ${other.sql}")
      }
      val keys = keysOf(cond)

      // full-row contract: WHEN MATCHED THEN UPDATE SET * and WHEN NOT
      // MATCHED THEN INSERT * (or their explicit spellings assigning
      // every target column from the same-named source column) — the
      // replacement row IS the source row, Upsert.merge semantics
      def fullRow(actions: Seq[MergeAction], what: String): Unit = {
        require(actions.length == 1 && actions.head.condition.isEmpty,
          s"graft MERGE needs exactly one unconditional $what action")
        val assignments = actions.head match {
          case UpdateAction(_, as, _) => as
          case InsertAction(_, as) => as
          case other => throw new UnsupportedOperationException(
            s"graft MERGE does not support ${other.getClass.getSimpleName}")
        }
        val resolver = spark.sessionState.analyzer.resolver
        val assigned = assignments.map { a =>
          val k = keyName(a.key)
          a.value match {
            case v: AttributeReference
                if sourceAttrs.contains(v) && resolver(v.name, k) => k
            case other => throw new UnsupportedOperationException(
              s"graft MERGE is full-row (SET * / INSERT *): $what must " +
                s"assign every column from the same-named source column, " +
                s"got ${a.key.sql} = ${other.sql}")
          }
        }
        val missing = target.output.map(_.name)
          .filterNot(c => assigned.exists(resolver(_, c)))
        require(missing.isEmpty,
          s"graft MERGE is full-row: $what leaves ${missing.mkString(", ")} " +
            "unassigned")
      }
      fullRow(matched, "WHEN MATCHED UPDATE")
      fullRow(notMatched, "WHEN NOT MATCHED INSERT")
      require(notMatchedBySource.isEmpty,
        "graft MERGE does not support WHEN NOT MATCHED BY SOURCE")

      GraftMergeCommand(t.path, source, keys)

    case _ => plan
  }
}

/** UPDATE graft.db.t SET c = e WHERE p → [[Snapshot.updateWhere]]. */
case class GraftUpdateCommand(path: String, condSql: Option[String],
    sets: Seq[(String, String)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Snapshot.updateWhere(spark, path,
      condSql.map(expr).getOrElse(lit(true)),
      sets.map { case (k, v) => k -> expr(v) }.toMap)
    Seq.empty
  }
}

/** MERGE INTO graft.db.t USING src ON keys → [[Snapshot.mergeInto]].
  * The source plan rides as a FIELD (not a child): it is already
  * resolved, and materializing it through a fresh Dataset at run time
  * re-enters the analyzer, so a graft-table source picks up
  * [[GraftReadRule]]'s native scan like any other read.
  */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graftbridge.PlanFrame(spark, source)
    Snapshot.mergeInto(spark, path, src, keys)
    Seq.empty
  }
}

/** Post-hoc rule: serve every remaining (pure-read) snapshot-table
  * relation through the native manifest-backed file scan. Runs after
  * the resolution batch, so DML targets are already commands; the one
  * node that must keep its v2 relation — `DeleteFromTable`, whose
  * execution path IS the v2 `SupportsDelete` — is skipped explicitly.
  *
  * One shape short-circuits the scan entirely: an ungrouped,
  * unfiltered `SELECT count(*)` / `count(col)` directly over a
  * snapshot table becomes a [[LocalRelation]] holding the answer from
  * [[GraftSnapshotTable.metadataCounts]] — the manifest's per-file
  * row/null counts, zero data files planned. The guard set (no
  * grouping, no Filter between aggregate and relation, no DISTINCT /
  * FILTER clause, no deletion vectors, every live file carrying a
  * stats envelope) keeps the rewrite exact, and any miss falls
  * through to the ordinary native scan.
  */
case class GraftReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case agg: Aggregate =>
      metadataAggregate(agg).getOrElse(agg.mapChildren(apply))
    case other => other.mapChildren(apply) match {
      case r @ DataSourceV2Relation(t: GraftSnapshotTable, output, _, _, _, _) =>
        org.apache.spark.sql.graftbridge.PlanFrame.fileRelation(
          SnapshotSource.relationFor(spark, t.path, t.pinnedVersion), output)
      case rewritten => rewritten
    }
  }

  /** `Aggregate` → manifest-answered `LocalRelation`, when provable. */
  private def metadataAggregate(agg: Aggregate): Option[LogicalPlan] = {
    if (agg.groupingExpressions.nonEmpty) return None

    // the relation must sit directly under the aggregate — alias and
    // column-pruning projections preserve cardinality and column
    // identity; anything else (Filter, Join, computed Project) doesn't
    def bare(p: LogicalPlan): Option[GraftSnapshotTable] = p match {
      case SubqueryAlias(_, c) => bare(c)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bare(c)
      case DataSourceV2Relation(t: GraftSnapshotTable, _, _, _, _, _) =>
        Some(t)
      case _ => None
    }

    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
    import graft.etl.GraftSnapshotTable._
    val reqs: Seq[Option[MetaReq]] = agg.aggregateExpressions.map {
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(l: Literal)) if l.value != null => Some(RowCount)
        case Count(Seq(a: AttributeReference)) => Some(NonNullCount(a.name))
        case Min(a: AttributeReference) => Some(ColMin(a.name, a.dataType))
        case Max(a: AttributeReference) => Some(ColMax(a.name, a.dataType))
        case _ => None
      }
      case _ => None
    }
    if (reqs.exists(_.isEmpty)) return None

    for {
      t <- bare(agg.child)
      vals <- t.metadataAnswer(reqs.flatten)
    } yield LocalRelation(agg.output,
      Seq(org.apache.spark.sql.catalyst.InternalRow.fromSeq(vals)))
  }
}
