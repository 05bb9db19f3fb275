package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.VersionedTable

/** Resolution rule wiring [[GraftCatalog]] tables into Catalyst — the
  * round-12 SQL WRITE surface. Two jobs, one top-down pass:
  *
  *  1. **DML interception.** Fully-resolved `DELETE FROM` / `UPDATE` /
  *     `MERGE INTO` over a graft table become runnable commands on the
  *     EXISTING VersionedTable mutation paths (`deleteWhereDv`,
  *     `updateWhereDv`, `merge`) — each already carrying snapshot
  *     isolation + optimistic-concurrency retry. Spark's own
  *     `RewriteUpdateTable`/`RewriteMergeIntoTable` leave tables
  *     without `SupportsRowLevelOperations` untouched, so this rule
  *     (running at the end of the same Resolution batch) sees the
  *     resolved nodes before the planner would reject them.
  *  2. **Relation swap.** Every remaining graft V2 relation (reads,
  *     incl. `VERSION AS OF` pins) is replaced by the SAME logical
  *     plan the DataFrame API builds — an explicit-file parquet scan
  *     plus the era's deletion-vector anti-join — aliased back onto
  *     the relation's original `exprId`s so parent references bind
  *     unchanged. SQL readers get full parquet
  *     pushdown/pruning/codegen; no RDD boundary, no V1 fallback.
  *
  * Write targets (`INSERT INTO` = `AppendData`, etc.) keep their
  * relation — the V1Write fallback in [[GraftCatalog]] handles those —
  * so the recursion steps over a [[V2WriteCommand]]'s table child and
  * rewrites only its query. */
case class GraftDmlRules(session: SparkSession) extends Rule[LogicalPlan] {

  // the rule runs on every analyzer fixed-point iteration of every
  // query — an allocation-free scan decides whether this plan holds
  // any graft work at all before the rewriting walk touches it
  private def isGraftRelation(p: LogicalPlan): Boolean = p.exists {
    case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
    case _ => false
  }

  private def hasGraftWork(p: LogicalPlan): Boolean =
    p.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
      case d: DeleteFromTable => graftRel(d.table).isDefined
      case u: UpdateTable => graftRel(u.table).isDefined
      case m: MergeIntoTable => graftRel(m.targetTable).isDefined
      // a V2 write command's `table` is a FIELD, not a plan child —
      // plan.exists never descends into it (found the hard way:
      // OverwritePartitionsDynamic over a graft table read as
      // "no graft work" and sailed into the capability check)
      case w: V2WriteCommand => isGraftRelation(w.table)
      case n if n.containsPattern(
          org.apache.spark.sql.catalyst.trees.TreePattern.PLAN_EXPRESSION) =>
        n.expressions.exists(_.exists {
          case s: SubqueryExpression => hasGraftWork(s.plan)
          case _ => false
        })
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (hasGraftWork(plan)) rewrite(plan) else plan

  private def graftRel(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    p match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some((r, t))
        case _ => None
      }
      case SubqueryAlias(_, child) => graftRel(child)
      case _ => None
    }

  private def unsupported(what: String, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft SQL $what: $why")

  /** Executable SQL text for a resolved expression over the table's
    * own columns: qualifiers stripped (the mutation paths evaluate
    * the text against the bare table scan), subqueries rejected with
    * a usable message instead of silently mis-rendering. */
  private def toSql(e: Expression, what: String): String = {
    e.foreach {
      case _: SubqueryExpression =>
        unsupported(what, "subqueries in the condition are not supported " +
          "on graft tables; materialize the subquery into the condition")
      case _ => ()
    }
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** The attribute under the analyzer's implicit widening casts —
    * `ON t.k = s.k` arrives as `t.k = CAST(s.k AS BIGINT)` when the
    * source column is narrower. */
  private def stripCast(e: Expression): Expression = e match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast => stripCast(c.child)
    case x => x
  }

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {

    case d @ DeleteFromTable(target, cond)
        if d.resolved && graftRel(target).isDefined =>
      val (_, t) = graftRel(target).get
      GraftDeleteCommand(t.root, toSql(cond, "DELETE"))

    case u @ UpdateTable(target, assignments, cond)
        if u.resolved && graftRel(target).isDefined =>
      val (_, t) = graftRel(target).get
      val set = assignments.flatMap { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => unsupported("UPDATE",
            s"only top-level columns can be SET, got ${other.sql}")
        }
        a.value match {
          // identity assignments from Spark's alignment pass carry no
          // information — dropping them keeps the DV commit minimal
          case v: AttributeReference if v.name == name => None
          case v => Some(name -> toSql(v, "UPDATE"))
        }
      }.toMap
      if (set.isEmpty) GraftNoopCommand()
      else GraftUpdateCommand(t.root, set,
        toSql(cond.getOrElse(Literal.TrueLiteral), "UPDATE"))

    case m: MergeIntoTable if m.resolved && graftRel(m.targetTable).isDefined =>
      rewriteMerge(m)

    // a STILL-RESOLVING DML node must be left whole: recursing now
    // would swap its target relation before the node resolves, and a
    // Project target no longer matches the conversions above (found
    // the hard way — star-action MERGE resolves over two analyzer
    // iterations)
    case dml @ (_: DeleteFromTable | _: UpdateTable | _: MergeIntoTable)
        if !dml.resolved => dml

    // ALTER TABLE ... ADD CONSTRAINT (round 16): the command's child
    // IS the table relation — the session-catalog resolver re-extracts
    // it to build the AlterTable change, so the read swap must leave
    // the node whole (the constraint predicate is only ANALYZED
    // against it, never executed through it)
    case acc: AddCheckConstraint => acc

    // resolved DML over someone ELSE's table: only the merge source
    // can hold graft reads
    case m: MergeIntoTable => m.copy(sourceTable = rewrite(m.sourceTable))
    case d: DeleteFromTable => d
    case u: UpdateTable => u

    // a partitionOverwriteMode=dynamic session plans INSERT OVERWRITE
    // as OverwritePartitionsDynamic, whose exec has no V1 fallback
    // (it needs a real BatchWrite) — but a graft table has no static
    // partitions, so dynamic overwrite IS a full overwrite: route it
    // straight onto commit(overwrite)
    case o: OverwritePartitionsDynamic
        if o.table.collectFirst {
          case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
        }.isDefined =>
      val t = o.table.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      }.get
      GraftInsertCommand(t.root, rewrite(o.query), overwrite = true)

    // INSERT INTO / INSERT OVERWRITE / CTAS-append: the write target
    // stays a V2 relation (V1Write fallback), only the query side is
    // rewritten
    case w: V2WriteCommand => w.withNewQuery(rewrite(w.query))
    case i: InsertIntoStatement => i.copy(query = rewrite(i.query))

    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      swapRead(r)

    case other =>
      val withChildren = other.mapChildren(rewrite)
      // scalar/EXISTS subqueries can hold graft reads too (q65f's
      // `(SELECT count(*) FROM graft.t VERSION AS OF 1)`)
      withChildren.mapExpressions(_.transform {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      })
  }

  private def swapRead(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftTable]
    val readPlan = VersionedTable.read(session, t.root, t.pinnedVersion)
      .queryExecution.analyzed
    val byName = readPlan.output.map(a => a.name -> a).toMap
    val projections = r.output.map { old =>
      val src = byName.getOrElse(old.name, sys.error(
        s"graft table ${t.name()} lost column ${old.name} between " +
          "resolution and swap — concurrent schema change?"))
      Alias(src, old.name)(exprId = old.exprId, qualifier = old.qualifier)
    }
    Project(projections, readPlan)
  }

  /** MERGE lowering (extended in round 15 to the CDC-APPLY and
    * FULL-SYNC shapes).
    * Supported: `ON` equality of same-named columns; any ordered mix of
    * `WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE`; any
    * ordered `WHEN NOT MATCHED [AND cond] THEN INSERT ...` — conditions
    * and assignment values must be SOURCE-side expressions (the CDC
    * idiom: `WHEN MATCHED AND s._change_type = 'delete' THEN DELETE`);
    * and `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... |
    * DELETE` — TARGET-side expressions (the full-sync idiom: BY SOURCE
    * DELETE makes the target mirror the source). First-match-wins
    * clause order per family. The classic unconditional
    * `UPDATE SET * + INSERT *` upsert keeps its dedicated
    * [[VersionedTable.merge]] wholesale-replacement path; every richer
    * accepted shape lowers onto [[VersionedTable.mergeApply]]'s
    * conditional copy-on-write. Still rejected precisely: non-equality
    * ON terms, side-crossing conditions or assignment values,
    * nested-field assignments. */
  private def rewriteMerge(m: MergeIntoTable): LogicalPlan = {
    val (_, t) = graftRel(m.targetTable).get
    def bad(why: String): Nothing = unsupported("MERGE",
      s"$why (supported: ON same-named column equality; WHEN MATCHED " +
        "[AND source-side cond] THEN UPDATE SET ... | DELETE; " +
        "WHEN NOT MATCHED [AND source-side cond] THEN INSERT ...; " +
        "WHEN NOT MATCHED BY SOURCE [AND target-side cond] THEN " +
        "UPDATE SET ... | DELETE)")
    val targetSet = m.targetTable.outputSet
    val sourceSet = m.sourceTable.outputSet
    // ON splits into EQUALITY KEY terms (the join) and — round 16 —
    // TARGET-SIDE RESIDUAL terms (`ON t.k = s.k AND t.ds = '2024-01'`,
    // the common shape against a partitioned/clustered table): a
    // residual narrows what counts as MATCHED (a pred-false target
    // row is unmatched — BY SOURCE clauses see it, and a source row
    // matching only pred-false rows inserts) and prunes the
    // copy-on-write file set (only files holding pred-true matches
    // rewrite; the predicate reaches the parquet scan). Side-CROSSING
    // non-equality terms stay rejected precisely.
    val (eqTerms, residualTerms) =
      splitConjuncts(m.mergeCondition).partition {
        case EqualTo(le, re) => (stripCast(le), stripCast(re)) match {
          case (a: AttributeReference, b: AttributeReference) =>
            (targetSet.contains(a) && sourceSet.contains(b)) ||
              (targetSet.contains(b) && sourceSet.contains(a))
          case _ => false
        }
        case _ => false
      }
    val keyPairs = eqTerms.map {
      case EqualTo(le, re) => (stripCast(le), stripCast(re)) match {
        case (a: AttributeReference, b: AttributeReference) =>
          val (tc, sc) =
            if (targetSet.contains(a) && sourceSet.contains(b)) (a, b)
            else (b, a)
          if (!tc.name.equalsIgnoreCase(sc.name))
            bad(s"ON term compares differently-named columns " +
              s"${tc.name} and ${sc.name}")
          (tc.name, sc)
        case _ => bad("unreachable: eqTerms filtered to attribute equality")
      }
      case _ => bad("unreachable: eqTerms are equalities")
    }
    if (keyPairs.isEmpty)
      bad("ON must contain at least one target-to-source column equality")
    residualTerms.foreach { term =>
      if (term.references.exists(sourceSet.contains))
        bad(s"ON term ${term.sql} mixes source columns into a " +
          "non-equality predicate; only target-side residual " +
          "predicates are supported alongside the key equalities")
    }
    val targetCond: Option[String] =
      if (residualTerms.isEmpty) None
      else Some(residualTerms.map(t =>
        s"(${toSql(t, "MERGE ON predicate")})").mkString(" AND "))
    val keys = keyPairs.map(_._1)
    val targetCols = m.targetTable.output.map(_.name)

    def srcOnly(e: Expression, what: String): Expression = {
      e.foreach {
        case _: SubqueryExpression =>
          bad(s"$what holds a subquery; materialize it into the source")
        case _ => ()
      }
      if (e.references.exists(targetSet.contains))
        bad(s"$what references target columns; only source-side " +
          "expressions are supported")
      e
    }
    def colName(a: Assignment, label: String): String = a.key match {
      case ar: AttributeReference => ar.name
      case other => bad(s"WHEN $label assigns a nested field ${other.sql}")
    }
    // identity entries from Spark's alignment pass (target col = its
    // own attribute) mean "keep" — they drop here, and mergeApply's
    // per-column default keeps the target value
    def updateSet(u: UpdateAction): Seq[(String, Expression)] =
      u.assignments.flatMap { a =>
        val name = colName(a, "MATCHED")
        a.value match {
          case v: AttributeReference
              if targetSet.contains(v) && v.name == name => None
          case v => Some(name -> srcOnly(v, s"UPDATE assignment to $name"))
        }
      }
    def insertSet(i: InsertAction): Seq[(String, Expression)] =
      i.assignments.map { a =>
        val name = colName(a, "NOT MATCHED")
        name -> srcOnly(a.value, s"INSERT assignment to $name")
      }

    // ── fast path: the classic unconditional upsert ────────────────
    // one unconditional UPDATE + one unconditional INSERT assigning
    // every target column the SAME source-side expression (what
    // `UPDATE SET * / INSERT *` aligns to) — wholesale replacement on
    // [[VersionedTable.merge]], exactly as before round 15
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(u: UpdateAction), Seq(i: InsertAction))
          if u.condition.isEmpty && i.condition.isEmpty &&
            m.notMatchedBySourceActions.isEmpty && targetCond.isEmpty =>
        val up = u.assignments.map(a => colName(a, "MATCHED") -> a.value).toMap
        val ins = i.assignments.map(a => colName(a, "NOT MATCHED") -> a.value).toMap
        val wholesale = targetCols.forall(c =>
          up.get(c).zip(ins.get(c)).exists { case (ue, ie) =>
            ue.semanticEquals(ie) && !ue.references.exists(targetSet.contains)
          })
        if (wholesale) {
          val proj = Project(
            targetCols.map(c => Alias(up(c), c)()), m.sourceTable)
          return GraftMergeCommand(t.root, keys, proj)
        }
      case _ => ()
    }

    // ── general path: conditional clauses onto mergeApply ──────────
    val matchedSpecs: Seq[(Option[Expression], Option[Seq[(String, Expression)]])] =
      m.matchedActions.map {
        case d: DeleteAction =>
          (d.condition.map(srcOnly(_, "WHEN MATCHED DELETE condition")), None)
        case u: UpdateAction =>
          (u.condition.map(srcOnly(_, "WHEN MATCHED UPDATE condition")),
            Some(updateSet(u)))
        case other => bad(
          s"unsupported WHEN MATCHED action ${other.getClass.getSimpleName}")
      }
    val insertSpecs: Seq[(Option[Expression], Seq[(String, Expression)])] =
      m.notMatchedActions.map {
        case i: InsertAction =>
          (i.condition.map(srcOnly(_, "WHEN NOT MATCHED condition")),
            insertSet(i))
        case other => bad(
          s"unsupported WHEN NOT MATCHED action ${other.getClass.getSimpleName}")
      }
    // BY SOURCE clauses see only the TARGET row — rendered to SQL over
    // the target's bare column names (the GraftUpdateCommand recipe;
    // mergeApply evaluates them against its own fresh scan)
    def tgtOnlySql(e: Expression, what: String): String = {
      if (e.references.exists(sourceSet.contains))
        bad(s"$what references source columns; WHEN NOT MATCHED BY " +
          "SOURCE sees only the target row")
      toSql(e, what)
    }
    val bySourceSpecs: Seq[(Option[String], Option[Seq[(String, String)]])] =
      m.notMatchedBySourceActions.map {
        case d: DeleteAction =>
          (d.condition.map(tgtOnlySql(_, "WHEN NOT MATCHED BY SOURCE " +
            "DELETE condition")), None)
        case u: UpdateAction =>
          val set = u.assignments.flatMap { a =>
            val name = colName(a, "NOT MATCHED BY SOURCE")
            a.value match {
              case v: AttributeReference
                  if targetSet.contains(v) && v.name == name => None
              case v => Some(name -> tgtOnlySql(v,
                s"BY SOURCE assignment to $name"))
            }
          }
          (u.condition.map(tgtOnlySql(_, "WHEN NOT MATCHED BY SOURCE " +
            "UPDATE condition")), Some(set))
        case other => bad(s"unsupported WHEN NOT MATCHED BY SOURCE " +
          s"action ${other.getClass.getSimpleName}")
      }
    // first-match-wins, encoded per source row BEFORE the join (the
    // conditions are source-side by construction)
    def firstIdx(conds: Seq[Option[Expression]]): Expression =
      conds.zipWithIndex.foldRight(Literal(-1): Expression) {
        case ((c, i), rest) =>
          c.map(org.apache.spark.sql.catalyst.expressions.If(
            _, Literal(i), rest)).getOrElse(Literal(i))
      }
    val projCols: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression] =
      keyPairs.map { case (name, attr) => Alias(attr, name)() } ++
        Seq(Alias(firstIdx(matchedSpecs.map(_._1)), "__act")(),
          Alias(firstIdx(insertSpecs.map(_._1)), "__iact")()) ++
        matchedSpecs.zipWithIndex.flatMap {
          case ((_, Some(set)), i) =>
            set.map { case (c, e) => Alias(e, s"__u${i}__$c")() }
          case _ => Nil
        } ++
        insertSpecs.zipWithIndex.flatMap { case ((_, set), j) =>
          set.map { case (c, e) => Alias(e, s"__i${j}__$c")() }
        }
    GraftMergeApplyCommand(t.root, keys,
      matchedSpecs.map(_._2.map(_.map(_._1))),
      insertSpecs.map(_._2.map(_._1)),
      bySourceSpecs,
      Project(projCols, m.sourceTable),
      targetCond)
  }
}

/** DELETE FROM graft.t WHERE ... → merge-on-read deletion vectors. */
case class GraftDeleteCommand(root: String, predicate: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.deleteWhereDv(spark, root, predicate)
    Seq.empty
  }
}

/** UPDATE graft.t SET ... WHERE ... → merge-on-read update (DV +
  * appended rows, no data-file rewrite). */
case class GraftUpdateCommand(root: String, set: Map[String, String],
                              predicate: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.updateWhereDv(spark, root, predicate, set)
    Seq.empty
  }
}

/** UPDATE whose only assignments were identities — nothing to write;
  * the table version intentionally does not advance. */
case class GraftNoopCommand() extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = Seq.empty
}

/** INSERT (OVERWRITE) routed around a write exec that has no V1
  * fallback — lands on [[VersionedTable.commit]] like every other
  * insert. */
case class GraftInsertCommand(root: String, source: LogicalPlan,
                              overwrite: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val df = org.apache.spark.sql.classic.Dataset.ofRows(classic, source)
    VersionedTable.commit(df, root,
      mode = if (overwrite) "overwrite" else "append")
    Seq.empty
  }
}

/** MERGE INTO graft.t → [[VersionedTable.merge]] (copy-on-write upsert
  * rewriting only key-holding files, OCC retry built in). */
case class GraftMergeCommand(root: String, keys: Seq[String],
                             source: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val updates = org.apache.spark.sql.classic.Dataset.ofRows(classic, source)
    VersionedTable.merge(updates, root, keys)
    Seq.empty
  }
}

/** Conditional MERGE (round 15) → [[VersionedTable.mergeApply]]:
  * `source` is the pre-shaped projection (keys, `__act`/`__iact`
  * first-match clause indexes, per-clause assigned values) built by
  * [[GraftDmlRules.rewriteMerge]]; re-analysis at run time swaps any
  * graft reads inside it. */
case class GraftMergeApplyCommand(root: String, keys: Seq[String],
                                  matched: Seq[Option[Seq[String]]],
                                  notMatched: Seq[Seq[String]],
                                  bySource: Seq[(Option[String], Option[Seq[(String, String)]])],
                                  source: LogicalPlan,
                                  targetCond: Option[String] = None)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val prep = org.apache.spark.sql.classic.Dataset.ofRows(classic, source)
    VersionedTable.mergeApply(prep, root, keys, matched, notMatched, bySource,
      targetCond = targetCond)
    Seq.empty
  }
}
