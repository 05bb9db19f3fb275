package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL TABLE functions for the versioned-table surface, registered in
  * the session's TableFunctionRegistry (the same mechanism `range(n)`
  * rides), so a SQL-ONLY client can read, time-travel, point-probe and
  * audit a VersionedTable with zero DataFrame-API calls:
  *
  * {{{
  *   SELECT * FROM vt_read('/path/t')                    -- current
  *   SELECT * FROM vt_read('/path/t', 3)                 -- VERSION AS OF
  *   SELECT * FROM vt_read_asof('/path/t', '2026-08-15 12:00:00')
  *   SELECT * FROM vt_read_eq('/path/t', 'url_hash', 'h_42')
  *   SELECT * FROM vt_read_range('/path/t', 'k', '10', '99')
  *   SELECT * FROM vt_read_range('/path/t', 'day', '3', '4',
  *                               'k', '100', '200')       -- conjunction
  *   SELECT * FROM vt_history('/path/t')                 -- DESCRIBE HISTORY
  *   SELECT * FROM vt_detail('/path/t')                  -- DESCRIBE DETAIL
  *   SELECT * FROM vt_changes('/path/t', 2, 5)           -- CDC change feed
  *   SELECT * FROM vt_tags('/path/t')                    -- named tags
  *   SELECT * FROM vt_read('t@v1-corpus')                -- read a tag
  * }}}
  *
  * Every `'/path/t'` can instead be a graft-catalog identifier
  * (`'t'`, `'ns.t'`, `'graft.ns.t'`) — a SQL-only client that created
  * its table through `CREATE TABLE graft.t ...` never needs to learn
  * the filesystem layout ([[resolveRoot]]).
  *
  * Arguments must be foldable literals — a table function's plan is
  * built at analysis time, exactly like the version pin it encodes.
  * Each call plans against the manifest snapshot resolved AT ANALYSIS,
  * giving SQL reads the same snapshot isolation as the API. The
  * data-skipping reads (`vt_read_eq`, `vt_read_range`) keep their
  * pruned file sets: SQL users get stats/bloom/shard pruning, not a
  * full scan with a filter on top. */
object GraftTableFunctions {

  private def litString(es: Seq[Expression], i: Int, fn: String): String =
    es(i) match {
      case l: Literal if l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a non-null literal, got $other")
    }

  private def litLong(es: Seq[Expression], i: Int, fn: String): Long =
    es(i) match {
      case l: Literal if l.value != null =>
        scala.util.Try(l.value.toString.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"$fn: argument ${i + 1} must be an integer literal, " +
              s"got '${l.value}'"))
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  /** Epoch millis from either an integer literal (epoch millis) or a
    * timestamp-string literal ('yyyy-MM-dd[ HH:mm:ss[.SSS]]'), the
    * latter interpreted in the session time zone — so the scaladoc's
    * `vt_read_asof('/path/t', '2026-08-15 12:00:00')` works as
    * written. */
  private def litMillis(es: Seq[Expression], i: Int, fn: String): Long =
    es(i) match {
      case l: Literal if l.value != null =>
        val s = l.value.toString
        scala.util.Try(s.toLong).getOrElse {
          val zone = java.time.ZoneId.of(
            SparkSession.active.conf.get("spark.sql.session.timeZone"))
          val local = scala.util.Try(
            java.time.LocalDateTime.parse(s.replace(' ', 'T'))).getOrElse {
            scala.util.Try(java.time.LocalDate.parse(s).atStartOfDay())
              .getOrElse(throw new IllegalArgumentException(
                s"$fn: argument ${i + 1} must be epoch millis or a " +
                  s"'yyyy-MM-dd[ HH:mm:ss]' timestamp string, got '$s'"))
          }
          local.atZone(zone).toInstant.toEpochMilli
        }
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a non-null literal, got $other")
    }

  /** A table argument that contains '/' is a filesystem root; anything
    * else resolves through a registered [[GraftCatalog]] — the leading
    * name part when it names one, the session's current catalog when
    * that is a GraftCatalog, else the conventional `graft`. */
  private[graftbridge] def resolveRoot(spark: SparkSession, table: String): String =
    if (table.contains('/')) table
    else {
      val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.catalogManager
      val parts = table.split('.')
      val byPrefix =
        if (parts.length > 1)
          scala.util.Try(cm.catalog(parts.head)).toOption.collect {
            case g: GraftCatalog => (g, parts.tail)
          }
        else None
      val (cat, rest) = byPrefix.getOrElse {
        val g = scala.util.Try(cm.catalog("graft")).toOption.collect {
          case g: GraftCatalog => g
        }.getOrElse(throw new IllegalArgumentException(
          s"vt function: '$table' is not a path and no 'graft' catalog " +
            "is registered — pass a root path or configure the catalog"))
        (g, parts)
      }
      GraftProcedures.rootOf(cat, rest.mkString("."))
    }

  private def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.logical

  private def arity(fn: String, es: Seq[Expression], ok: Int => Boolean,
                    want: String): Unit =
    require(ok(es.size), s"$fn expects $want arguments, got ${es.size}")

  /** (name, builder) for every graft SQL table function. */
  val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "vt_read" -> { es =>
      arity("vt_read", es, n => n == 1 || n == 2, "1 or 2")
      val spark = SparkSession.active
      // `vt_read('t@v1-corpus')` pins a NAMED TAG (round 14): the
      // suffix after the last '@' resolves through the table's tag
      // pins. '@' cannot appear in a tag name or a graft identifier,
      // so the split is unambiguous for CATALOG identifiers; a plain
      // PATH argument whose last component contains '@'
      // (`vt_read('/data/run@2024')`) is ambiguous — try the tag
      // lookup first, and when the pre-'@' prefix is itself a path
      // and no such tag exists, fall back to reading the full path
      // (the pre-round-14 behavior such paths always had).
      val arg = litString(es, 0, "vt_read")
      val at = arg.lastIndexOf('@')
      val tagRead: Option[LogicalPlan] =
        if (at > 0 && es.size == 1 && !arg.substring(at + 1).contains('/')) {
          val prefix = arg.substring(0, at)
          val name = arg.substring(at + 1)
          if (prefix.contains('/')) {
            // path prefix: fall back to the plain path read ONLY on a
            // DEFINITE no-such-tag result — a tag that resolves but
            // fails to READ (damaged/vacuumed pin) must surface ITS
            // error, and a transient FS failure while LISTING the tags
            // must propagate as itself, not silently reroute a genuine
            // tag read onto the fallback path (round 16: the listing
            // is no longer wrapped in a swallow-everything Try)
            val tagged = graft.sources.VersionedTable.tags(spark,
              resolveRoot(spark, prefix)).contains(name)
            if (tagged) Some(plan(graft.sources.VersionedTable.readTag(
              spark, resolveRoot(spark, prefix), name)))
            else None
          } else Some(plan(graft.sources.VersionedTable.readTag(
            spark, resolveRoot(spark, prefix), name)))
          // catalog identifier: tag errors always surface
        } else None
      tagRead.getOrElse {
        val v = if (es.size == 2) litLong(es, 1, "vt_read") else -1L
        plan(graft.sources.VersionedTable.read(
          spark, resolveRoot(spark, arg), v))
      }
    },
    "vt_read_asof" -> { es =>
      arity("vt_read_asof", es, _ == 2, "2")
      val spark = SparkSession.active
      plan(graft.sources.VersionedTable.readAsOf(spark,
        resolveRoot(spark, litString(es, 0, "vt_read_asof")), litMillis(es, 1, "vt_read_asof")))
    },
    "vt_read_eq" -> { es =>
      arity("vt_read_eq", es, _ == 3, "3")
      val spark = SparkSession.active
      plan(graft.sources.VersionedTable.readEq(spark,
        resolveRoot(spark, litString(es, 0, "vt_read_eq")), litString(es, 1, "vt_read_eq"),
        litString(es, 2, "vt_read_eq")))
    },
    "vt_read_range" -> { es =>
      arity("vt_read_range", es, n => n >= 4 && (n - 1) % 3 == 0,
        "1 + 3·k (path, then (col, lo, hi) conjuncts)")
      val spark = SparkSession.active
      val ranges = (1 until es.size by 3).map(i => (
        litString(es, i, "vt_read_range"),
        litString(es, i + 1, "vt_read_range"),
        litString(es, i + 2, "vt_read_range")))
      plan(graft.sources.VersionedTable.readRange(spark,
        resolveRoot(spark, litString(es, 0, "vt_read_range")), ranges, -1L))
    },
    "vt_changes" -> { es =>
      // change feed between two versions (CDC on pure SQL): the
      // table's columns + `_change_type` ('insert' | 'delete'),
      // net-state semantics ([[VersionedTable.changesBetween]]). The
      // first argument is a root path OR a graft-catalog identifier
      // ('t', 'graft.ns.t') — the SQL-only client that created the
      // table through the catalog never learns its path.
      arity("vt_changes", es, _ == 3, "3 (table, from_version, to_version)")
      val spark = SparkSession.active
      plan(graft.sources.VersionedTable.changesBetween(spark,
        resolveRoot(spark, litString(es, 0, "vt_changes")),
        litLong(es, 1, "vt_changes"), litLong(es, 2, "vt_changes")))
    },
    "vt_tags" -> { es =>
      // list a table's NAMED TAGS (round 14): name + pinned version —
      // the SQL-only client's way to discover corpus-era pins before
      // reading one via vt_read('t@name') / VERSION AS OF '<name>'
      arity("vt_tags", es, _ == 1, "1")
      val spark = SparkSession.active
      val root = resolveRoot(spark, litString(es, 0, "vt_tags"))
      import spark.implicits._
      plan(graft.sources.VersionedTable.tags(spark, root).toSeq
        .sortBy(_._1).toDF("tag", "version"))
    },
    "vt_constraints" -> { es =>
      // list a table's declared CHECK constraints (round 16): name +
      // predicate — the SQL-only client's way to discover what the
      // write paths will enforce (second arg pins a version: each era
      // sees ITS constraint set, like every other table property)
      arity("vt_constraints", es, n => n == 1 || n == 2, "1 or 2")
      val spark = SparkSession.active
      val root = resolveRoot(spark, litString(es, 0, "vt_constraints"))
      val v = if (es.size == 2) litLong(es, 1, "vt_constraints") else -1L
      import spark.implicits._
      plan(graft.sources.VersionedTable.constraintsOf(spark, root, v).toSeq
        .sortBy(_._1).toDF("name", "predicate"))
    },
    "vt_history" -> { es =>
      arity("vt_history", es, _ == 1, "1")
      val spark = SparkSession.active
      plan(graft.sources.VersionedTable.describeHistory(
        SparkSession.active, resolveRoot(spark, litString(es, 0, "vt_history"))))
    },
    "vt_detail" -> { es =>
      arity("vt_detail", es, _ == 1, "1")
      val spark = SparkSession.active
      plan(graft.sources.VersionedTable.describeDetail(
        spark, resolveRoot(spark, litString(es, 0, "vt_detail"))))
    })

  /** Register all table functions on an already-built session.
    * Idempotent — already-registered names are left alone (the
    * registry logs a replacement WARN per call otherwise, and every
    * query entry point calls configure()). */
  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registry = classic.sessionState.tableFunctionRegistry
    builders.foreach { case (name, b) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id))
        registry.registerFunction(id, GraftFunctions.info(name), b)
    }
  }
}
