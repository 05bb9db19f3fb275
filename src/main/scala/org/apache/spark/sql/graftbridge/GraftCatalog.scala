package org.apache.spark.sql.graftbridge

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** DataSource V2 [[TableCatalog]] over VersionedTable roots — the SQL
  * WRITE surface (round 12). With
  *
  * {{{
  *   spark.sql.catalog.graft      = org.apache.spark.sql.graftbridge.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse/dir           (optional)
  *   spark.sql.extensions         = ...graftbridge.GraftExtensions
  * }}}
  *
  * a SQL-ONLY client gets the full table lifecycle with zero
  * DataFrame-API calls:
  *
  * {{{
  *   CREATE TABLE graft.t (k BIGINT, p BIGINT)         -- v1 (empty)
  *   CREATE TABLE graft.t2 AS SELECT ...               -- CTAS
  *   INSERT INTO graft.t SELECT ...                    -- OCC append
  *   INSERT OVERWRITE graft.t SELECT ...               -- OCC overwrite
  *   MERGE INTO graft.t USING s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *                  -- VersionedTable.merge
  *   UPDATE graft.t SET p = p + 1 WHERE k < 9          -- merge-on-read DVs
  *   DELETE FROM graft.t WHERE k = 7                   -- merge-on-read DVs
  *   SELECT * FROM graft.t VERSION AS OF 2             -- time travel
  *   SELECT * FROM graft.t TIMESTAMP AS OF '...'       -- as-of read
  *   DROP TABLE graft.t
  * }}}
  *
  * Every mutation lands on the EXISTING VersionedTable commit paths —
  * commit/merge/updateWhereDv/deleteWhereDv — so SQL writers get the
  * same snapshot isolation and optimistic-concurrency retry the
  * DataFrame API has ([[graft.sources.VersionedTable]]). Reads resolve
  * through [[GraftDmlRules]]' relation swap, which replaces the V2
  * relation with the SAME parquet logical plan the DataFrame API
  * builds — full Catalyst pushdown/pruning, no RDD boundary; the
  * [[V1Scan]] here is only the defensive fallback for sessions that
  * configured the catalog without the extension. A table named
  * `graft.ns.t` lives at `<root>/ns/t`; the identifier IS the layout,
  * so the catalog holds no state beyond its root — at 1000 executors
  * there is nothing to coordinate but the manifest renames the table
  * format already serializes. */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("root")).getOrElse {
      val wh = SparkSession.active.conf
        .get("spark.sql.warehouse.dir", "spark-warehouse")
      new Path(wh, "graft").toString
    }
  }

  override def name(): String = catName

  /** Table directory for an identifier: namespace levels are
    * subdirectories. */
  def tableDir(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(new Path(warehouse))((p, part) => new Path(p, part)).toString

  private def spark: SparkSession = SparkSession.active

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(new Path(warehouse))((p, n) => new Path(p, n))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isDirectory)
      .filter(st => f.exists(new Path(st.getPath, "_manifests")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.currentVersion(spark, tableDir(ident)) > 0

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(tableDir(ident), -1L, ident.toString)
  }

  /** `VERSION AS OF <v>` — a numeric manifest version, or (round 14)
    * a NAMED TAG: `SELECT * FROM graft.t VERSION AS OF 'v1-corpus'`
    * resolves through the table's tag pins
    * ([[VersionedTable.tagVersion]]), so a corpus era reads back by
    * name with zero out-of-band bookkeeping. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = tableDir(ident)
    val v = scala.util.Try(version.toLong).getOrElse(
      scala.util.Try(VersionedTable.tagVersion(spark, root, version))
        .getOrElse(throw new IllegalArgumentException(
          s"graft table version must be a number or a tag name, " +
            s"got '$version' (tags: ${VersionedTable.tags(spark, root)
              .keys.toSeq.sorted.mkString(", ")})")))
    new GraftTable(root, v, s"${ident.toString}@v$v")
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = tableDir(ident)
    val v = VersionedTable.versionAsOf(spark, root, timestamp / 1000L)
    new GraftTable(root, v, s"${ident.toString}@t$timestamp")
  }

  /** Column-based create (the analyzer's entry since DSv2 columns):
    * the default StructType conversion DROPS identity specs, so this
    * override encodes identity (`identity.start/step/
    * allowExplicitInsert` — the engine's own field-metadata keys,
    * which [[graft.sources.VersionedTable]]'s insert path reads to
    * generate values) and column DEFAULTs (CURRENT/EXISTS metadata)
    * into the manifest schema itself; generated (computed) columns
    * are rejected precisely. */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val idc = org.apache.spark.sql.catalyst.util.IdentityColumn
    val rdc = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
    val fields = columns.map { c =>
      require(c.generationExpression() == null,
        s"graft tables do not support generated (computed) columns " +
          s"(column ${c.name()})")
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.metadataInJSON()).foreach(j =>
        mb.withMetadata(org.apache.spark.sql.types.Metadata.fromJson(j)))
      Option(c.defaultValue()).foreach { d =>
        mb.putString(rdc.CURRENT_DEFAULT_COLUMN_METADATA_KEY, d.getSql)
        mb.putString(rdc.EXISTS_DEFAULT_COLUMN_METADATA_KEY, d.getSql)
      }
      Option(c.identityColumnSpec()).foreach { s =>
        mb.putLong(idc.IDENTITY_INFO_START, s.getStart)
        mb.putLong(idc.IDENTITY_INFO_STEP, s.getStep)
        mb.putBoolean(idc.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
          s.isAllowExplicitInsert)
      }
      org.apache.spark.sql.types.StructField(
        c.name(), c.dataType(), c.nullable(), mb.build())
    }
    createTable(ident, StructType(fields), partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables cluster via the 'clustering' table property or " +
        "OPTIMIZE, not static partitions")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident.toString)
    val root = tableDir(ident)
    // `clustering = 'a,b,c'` declares the table's curve-cluster layout
    // at birth: it becomes a carried manifest property, every write
    // through this catalog routes its rows through the interleave
    // sink ([[GraftWriteBuilder]]), and the cluster columns join
    // statsCols — so a SQL-created table is PRUNABLE from its first
    // inserted row, no OPTIMIZE pass needed
    val clustering = Option(properties.get("clustering")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    // dotted paths cluster/stat on NESTED struct leaves (round 13)
    clustering.foreach(c => require(
      VersionedTable.fieldAtPath(schema, c).isDefined,
      s"clustering column '$c' is not in the table schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    val statsCols = (Option(properties.get("statscols")).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty) ++ clustering).distinct
    // `upsert_keys = 'k1,k2'` declares a KEYED table (round 16): every
    // streaming epoch lands as an atomic keyed upsert — the UPDATE
    // output-mode landing shape; `autocompact = N` folds small-file
    // compaction into the streaming sink's commit loop every N epochs
    val upsertKeys = Option(properties.get("upsert_keys")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    upsertKeys.foreach(c => require(schema.fieldNames.contains(c),
      s"upsert_keys column '$c' is not in the table schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    val autoCompact = Option(properties.get("autocompact")).map { v =>
      require(scala.util.Try(v.trim.toLong).toOption.exists(_ > 0),
        s"autocompact must be a positive epoch count, got '$v'")
      v.trim
    }
    val meta = (if (clustering.isEmpty) Map.empty[String, String]
      else Map("clustering" -> clustering.mkString(",")) ++
        Option(properties.get("clustering_bits")).map("clustering_bits" -> _)) ++
      (if (upsertKeys.isEmpty) Map.empty[String, String]
       else Map("upsert_keys" -> upsertKeys.mkString(","))) ++
      autoCompact.map("autocompact" -> _)
    // v1 = an empty commit carrying the schema; CTAS's follow-up
    // INSERT is then v2, so `VERSION AS OF 1` of a CTAS table is the
    // empty pre-insert state only for plain CREATE TABLE
    VersionedTable.commit(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
      root, meta = meta, statsCols = statsCols)
    new GraftTable(root, -1L, ident.toString)
  }

  /** ALTER TABLE on the column-mapping machinery (round 12): RENAME
    * COLUMN and DROP COLUMN are metadata-only commits (the physical
    * on-disk name never changes — zero data files rewritten), ADD
    * COLUMN is a metadata-only schema append (existing files
    * NULL-backfill at read). One `ALTER TABLE` statement's changes
    * fold into ONE metadata commit ([[VersionedTable.alterColumns]]),
    * so a failing change aborts the whole statement with nothing
    * half-applied — the TableCatalog all-or-nothing contract.
    *
    * Round 13: multi-part field names address NESTED STRUCT fields by
    * path (`ALTER TABLE t RENAME COLUMN props.lang TO language`) —
    * still metadata-only; paths through maps/arrays are rejected
    * precisely by the transform's own schema walk. A path segment
    * containing a literal '.' cannot be addressed (the manifest keys
    * paths dot-joined) and is rejected here rather than silently
    * mis-resolved. Anything else is rejected precisely. */
  /** The analyzer gates `ALTER TABLE ... ADD CONSTRAINT` and column
    * DEFAULT DDL on these capabilities (round 16): CHECK constraints
    * land as table-property metadata commits every write path
    * enforces, and column defaults land as `CURRENT_DEFAULT` /
    * `EXISTS_DEFAULT` field metadata in the manifest schema — the SQL
    * INSERT path fills the current default for omitted columns and
    * the parquet scan backfills the existence default for files
    * predating the column (metadata-only, zero data rewrites). */
  override def capabilities(): util.Set[TableCatalogCapability] =
    Set(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS).asJava

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = tableDir(ident)
    // CONSTRAINT changes (round 16): their own statements, never mixed
    // with column DDL by the parser — ADD validates existing data then
    // commits the `constraint.<name>` table property; only CHECK (and
    // the NOT-NULL special case it expresses) is supported, the
    // unenforced informational kinds (PK/FK/UNIQUE) are rejected
    // precisely rather than silently recorded-but-unchecked
    val (constraintChanges, columnChanges) = changes.partition {
      case _: TableChange.AddConstraint | _: TableChange.DropConstraint => true
      case _ => false
    }
    constraintChanges.foreach {
      case a: TableChange.AddConstraint => a.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          VersionedTable.addConstraint(spark, root, c.name(), c.predicateSql())
        case other => throw new UnsupportedOperationException(
          s"graft tables enforce CHECK constraints only; " +
            s"${other.getClass.getSimpleName} is not supported " +
            "(express NOT NULL as CHECK (col IS NOT NULL))")
      }
      case d: TableChange.DropConstraint =>
        VersionedTable.dropConstraint(spark, root, d.name(),
          ifExists = d.ifExists())
      case _ => ()
    }
    if (constraintChanges.nonEmpty && columnChanges.isEmpty)
      return loadTable(ident)
    def pathOf(fieldNames: Array[String], what: String): String = {
      fieldNames.find(_.contains(".")).foreach(seg =>
        throw new IllegalArgumentException(
          s"graft ALTER TABLE $what: field name segment '$seg' contains " +
            "'.' — dotted segments collide with path keys"))
      fieldNames.mkString(".")
    }
    val transforms = changes.map {
      case r: TableChange.RenameColumn =>
        VersionedTable.renameColumnTransform(root,
          pathOf(r.fieldNames(), "RENAME COLUMN"), r.newName())
      case d: TableChange.DeleteColumn =>
        VersionedTable.dropColumnTransform(root,
          pathOf(d.fieldNames(), "DROP COLUMN"),
          ifExists = d.ifExists() == java.lang.Boolean.TRUE)
      case a: TableChange.AddColumn =>
        require(a.position() == null,
          "graft ADD COLUMN appends columns (no FIRST/AFTER positions)")
        VersionedTable.addColumnTransform(root,
          pathOf(a.fieldNames(), "ADD COLUMN"), a.dataType(),
          Option(a.defaultValue()).map(_.getSql))
      case u: TableChange.UpdateColumnDefaultValue =>
        VersionedTable.setColumnDefaultTransform(root,
          pathOf(u.fieldNames(), "ALTER COLUMN ... DEFAULT"),
          Option(u.newCurrentDefault()).map(_.getSql)
            .filter(s => s != null && s.nonEmpty))
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE does not support ${other.getClass.getSimpleName}")
    }
    VersionedTable.alterColumns(spark, root, transforms)
    loadTable(ident)
  }

  /** Maintenance procedures — `CALL graft.optimize('t', 'k')` etc.
    * ([[GraftProcedures]]). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new Path(tableDir(ident))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(dir) && f.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent.toString)
    val f = new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(new Path(tableDir(oldIdent)), new Path(tableDir(newIdent))),
      s"rename ${oldIdent.toString} -> ${newIdent.toString} failed")
  }
}

/** A VersionedTable exposed through DSv2. `pinnedVersion` is -1 for
  * the latest snapshot, or the explicit version a time-travel clause
  * resolved. Capability surface: reads normally never reach
  * [[GraftV1Scan]] (the [[GraftDmlRules]] swap runs first); writes go
  * through the [[V1Write]] fallback onto [[VersionedTable.commit]],
  * which retries manifest-rename races internally — a SQL INSERT is
  * OCC-safe by construction. */
class GraftTable(val root: String, val pinnedVersion: Long,
                 identString: String)
    extends Table with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = identString

  override lazy val schema: StructType =
    VersionedTable.tableSchema(spark, root, pinnedVersion)
      .getOrElse(VersionedTable.read(spark, root, pinnedVersion).schema)

  /** Declared CHECK constraints of this era (round 16) — reported
    * enforced: every graft write path validates them at commit. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    VersionedTable.constraintsOf(spark, root, pinnedVersion)
      .toSeq.sortBy(_._1).map { case (n, p) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(n).predicateSql(p).build()
          .asInstanceOf[org.apache.spark.sql.connector.catalog.constraints.Constraint]
      }.toArray

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new GraftV1Scan(root, pinnedVersion, schema, options)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(root, info)
}

/** The graft Scan: batch reads fall back to [[V1Scan]] (defensive —
  * sessions with the catalog but without the extension; the
  * [[GraftDmlRules]] swap is the real batch path), and STREAMING
  * reads plan through [[GraftMicroBatchStream]] (round 14), making
  * `spark.readStream.table("graft.t")` a first-class source. */
class GraftV1Scan(root: String, version: Long, tableSchema: StructType,
                  options: CaseInsensitiveStringMap =
                    CaseInsensitiveStringMap.empty())
    extends V1Scan {
  override def readSchema(): StructType = tableSchema
  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = tableSchema
      override def buildScan(): RDD[Row] =
        VersionedTable.read(context.sparkSession, root, version).rdd
    }.asInstanceOf[T]
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(version < 0,
      "streaming reads follow the LIVE table; drop the VERSION AS OF pin")
    new GraftMicroBatchStream(root, tableSchema, options)
  }
}

/** INSERT INTO → commit(append); INSERT OVERWRITE / TRUNCATE →
  * commit(overwrite). Partition-level overwrite has no meaning here
  * (no static partitions), so only the full-table filter is accepted.
  * STREAMING writes (round 15) build [[GraftStreamingWrite]]: append
  * output mode lands epoch-exactly-once append commits, complete mode
  * (the engine calls truncate() first) an overwrite commit per epoch.
  * UPDATE output mode (round 16) is accepted through the
  * [[SupportsStreamingUpdateAsAppend]] marker — the engine hands the
  * sink each epoch's changed rows, and a table declaring
  * `upsert_keys` lands them as atomic keyed upserts (DV-delete the
  * epoch's keys + append their new rows in ONE commit), so a
  * watermarked streaming aggregate converges to one row per key. */
class GraftWriteBuilder(root: String, info: LogicalWriteInfo = null)
    extends WriteBuilder with SupportsOverwrite
    with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(_.isInstanceOf[AlwaysTrue]),
      "graft tables support only full-table INSERT OVERWRITE " +
        s"(got ${filters.mkString(", ")}); use DELETE + INSERT for slices")
    overwriteAll = true
    this
  }

  override def build(): Write = new V1Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

    // a declared clustered layout asks the ENGINE for an ordered
    // (range) distribution on the top-level cluster columns — for a
    // STREAMING write this is what makes each epoch's files
    // key-disjoint and prunable at birth (the writers can't reshuffle
    // themselves); a batch insert still routes through clusterLayout's
    // interleave curve below (the engine's pre-sort costs one extra
    // exchange on clustered batch writes, the price of sharing one
    // Write surface — non-clustered tables are untouched). Nested
    // cluster paths aren't addressable as connector expressions and
    // keep relying on clusterLayout alone.
    private val distCols: Seq[String] =
      if (info == null) Nil
      else VersionedTable.manifestMeta(SparkSession.active, root)
        .get("clustering").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        .filter(c => info.schema().fieldNames.contains(c))

    private def sortOrders
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
      import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
      distCols.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
    }

    override def requiredDistribution()
        : org.apache.spark.sql.connector.distributions.Distribution = {
      import org.apache.spark.sql.connector.{distributions => D}
      if (distCols.isEmpty) D.Distributions.unspecified()
      else D.Distributions.ordered(sortOrders)
    }

    override def requiredOrdering()
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      if (distCols.isEmpty) Array.empty else sortOrders

    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(info != null, "streaming write needs LogicalWriteInfo")
      new GraftStreamingWrite(root, info.schema(), info.queryId(),
        overwriteEachEpoch = overwriteAll)
    }
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: Dataset[Row], overwrite: Boolean): Unit = {
          val mode = if (overwriteAll || overwrite) "overwrite" else "append"
          val spark = data.sparkSession
          // a declared `clustering` layout shapes EVERY catalog write:
          // rows route through the interleave sink so the commit's
          // files are key-disjoint and stats-prunable at birth (the
          // per-commit analogue of OPTIMIZE; nFiles follows the
          // session's shuffle parallelism, the scale-out knob)
          val meta = VersionedTable.manifestMeta(spark, root)
          val clusterCols = meta.get("clustering").toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          val shaped =
            if (clusterCols.nonEmpty && clusterCols.forall(c =>
                VersionedTable.fieldAtPath(data.schema, c).isDefined)) {
              val bits = meta.get("clustering_bits").map(_.toInt).getOrElse(8)
              val nFiles = spark.conf.get("spark.sql.shuffle.partitions").toInt
              VersionedTable.clusterLayout(data.toDF(), clusterCols, bits, nFiles)
            } else data.toDF()
          VersionedTable.commit(shaped, root, mode = mode)
        }
      }
  }
}
