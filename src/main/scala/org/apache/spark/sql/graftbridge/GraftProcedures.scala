package org.apache.spark.sql.graftbridge

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.VersionedTable

/** DSv2 stored procedures (Spark 4.1's public `ProcedureCatalog` /
  * `CALL` surface) exposing the VersionedTable MAINTENANCE operations
  * to SQL-only clients — the last toolbox the DataFrame API had to
  * itself:
  *
  * {{{
  *   CALL graft.optimize('t', 'k,day')        -- cluster-rewrite + stats
  *   CALL graft.compact_small('t')            -- fold the append frontier
  *   CALL graft.vacuum('t', 3)                -- GC unreferenced files
  *   CALL graft.restore('t', 5)               -- roll back as a NEW commit
  *   CALL graft.shard_manifest('t', 4096)     -- two-level manifest
  *   CALL graft.clone('src', 'dst')            -- shallow clone (v pin ok)
  *   CALL graft.materialize('dst')             -- self-contain a clone
  *   CALL graft.materialize('dst', true)       -- + localize ALL history
  *   CALL graft.tag('t', 'v1-corpus', 12)      -- pin an era by name
  *   CALL graft.drop_tag('t', 'v1-corpus')     -- release the pin
  * }}}
  *
  * Each lands on the EXISTING VersionedTable path (optimize /
  * compactSmall / vacuum / restore / shardManifest) with the same OCC
  * retry SQL writers already get, and returns its result as a
  * one-row relation ([[LocalScan]] — `CALL` surfaces it like a
  * query). The table argument is the catalog-relative identifier
  * (`'t'`, `'ns.t'`); an absolute `/path` is accepted too, so a
  * procedure can service roots created through the DataFrame API. */
object GraftProcedures {

  private val names =
    Seq("optimize", "compact_small", "vacuum", "restore", "shard_manifest",
      "clone", "materialize", "tag", "drop_tag")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) names.map(Identifier.of(Array.empty[String], _)).toArray
    else Array.empty

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty,
      s"no procedure namespace ${ident.namespace().mkString(".")} in graft")
    val name = ident.name().toLowerCase(java.util.Locale.ROOT)
    require(names.contains(name),
      s"unknown graft procedure '${ident.name()}' (have ${names.mkString(", ")})")
    new GraftProcedure(catalog, name)
  }

  private[graftbridge] def rootOf(catalog: GraftCatalog, table: String): String =
    if (table.contains('/')) table
    else {
      val parts = table.split('.')
      catalog.tableDir(Identifier.of(parts.init, parts.last))
    }
}

private class GraftProcedure(catalog: GraftCatalog, procName: String)
    extends UnboundProcedure with BoundProcedure {

  import ProcedureParameter.in

  override def name(): String = procName

  override def description(): String = s"graft table maintenance: $procName"

  override def bind(inputType: StructType): BoundProcedure = this

  // side-effecting by design — never constant-folded or re-run by a
  // planner that assumes purity
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = procName match {
    case "optimize" => Array(
      in("table", StringType).build(),
      in("cluster_cols", StringType)
        .comment("comma-separated cluster columns").build(),
      in("bits", IntegerType).defaultValue("8").build(),
      in("n_files", IntegerType).defaultValue("64").build())
    case "compact_small" => Array(
      in("table", StringType).build(),
      in("target_bytes", LongType)
        .defaultValue((128L * 1024 * 1024).toString).build(),
      in("min_bytes", LongType)
        .defaultValue((32L * 1024 * 1024).toString).build())
    case "vacuum" => Array(
      in("table", StringType).build(),
      in("retain_versions", IntegerType).defaultValue("1").build(),
      in("grace_ms", LongType).defaultValue((10L * 60 * 1000).toString).build())
    case "restore" => Array(
      in("table", StringType).build(),
      in("version", LongType).build())
    case "shard_manifest" => Array(
      in("table", StringType).build(),
      in("files_per_shard", IntegerType).defaultValue("4096").build())
    case "clone" => Array(
      in("source", StringType).build(),
      in("target", StringType).build(),
      in("version", LongType).defaultValue("-1").build())
    case "materialize" => Array(
      in("table", StringType).build(),
      in("all_retained", BooleanType).defaultValue("false")
        .comment("localize EVERY retained manifest, not just current")
        .build())
    case "tag" => Array(
      in("table", StringType).build(),
      in("name", StringType).build(),
      in("version", LongType).defaultValue("-1").build())
    case "drop_tag" => Array(
      in("table", StringType).build(),
      in("name", StringType).build())
  }

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val spark = SparkSession.active
    val root = GraftProcedures.rootOf(catalog, input.getUTF8String(0).toString)
    val (schema, row): (StructType, Array[Any]) = procName match {
      case "optimize" =>
        val cols = input.getUTF8String(1).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val v = VersionedTable.optimize(spark, root, cols,
          bits = input.getInt(2), nFiles = input.getInt(3))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "compact_small" =>
        val v = VersionedTable.compactSmall(spark, root,
          targetFileBytes = input.getLong(1), minFileBytes = input.getLong(2))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "vacuum" =>
        val n = VersionedTable.vacuum(spark, root,
          retainVersions = input.getInt(1), graceMs = input.getLong(2))
        (StructType(Seq(StructField("deleted_files", IntegerType))),
          Array[Any](n))
      case "restore" =>
        val v = VersionedTable.restore(spark, root, input.getLong(1))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "shard_manifest" =>
        val v = VersionedTable.shardManifest(spark, root,
          targetFilesPerShard = input.getInt(1))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "clone" =>
        val dst = GraftProcedures.rootOf(catalog,
          input.getUTF8String(1).toString)
        val v = VersionedTable.clone(spark, root, dst,
          version = input.getLong(2))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "materialize" =>
        val v = VersionedTable.materialize(spark, root,
          allRetained = input.getBoolean(1))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "tag" =>
        val v = VersionedTable.tag(spark, root,
          input.getUTF8String(1).toString, version = input.getLong(2))
        (StructType(Seq(StructField("version", LongType))), Array[Any](v))
      case "drop_tag" =>
        val existed = VersionedTable.dropTag(spark, root,
          input.getUTF8String(1).toString)
        (StructType(Seq(StructField("dropped", BooleanType))),
          Array[Any](existed))
    }
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(row))
    }
    Collections.singletonList(scan).iterator()
  }
}
