package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 [[TableCatalog]] over a directory tree of snapshot-log
  * tables — the full SQL DDL/DML surface without a metastore:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse
  *
  *   CREATE NAMESPACE graft.gold
  *   CREATE TABLE graft.gold.events (day DATE, k BIGINT, v STRING)
  *     PARTITIONED BY (day)
  *   INSERT INTO graft.gold.events SELECT ...
  *   INSERT OVERWRITE graft.gold.events SELECT ...
  *   CREATE TABLE graft.gold.top AS SELECT ...          -- CTAS
  *   SELECT * FROM graft.gold.events VERSION AS OF 3
  *   SELECT * FROM graft.gold.events TIMESTAMP AS OF '...'
  *   SHOW TABLES IN graft.gold / DROP TABLE / ALTER ... RENAME
  * }}}
  *
  * Layout is self-describing: `<root>/<ns...>/<table>` IS the snapshot
  * log directory — a namespace is a plain directory, a table is a
  * directory with committed versions, and the MANIFEST is the catalog
  * entry (schema, partition columns, CHECK constraints, stats all live
  * in commit headers already). Nothing here adds driver state, so a
  * thousand concurrent writers coordinate exactly as the commit
  * protocol does ([[SnapshotLog.commitFiles]] claim/rebase) — the
  * catalog is a NAMING layer, not a lock service.
  *
  * Writes route through [[V1Write]]/[[InsertableRelation]] — the
  * supported v2 fallback that hands the committed plan back as a
  * driver-side DataFrame, which is exactly the shape the library's
  * commit verbs want (CHECK validation, schema merge, partition
  * purity, DV carry, race rebase). INSERT INTO appends WITHOUT a
  * `#batch=` header ([[SnapshotLog.append]]); INSERT OVERWRITE
  * replaces, re-declaring the table's partition layout via
  * [[SnapshotLog.commitPartitioned]] when one exists. Time-traveled
  * relations are read-only. alterTable is refused loudly: schema
  * changes ride data commits (the log's schema-merge rules), not
  * metadata edits. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null && r.nonEmpty,
      s"GraftCatalog '$name' needs spark.sql.catalog.$name.root=<dir>")
    root = r.stripSuffix("/")
  }
  override def name(): String = catalogName

  /** Constraint DDL (`ALTER TABLE ... ADD CONSTRAINT ... CHECK`) rides
    * the manifest's `#check=` headers; column DEFAULT values
    * (`CREATE TABLE (c INT DEFAULT 5)` / `ADD COLUMN ... DEFAULT` /
    * `ALTER COLUMN ... SET DEFAULT`) ride the `#schema=` header's field
    * metadata — Spark's analyzer fills omitted INSERT columns from
    * CURRENT_DEFAULT, and every scan fills file-missing columns from
    * the frozen EXISTS_DEFAULT. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
  private def nsPath(ns: Seq[String]): Path =
    new Path((root +: ns).mkString("/"))
  private def dirOf(ident: Identifier): String =
    ((root +: ident.namespace().toSeq) :+ ident.name()).mkString("/")
  private def isTable(dir: String): Boolean =
    SnapshotLog.versions(spark, dir).nonEmpty

  // ---- tables -----------------------------------------------------------

  override def tableExists(ident: Identifier): Boolean =
    isTable(dirOf(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace.toSeq)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
      .filter(n => isTable((root +: namespace.toSeq :+ n).mkString("/")))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None)

  /** `VERSION AS OF <v>` — the version string is the snapshot-log
    * version number. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$catalogName versions are snapshot-log version numbers; " +
          s"got '$version'")
    }
    loadAt(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <t>` — micros since epoch, resolved to the
    * newest version committed at or before that instant. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    loadAt(ident, Some(
      SnapshotLog.versionAsOf(spark, dir, timestampMicros / 1000L)))
  }

  private def loadAt(ident: Identifier, versionAsOf: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val schema = SnapshotStreamSource.schemaFor(dir, versionAsOf)
    new SnapshotCatalogTable(schema, dir,
      s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      versionAsOf)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val nsp = nsPath(ident.namespace().toSeq)
    if (!fs.exists(nsp)) throw new NoSuchNamespaceException(ident.namespace())
    val pcs = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"snapshot tables partition by plain columns (identity " +
          s"transforms); got ${t.describe()}")
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames().length == 1,
        s"unsupported partition reference ${t.describe()}")
      refs.head.fieldNames().head
    }
    // the empty commit DECLARES the table: schema (+ layout) live in the
    // version-1 manifest headers, the same bootstrap shape the CDC
    // replica uses (SnapshotPartitionSpec "pre-declares the layout")
    val empty = spark.createDataFrame(
      util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    if (pcs.isEmpty) SnapshotLog.commit(spark, dir, empty)
    else SnapshotLog.commitPartitioned(spark, dir, empty, pcs)
    // TBLPROPERTIES: user properties (Spark's own bookkeeping keys
    // excluded) land as one more metadata commit riding every later
    // version via the #tblprop auto-carry. CREATE TABLE ... COMMENT
    // persists too (under PROP_COMMENT, like ALTER's COMMENT ON TABLE).
    val userProps = properties.asScala.toMap.filter { case (k, v) =>
      (k == "comment" && v != null) ||
        (!GraftCatalog.ReservedProps(k) && !k.startsWith("option."))
    }
    if (userProps.nonEmpty)
      SnapshotLog.setTableProperties(spark, dir, userProps)
    loadTable(ident)
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` → one metadata-only
    * schema-widening commit ([[SnapshotLog.addColumns]]): older versions
    * read the new columns as typed NULLs, new writes carry them, stats/
    * DV/layout/constraints ride along. `ADD CONSTRAINT <n> CHECK (...)`
    * / `DROP CONSTRAINT <n>` route to [[SnapshotLog.addCheck]] /
    * [[SnapshotLog.dropCheck]] (addCheck validates existing data in one
    * pass and every subsequent write re-validates — the enforced-CHECK
    * contract). Every other change is refused loudly — schema otherwise
    * evolves through data commits (the log's schema-merge rules). */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // stage EVERY change of the statement, then commit once — a
    // multi-change ALTER is all-or-nothing and lands as exactly ONE
    // version (SnapshotLog.alterCommit); a failing piece refuses the
    // whole statement with nothing applied
    val cols = Seq.newBuilder[org.apache.spark.sql.types.StructField]
    val addChecks = Seq.newBuilder[(String, String)]
    val dropChecks = Seq.newBuilder[String]
    val renames = Seq.newBuilder[(String, String)]
    val dropCols = Seq.newBuilder[String]
    val setDefaults = Seq.newBuilder[(String, Option[String])]
    val setProps = scala.collection.mutable.LinkedHashMap[String, String]()
    val unsetProps = Seq.newBuilder[String]
    changes.foreach {
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1,
          "snapshot tables rename TOP-LEVEL columns only; got " +
            rn.fieldNames().mkString("."))
        renames += (rn.fieldNames().head -> rn.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "snapshot tables drop TOP-LEVEL columns only; got " +
            del.fieldNames().mkString("."))
        val name = del.fieldNames().head
        val known = SnapshotLog.versions(spark, dir).lastOption
          .flatMap(SnapshotLog.schemaOf(spark, dir, _))
          .exists(_.fieldNames.contains(name))
        if (known) dropCols += name
        else require(del.ifExists(), s"no column '$name' on $dir")
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "snapshot tables add TOP-LEVEL columns only; got " +
            add.fieldNames().mkString("."))
        require(add.isNullable,
          s"added column '${add.fieldNames().head}' must be nullable — " +
            "existing rows read it as its DEFAULT (NULL when none)")
        // loud, not silently dropped: the widened schema always APPENDS
        require(add.position() == null,
          s"added column '${add.fieldNames().head}' specifies a position " +
            "(FIRST/AFTER) — snapshot schemas only widen at the end")
        val field0 = org.apache.spark.sql.types.StructField(
          add.fieldNames().head, add.dataType(), nullable = true)
        // DEFAULT <expr>: record the SQL text as CURRENT_DEFAULT —
        // alterCommit validates it and freezes the folded literal as
        // EXISTS_DEFAULT (what pre-existing rows read)
        val field = Option(add.defaultValue()) match {
          case None => field0
          case Some(d) => field0.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString(org.apache.spark.sql.catalyst.util
                .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY,
                defaultSqlOf(d)).build())
        }
        cols += Option(add.comment()).map(field.withComment)
          .getOrElse(field)
      case ud: TableChange.UpdateColumnDefaultValue =>
        require(ud.fieldNames().length == 1,
          "snapshot tables default TOP-LEVEL columns only; got " +
            ud.fieldNames().mkString("."))
        // SET DEFAULT carries the new expression; DROP DEFAULT arrives
        // as an empty default — map it to None (future inserts fill
        // NULL again; existing rows keep their frozen EXISTS_DEFAULT)
        val sqlTxt = Option(ud.newCurrentDefault()).map(defaultSqlOf)
          .filter(_.nonEmpty)
        setDefaults += (ud.fieldNames().head -> sqlTxt)
      case ac: TableChange.AddConstraint => ac.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          addChecks += (c.name() -> c.predicateSql())
        case other => throw new UnsupportedOperationException(
          s"snapshot tables enforce CHECK constraints only; got " +
            other.toDDL)
      }
      case dc: TableChange.DropConstraint =>
        val known = SnapshotLog.versions(spark, dir).lastOption
          .map(SnapshotLog.checksOf(spark, dir, _)).getOrElse(Seq.empty)
        if (known.exists(_._1 == dc.name())) dropChecks += dc.name()
        else require(dc.ifExists(),
          s"no CHECK constraint '${dc.name()}' on $dir")
      // COMMENT ON TABLE arrives as SetProperty("comment") — a
      // user-visible statement that must PERSIST, not no-op. It lands in
      // the #tblprop map under Spark's own PROP_COMMENT key: DESCRIBE
      // EXTENDED surfaces it as the table comment, while SHOW
      // TBLPROPERTIES hides it (Spark filters TABLE_RESERVED_PROPERTIES
      // from v2 property listings).
      case sp: TableChange.SetProperty if sp.property() == "comment" =>
        // COMMENT ... IS NULL arrives as SetProperty("comment", "")
        if (sp.value() == null || sp.value().isEmpty)
          unsetProps += "comment"
        else setProps += ("comment" -> sp.value())
      // create/alter symmetry: Spark's other bookkeeping keys (provider/
      // location/owner/option.*) must not persist into #tblprop= and
      // surface in SHOW TBLPROPERTIES — the same ReservedProps filter
      // createTable applies
      case sp: TableChange.SetProperty
          if !GraftCatalog.ReservedProps(sp.property()) &&
            !sp.property().startsWith("option.") =>
        setProps += (sp.property() -> sp.value())
      case _: TableChange.SetProperty => () // reserved: ignore, like create
      case rp: TableChange.RemoveProperty =>
        unsetProps += rp.property()
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE supports ADD COLUMNS / RENAME COLUMN / " +
          s"DROP COLUMN / ALTER COLUMN SET|DROP DEFAULT / " +
          s"ADD CONSTRAINT ... CHECK / DROP CONSTRAINT " +
          s"on snapshot tables (got ${other.getClass.getSimpleName}); " +
          "schema otherwise evolves through data commits")
    }
    val (ac, ak, dk) = (cols.result(), addChecks.result(),
      dropChecks.result())
    val (rn, dc, sd) = (renames.result(), dropCols.result(),
      setDefaults.result())
    if (ac.nonEmpty || ak.nonEmpty || dk.nonEmpty || rn.nonEmpty ||
      dc.nonEmpty || sd.nonEmpty)
      SnapshotLog.alterCommit(spark, dir, ac, ak, dk, rn, dc, sd)
    // SET/UNSET TBLPROPERTIES arrive as their own statements from SQL —
    // one metadata commit per statement
    if (setProps.nonEmpty || unsetProps.result().nonEmpty)
      SnapshotLog.setTableProperties(spark, dir, setProps.toMap,
        unsetProps.result())
    loadTable(ident)
  }

  /** The DEFAULT expression's SQL text: DDL always carries it; a
    * programmatic connector default may carry only a literal. */
  private def defaultSqlOf(
      d: org.apache.spark.sql.connector.catalog.DefaultValue): String =
    Option(d.getSql).getOrElse {
      d.getExpression match {
        case lv: org.apache.spark.sql.connector.expressions.Literal[_] =>
          org.apache.spark.sql.catalyst.expressions
            .Literal(lv.value, lv.dataType).sql
        case other => throw new UnsupportedOperationException(
          s"graft DEFAULT needs a SQL text or a literal; got $other")
      }
    }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) false
    else fs.delete(new Path(dir), true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val to = nsPath(newIdent.namespace().toSeq)
    if (!fs.exists(to)) throw new NoSuchNamespaceException(
      newIdent.namespace())
    require(fs.rename(new Path(dirOf(oldIdent)), new Path(dirOf(newIdent))),
      s"rename ${dirOf(oldIdent)} -> ${dirOf(newIdent)} failed")
  }

  // ---- namespaces -------------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsPath(namespace.toSeq)) &&
        !isTable(nsPath(namespace.toSeq).toString))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    val p = nsPath(namespace.toSeq)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
      .filterNot(n => isTable((root +: namespace.toSeq :+ n).mkString("/")))
      .map(n => (namespace :+ n)).toArray
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsPath(namespace.toSeq).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace.toSeq))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are plain directories; nothing to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    val p = nsPath(namespace.toSeq)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw NonEmptyNamespaceException(namespace, "namespace not empty",
        None)
    fs.delete(p, true)
  }
}

private[graft] object GraftCatalog {
  /** Spark's own catalog bookkeeping keys — never stored as user
    * table properties. */
  val ReservedProps: Set[String] = Set("provider", "location", "owner",
    "comment", "external", "is_managed_location", "path")
}

/** A catalog-loaded snapshot table: everything the path-based DSv2
  * table does (pruned batch scan, micro-batch stream) PLUS the v2
  * write surface — [[V1Write]] handing the planned rows back as a
  * driver DataFrame for the commit verbs. Declared V1_BATCH_WRITE (not
  * BATCH_WRITE): Spark then plans INSERT/CTAS through the v1-fallback
  * writer exec, which is exactly this shape. */
private[graft] class SnapshotCatalogTable(schema0: StructType,
    dir: String, qualified: String, versionAsOf: Option[Long])
    extends SnapshotStreamTable(schema0, dir, versionAsOf)
    with SupportsWrite with SupportsDelete {
  override def name(): String = qualified

  /** Stored TBLPROPERTIES as of this (point-in-time) table instance —
    * what DESCRIBE EXTENDED and SHOW TBLPROPERTIES read. */
  override lazy val properties: java.util.Map[String, String] = {
    val spark = SparkSession.active
    val v = versionAsOf.orElse(SnapshotLog.versions(spark, dir).lastOption)
    v.map(SnapshotLog.tablePropertiesOf(spark, dir, _))
      .getOrElse(Map.empty[String, String]).asJava
  }

  /** The manifest's DECLARED partition layout as identity transforms —
    * what `INSERT OVERWRITE ... PARTITION (col = v)` static specs and
    * DESCRIBE resolve against. Resolved ONCE per loaded table instance
    * (Spark calls these Table methods repeatedly per statement; the
    * table object is already a point-in-time view, like schema0). */
  override lazy val partitioning
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    val spark = SparkSession.active
    val v = versionAsOf.orElse(SnapshotLog.versions(spark, dir).lastOption)
    v.map(SnapshotLog.partitionColsOf(spark, dir, _)).getOrElse(Seq.empty)
      .map(c => org.apache.spark.sql.connector.expressions.Expressions
        .identity(c)).toArray
  }

  /** The manifest's CHECK constraints as catalog constraints (DESCRIBE
    * and the ALTER CONSTRAINT surface read these). They are ENFORCED:
    * every commit verb validates them on the write path. Same
    * once-per-instance resolution as [[partitioning]]. */
  override lazy val constraints
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    val spark = SparkSession.active
    val v = versionAsOf.orElse(SnapshotLog.versions(spark, dir).lastOption)
    v.map(SnapshotLog.checksOf(spark, dir, _)).getOrElse(Seq.empty)
      .map { case (n, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(n).predicateSql(sql).enforced(true).build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
      }.toArray
  }

  /** `DELETE FROM cat.ns.t WHERE ...` — the pushed filters convert to
    * one Column predicate and run through the library's copy-on-write
    * [[SnapshotLog.deleteWhere]] (commit-protocol atomicity, DV carry,
    * untouched files by reference). `DELETE FROM t` with no WHERE goes
    * through the inherited truncateTable() = deleteWhere(AlwaysTrue).
    * canDeleteWhere declines (→ loud analysis error, not silent
    * partial delete) when a filter has no Column translation or the
    * relation is time-traveled. */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    versionAsOf.isEmpty && filters.forall(filterToColumn(_).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(versionAsOf.isEmpty,
      s"$qualified VERSION/TIMESTAMP AS OF is a read-only relation")
    val cond = filters.toSeq.map(f => filterToColumn(f).getOrElse(
        throw new UnsupportedOperationException(
          s"cannot push DELETE filter $f")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    SnapshotLog.deleteWhere(SparkSession.active, dir, cond)
    ()
  }

  private def filterToColumn(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
      case StringContains(a, v)     => Some(col(a).contains(v))
      case And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r))
          yield lc && rc
      case Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r))
          yield lc || rc
      case Not(c)        => filterToColumn(c).map(!_)
      case AlwaysTrue()  => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _             => None
    }
  }

  override def capabilities(): util.Set[TableCapability] =
    // no OVERWRITE_DYNAMIC: Spark has no V1-fallback exec for dynamic
    // overwrite, so graft.plans.SqlDml rewrites the logical plan onto
    // SnapshotLog.overwritePartitions during analysis instead.
    // AUTOMATIC_SCHEMA_EVOLUTION enables `MERGE ... WITH SCHEMA
    // EVOLUTION`: Spark's ResolveMergeIntoSchemaEvolution widens the
    // table through alterTable (one SnapshotLog.alterCommit metadata
    // version) and re-resolves the merge — including star expansion —
    // against the widened schema before the merge's own data commit.
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(versionAsOf.isEmpty,
      s"$qualified VERSION/TIMESTAMP AS OF is a read-only relation")
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsOverwrite
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      // Append (default) | Truncate (full overwrite) | Where(cond:
      // REPLACE WHERE / static partition overwrite) | Dynamic (replace
      // only the partitions the data touches)
      private sealed trait Mode
      private case object Append extends Mode
      private case object Truncate extends Mode
      private case class Where(cond: org.apache.spark.sql.Column)
          extends Mode
      private case object Dynamic extends Mode
      private var mode: Mode = Append

      override def truncate(): WriteBuilder = { mode = Truncate; this }

      override def canOverwrite(
          filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
        filters.forall(filterToColumn(_).isDefined)

      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : WriteBuilder = {
        import org.apache.spark.sql.sources.AlwaysTrue
        mode =
          if (filters.isEmpty || filters.forall(_ == AlwaysTrue)) Truncate
          else Where(filters.toSeq.map(f => filterToColumn(f).getOrElse(
              throw new UnsupportedOperationException(
                s"cannot push REPLACE WHERE filter $f")))
            .reduce(_ && _))
        this
      }

      override def overwriteDynamicPartitions(): WriteBuilder = {
        mode = Dynamic; this
      }

      override def build(): V1Write = new V1Write {
        /** `writeStream.toTable(...)` — the executor-side v2 write:
          * tasks stream parquet files, the epoch commit registers the
          * list (appendExternal / commitBatchExternal for Complete).
          * Spark's micro-batch planner reaches streaming writes via
          * `build().toStreaming`, so the override lives HERE, not on
          * the builder's deprecated buildForStreaming. */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(mode == Append || mode == Truncate,
            s"$qualified: streaming writes support Append and Complete " +
              "only")
          new SnapshotStreamingWrite(dir, info.schema(), mode == Truncate)
        }
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                ovr: Boolean): Unit = {
              val spark = data.sparkSession
              mode match {
                case Where(cond) =>
                  SnapshotLog.replaceWhere(spark, dir, data, cond)
                case Dynamic =>
                  SnapshotLog.overwritePartitions(spark, dir, data)
                case Truncate => fullOverwrite(spark, data)
                case Append =>
                  if (ovr) fullOverwrite(spark, data)
                  else SnapshotLog.append(spark, dir, data)
              }
              ()
            }
            private def fullOverwrite(spark: SparkSession,
                data: org.apache.spark.sql.DataFrame): Unit = {
              // re-declare the layout an existing table carries — a
              // plain commit() would silently flatten it
              val pcs = SnapshotLog.versions(spark, dir).lastOption
                .map(SnapshotLog.partitionColsOf(spark, dir, _))
                .getOrElse(Seq.empty)
              if (pcs.isEmpty) SnapshotLog.commit(spark, dir, data)
              else SnapshotLog.commitPartitioned(spark, dir, data, pcs)
              ()
            }
          }
      }
    }
  }
}
