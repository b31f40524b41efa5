package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.{col, expr, isnan, lit}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{GraftDataset, GraftLake}
import graft.core.Model.{DatasetMeta, VariableMeta}

/** A Spark `TableCatalog` over a graft lake — the store as a
  * first-class SQL namespace:
  *
  * {{{
  * spark.sql.catalog.g      = graft.sources.GraftCatalog
  * spark.sql.catalog.g.root = /data/lake
  *
  * CREATE NAMESPACE g.weather;
  * CREATE TABLE g.weather.temp (x0 BIGINT, x1 BIGINT, value DOUBLE)
  *   TBLPROPERTIES (shape='8,8', chunkDims='4,4', dtype='double');
  * INSERT INTO g.weather.temp SELECT ...;      -- commits a version
  * SELECT * FROM g.weather.temp;               -- latest
  * SELECT * FROM g.weather.temp VERSION AS OF 42;  -- time travel
  * DROP TABLE g.weather.temp;                  -- MVCC: new version
  * }}}
  *
  * Namespace = dataset (the reference's Schema protocol,
  * hbase.clj:299-344); table = variable. DDL commits metadata-only
  * versions through the same optimistic protocol as data writes, so
  * concurrent DDL/DML resolve via the commit-time metadata merge.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  private def lake = new GraftLake(SparkSession.active, root)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'root' (the lake directory)"))
  }

  override def name(): String = catalogName

  private def dsName(namespace: Array[String]): String = {
    require(namespace.length == 1,
      s"graft namespaces are single-level, got ${namespace.mkString(".")}")
    namespace(0)
  }

  private def connect(namespace: Array[String]): GraftDataset = {
    val n = dsName(namespace)
    if (!lake.exists(n)) throw new NoSuchNamespaceException(Seq(n))
    lake.connect(n)
  }

  /** The DATASET level of an identifier: 1-level for variables,
    * the first level for 3-part metadata-table identifiers
    * (`g.<dataset>.<variable>.<kind>`, namespace length 2).
    */
  private def datasetNs(ident: Identifier): Array[String] =
    if (ident.namespace().length == 2 &&
        GraftMetadataTables.Kinds.contains(
          ident.name().toLowerCase(java.util.Locale.ROOT)))
      Array(ident.namespace()(0))
    else ident.namespace()

  // ---------- tables (variables) ----------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ds = connect(namespace)
    ds.latestVersion.map { v =>
      ds.metadata(v).variables
        .map(vm => Identifier.of(namespace, vm.name)).toArray
    }.getOrElse(Array.empty)
  }

  private def loadAt(ident: Identifier, asOf: Option[Long]): Table = {
    // metadata tables ride a THIRD name level under a variable
    // (`g.<dataset>.<variable>.history|tags|variables` — the Iceberg
    // multipart convention), so they can never collide with variables
    // (which resolve under a 1-level namespace). Time travel clips
    // them to the pinned version.
    if (ident.namespace().length == 2 &&
        GraftMetadataTables.Kinds.contains(
          ident.name().toLowerCase(java.util.Locale.ROOT))) {
      val dsNs = Array(ident.namespace()(0))
      val variable = ident.namespace()(1)
      val ds = connect(dsNs)
      val version = asOf.orElse(ds.latestVersion).getOrElse(
        throw new NoSuchTableException(ident))
      val known =
        try ds.metadata(version).variables.exists(_.name == variable)
        catch { case _: IllegalArgumentException => false }
      if (!known) throw new NoSuchTableException(ident)
      return GraftMetadataTables.load(ds, dsNs(0), variable,
        ident.name().toLowerCase(java.util.Locale.ROOT), asOf)
    }
    val ds = connect(ident.namespace())
    val version = asOf.orElse(ds.latestVersion).getOrElse(
      throw new NoSuchTableException(ident))
    val meta =
      try ds.metadata(version)
      catch { case _: IllegalArgumentException =>
        throw new NoSuchTableException(ident)
      }
    val v = meta.variables.find(_.name == ident.name()).getOrElse(
      throw new NoSuchTableException(ident))
    // lineage-aware: cloned variables' pre-clone rows decode under
    // their source's historical metadata
    val metas = ds.decodeMetas(v, version)
    new GraftTable(ds.path, ident.name(), version, v, metas,
      withVersion = false)
  }

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF <id>` time travel; a non-numeric version is a
    * tag name (`VERSION AS OF 'corpus-v1'`), resolved through the
    * dataset's O(1) tag refs.
    */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.toLongOption.getOrElse(
      connect(datasetNs(ident)).resolveTag(version).getOrElse(
        throw new IllegalArgumentException(
          s"unknown tag '$version' on ${ident.namespace().mkString(".")}")))))

  /** `TIMESTAMP AS OF <ts>` time travel (micros since epoch, per the
    * DSv2 contract): version ids ARE commit epoch-millis, so the read
    * resolves to the newest live version committed at or before the
    * timestamp — no extra metadata needed.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val cutoffMillis = Math.floorDiv(timestampMicros, 1000L)
    val ds = connect(datasetNs(ident))
    val v = ds.versionIds().filter(_ <= cutoffMillis).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"no live version of ${ident.namespace().mkString(".")} at or " +
          s"before timestamp $cutoffMillis"))
    loadAt(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true }
    catch {
      case _: NoSuchTableException | _: NoSuchNamespaceException => false
    }

  /** Parse the variable geometry from CREATE/REPLACE TABLE properties
    * and validate the column list against the cell schema it implies.
    * `inheritFrom` (REPLACE) backfills any property the statement
    * omits from the variable being replaced.
    */
  private def parseVariable(ident: Identifier, schema: StructType,
      properties: util.Map[String, String],
      inheritFrom: Option[VariableMeta]): VariableMeta = {
    def longs(key: String, inherited: Option[Seq[Long]]): Seq[Long] =
      Option(properties.get(key))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
        .orElse(inherited).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE requires table property '$key' (e.g. '8,8')"))
    val dtype = Option(properties.get("dtype"))
      .orElse(inheritFrom.map(_.dtype)).getOrElse("double")
    // default fill follows the dtype: NaN marks unwritten cells for
    // float types (hbase_test.clj:152-156), but integer dtypes have no
    // NaN — default them to 0 (an explicit 'NaN' for an integer dtype
    // is rejected by VariableMeta's representability check)
    val integral = dtype == "short" || dtype == "int" || dtype == "long"
    val fill = Option(properties.get("fillValue")) match {
      case None => inheritFrom.map(_.fillValue).getOrElse(
        if (integral) 0.0 else Double.NaN)
      case Some("NaN") => Double.NaN
      case Some(x) => x.toDouble
    }
    val check = Option(properties.get("check")).map(_.trim)
      .orElse(inheritFrom.map(_.check)).getOrElse("")
    val vm0 = VariableMeta(ident.name(), dtype,
      longs("shape", inheritFrom.map(_.shape)),
      longs("chunkDims", inheritFrom.map(_.chunkDims)), fill,
      check = check)
    if (check.nonEmpty)
      GraftCatalog.validateCheck(check, vm0.shape.length)
    if (schema.nonEmpty) {
      val expected = GraftTableProvider.schemaFor(vm0)
      require(schema.fieldNames.toSeq == expected.fieldNames.toSeq,
        s"column list ${schema.fieldNames.mkString(",")} does not match " +
          s"the geometry's cell schema ${expected.fieldNames.mkString(",")}")
    }
    vm0
  }

  /** The variable under a physical index key no variable in the lake's
    * WHOLE HISTORY ever keyed on: retained rows under a dropped/renamed
    * /replaced key must never phantom into a new table of the same
    * name. `always` (REPLACE) forces a fresh key even for a never-used
    * name — replace semantics demand the old rows vanish at HEAD.
    */
  private def freshKey(ds: GraftDataset, vm0: VariableMeta,
      always: Boolean): VariableMeta = {
    val historicalKeys = ds.latestVersion.map(v =>
      ds.metasUpTo(v).values.flatMap(_.variables.map(_.idx)).toSet)
      .getOrElse(Set.empty[String])
    if (always || historicalKeys(vm0.idx)) vm0.copy(indexName =
      s"${vm0.name}#${java.util.UUID.randomUUID().toString.take(8)}")
    else vm0
  }

  /** CREATE TABLE: the variable's array geometry rides in table
    * properties (`shape`, `chunkDims`, required; `dtype`, `fillValue`
    * optional). The column list is validated against the cell schema
    * the geometry implies. Committed as a metadata-only version.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val ds = connect(ident.namespace())
    val vm = freshKey(ds,
      parseVariable(ident, schema, properties, None), always = false)
    val current = ds.latestVersion.map(ds.metadata)
      .getOrElse(DatasetMeta(Seq.empty))
    require(!current.variables.exists(x =>
        x.name == ident.name() || x.idx == ident.name()),
      s"table already exists: ${ident.name()} (a renamed variable's " +
        "index rows still key on its original name)")
    val w = ds.newWriter(DatasetMeta(current.variables :+ vm))
    w.commit()
    loadTable(ident)
  }

  // ---------- atomic CTAS / RTAS (StagingTableCatalog) ----------

  /** `CREATE TABLE ... AS SELECT` as ONE atomic MVCC commit: the new
    * variable's registration and its data land in the same version.
    * The query's output is staged (chunks encoded, index rows written
    * to the staging area) against the not-yet-committed metadata;
    * [[GraftStagedTable.commitStagedChanges]] is the single commit
    * point, and an abort leaves nothing visible — no half-created
    * empty table, unlike the non-atomic create-then-insert fallback.
    */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    val ds = connect(ident.namespace())
    val vm = freshKey(ds,
      parseVariable(ident, schema, properties, None), always = false)
    val current = ds.latestVersion.map(ds.metadata)
      .getOrElse(DatasetMeta(Seq.empty))
    require(!current.variables.exists(x =>
        x.name == ident.name() || x.idx == ident.name()),
      s"table already exists: ${ident.name()}")
    new GraftStagedTable(ds, DatasetMeta(current.variables :+ vm), vm)
  }

  /** `REPLACE TABLE ... AS SELECT`: one commit under which the
    * variable swaps to a FRESH physical index key carrying exactly the
    * query's rows — the epoch-swap trick TRUNCATE/INSERT OVERWRITE
    * use, so no old data is rewritten or deleted and history below the
    * replace stays time-travelable. Geometry properties omitted from
    * the statement are inherited from the variable being replaced.
    */
  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    val ds = connect(ident.namespace())
    val current = ds.latestVersion.map(ds.metadata)
      .getOrElse(DatasetMeta(Seq.empty))
    val old = current.variables.find(_.name == ident.name()).getOrElse(
      throw new NoSuchTableException(ident))
    val vm = freshKey(ds,
      parseVariable(ident, schema, properties, Some(old)), always = true)
    new GraftStagedTable(ds,
      DatasetMeta(current.variables.map(v =>
        if (v.name == ident.name()) vm else v)), vm)
  }

  override def stageCreateOrReplace(ident: Identifier,
      schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    val ds = connect(ident.namespace())
    val current = ds.latestVersion.map(ds.metadata)
      .getOrElse(DatasetMeta(Seq.empty))
    if (current.variables.exists(_.name == ident.name()))
      stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)
  }

  /** DROP TABLE: MVCC — commits a version without the variable;
    * history (and time travel to it) is retained.
    */
  override def dropTable(ident: Identifier): Boolean =
    try {
      val ds = connect(ident.namespace())
      val current = ds.latestVersion.map(ds.metadata)
        .getOrElse(DatasetMeta(Seq.empty))
      if (!current.variables.exists(_.name == ident.name())) false
      else {
        val w = ds.newWriter(DatasetMeta(
          current.variables.filterNot(_.name == ident.name())))
        w.commit()
        true
      }
    } catch { case _: NoSuchNamespaceException => false }

  /** `ALTER TABLE ... SET TBLPROPERTIES ('shape'='8,8')`: shape
    * grow/shrink and fillValue changes are METADATA-ONLY MVCC commits
    * through the same optimistic merge path as data writes (concurrent
    * DDL/DML resolve at commit time; old chunks re-mask under the new
    * shape exactly like the programmatic grow/shrink scenarios).
    * chunkDims and dtype are fixed at creation — layout and payload
    * encoding are content-addressed, so changing them means rewriting
    * data ([[GraftDataset.rechunk]]), not DDL.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val ds = connect(ident.namespace())
    val current = ds.latestVersion.map(ds.metadata)
      .getOrElse(DatasetMeta(Seq.empty))
    val vm = current.variables.find(_.name == ident.name()).getOrElse(
      throw new NoSuchTableException(ident))
    var updated = vm
    var newDtype: Option[String] = None
    changes.foreach {
      // dtype evolution: `ALTER TABLE t ALTER COLUMN value TYPE <t>`
      // — handled below as ONE rechunk-to-same-name epoch-swap commit
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames().toSeq == Seq("value"),
          s"only the value column's type can evolve, not " +
            s"${ut.fieldNames().mkString(".")} (coordinates are LONG " +
            "by construction)")
        newDtype = Some(ut.newDataType() match {
          case DoubleType => "double"
          case FloatType => "float"
          case LongType => "long"
          case IntegerType => "int"
          case ShortType => "short"
          case other => throw new UnsupportedOperationException(
            s"unsupported cell type $other; supported: DOUBLE, FLOAT, " +
              "BIGINT, INT, SMALLINT")
        })
      case sp: TableChange.SetProperty => sp.property match {
        case "shape" =>
          val shape = sp.value.split(",").map(_.trim)
            .filter(_.nonEmpty).map(_.toLong).toSeq
          require(shape.length == vm.shape.length,
            s"shape rank ${shape.length} != variable rank " +
              s"${vm.shape.length} (rank is immutable)")
          require(shape.forall(_ > 0),
            s"shape dimensions must be positive, got '${sp.value}' — " +
              "a 0/negative extent would commit a broken chunk grid")
          updated = updated.copy(shape = shape)
        case "fillValue" =>
          val f = if (sp.value == "NaN") Double.NaN
            else try sp.value.toDouble
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"fillValue '${sp.value}' is not a number")
            }
          updated = updated.copy(fillValue = f)
        case "check" =>
          val check = sp.value.trim
          if (check.nonEmpty) {
            GraftCatalog.validateCheck(check, vm.shape.length)
            // adding/tightening a constraint validates EXISTING data
            // (the Delta ADD CONSTRAINT contract): one distributed
            // existence probe for a counterexample before the
            // metadata commit
            val candidate = vm.copy(check = check)
            val bad = graft.core.SlabWriter.checkViolations(
              ds.readSlab(vm.name, ds.latestVersion.getOrElse(
                throw new NoSuchTableException(ident))), candidate)
              .limit(1).collect()
            if (bad.nonEmpty)
              throw new IllegalArgumentException(
                s"cannot add CHECK constraint '$check' to " +
                  s"${ident.name()}: existing cell " +
                  s"[${bad.head.getSeq[Long](0).mkString(",")}] = " +
                  s"${bad.head.getDouble(1)} violates it")
          }
          updated = updated.copy(check = check)
        case other => throw new UnsupportedOperationException(
          s"table property '$other' is immutable after creation " +
            "(chunkDims/dtype fix the chunk layout; rechunk to change)")
      }
      case rp: TableChange.RemoveProperty if rp.property == "check" =>
        updated = updated.copy(check = "")
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change $other; supported: " +
          "SET TBLPROPERTIES ('shape'=..., 'fillValue'=..., " +
          "'check'=...) and UNSET TBLPROPERTIES ('check')")
    }
    newDtype.filter(_ != vm.dtype) match {
      case Some(nd) =>
        // dtype evolution = rechunk under a FRESH epoch key in ONE
        // atomic commit (the INSERT OVERWRITE machinery): live cells
        // re-encode under the new dtype, the swap makes them the only
        // rows visible at HEAD, and time travel below the swap decodes
        // the old chunks under their own (old-dtype) metadata. O(live
        // data) by nature — a physical re-encode — but never more: a
        // lossy value fails the probe and NOTHING commits.
        val head = ds.latestVersion.getOrElse(
          throw new NoSuchTableException(ident))
        val integral = nd == "short" || nd == "int" || nd == "long"
        val (lo, hi) = nd match {
          case "short" => (Short.MinValue.toDouble, Short.MaxValue.toDouble)
          case "int" => (Int.MinValue.toDouble, Int.MaxValue.toDouble)
          case _ => (-9007199254740992.0, 9007199254740992.0) // ±2^53
        }
        val fill0 = updated.fillValue
        val newFill =
          if (!integral) fill0
          else if (!fill0.isNaN && fill0 == math.rint(fill0) &&
            fill0 >= lo && fill0 <= hi) fill0
          else 0.0
        val live = ds.readSlab(vm.name, head)
          .filter(col("value") =!= lit(vm.fillValue))
        val representable =
          if (nd == "double") lit(true)
          else if (nd == "float")
            isnan(col("value")) ||
              col("value") === col("value").cast(FloatType).cast(DoubleType)
          else !isnan(col("value")) &&
            col("value") === expr("round(value, 0)") &&
            col("value") >= lo && col("value") <= hi
        val bad = live.where(!representable).limit(1).collect()
        if (bad.nonEmpty)
          throw new IllegalArgumentException(
            s"cannot ALTER ${ident.name()} value type ${vm.dtype} -> " +
              s"$nd: cell [${bad.head.getSeq[Long](0).mkString(",")}] = " +
              s"${bad.head.getDouble(1)} is not exactly representable")
        val candidate = updated.copy(dtype = nd, fillValue = newFill)
        val swapped = GraftTable.freshEpoch(
          DatasetMeta(current.variables.map(v =>
            if (v.name == ident.name()) candidate else v)), ident.name())
        val w = ds.newWriter(swapped)
        w.writeSlab(ident.name(), live.select(col("coord"), col("value")))
        w.commit()
      case None =>
        val w = ds.newWriter(DatasetMeta(current.variables.map(v =>
          if (v.name == ident.name()) updated else v)))
        w.commit()
    }
    loadTable(ident)
  }

  /** RENAME TABLE: a METADATA-ONLY commit. Index rows key on the
    * variable's stable physical `indexName` (pinned to the original
    * name on first rename), so no index rewrite happens and history /
    * time travel keep working — `VERSION AS OF` an old id shows the
    * old name, the data is one and the same.
    */
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    // Spark may pass the new identifier bare (RENAME TO <name>) or
    // fully qualified incl. the catalog name; a resolved namespace
    // must match — a variable cannot move across datasets without
    // moving its index rows
    val newNs = newIdent.namespace() match {
      case ns if ns.nonEmpty && ns.head == catalogName => ns.drop(1)
      case ns => ns
    }
    require(newNs.isEmpty || oldIdent.namespace().sameElements(newNs),
      "RENAME cannot move a table across namespaces (datasets): " +
        s"${oldIdent.namespace().mkString(".")} -> ${newNs.mkString(".")}")
    val ds = connect(oldIdent.namespace())
    val current = ds.latestVersion.map(ds.metadata)
      .getOrElse(DatasetMeta(Seq.empty))
    val vm = current.variables.find(_.name == oldIdent.name()).getOrElse(
      throw new NoSuchTableException(oldIdent))
    // exclude the variable being renamed: renaming BACK to its own
    // stable index key (a -> b -> a) is the one zero-risk collision
    require(!current.variables.exists(x => x.name != oldIdent.name() &&
        (x.name == newIdent.name() || x.idx == newIdent.name())),
      s"table already exists: ${newIdent.name()} (a renamed variable's " +
        "index rows still key on its original name)")
    val renamed = vm.copy(name = newIdent.name(), indexName = vm.idx)
    val w = ds.newWriter(DatasetMeta(current.variables.map(x =>
      if (x.name == oldIdent.name()) renamed else x)))
    w.commit()
    ()
  }

  // ---------- procedures (maintenance verbs) ----------

  /** `CALL g.system.compact_index(...)` etc — see [[GraftProcedures]].
    * Procedures live under the reserved `system` namespace (the
    * Iceberg convention), never colliding with datasets.
    */
  override def loadProcedure(ident: Identifier): org.apache.spark.sql
      .connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(GraftProcedures.Namespace),
      s"procedures live under $catalogName.system, got " +
        s"${ident.namespace().mkString(".")}.${ident.name()}")
    GraftProcedures.load(ident.name(), lake)
  }

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty ||
        namespace.sameElements(GraftProcedures.Namespace))
      GraftProcedures.identifiers(catalogName)
    else Array.empty

  // ---------- functions (chunk-grid transforms) ----------

  /** The analyzer resolves a scan-reported `chunk(...)` transform by
    * asking the relation's catalog for the function under the EMPTY
    * namespace ([[GraftFunctions]]) — serving it here is what turns
    * two chunk-aligned graft scans into a zero-shuffle
    * storage-partitioned join.
    */
  override def listFunctions(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || lake.exists(dsName(namespace)))
      GraftFunctions.identifiers
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def loadFunction(ident: Identifier): UnboundFunction =
    GraftFunctions.load(ident.name()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))

  // ---------- namespaces (datasets) ----------

  override def listNamespaces(): Array[Array[String]] =
    lake.list().map(n => Array(n)).toArray

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (lake.exists(dsName(namespace))) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (lake.exists(dsName(namespace))) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    lake.create(dsName(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  /** DROP NAMESPACE: destroys the dataset (hbase.clj:313-316). */
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val n = dsName(namespace)
    if (!lake.exists(n)) false
    else { lake.destroy(n); true }
  }
}

object GraftCatalog {

  /** Reject a CHECK expression that does not parse or references
    * anything beyond the cell columns `x0..x{rank-1}` and `value` —
    * at DDL time, so a typo'd constraint can never become a durable
    * metadata version that every later write trips over. Resolution
    * runs against an empty relation of the cell schema; no job.
    */
  private[sources] def validateCheck(check: String, rank: Int): Unit = {
    val spark = SparkSession.active
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    val cellSchema = StructType(
      (0 until rank).map(i => StructField(s"x$i", LongType)) :+
        StructField("value", DoubleType))
    try {
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), cellSchema)
      empty.where(org.apache.spark.sql.functions.expr(check)
        .cast("boolean")).queryExecution.analyzed
      ()
    } catch { case e: Exception =>
      throw new IllegalArgumentException(
        s"invalid CHECK constraint '$check': must be a boolean SQL " +
          s"expression over x0..x${rank - 1} and value (${e.getMessage})")
    }
  }
}

/** The staged side of an atomic CTAS/RTAS: the query's rows are
  * STAGED through the normal distributed slab-write path (re-chunk,
  * encode, content-hash, stage index rows) against metadata that is
  * not yet committed; `commitStagedChanges` is the single atomic
  * commit point — variable registration and data become visible in
  * the SAME version, and `abortStagedChanges` leaves no trace (the
  * staging area is swept by gc's stale-staging path regardless).
  *
  * Concurrency: the commit rides [[graft.core.SlabWriter]]'s
  * optimistic protocol, so a CTAS racing other writers merges or
  * conflicts exactly like any data commit.
  */
private[sources] class GraftStagedTable(ds: GraftDataset,
    newMeta: DatasetMeta, vm: VariableMeta)
    extends StagedTable with SupportsWrite {
  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
  import org.apache.spark.sql.sources.InsertableRelation
  import org.apache.spark.sql.types.{DoubleType, LongType}
  import org.apache.spark.sql.functions.{array, col}

  private var writer: Option[graft.core.SlabWriter] = None

  override def name(): String = s"graft.${vm.name} (staged)"
  override def schema(): StructType = GraftTableProvider.schemaFor(vm)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS plans a truncate-then-write; the replaced variable's
      // fresh index key already guarantees only the query's rows are
      // visible, so the truncate is subsumed by the epoch swap
      override def truncate(): WriteBuilder = this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                val rank = vm.shape.length
                val cells = data.select(
                  array((0 until rank).map(i =>
                    col(s"x$i").cast(LongType)): _*).as("coord"),
                  col("value").cast(DoubleType).as("value"))
                val w = ds.newWriter(newMeta)
                // register BEFORE the slab write so a mid-write
                // failure is cleaned up by abortStagedChanges
                // immediately, not left for the stale-staging gc sweep
                writer = Some(w)
                w.writeSlab(vm.name, cells) // commit deferred to commitStagedChanges
              }
            }
        }
    }

  override def commitStagedChanges(): Unit = {
    // no staged rows (empty source relation) still creates the table —
    // the commit is then metadata-only, like a plain CREATE
    writer.getOrElse(ds.newWriter(newMeta)).commit()
    ()
  }

  override def abortStagedChanges(): Unit = writer.foreach(_.abort())
}
