package graft.sources

import java.util.Collections

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.GraftLake

/** Maintenance procedures for the SQL surface — the lake's operational
  * verbs (`compactIndexLog` / `expireVersions` / `gc` / version
  * listing) as Spark 4 `CALL` statements, the same shape Iceberg uses
  * for `system.*` procedures:
  *
  * {{{
  * CALL g.system.compact_index(dataset => 'weather')
  * CALL g.system.expire_versions(dataset => 'weather', keep_last => 2)
  * CALL g.system.gc(dataset => 'weather', grace_ms => 0)
  * CALL g.system.history(dataset => 'weather')
  * }}}
  *
  * Each returns a small driver-local result set (a [[LocalScan]]) with
  * the operation's accounting, so maintenance can be scheduled from
  * pure SQL — no Scala API needed. The heavy lifting inside each verb
  * (index folds, ref-count deltas, blob sweeps) stays distributed; only
  * the summary surfaces here.
  *
  * Reference protocol: retention/compaction have no direct equivalent
  * in hbase.clj (HBase owns compaction there); these are the
  * lake-native maintenance verbs SURVEY.md §2 derives from its
  * delete-table / ref-count semantics (hbase.clj:156-172).
  */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Seq[String] =
    Seq("compact_index", "expire_versions", "gc", "history",
      "stats", "tag", "drop_tag", "tags", "pack_chunks",
      "verify_chunks", "value_stats", "analyze", "clone_table",
      "merge_table", "build_vector_index", "refresh_vector_index",
      "probe_vector_index", "delete_from_vector_index",
      "compact_vector_index", "retrain_vector_index",
      "vector_index_stats", "build_pyramid",
      "stencil", "index_text", "compact_text_index", "probe_text_index",
      "probe_text_phrase", "text_index_stats", "delete_from_text_index")

  def load(procName: String, lake: => GraftLake): UnboundProcedure =
    procName match {
      case "build_vector_index"   => new BuildVectorIndex(lake)
      case "refresh_vector_index" => new RefreshVectorIndex(lake)
      case "probe_vector_index"   => new ProbeVectorIndex(lake)
      case "delete_from_vector_index" => new DeleteFromVectorIndex(lake)
      case "compact_vector_index" => new CompactVectorIndex(lake)
      case "retrain_vector_index" => new RetrainVectorIndex(lake)
      case "vector_index_stats"   => new VectorIndexStats(lake)
      case "text_index_stats"     => new TextIndexStats(lake)
      case "build_pyramid"   => new BuildPyramid(lake)
      case "stencil"         => new Stencil(lake)
      case "index_text"         => new IndexText(lake)
      case "compact_text_index" => new CompactTextIndex(lake)
      case "probe_text_index"   => new ProbeTextIndex(lake)
      case "probe_text_phrase"  => new ProbeTextPhrase(lake)
      case "delete_from_text_index" => new DeleteFromTextIndex(lake)
      case "pack_chunks"     => new PackChunks(lake)
      case "clone_table"     => new CloneTable(lake)
      case "merge_table"     => new MergeTable(lake)
      case "analyze"         => new Analyze(lake)
      case "verify_chunks"   => new VerifyChunks(lake)
      case "value_stats"     => new ValueStats(lake)
      case "compact_index"   => new CompactIndex(lake)
      case "expire_versions" => new ExpireVersions(lake)
      case "gc"              => new Gc(lake)
      case "history"         => new History(lake)
      case "stats"           => new Stats(lake)
      case "tag"             => new Tag(lake)
      case "drop_tag"        => new DropTag(lake)
      case "tags"            => new Tags(lake)
      case other => throw new IllegalArgumentException(
        s"unknown procedure system.$other; available: " +
          names.mkString(", "))
    }

  def identifiers(catalog: String): Array[Identifier] =
    names.map(Identifier.of(Namespace, _)).toArray

  /** Shared plumbing: trivially self-bound (parameter types are
    * declared, Spark's BindProcedures aligns named/positional args and
    * defaults into one InternalRow), side-effecting (never cached or
    * re-invoked speculatively), one LocalScan of summary rows out.
    */
  private abstract class MaintenanceProc(lake: => GraftLake)
      extends UnboundProcedure with BoundProcedure {
    protected def outputSchema: StructType
    protected def run(lk: GraftLake, args: InternalRow): Seq[InternalRow]

    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = run(lake, input).toArray
      val schema = outputSchema
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = schema
      }).iterator()
    }

    protected def datasetParam: ProcedureParameter =
      ProcedureParameter.in("dataset", StringType)
        .comment("dataset (namespace) to operate on").build()

    protected def connect(lk: GraftLake, args: InternalRow) = {
      val n = args.getUTF8String(0).toString
      require(lk.exists(n), s"no such dataset: $n")
      lk.connect(n)
    }

    protected def str(s: String): UTF8String = UTF8String.fromString(s)
  }

  /** Fold per-version index partitions into the merged segment store
    * (incremental; level-merges past the segment cap). Returns the
    * number of partition dirs folded.
    */
  private final class CompactIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "compact_index"
    override def description(): String =
      "fold per-version index partitions into the merged segment store"
    override def parameters(): Array[ProcedureParameter] =
      Array(datasetParam)
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("folded_partitions", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val folded = ds.compactIndexLog()
      Seq(InternalRow(args.getUTF8String(0).copy(), folded))
    }
  }

  /** Zero-chunk-copy CLONE (branch) of a table at a version — see
    * [[graft.core.GraftDataset.cloneVariable]]: O(index) row copy
    * under a fresh key, shared refcounted chunks, decode lineage for
    * pre-clone writer versions. The clone is immediately a
    * first-class table: readable, writable, renamable, droppable,
    * independently retained.
    */
  private final class CloneTable(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "clone_table"
    override def description(): String =
      "zero-chunk-copy clone of table(s) at a version (default HEAD); " +
        "comma-separated source/target lists branch atomically"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("source", StringType)
        .comment("table(s) to clone; comma-separated for a " +
          "whole-dataset branch in one commit").build(),
      ProcedureParameter.in("target", StringType)
        .comment("new table name(s), aligned with source").build(),
      ProcedureParameter.in("version", LongType).defaultValue("0")
        .comment("version to clone at; 0 = current HEAD").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("target", StringType, nullable = false),
      StructField("cloned_at", LongType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val sources = args.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val targets = args.getUTF8String(2).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(sources.length == targets.length && sources.nonEmpty,
        s"source list (${sources.length}) and target list " +
          s"(${targets.length}) must align and be non-empty")
      val at = args.getLong(3) match {
        case 0L => ds.latestVersion.getOrElse(
          throw new IllegalArgumentException("no committed versions"))
        case v => v
      }
      val committed = ds.cloneVariables(sources.zip(targets), at)
      sources.zip(targets).map { case (src, tgt) =>
        InternalRow(args.getUTF8String(0).copy(), str(src), str(tgt),
          at, committed)
      }
    }
  }

  /** Materialize a multi-resolution overview pyramid — see
    * [[graft.operators.ArrayOps.buildPyramid]]: level k is level k−1
    * block-aggregated by `factor` per dim, committed as
    * `<table>_l<k>` (each level immediately a first-class table).
    * Each level reads only the previous one, so the total extra I/O
    * is a geometric series of the base.
    */
  private final class BuildPyramid(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "build_pyramid"
    override def description(): String =
      "materialize overview levels of a table as <table>_l<k>"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("table", StringType)
        .comment("base variable").build(),
      ProcedureParameter.in("levels", IntegerType)
        .comment("number of overview levels to build").build(),
      ProcedureParameter.in("factor", IntegerType).defaultValue("2")
        .comment("per-dim block factor between levels").build(),
      ProcedureParameter.in("agg", StringType).defaultValue("'avg'")
        .comment("avg | min | max | sum").build(),
      ProcedureParameter.in("version", LongType).defaultValue("0")
        .comment("base version; 0 = current HEAD").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("level_table", StringType, nullable = false),
      StructField("level", IntegerType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val table = args.getUTF8String(1).toString
      val levels = args.getInt(2)
      val factor = args.getInt(3)
      val aggName = args.getUTF8String(4).toString
      val at = args.getLong(5) match {
        case 0L => ds.latestVersion.getOrElse(
          throw new IllegalArgumentException("no committed versions"))
        case v => v
      }
      require(factor >= 2, "factor must be >= 2")
      import org.apache.spark.sql.{functions => F}
      val aggFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        aggName match {
          case "avg" => F.avg
          case "min" => F.min
          case "max" => F.max
          case "sum" => F.sum
          case other => throw new IllegalArgumentException(
            s"agg must be avg|min|max|sum, got '$other'")
        }
      val rank = ds.metadata(at).variable(table).shape.length
      val out = graft.operators.ArrayOps.buildPyramid(ds, table, at,
        Seq.fill(rank)(factor.toLong), levels, aggFn)
      out.drop(1).zipWithIndex.map { case ((name, v), k) =>
        InternalRow(args.getUTF8String(0).copy(), str(name), k + 1, v)
      }
    }
  }

  /** Materialize a radius-r neighborhood mean of a table as the
    * first-class variable `<table>_sm<r>` — chunk-halo exchange under
    * the hood ([[graft.operators.ArrayOps.stencilAvg]]), one commit.
    */
  private final class Stencil(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "stencil"
    override def description(): String =
      "materialize a neighborhood-mean smoothing of a table as <table>_sm<r>"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("table", StringType)
        .comment("source variable").build(),
      ProcedureParameter.in("radius", IntegerType).defaultValue("1")
        .comment("Chebyshev neighborhood radius (<= min chunk dim)").build(),
      ProcedureParameter.in("version", LongType).defaultValue("0")
        .comment("source version; 0 = current HEAD").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("result_table", StringType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val table = args.getUTF8String(1).toString
      val radius = args.getInt(2)
      val at = args.getLong(3) match {
        case 0L => ds.latestVersion.getOrElse(
          throw new IllegalArgumentException("no committed versions"))
        case v => v
      }
      val (rname, v) =
        graft.operators.ArrayOps.materializeStencil(ds, table, at, radius)
      Seq(InternalRow(args.getUTF8String(0).copy(), str(rname), v))
    }
  }

  /** Build or append-refresh the persisted BM25 text index from any
    * SQL-resolvable source of (doc_id, text) — see
    * [[graft.operators.TextIndexOps.indexDocuments]]: one tokenize
    * pass over the source, every artifact appends, probes sum across
    * batches. Re-invoking with NEW doc_ids IS the refresh.
    */
  private final class IndexText(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "index_text"
    override def description(): String =
      "build or append-refresh a persisted BM25 text index from a " +
        "(doc_id, text) table"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index_dir", StringType)
        .comment("index root directory").build(),
      ProcedureParameter.in("source", StringType)
        .comment("table/view with doc_id, text (NEW doc_ids only)").build(),
      ProcedureParameter.in("n_buckets", IntegerType).defaultValue("0")
        .comment("postings buckets, pinned at FIRST build (0 = " +
          "stored value or the 64 default); later calls must match")
        .build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("index_dir", StringType, nullable = false),
      StructField("docs_indexed", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val dir = args.getUTF8String(0).toString
      val src = lk.spark.table(args.getUTF8String(1).toString)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      graft.operators.TextIndexOps.indexDocuments(lk.spark, src, dir,
        Some(args.getInt(2)).filter(_ > 0))
      Seq(InternalRow(args.getUTF8String(0).copy(), src.count()))
    }
  }

  /** Fold the text index's per-batch artifacts to one row per key —
    * bounds file/row growth after many micro-refreshes; probes never
    * REQUIRE it (maintenance-window semantics).
    */
  private final class CompactTextIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "compact_text_index"
    override def description(): String =
      "fold a text index's per-batch artifacts to one row per key"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index_dir", StringType)
        .comment("index root directory").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("index_dir", StringType, nullable = false),
      StructField("status", StringType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      graft.operators.TextIndexOps.compactTextIndex(lk.spark,
        args.getUTF8String(0).toString)
      Seq(InternalRow(args.getUTF8String(0).copy(), str("compacted")))
    }
  }

  /** BM25-score the indexed corpus against an ARRAY of query terms —
    * zero corpus I/O, postings pruned to the terms' buckets. The
    * parameter is array-typed rather than a delimited string: the
    * tokenizer is space-split only, so an indexed token may legally
    * contain any would-be delimiter — an array can never mis-split a
    * term.
    */
  private final class ProbeTextIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "probe_text_index"
    override def description(): String =
      "top-20 BM25 retrieval from a persisted text index " +
        "(zero corpus I/O)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index_dir", StringType)
        .comment("index root directory").build(),
      ProcedureParameter.in("terms", ArrayType(StringType))
        .comment("query terms, e.g. array('fox', 'dog')").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val arr = args.getArray(1)
      // a null element is a caller bug (e.g. array('fox', NULL)) —
      // refuse by name rather than NPE inside the decode loop. Empty
      // strings pass through: '' is a legal indexed token, and the
      // Scala API scores it like any other term
      val terms = (0 until arr.numElements()).map { i =>
        require(!arr.isNullAt(i),
          s"probe_text_index: terms[$i] is NULL — pass only non-null " +
            "query strings")
        arr.getUTF8String(i).toString
      }
      graft.operators.TextIndexOps
        .probeTextIndex(lk.spark, args.getUTF8String(0).toString, terms)
        .collect().toSeq
        .map(r => InternalRow(r.getLong(0), r.getDouble(1)))
    }
  }

  /** PHRASE retrieval from the persisted text index — exact
    * consecutive term sequences via the stored position lists, ranked
    * by occurrence count; see
    * [[graft.operators.TextIndexOps.probePhrase]]. Array-typed for
    * the same reason as probe_text_index; ORDER matters (it is the
    * phrase), and duplicate terms are legal.
    */
  private final class ProbeTextPhrase(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "probe_text_phrase"
    override def description(): String =
      "top-20 exact-phrase retrieval from a persisted text index " +
        "(positional postings, zero corpus I/O)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index_dir", StringType)
        .comment("index root directory").build(),
      ProcedureParameter.in("terms", ArrayType(StringType))
        .comment("the phrase, in order, e.g. array('quick', 'brown')")
        .build(),
      ProcedureParameter.in("slop", IntegerType).defaultValue("0")
        .comment("proximity window: each term may trail the previous " +
          "by up to 1 + slop positions (0 = exact phrase)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_matches", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val arr = args.getArray(1)
      // NO empty-string filtering here: '' is a legal indexed token
      // (double-space seams) and a phrase is positional — dropping a
      // slot would silently shift every later term's offset and turn
      // the query into a different phrase
      val phrase = (0 until arr.numElements()).map { i =>
        require(!arr.isNullAt(i),
          s"probe_text_phrase: terms[$i] is NULL — pass only non-null " +
            "query strings")
        arr.getUTF8String(i).toString
      }
      graft.operators.TextIndexOps
        .probePhrase(lk.spark, args.getUTF8String(0).toString, phrase,
          slop = args.getInt(2))
        .collect().toSeq
        .map(r => InternalRow(r.getLong(0), r.getLong(1)))
    }
  }

  /** Tombstone documents out of the persisted text index — the
    * takedown verb; see
    * [[graft.operators.TextIndexOps.deleteFromTextIndex]]: O(deleted)
    * rows appended to the tombstone ledger, probes/stats anti-join it
    * immediately, compaction folds the docs out of every artifact.
    * Idempotent per id; never-indexed ids refuse loudly.
    */
  private final class DeleteFromTextIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "delete_from_text_index"
    override def description(): String =
      "tombstone doc_ids out of a persisted text index (O(deleted) " +
        "ledger append; compaction folds them out)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index_dir", StringType)
        .comment("index root directory").build(),
      ProcedureParameter.in("doc_ids", StringType)
        .comment("comma-separated document ids to delete").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("index_dir", StringType, nullable = false),
      StructField("deleted", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ids = args.getUTF8String(1).toString.split(",")
        .iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
      require(ids.nonEmpty, "delete_from_text_index: no doc_ids given")
      import lk.spark.implicits._
      val n = graft.operators.TextIndexOps.deleteFromTextIndex(
        lk.spark, args.getUTF8String(0).toString, ids.toDF("doc_id"))
      Seq(InternalRow(args.getUTF8String(0).copy(), n))
    }
  }

  /** Three-way merge of a clone back into its source — see
    * [[graft.core.GraftDataset.mergeBranch]]: the branch's changed
    * chunks replace the source's (conflicts refuse unless `force`),
    * content-addressed dedup makes it ~zero new chunk bytes.
    */
  private final class MergeTable(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "merge_table"
    override def description(): String =
      "merge a cloned table's changes back into its source " +
        "(three-way, chunk-granular; conflicts refuse unless force)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("branch", StringType)
        .comment("cloned table whose changes to merge back").build(),
      ProcedureParameter.in("force", BooleanType).defaultValue("false")
        .comment("merge conflicted chunks with the branch side winning")
        .build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("branch", StringType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val branch = args.getUTF8String(1).toString
      val committed = ds.mergeBranch(branch, args.getBoolean(2))
      Seq(InternalRow(args.getUTF8String(0).copy(), str(branch),
        committed))
    }
  }

  /** Expire versions beyond the newest `keep_last`; one row per
    * expired version id (empty result = nothing to expire).
    */
  private final class ExpireVersions(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "expire_versions"
    override def description(): String =
      "expire committed versions beyond keep_last, or older than a " +
        "timestamp (version ids are commit epoch-millis)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("keep_last", IntegerType)
        .defaultValue("0")
        .comment("number of newest versions to retain (>= 1)").build(),
      ProcedureParameter.in("older_than", LongType)
        .defaultValue("0")
        .comment("expire versions committed before this epoch-millis " +
          "timestamp; HEAD always survives").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("expired_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val dsName = args.getUTF8String(0).copy()
      val keepLast = args.getInt(1)
      val olderThan = args.getLong(2)
      require((keepLast >= 1) ^ (olderThan > 0L),
        "pass exactly one of keep_last or older_than")
      val expired =
        if (olderThan > 0L) ds.expireVersionsOlderThan(olderThan)
        else ds.expireVersions(keepLast)
      expired.map(v => InternalRow(dsName, v))
    }
  }

  /** Fold committed per-chunk blobs into large pack files (the
    * small-file compaction step — see GraftDataset.packChunks).
    */
  private final class PackChunks(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "pack_chunks"
    override def description(): String =
      "fold committed chunk blobs into large immutable pack files"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("rewrite_live_frac", DoubleType)
        .defaultValue("0.5")
        .comment("rewrite packs whose live-byte fraction fell below " +
          "this threshold (space reclaim)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("blobs_packed", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val n = ds.packChunks(args.getDouble(1))
      Seq(InternalRow(args.getUTF8String(0).copy(), n))
    }
  }

  /** Distributed integrity scrub — re-hash every committed chunk
    * against its content address (see GraftDataset.verifyChunks).
    * One summary row when clean; one row per corrupt hash otherwise.
    */
  private final class VerifyChunks(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "verify_chunks"
    override def description(): String =
      "re-hash every committed chunk payload against its content " +
        "address (blobs and pack ranges) — the object-store fsck"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("max_report", IntegerType)
        .defaultValue("100")
        .comment("cap on corrupt hashes returned").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("chunks_checked", LongType, nullable = false),
      StructField("corrupt_count", LongType, nullable = false),
      StructField("corrupt_hash", StringType, nullable = true)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val dsName = args.getUTF8String(0).copy()
      val (checked, nBad, corrupt) = ds.verifyChunks(args.getInt(1))
      if (corrupt.isEmpty)
        Seq(InternalRow(dsName, checked, 0L, null))
      else corrupt.map(h => InternalRow(dsName, checked, nBad, str(h)))
    }
  }

  /** Zone-map-backed value min/max for one variable (ANALYZE-style:
    * pure index metadata, zero chunk reads — see
    * GraftDataset.valueStats).
    */
  private final class ValueStats(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "value_stats"
    override def description(): String =
      "value min/max of a variable from zone maps (no chunk reads)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("variable", StringType)
        .comment("variable (table) to summarize").build(),
      ProcedureParameter.in("as_of", LongType)
        .defaultValue("0")
        .comment("version to resolve at (0 = latest)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("variable", StringType, nullable = false),
      StructField("value_min", DoubleType, nullable = true),
      StructField("value_max", DoubleType, nullable = true),
      StructField("n_live_chunks", LongType, nullable = false),
      StructField("unknown_chunks", LongType, nullable = false),
      // exact written-tile sum from the vsum stats; null when any
      // live tile lacks them (a partial total would read as the whole)
      StructField("value_sum", DoubleType, nullable = true),
      StructField("unknown_sum_chunks", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val variable = args.getUTF8String(1).toString
      val asOf = args.getLong(2) match {
        case 0L => ds.latestVersion.getOrElse(
          throw new IllegalArgumentException("dataset has no versions"))
        case v => v
      }
      val r = ds.valueStats(variable, asOf).head()
      Seq(InternalRow(args.getUTF8String(1).copy(),
        if (r.isNullAt(0)) null else r.getDouble(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        r.getLong(5)))
    }
  }

  /** Backfill zone stats for index rows that lack them (pre-stats
    * history) — each stat-less chunk decodes once and the store
    * rewrites as one level-merged segment, after which the value-skip
    * and MIN/MAX/SUM/AVG pushdowns apply to the old rows too (see
    * GraftDataset.analyzeIndexStats).
    */
  private final class Analyze(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "analyze"
    override def description(): String =
      "backfill zone stats for pre-stats index rows (decode once, " +
        "rewrite as one merged segment)"
    override def parameters(): Array[ProcedureParameter] =
      Array(datasetParam)
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("rows_backfilled", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val n = ds.analyzeIndexStats()
      Seq(InternalRow(args.getUTF8String(0).copy(), n))
    }
  }

  /** Sweep unreferenced chunk blobs + stale staging/planning dirs.
    * grace_ms guards in-flight readers/writers; 0 = immediate (tests,
    * post-retention reclaim).
    */
  private final class Gc(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "gc"
    override def description(): String =
      "sweep unreferenced chunks and stale staging dirs"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("grace_ms", LongType)
        .defaultValue("3600000")
        .comment("min age before an unreferenced blob is swept").build(),
      ProcedureParameter.in("stale_staging_ms", LongType)
        .defaultValue("86400000")
        .comment("min idle age before a crashed writer's staging is " +
          "adopted and dropped").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("chunks_deleted", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val n = ds.gc(args.getLong(1), args.getLong(2))
      Seq(InternalRow(args.getUTF8String(0).copy(), n))
    }
  }

  /** Dataset-level totals (`ds.stats()` for SQL): one distributed
    * aggregate over manifest/index/ref state.
    */
  private final class Stats(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "stats"
    override def description(): String =
      "dataset totals: versions, chunks, bytes, index entries, refs"
    override def parameters(): Array[ProcedureParameter] =
      Array(datasetParam)
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("n_versions", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false),
      StructField("total_chunk_bytes", LongType, nullable = false),
      StructField("n_index_entries", LongType, nullable = false),
      StructField("ref_total", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val r = ds.stats().head()
      Seq(InternalRow(args.getUTF8String(0).copy(), r.getLong(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }
  }

  /** Pin a named ref to a version (default: HEAD) — reproducible
    * snapshot handles; `VERSION AS OF '<name>'` resolves through it.
    */
  private final class Tag(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "tag"
    override def description(): String =
      "pin a named ref to a version (default HEAD); " +
        "resolvable via VERSION AS OF '<name>'"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("name", StringType)
        .comment("tag name (not a bare number)").build(),
      ProcedureParameter.in("version", LongType).defaultValue("0")
        .comment("version to pin; 0 = current HEAD").build(),
      ProcedureParameter.in("replace", BooleanType).defaultValue("false")
        .comment("move the tag if it already exists").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("tag", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val name = args.getUTF8String(1).toString
      val version = args.getLong(2) match {
        case 0L => ds.latestVersion.getOrElse(
          throw new IllegalArgumentException("no committed versions"))
        case v => v
      }
      ds.tag(name, version, args.getBoolean(3))
      Seq(InternalRow(args.getUTF8String(0).copy(),
        UTF8String.fromString(name), version))
    }
  }

  /** Remove a tag. */
  private final class DropTag(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "drop_tag"
    override def description(): String = "remove a named version ref"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("name", StringType)
        .comment("tag name").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("tag", StringType, nullable = false),
      StructField("existed", BooleanType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val name = args.getUTF8String(1).toString
      Seq(InternalRow(args.getUTF8String(0).copy(),
        UTF8String.fromString(name), ds.dropTag(name)))
    }
  }

  /** List tags, name-sorted. */
  private final class Tags(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "tags"
    override def description(): String =
      "list named version refs, name-sorted"
    override def parameters(): Array[ProcedureParameter] =
      Array(datasetParam)
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("tag", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val dsName = args.getUTF8String(0).copy()
      ds.tags().map { case (n, v) =>
        InternalRow(dsName, UTF8String.fromString(n), v)
      }
    }
  }

  /** Live (un-expired) version ids, newest first — the SQL-side
    * discovery surface for `VERSION AS OF` time travel.
    */
  private final class History(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "history"
    override def description(): String =
      "live version ids, newest first (time-travel discovery)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("max_versions", IntegerType)
        .defaultValue("2147483647")
        .comment("cap on returned rows (newest first)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("version_id", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val ds = connect(lk, args)
      val dsName = args.getUTF8String(0).copy()
      ds.versionIds().take(args.getInt(1))
        .map(v => InternalRow(dsName, v))
    }
  }

  /** The persisted IVF-PQ vector index as SQL verbs — see
    * [[graft.operators.VectorIndexOps]]. `source_dir` is a directory
    * holding an `embeddings.parquet` (vec_id, embedding ARRAY<FLOAT>);
    * the index lands as five versioned variables in `dataset`.
    */
  private final class BuildVectorIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "build_vector_index"
    override def description(): String =
      "build the persisted IVF-PQ index (centroids, codebook, lists, " +
        "codes, norms) from an embeddings table in ONE commit"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("source_dir", StringType)
        .comment("directory holding embeddings.parquet").build(),
      ProcedureParameter.in("k", IntegerType).defaultValue("8")
        .comment("coarse cells (tune ~ sqrt(N))").build(),
      ProcedureParameter.in("n_probe", IntegerType).defaultValue("2")
        .comment("cells probed per query").build(),
      ProcedureParameter.in("m_sub", IntegerType).defaultValue("4")
        .comment("PQ subspaces (must divide dims)").build(),
      ProcedureParameter.in("ks", IntegerType).defaultValue("8")
        .comment("codewords per subspace").build(),
      ProcedureParameter.in("top_c", IntegerType).defaultValue("64")
        .comment("ADC shortlist size").build(),
      ProcedureParameter.in("top_k", IntegerType).defaultValue("5")
        .comment("neighbors returned per query").build(),
      ProcedureParameter.in("train_stride", LongType).defaultValue("1")
        .comment("train quantizers on the sample vec_id % stride = 0 " +
          "(1 = full corpus); every vector is still assigned/encoded")
        .build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val dsName = args.getUTF8String(0).toString
      val dir = args.getUTF8String(1).toString
      val e = graft.operators.SimilarityOps.emb(lk.spark, dir)
      // dims comes from the DATA, never a default: a mismatched
      // default would silently mis-slice subvectors (slice past the
      // array end yields short subvectors) instead of failing, and
      // m_sub must validate against the real width. One aggregate
      // also refuses the two silent-corruption inputs by name: an
      // empty source and ragged widths (the first row's width would
      // otherwise mis-slice every other row)
      val f = org.apache.spark.sql.functions
      val drow = e.agg(f.min(f.size(f.col("e"))).as("lo"),
        f.max(f.size(f.col("e"))).as("hi"),
        f.count(f.lit(1)).as("n")).head()
      require(drow.getLong(2) > 0L,
        s"build_vector_index: $dir holds no embeddings")
      require(drow.getInt(0) == drow.getInt(1),
        s"build_vector_index: ragged embedding widths " +
          s"${drow.getInt(0)}..${drow.getInt(1)} in $dir — every " +
          "vector must share one dimensionality")
      val dims = drow.getInt(0)
      // the config persists INTO the index (geometry = variable
      // shapes, probe params shape-encoded) — later refresh/probe/
      // delete calls read it back, no re-statement needed
      val cfg = graft.operators.VectorIndexConfig(
        dims = dims,
        k = args.getInt(2), nProbe = args.getInt(3),
        mSub = args.getInt(4), ks = args.getInt(5),
        topC = args.getInt(6), topK = args.getInt(7),
        rnStore = math.max(2, args.getInt(3)))
      val v = graft.operators.VectorIndexOps
        .buildVectorIndex(lk.spark, lk.root, e, dsName, cfg,
          trainStride = args.getLong(8))
      Seq(InternalRow(args.getUTF8String(0).copy(), v))
    }
  }

  /** Incremental refresh: vectors with `vec_id >= min_vec_id` assign
    * against the STORED quantizers; only their cells write (O(new)
    * chunks, one commit, shape growth when ids extend past the index).
    */
  private final class RefreshVectorIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "refresh_vector_index"
    override def description(): String =
      "incrementally add new vectors to a persisted IVF-PQ index " +
        "(stored quantizers, O(new) writes)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("source_dir", StringType)
        .comment("directory holding embeddings.parquet").build(),
      ProcedureParameter.in("min_vec_id", LongType)
        .comment("refresh vectors with vec_id >= this").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val dsName = args.getUTF8String(0).toString
      val dir = args.getUTF8String(1).toString
      val minId = args.getLong(2)
      val e = graft.operators.SimilarityOps.emb(lk.spark, dir)
        .where(org.apache.spark.sql.functions.col("vec_id") >= minId)
      val v = graft.operators.VectorIndexOps
        .refreshVectorIndex(lk.spark, lk.root, e, dsName)
      Seq(InternalRow(args.getUTF8String(0).copy(), v))
    }
  }

  /** Re-train a drifted index in place — the action verb for the
    * vector_index_stats skew signal; see
    * [[graft.operators.VectorIndexOps.retrainVectorIndex]]: live
    * membership re-clustered under ONE commit, deletes survive,
    * asOf probes keep the old geometry.
    */
  private final class RetrainVectorIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "retrain_vector_index"
    override def description(): String =
      "re-cluster a persisted IVF-PQ index in place (one commit; " +
        "optionally more cells; old versions keep their geometry)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("source_dir", StringType)
        .comment("directory holding embeddings.parquet").build(),
      ProcedureParameter.in("k", IntegerType).defaultValue("0")
        .comment("new coarse-cell count (0 = keep the stored k)")
        .build(),
      ProcedureParameter.in("train_stride", LongType).defaultValue("1")
        .comment("re-train quantizers on the sample vec_id % stride " +
          "= 0 (1 = full live corpus); every live vector is still " +
          "assigned/encoded").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("committed_version", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val dsName = args.getUTF8String(0).toString
      val dir = args.getUTF8String(1).toString
      val e = graft.operators.SimilarityOps.emb(lk.spark, dir)
      val v = graft.operators.VectorIndexOps.retrainVectorIndex(
        lk.spark, lk.root, e, dsName,
        Some(args.getInt(2)).filter(_ > 0),
        trainStride = args.getLong(3))
      Seq(InternalRow(args.getUTF8String(0).copy(), v))
    }
  }

  /** Probe the persisted index: top-k neighbors per query vector
    * (vec_id < query_max_id), returned as the procedure's result set.
    */
  private final class ProbeVectorIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "probe_vector_index"
    override def description(): String =
      "top-k ANN over a persisted IVF-PQ index (zero build jobs)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("source_dir", StringType)
        .comment("directory holding embeddings.parquet").build(),
      ProcedureParameter.in("query_max_id", LongType).defaultValue("5")
        .comment("query set: vec_id < this").build(),
      ProcedureParameter.in("as_of", LongType).defaultValue("-1")
        .comment("probe at this index version (<= 0 = HEAD) — " +
          "reproduces a snapshot's retrieval, e.g. pre-delete").build(),
      ProcedureParameter.in("n_probe", IntegerType).defaultValue("0")
        .comment("per-call recall/latency override (0 = the index's " +
          "stored default; capped by its stored assignment ranks)")
        .build(),
      ProcedureParameter.in("top_k", IntegerType).defaultValue("0")
        .comment("neighbors per query (0 = stored default)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("cos_sim", DoubleType, nullable = false),
      StructField("rank", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val dsName = args.getUTF8String(0).toString
      val dir = args.getUTF8String(1).toString
      val e = graft.operators.SimilarityOps.emb(lk.spark, dir)
      val asOf = Some(args.getLong(3)).filter(_ > 0L)
      graft.operators.VectorIndexOps
        .probeVectorIndex(lk.spark, lk.root, e, args.getLong(2), dsName,
          asOf, Some(args.getInt(4)).filter(_ > 0),
          Some(args.getInt(5)).filter(_ > 0))
        .collect().toSeq
        .map(r => InternalRow(r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getLong(3)))
    }
  }

  /** Tombstone vectors out of the persisted index: one O(deleted)-
    * cells commit; the ids vanish from every probe at HEAD but stay
    * answerable asOf earlier versions (see
    * [[graft.operators.VectorIndexOps.deleteFromVectorIndex]]).
    */
  private final class DeleteFromVectorIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "delete_from_vector_index"
    override def description(): String =
      "tombstone vector ids out of a persisted IVF-PQ index " +
        "(one commit, O(deleted) cells, version-scoped)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("vec_ids", StringType)
        .comment("comma-separated vector ids to delete").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("committed_version", LongType, nullable = false),
      StructField("deleted", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val dsName = args.getUTF8String(0).toString
      val ids = args.getUTF8String(1).toString.split(",")
        .iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
      require(ids.nonEmpty, "delete_from_vector_index: no ids given")
      import lk.spark.implicits._
      val v = graft.operators.VectorIndexOps.deleteFromVectorIndex(
        lk.spark, lk.root, ids.toDF("vec_id"), dsName)
      Seq(InternalRow(args.getUTF8String(0).copy(), v, ids.length.toLong))
    }
  }

  /** Per-cell inverted-list sizes of a persisted vector index — the
    * skew dashboard (see
    * [[graft.operators.VectorIndexOps.vectorIndexStats]]): reads the
    * stored assignment only, never the vectors.
    */
  private final class VectorIndexStats(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "vector_index_stats"
    override def description(): String =
      "per-cell inverted-list sizes of a persisted vector index " +
        "(assignment-only read)"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("as_of", LongType).defaultValue("-1")
        .comment("report a historical snapshot (<= 0 = HEAD)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("n_vectors", LongType, nullable = false),
      StructField("min_vec_id", LongType, nullable = false),
      StructField("max_vec_id", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      graft.operators.VectorIndexOps.vectorIndexStats(lk.spark, lk.root,
        args.getUTF8String(0).toString,
        Some(args.getLong(1)).filter(_ > 0L))
        .collect().toSeq.map(r => InternalRow(r.getInt(0), r.getLong(1),
          r.getLong(2), r.getLong(3)))
    }
  }

  /** Vocabulary/doc/token-volume statistics of a persisted text index
    * from its artifacts alone — zero corpus I/O (see
    * [[graft.operators.TextIndexOps.textIndexStats]]).
    */
  private final class TextIndexStats(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "text_index_stats"
    override def description(): String =
      "vocab/doc/token stats of a persisted text index (index " +
        "artifacts only, zero corpus I/O)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index_dir", StringType)
        .comment("index root directory").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("n_terms", LongType, nullable = false),
      StructField("n_docs", LongType, nullable = false),
      StructField("total_tokens", LongType, nullable = false),
      StructField("max_df", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      graft.operators.TextIndexOps.textIndexStats(lk.spark,
        args.getUTF8String(0).toString)
        .collect().toSeq.map(r => InternalRow(r.getLong(0),
          r.getLong(1), r.getLong(2), r.getLong(3)))
    }
  }

  /** Fold a refresh-heavy vector index's commit history to bounded
    * metadata — expire + index-log fold + pack + gc composed; HEAD
    * probes are identical before/after (see
    * [[graft.operators.VectorIndexOps.compactVectorIndex]]).
    */
  private final class CompactVectorIndex(lake: => GraftLake)
      extends MaintenanceProc(lake) {
    override def name(): String = "compact_vector_index"
    override def description(): String =
      "fold a vector index's per-refresh commit history (expire + " +
        "log fold + pack + gc); HEAD probes unchanged"
    override def parameters(): Array[ProcedureParameter] = Array(
      datasetParam,
      ProcedureParameter.in("keep_last", IntegerType).defaultValue("1")
        .comment("versions to keep (>= 1)").build())
    override protected val outputSchema: StructType = StructType(Seq(
      StructField("dataset", StringType, nullable = false),
      StructField("versions_expired", LongType, nullable = false),
      StructField("log_dirs_folded", LongType, nullable = false),
      StructField("blobs_collected", LongType, nullable = false)))
    override protected def run(lk: GraftLake,
        args: InternalRow): Seq[InternalRow] = {
      val (expired, folded, swept) =
        graft.operators.VectorIndexOps.compactVectorIndex(
          lk.spark, lk.root, args.getUTF8String(0).toString,
          args.getInt(1))
      Seq(InternalRow(args.getUTF8String(0).copy(), expired, folded,
        swept))
    }
  }
}
