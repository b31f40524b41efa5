package graft.core

/** Core data model of the versioned chunked N-D array store — the
  * Spark-native re-expression of the reference's three KV tables
  * (reference: src/io/mandoline/backend/hbase.clj:19-36 schema comment).
  *
  * - chunks:   content-addressed blobs, SHA-1 keyed (hbase.clj:21-23)
  * - indices:  (variable, chunk-grid coord, version) -> chunk hash
  *             (hbase.clj:24-25); coord is a typed ARRAY<LONG> instead
  *             of the reference's "/"-joined string codec
  *             (hbase.clj:176-179)
  * - versions: immutable commit log with JSON dataset metadata
  *             (hbase.clj:26-28,263-268)
  */
object Model {

  /** A content-addressed chunk payload (hbase.clj:21-23). */
  case class ChunkRecord(hash: String, data: Array[Byte])

  /** Append-only ref-count delta — replaces the reference's racy
    * read-modify-write counter (hbase.clj:156-172) with an associative
    * aggregate over a log (SURVEY §4.4).
    */
  case class RefDelta(hash: String, delta: Long)

  /** One index row: resolves a chunk-grid coordinate of a variable at a
    * version to a chunk hash (hbase.clj:24-25). Scalar (0-D) variables
    * use the empty coordinate (reference sentinel "_", hbase.clj:177-178).
    */
  case class IndexEntry(
      variable: String, coord: Seq[Long], versionId: Long, chunkHash: String)

  /** Per-variable metadata: the element dtypes exercised by the
    * reference tests are double/float/short (hbase_test.clj:16-18);
    * int/long added for completeness. Fill value covers unwritten
    * regions (NaN for float types — hbase_test.clj:152-156).
    */
  case class VariableMeta(
      name: String,
      dtype: String, // double | float | short | int | long
      shape: Seq[Long],
      chunkDims: Seq[Long],
      fillValue: Double,
      /** Physical key of this variable's index rows, stable across
        * RENAME (empty ⇒ same as `name`). Index rows key on it, so a
        * rename is a metadata-only commit — no index rewrite — and
        * writes racing a rename still land on the same rows.
        */
      indexName: String = "",
      /** Decode lineage for cloned variables: (sourceIdxKey, upto)
        * pairs, ascending by `upto`. A clone copies the source's
        * resolved index rows under a fresh key, PRESERVING each row's
        * original `writerVersion` — but the metadata those chunks
        * decode under lives in history under the SOURCE's key. A row
        * with writerVersion ≤ the first covering `upto` decodes under
        * that entry's key (chains capture clone-of-clone). Empty for
        * ordinary variables.
        */
      lineage: Seq[(String, Long)] = Seq.empty,
      /** For clones: the HEAD version the last [[mergeBranch]] of this
        * branch into its source read from (0 = never merged). Source
        * changes at or before it are already reconciled, so only
        * source writes AFTER it (that are not merge commits of this
        * branch themselves) conflict with branch changes — the
        * merge-base advance that lets branch → merge → branch → merge
        * cycles stay conflict-free, like a VCS updating the merge
        * base.
        */
      mergeBase: Long = 0L,
      /** Optional CHECK constraint: a SQL boolean expression over the
        * cell columns `x0..x{rank-1}` and `value`, enforced on every
        * write path (INSERT, row-level DML, streaming sinks, the Lake
        * API — they all funnel through SlabWriter.writeSlab). ANSI
        * semantics: NULL passes; writes of the fill value (deletions)
        * are exempt so a constraint never forbids erasing a cell.
        * Empty string = no constraint.
        */
      check: String = "") {
    /** The index-row key: [[indexName]] falling back to [[name]]. */
    def idx: String = if (indexName.isEmpty) name else indexName
    require(lineage.map(_._2) == lineage.map(_._2).sorted &&
      lineage.map(_._2).distinct.length == lineage.length,
      s"clone lineage of $name must be strictly ascending by version")
    /** Physical index key whose historical metadata the chunk written
      * at `writerVersion` decodes under (see [[lineage]]).
      */
    def decodeKeyAt(writerVersion: Long): String =
      lineage.find(writerVersion <= _._2).map(_._1).getOrElse(idx)
    require(shape.length == chunkDims.length,
      s"shape/chunkDims rank mismatch for $name")
    require(shape.forall(_ > 0) && chunkDims.forall(_ > 0),
      s"shape/chunkDims of $name must be positive, got " +
        s"shape=${shape.mkString(",")} chunkDims=${chunkDims.mkString(",")}")
    // integer dtypes surface their fill through the exact long/int
    // decode paths: a NaN (or non-representable) fill would silently
    // read back as 0 and trip the encoder's 2^53 exactness guard on
    // every partial-tile write — reject it at construction instead
    if (dtype == "short" || dtype == "int" || dtype == "long") {
      require(!fillValue.isNaN && fillValue == math.rint(fillValue),
        s"fill value $fillValue is not representable in dtype $dtype " +
          s"for $name (integer dtypes need an integral, non-NaN fill)")
      val (lo, hi) = dtype match {
        case "short" => (Short.MinValue.toDouble, Short.MaxValue.toDouble)
        case "int" => (Int.MinValue.toDouble, Int.MaxValue.toDouble)
        case _ => (-9007199254740992.0, 9007199254740992.0) // ±2^53
      }
      require(fillValue >= lo && fillValue <= hi,
        s"fill value $fillValue out of range for dtype $dtype of $name")
    }
    /** number of chunks along each dimension */
    def chunkGrid: Seq[Long] =
      shape.zip(chunkDims).map { case (s, c) => (s + c - 1) / c }
  }

  /** Dataset metadata carried by each version (hbase.clj:26-28): the
    * reference stores it as opaque JSON from mandoline-core; ours is
    * typed and serialized to JSON in the version record.
    */
  case class DatasetMeta(variables: Seq[VariableMeta]) {
    def variable(name: String): VariableMeta =
      variables.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no such variable: $name"))
  }

  /** A committed version: id is epoch-millis (the reference
    * reconstructs Joda DateTime from the id, hbase.clj:293).
    */
  case class Version(versionId: Long, metadata: DatasetMeta)

  /** Raised when an optimistic commit loses a conflict (the Spark
    * replacement for check-and-put returning false, hbase.clj:241-248).
    */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  // ---- minimal JSON codec for version metadata (no extra deps) ----

  def metaToJson(m: DatasetMeta): String = {
    def varJson(v: VariableMeta): String = {
      val fill =
        if (v.fillValue.isNaN) "\"NaN\"" else v.fillValue.toString
      val alias =
        if (v.idx == v.name) "" else s""""indexName":"${v.idx}","""
      val lin =
        if (v.lineage.isEmpty) ""
        else "\"lineage\":[" + v.lineage
          .map { case (k, u) => s"""["$k",$u]""" }.mkString(",") + "],"
      val mb =
        if (v.mergeBase == 0L) "" else s""""mergeBase":${v.mergeBase},"""
      val chk =
        if (v.check.isEmpty) ""
        else {
          val esc = v.check.replace("\\", "\\\\").replace("\"", "\\\"")
          s""""check":"$esc","""
        }
      s"""{"name":"${v.name}","dtype":"${v.dtype}",$alias$lin$mb$chk""" +
        s""""shape":[${v.shape.mkString(",")}],""" +
        s""""chunkDims":[${v.chunkDims.mkString(",")}],""" +
        s""""fillValue":$fill}"""
    }
    s"""{"variables":[${m.variables.map(varJson).mkString(",")}]}"""
  }

  def metaFromJson(json: String): DatasetMeta = {
    // deliberately tiny parser for the fixed shape we emit above
    val varRe =
      ("""\{"name":"([^"]*)","dtype":"([^"]*)",""" +
        """(?:"indexName":"([^"]*)",)?""" +
        """(?:"lineage":\[((?:\["[^"]*",\d+\],?)*)\],)?""" +
        """(?:"mergeBase":(\d+),)?""" +
        """(?:"check":"((?:[^"\\]|\\.)*)",)?""" +
        """"shape":\[([^\]]*)\],""" +
        """"chunkDims":\[([^\]]*)\],"fillValue":("NaN"|[^}]*)\}""").r
    val linRe = """\["([^"]*)",(\d+)\]""".r
    val vars = varRe.findAllMatchIn(json).map { m =>
      def longs(s: String): Seq[Long] =
        if (s.trim.isEmpty) Seq.empty
        else s.split(",").map(_.trim.toLong).toSeq
      val fill =
        if (m.group(9) == "\"NaN\"") Double.NaN else m.group(9).toDouble
      val lineage = Option(m.group(4)).toSeq.flatMap(s =>
        linRe.findAllMatchIn(s).map(lm =>
          (lm.group(1), lm.group(2).toLong)).toSeq)
      val check = Option(m.group(6)).map(
        _.replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse("")
      VariableMeta(m.group(1), m.group(2), longs(m.group(7)),
        longs(m.group(8)), fill, Option(m.group(3)).getOrElse(""),
        lineage, Option(m.group(5)).map(_.toLong).getOrElse(0L), check)
    }.toSeq
    DatasetMeta(vars)
  }
}
