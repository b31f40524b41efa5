package graft.operators

import java.nio.file.Files

import graft.{Q, QueryPack}
import graft.core._
import graft.core.Model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The versioned chunked-array engine surfaced through the driver's
  * correctness gate as self-contained flows (no SQL oracle — the store
  * semantics aren't expressible over the driver's parquet tables; the
  * scenario conformance lives in MandolineScenarioSpec). Each query
  * builds a deterministic dataset in a temp lake, exercises the
  * protocol surface, and returns the resulting cells/listing.
  */
object MandolineOps extends QueryPack {

  private def withLake[T](s: SparkSession)(body: GraftLake => T): T =
    body(new GraftLake(s, Files.createTempDirectory("graft_mql_").toString))

  private def cellsDF(s: SparkSession,
      cells: Seq[(Seq[Long], Double)]): DataFrame = {
    import s.implicits._
    cells.toDF("coord", "value")
  }

  private val meta = DatasetMeta(Seq(
    VariableMeta("temp", "double", Seq(8, 8), Seq(4, 4), Double.NaN)))

  val all: Seq[Q] = Seq(

    // entire-flow + linear-versions + fill: write v1, overwrite one
    // chunk in v2, read back as-of v1 (time travel) — cells of v1.
    Q("m01_mandoline_timetravel", None, (s, d) => {
      withLake(s) { lake =>
        lake.create("weather")
        val ds = lake.connect("weather")
        val w1 = ds.newWriter(meta)
        w1.writeSlab("temp", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L if (i + j) % 2 == 0)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v1 = w1.commit()
        val w2 = ds.newWriter(meta)
        w2.writeSlab("temp", cellsDF(s, Seq((Seq(0L, 0L): Seq[Long]) -> 999.0)))
        w2.commit()
        ds.readSlab("temp", v1)
          .select(element_at(col("coord"), 1).as("x"),
            element_at(col("coord"), 2).as("y"), col("value"))
      }
    }),

    // grow + shrink + scalar + versions listing in one flow; returns
    // the version catalog (reverse-chronological, as Connection.versions).
    Q("m02_mandoline_versions", None, (s, d) => {
      import s.implicits._
      withLake(s) { lake =>
        lake.create("d")
        val ds = lake.connect("d")
        def m(n: Long) = DatasetMeta(Seq(
          VariableMeta("t", "double", Seq(n), Seq(4), Double.NaN),
          VariableMeta("answer", "double", Seq.empty, Seq.empty, 0.0)))
        val w1 = ds.newWriter(m(6))
        w1.writeSlab("t", cellsDF(s, (0L until 6L).map(i =>
          (Seq(i): Seq[Long]) -> i.toDouble)))
        w1.writeSlab("answer", cellsDF(s, Seq((Seq.empty[Long]) -> 42.0)))
        val v1 = w1.commit()
        val w2 = ds.newWriter(m(10))
        w2.writeSlab("t", cellsDF(s, Seq((Seq(9L): Seq[Long]) -> 9.0)))
        val v2 = w2.commit()
        val sizes = Seq(v1 -> 6L, v2 -> 10L)
        sizes.map { case (v, expectedN) =>
          val n = ds.readSlab("t", v).count()
          val scalar = ds.readSlab("answer", v)
            .as[(Seq[Long], Double)].collect().head._2
          (v, n, expectedN, n == expectedN, scalar)
        }.toDF("version_id", "n_cells", "expected", "ok", "scalar_value")
      }
    }),

    // chunk store protocol: content-addressed dedup + ref counts + gc
    // of aborted-writer orphans; returns the store accounting.
    Q("m03_mandoline_chunkstore", None, (s, d) => {
      import s.implicits._
      withLake(s) { lake =>
        lake.create("d")
        val ds = lake.connect("d")
        val w = ds.newWriter(meta)
        // chunks (0,0) and (1,1) identical content -> dedup to 1 record
        w.writeSlab("temp", cellsDF(s, Seq(
          (Seq(0L, 0L): Seq[Long]) -> 5.0, (Seq(4L, 4L): Seq[Long]) -> 5.0,
          (Seq(0L, 4L): Seq[Long]) -> 6.0)))
        w.commit()
        val orphan = ds.newWriter(meta)
        orphan.writeSlab("temp", cellsDF(s, Seq((Seq(4L, 0L): Seq[Long]) -> 7.0)))
        orphan.abort()
        val before = ds.chunksDF.count()
        val removed = ds.gc(graceMs = 0L)
        val after = ds.chunksDF.count()
        val refTotal = ds.refCounts.agg(sum("refCount")).as[Long].head()
        Seq((before, removed, after, refTotal))
          .toDF("chunks_before_gc", "gc_removed", "chunks_after_gc",
            "total_refs")
      }
    }),

    // The reference's only benchmark, reproduced 1:1: 100 chunks x
    // 64,000 bytes (hbase_test.clj:170-190; threshold there was <1.0s
    // upper-quantile write latency). Writes 800k cells -> 100 x 8000-
    // double tiles, commits, reads back the store accounting. The
    // BENCH_r time of this query is our number against that baseline.
    Q("m05_mandoline_write_bench", None, (s, d) => {
      import s.implicits._
      withLake(s) { lake =>
        lake.create("bench")
        val ds = lake.connect("bench")
        val chunkCells = 8000L // 8000 doubles = 64,000 B per chunk
        val nChunks = 100L
        val meta = DatasetMeta(Seq(VariableMeta("payload", "double",
          Seq(nChunks * chunkCells), Seq(chunkCells), Double.NaN)))
        val w = ds.newWriter(meta)
        val cells = s.range(nChunks * chunkCells)
          .select(array(col("id")).as("coord"),
            (col("id") % 997).cast("double").as("value"))
        w.writeSlab("payload", cells)
        val v = w.commit()
        val nStored = ds.chunkHashes().length.toLong
        val sampleBytes = ds.readChunk(
          ds.resolveIndex("payload", v).select("chunkHash")
            .head().getString(0)).length.toLong
        Seq((v > 0, nStored, sampleBytes))
          .toDF("committed", "n_chunks_stored", "chunk_bytes")
      }
    }),

    // DSv2 connector path: read a variable via format("graft") with a
    // pushed coordinate-bound filter (chunk pruning) + aggregation.
    Q("m04_mandoline_dsv2", None, (s, d) => {
      withLake(s) { lake =>
        lake.create("d")
        val ds = lake.connect("d")
        val w = ds.newWriter(meta)
        w.writeSlab("temp", cellsDF(s,
          for (i <- 0L until 8L; j <- 0L until 8L)
            yield (Seq(i, j): Seq[Long]) -> (i * 8 + j).toDouble))
        val v = w.commit()
        s.read.format("graft")
          .option("path", ds.path).option("variable", "temp")
          .option("asOf", v.toString).load()
          .filter(col("x0") >= 2 && col("x0") < 6)
          .groupBy(col("x0"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("row_sum"))
      }
    })
  )
}
