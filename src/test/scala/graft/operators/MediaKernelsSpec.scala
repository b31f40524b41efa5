package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

import MultimodalOps.{MediaKernels, MediaMeta, MediaRecord}

/** The media kernel chain with a REAL codec: generated PNGs decode to
  * exact pixel intensities through javax.imageio; unrecognized bytes
  * fall back to the stub; the Spark-side plumbing (binary column +
  * typed metadata, partition-parallel kernels) carries both.
  */
class MediaKernelsSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImage returns exact grayscale intensities for a PNG") {
    val bytes = png(4, 2, (x, y) => x * 10 + y * 100)
    val px = MediaKernels.decodeImage(bytes)
    assert(px.isDefined)
    assert(px.get.toSeq ==
      (for (y <- 0 until 2; x <- 0 until 4) yield x * 10 + y * 100))
    assert(MediaKernels.meanIntensity(px.get) == 65.0)
  }

  test("non-image payloads fall back to the byte-intensity stub") {
    val garbage = "definitely not an image".getBytes("UTF-8")
    assert(MediaKernels.decodeImage(garbage).isEmpty)
    assert(MediaKernels.decode(garbage).toSeq ==
      garbage.map(_ & 0xff).toSeq)
  }

  test("partition-parallel feature pass over real PNG payloads") {
    val recs = (0 until 32).map { i =>
      val w = 4 + i % 3
      val h = 3 + i % 2
      MediaRecord(i.toLong, MediaMeta("image", w, h, 0, 1000L),
        png(w, h, (x, y) => (i + x + y) % 256))
    }
    val feats = spark.createDataset(recs)
      .repartition(8)
      .mapPartitions { it =>
        it.map { r =>
          val px = MediaKernels.decode(r.payload)
          (r.media_id, px.length, MediaKernels.meanIntensity(px))
        }
      }.collect().sortBy(_._1)
    assert(feats.length == 32)
    feats.foreach { case (id, n, mean) =>
      val i = id.toInt
      val w = 4 + i % 3
      val h = 3 + i % 2
      assert(n == w * h, s"record $id pixel count")
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (i + x + y) % 256).sum.toDouble / (w * h)
      assert(mean == expected, s"record $id mean")
    }
  }
}
