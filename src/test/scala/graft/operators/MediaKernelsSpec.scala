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

  test("audio features: known waveform, edges") {
    import MultimodalOps.MediaKernels._
    // empty and singleton
    assert(audioFeatures(Array.empty[Int]) == ((0, 0.0, 0.0, 0, 0.0)))
    assert(audioFeatures(Array(3)) == ((1, 3.0, 0.0, 3, 0.0)))
    // alternating ±2: rms 2, every step crosses zero, no clips
    val alt = Array(2, -2, 2, -2)
    val (n, rms, zcr, peak, clip) = audioFeatures(alt)
    assert(n == 4 && rms == 2.0 && zcr == 1.0 && peak == 2 && clip == 0.0)
    // clipping threshold at |v| >= 90
    val (_, _, _, p2, c2) = audioFeatures(Array(89, 90, -90, -128))
    assert(p2 == 128 && c2 == 0.75)
    // decode stub: alternating sign of centered bytes
    val pcm = decodeAudioStub(Array[Byte](0, 0, -1))
    assert(pcm.toSeq == Seq(-128, 128, 127))
  }
}
