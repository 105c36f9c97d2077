package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec for the multimodal decode path (reference O7:
  * `bob_vector_db/embedder.py:271-277` — imgmsg → cv2 → BGR2RGB → PIL).
  * `javax.imageio` ships in the JVM, so PNG/JPEG decode needs no external
  * dependency: [[Multimodal.decodeFeaturesBatch]] feeds real image bytes
  * through [[decode]] and derives features from actual pixels; the
  * byte-statistics stub remains only as the non-image fallback.
  *
  * The synthetic-PNG generator ([[encodePng]]) exists because the fixture
  * tables carry no real media: each document gets a small real PNG whose
  * RGB values are a closed-form integer function of (doc_id, x, y) —
  * PNG is lossless, so the DuckDB oracle replays the decoded pixel sums
  * from the formula alone. The round trip (formula → BufferedImage → PNG
  * bytes → ImageIO decode → pixel sums == formula sums, plus the pinned
  * PNG magic in the encoded bytes) gates that the decode path reads real
  * compressed image data, not a stand-in.
  */
object ImageCodec {

  // executors must not spill ImageIO scratch files to disk
  ImageIO.setUseCache(false)

  /** Closed-form synthetic pixel channels — shared, literally, by the PNG
    * generator and the SQL oracle (`(doc_id*31 + x*7 + y*13) % 256` etc.;
    * all inputs non-negative, so JVM % == SQL %). */
  def pr(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def pg(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 3 + y * 5) % 256).toInt
  def pb(id: Long, x: Int, y: Int): Int = ((id * 11 + x * 2 + y * 19) % 256).toInt

  /** Encode the synthetic w×h RGB image for `id` as real PNG bytes. */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pr(id, x, y) << 16) | (pg(id, x, y) << 8) | pb(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Magic-byte sniff (PNG / JPEG / GIF) — cheap routing between the real
    * codec and the byte-statistics fallback, so non-media payloads never
    * pay an ImageIO reader scan. */
  def isImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') ||
      (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte &&
        bytes(2) == 0xFF.toByte) ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))

  /** Real decode: compressed image bytes → BufferedImage (null when no
    * installed reader recognizes the stream). Throws on a corrupt stream
    * behind a valid magic — operators use [[decodeOrNull]]. */
  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Containment form of [[decode]]: a payload that LOOKS like an image
    * (magic matched) but fails mid-decode (truncated PNG, unsupported
    * JPEG colorspace — ImageIO throws rather than returning null) must
    * degrade to the caller's fallback/drop path, never kill the task —
    * the reference's drop-on-error contract (O19). */
  def decodeOrNull(bytes: Array[Byte]): BufferedImage =
    try decode(bytes)
    catch { case scala.util.control.NonFatal(_) => null }

  /** Per-channel pixel sums [ΣR, ΣG, ΣB] over the decoded image. */
  def channelSums(img: BufferedImage): Array[Long] = {
    val out = new Array[Long](3)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(0) += (rgb >> 16) & 0xff
        out(1) += (rgb >> 8) & 0xff
        out(2) += rgb & 0xff
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize pixel sums: source pixel of output (x', y')
    * is (x'·w DIV nw, y'·h DIV nh) — pure integer index math, so the
    * oracle replays the resized image exactly (interpolating resamplers
    * are float-order-dependent and could not be hash-gated). */
  def resizedChannelSums(img: BufferedImage, nw: Int, nh: Int): Array[Long] = {
    val out = new Array[Long](3)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val rgb = img.getRGB((x.toLong * w / nw).toInt, (y.toLong * h / nh).toInt)
        out(0) += (rgb >> 16) & 0xff
        out(1) += (rgb >> 8) & 0xff
        out(2) += rgb & 0xff
        x += 1
      }
      y += 1
    }
    out
  }
}
