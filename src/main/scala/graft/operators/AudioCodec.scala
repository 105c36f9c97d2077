package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec for the multimodal path — the audio sibling of
  * [[ImageCodec]]: `javax.sound.sampled` ships in the JVM, so WAV
  * parse/decode needs no external dependency. The synthetic-WAV generator
  * exists because the fixtures carry no media: each document gets a real
  * RIFF/WAVE container (PCM 16-bit signed little-endian mono) whose
  * samples are a closed-form integer function of (doc_id, i) — PCM is
  * lossless, so the DuckDB oracle replays the decoded sample sums from
  * the formula alone. The round trip (formula → WAV bytes → AudioSystem
  * parse → frame/format metadata + sample sums == formula) gates that the
  * decode path reads a real audio container, not a byte stand-in.
  */
object AudioCodec {

  /** Closed-form synthetic sample (16-bit signed) — shared, literally, by
    * the generator and the SQL oracle: `(id·7 + i·13) % 65536 − 32768`
    * (inputs non-negative, so JVM % == SQL %). */
  def sample(id: Long, i: Int): Int =
    (((id * 7 + i.toLong * 13) % 65536) - 32768).toInt

  /** Encode `n` synthetic samples for `id` as real WAV bytes (PCM 16-bit
    * signed LE mono @8 kHz). */
  def encodeWav(id: Long, n: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(id, i)
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt,
      n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Magic sniff: RIFF....WAVE container. */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** Decoded audio statistics: (frames, channels, rate_milli,
    * sample_sum) from an actually-parsed WAV stream — null on a corrupt
    * or non-PCM-16 stream (the containment contract of
    * [[ImageCodec.decodeOrNull]]). */
  def decodeStatsOrNull(bytes: Array[Byte]): Array[Long] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.isBigEndian) null
        else {
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < data.length) {
            val lo = data(i) & 0xff
            val hi = data(i + 1).toInt // sign-carrying high byte
            sum += (hi << 8) | lo
            i += 2
          }
          Array(frames, fmt.getChannels.toLong,
            math.round(fmt.getSampleRate.toDouble * 1000), sum)
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => null }
}
