package graft.wrangling

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star superset): image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as batch transforms.
  *
  * The Spark-side plumbing — schema, batching, partition sizing, feature
  * shapes — is real and tested. IMAGES have a REAL codec: pure-JVM
  * `javax.imageio` (PNG/GIF/BMP/JPEG as shipped with the JDK) drives
  * [[MediaCodec.decodeImage]]/[[MediaCodec.resizeImage]] and the
  * [[extractImageFeatures]] pipeline end-to-end. AUDIO has a REAL codec
  * too: `javax.sound.sampled` (WAV/AIFF/AU as shipped with the JDK) drives
  * [[MediaCodec.decodeAudio]] → mono PCM → [[extractAudioFeatures]].
  * VIDEO has TWO real containers: uncompressed YUV4MPEG2
  * ([[MediaCodec.decodeVideoY4M]]: header parse, C420/C422/C444/mono
  * chroma, per-frame luma planes) and COMPRESSED MJPEG-in-AVI
  * ([[MediaCodec.decodeVideoAviMjpeg]]: RIFF walk + per-frame JPEG DCT
  * decode via imageio), both driving [[extractVideoFeatures]] through the
  * dispatching [[MediaCodec.decodeVideo]]. INTER-frame codecs (H.264/VP9)
  * are a rationale'd NON-GOAL (COVERAGE.md: a conformant pure-JVM decoder
  * is a multi-10k-LoC project and the container ships no native codec
  * lib); [[MediaCodec.decodeStub]] is the documented single-function seam
  * a deployment with libavcodec/JCodec on the classpath swaps in —
  * nothing upstream of the decodeVideo dispatch changes.
  *
  * Scale notes: media rows are large (MBs); keep
  * `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * binaries fits executor memory, and process per-partition (mapPartitions)
  * so codec initialization amortizes across a batch — the same shape a
  * Python pipeline gets from mapInPandas.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
      features: Array[Double], n_frames: Int)

  object MediaCodec {
    /** STUB — stands in for a COMPRESSED-video decoder (no H.264/VP9 codec
      * in this container): interprets the payload bytes as the decoded
      * buffer. Deterministic by construction so tests are stable. Images
      * use the real [[decodeImage]], audio the real [[decodeAudio]], and
      * uncompressed video the real [[decodeVideoY4M]] below. */
    def decodeStub(payload: Array[Byte]): Array[Byte] = payload

    /** REAL video decode for the YUV4MPEG2 (.y4m) container — the standard
      * uncompressed interchange format (ffmpeg/mjpegtools), fully parseable
      * in pure JVM: `YUV4MPEG2 W<w> H<h> F<num>:<den> [C<chroma> ...]\n`
      * then per frame `FRAME[params]\n` + planar YUV. Returns (width,
      * height, fps, luma planes) — one `w*h` Y plane per frame; chroma
      * planes are skipped per the subsampling declared in the header
      * (C420* = w*h/2 extra bytes, C422 = w*h, C444 = 2*w*h, Cmono = 0).
      * None = not a y4m payload (dropped by the pipeline, like
      * undecodable images/audio). */
    def decodeVideoY4M(payload: Array[Byte])
        : Option[(Int, Int, Double, Vector[Array[Byte]])] = {
      val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
      if (payload.length < magic.length ||
          !java.util.Arrays.equals(payload.take(magic.length), magic))
        return None
      val hdrEnd = payload.indexOf('\n'.toByte)
      if (hdrEnd < 0) return None
      try {
        val params = new String(payload, magic.length, hdrEnd - magic.length,
          "US-ASCII").split(' ').filter(_.nonEmpty)
        var w = -1; var h = -1; var fps = 0.0; var chroma = "420"
        params.foreach { p =>
          p.head match {
            case 'W' => w = p.tail.toInt
            case 'H' => h = p.tail.toInt
            case 'F' =>
              val Array(n, d) = p.tail.split(':')
              fps = n.toDouble / d.toDouble
            case 'C' => chroma = p.tail
            case _ => () // I (interlacing), A (aspect), X (extensions)
          }
        }
        if (w <= 0 || h <= 0) return None
        // LONG frame geometry: a 32k x 32k C444 header overflows Int in
        // lumaSize + chromaSize, the bounds guard passes on the wrapped
        // negative, and copyOfRange zero-pads a bogus multi-GB frame
        val lumaSize = w.toLong * h
        val chromaSize =
          if (chroma.startsWith("mono")) 0L
          else if (chroma.startsWith("420")) lumaSize / 2
          else if (chroma.startsWith("422")) lumaSize
          else if (chroma.startsWith("444")) 2 * lumaSize
          else return None
        if (lumaSize > Int.MaxValue) return None
        val frames = Vector.newBuilder[Array[Byte]]
        var pos = hdrEnd + 1
        while (pos < payload.length) {
          // frame header: "FRAME" + optional params, '\n'-terminated
          if (pos + 5 > payload.length ||
              new String(payload, pos, 5, "US-ASCII") != "FRAME") return None
          val fEnd = payload.indexOf('\n'.toByte, pos)
          // the +1 for the FRAME header's newline belongs in the bound: a
          // stream truncated by exactly ONE byte used to pass and
          // copyOfRange fabricated a zero pixel — corrupt frame, not None
          if (fEnd < 0 || fEnd + 1 + lumaSize + chromaSize > payload.length)
            return None
          frames += java.util.Arrays.copyOfRange(payload, fEnd + 1,
            fEnd + 1 + lumaSize.toInt)
          pos = (fEnd + 1 + lumaSize + chromaSize).toInt
        }
        Some((w, h, fps, frames.result()))
      } catch { case _: Exception => None }
    }

    /** Y4M encoder (round-trip partner of [[decodeVideoY4M]], also the
      * deterministic test-payload generator): luma-only planes become a
      * `Cmono` stream. */
    def encodeVideoY4M(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.forall(_.length == w * h),
        s"every luma plane must be w*h = ${w * h} bytes")
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
        .getBytes("US-ASCII"))
      frames.foreach { f => bos.write("FRAME\n".getBytes("US-ASCII")); bos.write(f) }
      bos.toByteArray
    }

    // ---- MJPEG-in-AVI: a REAL compressed video container in pure JVM ----
    // RIFF/AVI parsing is byte arithmetic; the per-frame codec is JPEG via
    // javax.imageio — an actual DCT compressor the JDK ships. This closes
    // the compressed-container gap honestly; only INTER-frame codecs
    // (H.264/VP9) remain stubbed, needing native libs this sandbox lacks.

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def rdLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Gray luma plane → JPEG bytes (ImageIO's real DCT encoder). */
    def encodeJpegGray(w: Int, h: Int, plane: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, plane)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Luma frames → MJPEG-in-AVI: each frame JPEG-compressed, wrapped in
      * the standard RIFF structure (hdrl: avih + one 'vids'/'MJPG' stream;
      * movi: '00dc' chunks; idx1). Playable by any AVI-aware tool. */
    def encodeVideoAviMjpeg(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.forall(_.length == w * h),
        s"every luma plane must be w*h = ${w * h} bytes")
      val jpegs = frames.map(encodeJpegGray(w, h, _))
      val usPerFrame = (1000000L * fpsDen / fpsNum).toInt
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
        id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", kind.getBytes("US-ASCII") ++ body)
      val maxJpeg = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max
      val avih = le32(usPerFrame) ++ le32(maxJpeg * fpsNum / math.max(1, fpsDen)) ++
        le32(0) ++ le32(0x10) /* AVIF_HASINDEX */ ++ le32(jpegs.length) ++
        le32(0) ++ le32(1) ++ le32(maxJpeg) ++ le32(w) ++ le32(h) ++
        Array.fill(16)(0.toByte)
      val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(fpsDen) ++ le32(fpsNum) ++
        le32(0) ++ le32(jpegs.length) ++ le32(maxJpeg) ++ le32(-1) ++
        le32(0) ++ le32(0) ++ le32((h << 16) | w)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
        "MJPG".getBytes("US-ASCII") ++ le32(w * h * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val moviChunks = jpegs.map(j => chunk("00dc", j))
      val movi = list("movi", moviChunks.flatten.toArray)
      // idx1: one entry per frame (offset relative to movi list body start)
      var off = 4
      val idxBody = moviChunks.flatMap { c =>
        val e = "00dc".getBytes("US-ASCII") ++ le32(0x10) ++ le32(off) ++
          le32(c.length - 8)
        off += c.length; e
      }.toArray
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++
        chunk("idx1", idxBody)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

    /** REAL compressed-video decode for MJPEG-in-AVI: RIFF walk (avih for
      * geometry/rate, movi for '00dc'/'00db' frames), per-frame JPEG
      * decode via imageio, luma extraction (direct for grayscale JPEGs,
      * BT.601 from RGB otherwise). Same result shape as
      * [[decodeVideoY4M]]. None = not an AVI payload. */
    def decodeVideoAviMjpeg(payload: Array[Byte])
        : Option[(Int, Int, Double, Vector[Array[Byte]])] = {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return None
      try {
        var w = -1; var h = -1; var fps = 0.0
        // geometry of the first ACCEPTED frame — the consistency anchor
        // when the stream is non-standard and movi precedes avih (w/h
        // still unset): without it the w<=0 disjunct below admitted
        // frames of ANY size, and mixed-size planes blew up
        // videoDescriptors' paired-frame loop with an
        // ArrayIndexOutOfBounds OUTSIDE this decoder's catch — a job
        // crash where the contract promises a drop (pass 33)
        var fw = -1; var fh = -1
        val frames = Vector.newBuilder[Array[Byte]]
        def lumaOf(img: java.awt.image.BufferedImage): Array[Byte] = {
          val iw = img.getWidth; val ih = img.getHeight
          val out = new Array[Byte](iw * ih)
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
            img.getRaster.getDataElements(0, 0, iw, ih, out)
            out
          } else {
            var y = 0; var i = 0
            while (y < ih) {
              var x = 0
              while (x < iw) {
                val rgb = img.getRGB(x, y)
                val l = 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                out(i) = math.round(l).toInt.min(255).toByte
                i += 1; x += 1
              }
              y += 1
            }
            out
          }
        }
        def walk(start: Int, end: Int): Unit = {
          var pos = start
          while (pos + 8 <= end) {
            val id = fourcc(payload, pos)
            val size = rdLe32(payload, pos + 4)
            val body = pos + 8
            // negative size (corrupt/hostile chunk) must bail: it passes
            // the bounds check below (body + size < pos) and makes the
            // loop-advance `body + size + pad` NOT advance — one corrupt
            // row used to hang the executor thread forever
            if (size < 0 || body + size > payload.length) return
            id match {
              case "LIST" =>
                walk(body + 4, body + size) // recurse past the list kind
              case "avih" =>
                val us = rdLe32(payload, body)
                if (us > 0) fps = 1e6 / us
                w = rdLe32(payload, body + 32)
                h = rdLe32(payload, body + 36)
              case "00dc" | "00db" =>
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(payload, body, size))
                // only frames matching the avih geometry — or, when avih
                // hasn't been seen yet, the first accepted frame's: a
                // stream whose embedded JPEGs disagree in size would hand
                // videoDescriptors planes of different lengths — an
                // ArrayIndexOutOfBounds OUTSIDE this decoder's catch,
                // a job crash where the contract promises a drop
                if (img != null) {
                  if (fw < 0 && (w <= 0 ||
                      (img.getWidth == w && img.getHeight == h))) {
                    fw = img.getWidth; fh = img.getHeight
                  }
                  if (img.getWidth == fw && img.getHeight == fh &&
                      (w <= 0 || (img.getWidth == w && img.getHeight == h)))
                    frames += lumaOf(img)
                }
              case _ => ()
            }
            pos = body + size + (size % 2) // chunks are word-aligned
          }
        }
        walk(12, payload.length)
        if (w <= 0 || h <= 0) None
        else
          // post-filter for the avih-after-movi corner: frames accepted
          // against the first-frame anchor before a DISAGREEING avih
          // arrived would leave planes of the wrong size behind the
          // declared geometry — drop them rather than return a frame set
          // inconsistent with (w, h)
          Some((w, h, fps,
            frames.result().filter(_.length == w.toLong * h)))
      } catch { case _: Exception => None }
    }

    /** Container-dispatching video decode: uncompressed y4m, then
      * MJPEG-in-AVI. None = neither container. */
    def decodeVideo(payload: Array[Byte])
        : Option[(Int, Int, Double, Vector[Array[Byte]])] =
      decodeVideoY4M(payload).orElse(decodeVideoAviMjpeg(payload))

    /** Per-video motion/brightness descriptors over sampled luma frames:
      * (mean luma, luma stddev, mean |frame diff| — the motion-energy
      * proxy used for static-clip filtering). */
    def videoDescriptors(frames: Seq[Array[Byte]]): Array[Double] = {
      if (frames.isEmpty) return Array(0.0, 0.0, 0.0)
      var sum = 0.0; var sumSq = 0.0; var n = 0L
      frames.foreach { f =>
        var i = 0
        while (i < f.length) {
          val v = (f(i) & 0xff).toDouble
          sum += v; sumSq += v * v; n += 1; i += 1
        }
      }
      val mean = sum / n
      val std = math.sqrt(math.max(0.0, sumSq / n - mean * mean))
      var diff = 0.0; var dn = 0L
      var k = 1
      while (k < frames.size) {
        val a = frames(k - 1); val b = frames(k)
        var i = 0
        while (i < a.length) {
          diff += math.abs((b(i) & 0xff) - (a(i) & 0xff)); dn += 1; i += 1
        }
        k += 1
      }
      Array(mean, std, if (dn == 0) 0.0 else diff / dn)
    }

    /** Guarded ImageIO read — the single decode boundary both image ops
      * share (one copy of the drop-on-undecodable rule). */
    private def readImage(payload: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      Option(try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null })

    /** Row-major packed RGB bytes of an image — the single getRGB→pack
      * loop both image ops share. */
    private def toRgbBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          i += 3; x += 1
        }
        y += 1
      }
      out
    }

    /** REAL image decode via javax.imageio: encoded bytes → (width, height,
      * row-major packed RGB buffer). None = payload is not a decodable
      * image (the pipeline drops it rather than poisoning the batch). */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      readImage(payload).map(img => (img.getWidth, img.getHeight, toRgbBytes(img)))

    /** REAL image resize (AWT smooth-scaled thumbnail) → RGB buffer of the
      * target geometry. */
    def resizeImage(payload: Array[Byte], w: Int, h: Int)
        : Option[Array[Byte]] =
      readImage(payload).map { img =>
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
          0, 0, null)
        g.dispose()
        toRgbBytes(dst)
      }

    /** REAL audio decode via javax.sound.sampled (WAV/AIFF/AU, shipped
      * with the JDK): encoded bytes → (sampleRate, channels, mono PCM
      * samples in [-1,1]). Multi-channel input mixes down to mono (mean
      * across channels per frame). None = payload is not decodable audio
      * (dropped by the pipeline, like undecodable images). */
    def decodeAudio(payload: Array[Byte])
        : Option[(Float, Int, Array[Float])] = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(
            new java.io.ByteArrayInputStream(payload)))
        val fmt = in.getFormat
        // normalize to 16-bit signed little-endian PCM so sample math is
        // uniform across source encodings (8-bit, big-endian, unsigned…)
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
          fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem
          .getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        pcm.close(); in.close()
        val ch = fmt.getChannels
        val nFrames = bytes.length / (2 * ch)
        val mono = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var s = 0.0f
          var c = 0
          while (c < ch) {
            val off = (f * ch + c) * 2
            val v = (((bytes(off + 1) & 0xff) << 8) | (bytes(off) & 0xff)).toShort
            s += v / 32768.0f
            c += 1
          }
          mono(f) = s / ch
          f += 1
        }
        Some((fmt.getSampleRate, ch, mono))
      } catch { case _: Exception => None }
    }

    /** Cheap acoustic descriptors of a PCM window: RMS energy,
      * zero-crossing rate, peak amplitude, DC offset — the classic
      * first-pass features for audio quality filtering / near-dup
      * blocking. */
    def audioDescriptors(w: Array[Float]): Array[Double] = {
      if (w.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
      var sumSq = 0.0; var sum = 0.0; var peak = 0.0; var zc = 0
      var i = 0
      while (i < w.length) {
        val v = w(i)
        sumSq += v * v; sum += v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (v >= 0) != (w(i - 1) >= 0)) zc += 1
        i += 1
      }
      Array(math.sqrt(sumSq / w.length), zc.toDouble / w.length, peak,
        sum / w.length)
    }

    /** Byte-value histogram as the stand-in feature extractor (this part is
      * real computation, not a stub): 32 bins, L1-normalized. */
    def byteHistogram(buf: Array[Byte], bins: Int = 32): Array[Double] = {
      val h = new Array[Double](bins)
      var i = 0
      while (i < buf.length) { h((buf(i) & 0xff) * bins / 256) += 1.0; i += 1 }
      if (buf.length > 0) { var j = 0; while (j < bins) { h(j) /= buf.length; j += 1 } }
      h
    }

    /** Frame sampling: every `stride`-th fixed-size window of the decoded
      * buffer (the video-frame-sampling access pattern). */
    def sampleFrames(buf: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      // stride clamped like the sibling extractors: 0 threw Range's
      // "step cannot be 0" on executors, negative silently sampled nothing
      if (frameSize <= 0 || buf.length < frameSize) Seq.empty
      else (0 to (buf.length - frameSize) by (frameSize * math.max(1, stride)))
        .map(off => buf.slice(off, off + frameSize))

    /** Resize = mean-pool the feature vector to a smaller dimension. */
    def pool(features: Array[Double], outDim: Int): Array[Double] = {
      val n = features.length
      Array.tabulate(outDim) { i =>
        val lo = i * n / outDim; val hi = math.max(lo + 1, (i + 1) * n / outDim)
        var s = 0.0; var j = lo
        while (j < hi) { s += features(j); j += 1 }
        s / (hi - lo)
      }
    }
  }

  /** Batch feature extraction: decode(stub) → frame-sample → per-frame
    * histogram → mean-pool. mapPartitions so a real codec would init once
    * per partition, not once per row. */
  def extractFeatures(media: Dataset[MediaRow], frameSize: Int = 1024,
      stride: Int = 2, featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real pipeline: codec/model handle initialized HERE, once)
      rows.map { r =>
        val buf = MediaCodec.decodeStub(r.payload)
        val frames = MediaCodec.sampleFrames(buf, frameSize, stride)
        val feats =
          if (frames.isEmpty) MediaCodec.pool(MediaCodec.byteHistogram(buf), featureDim)
          else {
            val per = frames.map(f => MediaCodec.byteHistogram(f))
            val acc = new Array[Double](per.head.length)
            per.foreach(h => { var i = 0; while (i < acc.length) { acc(i) += h(i); i += 1 } })
            MediaCodec.pool(acc.map(_ / per.size), featureDim)
          }
        MediaFeatures(r.media_id, r.meta.kind, feats, frames.size)
      }
    }
  }

  /** AUDIO feature extraction — the real-codec pipeline: decode
    * (javax.sound.sampled: WAV/AIFF/AU) → mono PCM → sliding sample
    * windows → per-window acoustic descriptors (RMS / zero-crossings /
    * peak / DC) averaged across windows, concatenated with an
    * amplitude-quantization histogram → mean-pool to `featureDim`.
    * Undecodable payloads are dropped, mirroring [[extractImageFeatures]].
    * mapPartitions keeps per-batch shape; n_frames = window count. */
  def extractAudioFeatures(media: Dataset[MediaRow],
      windowSize: Int = 2048, stride: Int = 2,
      featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.decodeAudio(r.payload).map { case (_, _, pcm) =>
          val step = math.max(1, windowSize * stride)
          val offsets =
            if (pcm.length < windowSize) Seq(0)
            else 0 to (pcm.length - windowSize) by step
          val wins = offsets.map(off =>
            java.util.Arrays.copyOfRange(pcm, off,
              math.min(off + windowSize, pcm.length)))
          val desc = new Array[Double](4)
          wins.foreach { w =>
            val d = MediaCodec.audioDescriptors(w)
            var i = 0; while (i < 4) { desc(i) += d(i); i += 1 }
          }
          var i = 0
          while (i < 4) { desc(i) /= wins.size; i += 1 }
          // amplitude histogram over [-1,1] quantized to bytes
          val quant = pcm.map(v =>
            (math.max(-1f, math.min(1f, v)) * 127).toByte)
          val hist = MediaCodec.byteHistogram(quant)
          MediaFeatures(r.media_id, "audio",
            MediaCodec.pool(desc ++ hist, featureDim), wins.size)
        }
      }
    }
  }

  /** VIDEO feature extraction — the real-codec pipeline for uncompressed
    * y4m: decode ([[MediaCodec.decodeVideoY4M]]) → sample every
    * `frameStride`-th luma frame → motion/brightness descriptors
    * ([[MediaCodec.videoDescriptors]]) concatenated with the mean luma
    * histogram → mean-pool to `featureDim`. Undecodable payloads are
    * dropped; n_frames = SAMPLED frame count. mapPartitions keeps the
    * batch shape (a compressed codec would init its context once here). */
  def extractVideoFeatures(media: Dataset[MediaRow], frameStride: Int = 1,
      featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.decodeVideo(r.payload).map { case (_, _, _, all) =>
          val frames = all.zipWithIndex
            .collect { case (f, i) if i % math.max(1, frameStride) == 0 => f }
          val desc = MediaCodec.videoDescriptors(frames)
          val hist = new Array[Double](32)
          frames.foreach { f =>
            val h = MediaCodec.byteHistogram(f)
            var i = 0; while (i < 32) { hist(i) += h(i); i += 1 }
          }
          if (frames.nonEmpty) {
            var i = 0; while (i < 32) { hist(i) /= frames.size; i += 1 }
          }
          MediaFeatures(r.media_id, "video",
            MediaCodec.pool(desc ++ hist, featureDim), frames.size)
        }
      }
    }
  }

  /** IMAGE feature extraction — the real-codec pipeline: decode (imageio)
    * → optional resize to a canonical geometry → per-channel byte
    * histogram → mean-pool to `featureDim`. Undecodable payloads are
    * dropped (not nulled) so downstream similarity joins never see
    * garbage vectors. mapPartitions keeps the decoder warm per batch. */
  def extractImageFeatures(media: Dataset[MediaRow],
      resizeTo: Option[(Int, Int)] = None,
      featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val buf = resizeTo match {
          case Some((w, h)) => MediaCodec.resizeImage(r.payload, w, h)
          case None => MediaCodec.decodeImage(r.payload).map(_._3)
        }
        buf.map { b =>
          MediaFeatures(r.media_id, "image",
            MediaCodec.pool(MediaCodec.byteHistogram(b), featureDim), 1)
        }
      }
    }
  }

  /** Testdata adapter: documents.text bytes as stand-in payloads — proves
    * the plumbing end-to-end on driver-provided data. */
  def documentsAsMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(lit("text").as("kind"), lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sampleRate"), col("n_chars").as("durationMs")).as("meta"))
      .as[MediaRow]
  }
}
