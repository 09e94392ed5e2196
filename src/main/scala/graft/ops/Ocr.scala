package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{BinaryType, IntegerType, StructField}

/** OCR preprocessing (ref `ingestion/ocr_extractor.py:64-147`: cv2
  * grayscale → denoise → Otsu binarize) implemented natively — the
  * transforms are pure integer math and need no imaging library:
  *
  *  - grayscale: integer luma `(299·R + 587·G + 114·B) / 1000`;
  *  - denoise: 3×3 box mean with edge clamping (the cv2 blur shape);
  *  - binarize: Otsu's threshold — maximize between-class variance
  *    σ²(t) = w0·w1·(µ0−µ1)², computed as the exact-integer fraction
  *    (s0·w1 − s1·w0)² / (w0·w1) so the argmax is deterministic.
  *
  * The per-image pipeline runs as a bounded-batch mapPartitions stage
  * (`preprocessStage`) — the same executor-side seam as
  * [[Multimodal.extractFeatures]] and [[Pdf.extractStage]]; the Otsu
  * statistic is additionally expressed RELATIONALLY (`ocr1` gate query)
  * so the threshold math itself is DuckDB-hash-gated, not only
  * spec-tested. Images small enough to sit in one row (page crops,
  * receipt scans) are the OCR-routing case the reference handles; full
  * pages at 100 TB shard per image row and the stage stays map-only. */
object Ocr {

  /** Integer luma of interleaved RGB bytes (3·n → n). */
  def grayscale(rgb: Array[Byte]): Array[Byte] = {
    val n = rgb.length / 3
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      out(i) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      i += 1
    }
    out
  }

  /** 3×3 box-mean denoise over a w×h grayscale image, edges clamped
    * (each pixel averages its existing neighbors — the cv2
    * BORDER_REPLICATE-free shape: divide by the actual neighbor count). */
  def boxDenoise3(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h, s"expected $w x $h = ${w * h} pixels, got ${px.length}")
    val out = new Array[Byte](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var sum = 0; var cnt = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val xx = x + dx; val yy = y + dy
            if (xx >= 0 && xx < w && yy >= 0 && yy < h) {
              sum += px(yy * w + xx) & 0xff; cnt += 1
            }
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = (sum / cnt).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Otsu's threshold over grayscale bytes: the intensity t maximizing
    * between-class variance, candidates = observed intensities with both
    * classes nonempty, ties → lowest t. Exact-integer comparison via
    * cross-multiplied fractions — no floating point in the argmax at
    * all, so any replay (including the relational one) agrees exactly.
    * Returns -1 for a constant image (no valid split). */
  def otsuThreshold(px: Array[Byte]): Int = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < px.length) { hist(px(i) & 0xff) += 1; i += 1 }
    val n = px.length.toLong
    var s = 0L
    var v = 0
    while (v < 256) { s += v.toLong * hist(v); v += 1 }
    var bestT = -1
    var bestNum = java.math.BigInteger.ZERO
    var bestDen = java.math.BigInteger.ONE
    var w0 = 0L; var s0 = 0L
    v = 0
    while (v < 256) {
      if (hist(v) > 0) {
        w0 += hist(v); s0 += v.toLong * hist(v)
        if (w0 < n) {
          val a = s0 * (n - w0) - (s - s0) * w0
          val num = java.math.BigInteger.valueOf(a).pow(2)
          val den = java.math.BigInteger.valueOf(w0 * (n - w0))
          // num/den > bestNum/bestDen  <=>  num*bestDen > bestNum*den
          if (bestT < 0 || num.multiply(bestDen).compareTo(bestNum.multiply(den)) > 0) {
            bestT = v; bestNum = num; bestDen = den
          }
        }
      }
      v += 1
    }
    bestT
  }

  /** Binarize: foreground (255) strictly above the threshold. */
  def binarize(px: Array[Byte], threshold: Int): Array[Byte] =
    px.map(p => if ((p & 0xff) > threshold) 255.toByte else 0.toByte)

  /** The full distributed preprocessing stage: interleaved-RGB payload →
    * (binarized payload, otsu threshold), one row streamed at a time
    * ([[Stages.appendFields]]). Width/height come from companion int
    * columns. */
  def preprocessStage(df: DataFrame, payloadCol: String, wCol: String, hCol: String,
                      outCol: String, thresholdCol: String): DataFrame = {
    val pIdx = df.schema.fieldIndex(payloadCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    Stages.appendFields(df,
      Seq(StructField(outCol, BinaryType), StructField(thresholdCol, IntegerType))) { r =>
      val gray = grayscale(r.getAs[Array[Byte]](pIdx))
      val smooth = boxDenoise3(gray, r.getInt(wIdx), r.getInt(hIdx))
      val t = otsuThreshold(smooth)
      Seq(binarize(smooth, t), t)
    }
  }
}
