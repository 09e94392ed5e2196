package graft.ops

/** Zero-dependency bzip2 codec — the compression Wikipedia dumps and
  * many archival corpora actually ship in (the JDK has gzip/deflate but
  * no bzip2). Pure public-spec implementation of the container:
  *
  *   stream:  "BZh" level-digit, blocks…, end marker 0x177245385090,
  *            combined stream CRC; bit-packed MSB-first throughout.
  *   block:   magic 0x314159265359, block CRC (bzip2's MSB-first
  *            CRC-32, poly 0x04C11DB7, complemented), origPtr, the
  *            two-level symbol-presence map, 2–6 Huffman tables with
  *            MTF+unary-coded selectors switching every 50 symbols,
  *            delta-coded code lengths, then the RLE2(MTF(BWT(RLE1)))
  *            symbol stream: RUNA/RUNB bijective-base-2 zero runs,
  *            EOB terminator.
  *   inverse: Huffman → MTF⁻¹ → counting-sort BWT⁻¹ (origPtr walk) →
  *            RLE1⁻¹, CRC-checked per block and for the stream.
  *
  * Randomized blocks (deprecated since 0.9.5) and anything malformed —
  * bad magic, over-long runs, invalid code lengths, CRC mismatch,
  * truncation — fail to None, never garbage (the engine's quarantine
  * contract). The companion encoder (single 100k-block level, two
  * identical Huffman tables — the format's minimum — and all-zero
  * selectors) exists to BUILD fixtures; Bzip2Spec cross-validates both
  * directions against the system bzip2 binary. */
object Bzip2 {

  // bzip2's CRC-32: MSB-first (unreflected), poly 0x04C11DB7, init/final 0xFFFFFFFF
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 24
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
      k += 1
    }
    c
  }

  private def crcUpdate(crc: Int, b: Int): Int =
    (crc << 8) ^ CrcTable(((crc >>> 24) ^ b) & 0xff)

  private final class Fail extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Fail

  private final class BitIn(val b: Array[Byte]) {
    var pos = 0L // bit position
    def bit(): Int = {
      val byteI = (pos >> 3).toInt
      if (byteI >= b.length) fail()
      val v = (b(byteI) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      v
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private final class BitOut(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1).toInt
        cnt += 1
        if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { out.write(buf << (8 - cnt)); buf = 0; cnt = 0 }
  }

  /** Decompress a complete .bz2 stream. None on any malformation. */
  def decode(bytes: Array[Byte], maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    try {
      if (bytes == null || bytes.length < 14) return None
      if (bytes(0) != 'B' || bytes(1) != 'Z' || bytes(2) != 'h') return None
      val level = bytes(3) - '0'
      if (level < 1 || level > 9) return None
      var maxBlock = level * 100000
      val in = new BitIn(bytes)
      in.pos = 32
      val out = new java.io.ByteArrayOutputStream()
      var streamCrc = 0
      var done = false
      while (!done) {
        val magic = in.bits(48)
        if (magic == 0x177245385090L) { // stream end
          val claimed = in.bits(32).toInt
          if (claimed != streamCrc) fail()
          // multistream (pbzip2 / Wikipedia multistream dumps): another
          // complete "BZh" stream may follow on the next BYTE boundary
          val nextByte = ((in.pos + 7) >> 3).toInt
          if (nextByte + 4 <= bytes.length && bytes(nextByte) == 'B' &&
              bytes(nextByte + 1) == 'Z' && bytes(nextByte + 2) == 'h' &&
              bytes(nextByte + 3) >= '1' && bytes(nextByte + 3) <= '9') {
            maxBlock = (bytes(nextByte + 3) - '0') * 100000
            in.pos = (nextByte + 4).toLong << 3
            streamCrc = 0
          } else {
            // whole-payload strictness (same contract as decodeMp3/decodeOgg/
            // TfRecord): anything after the final stream except zero padding
            // means a corrupted concatenation — quarantine, don't mask it
            var t = nextByte
            while (t < bytes.length) { if (bytes(t) != 0) fail(); t += 1 }
            done = true
          }
        } else if (magic != 0x314159265359L) fail()
        else {
          val blockCrcClaimed = in.bits(32).toInt
          if (in.bit() != 0) fail() // randomized: deprecated, out of scope
          val origPtr = in.bits(24).toInt
          // symbol-presence map
          val used16 = in.bits(16).toInt
          val inUse = new Array[Boolean](256)
          var i = 0
          while (i < 16) {
            if ((used16 & (0x8000 >>> i)) != 0) {
              var j = 0
              val w = in.bits(16).toInt
              while (j < 16) {
                if ((w & (0x8000 >>> j)) != 0) inUse(i * 16 + j) = true
                j += 1
              }
            }
            i += 1
          }
          val seqToUnseq = (0 until 256).filter(inUse).toArray
          val nUsed = seqToUnseq.length
          if (nUsed == 0) fail()
          val alphaSize = nUsed + 2
          val nGroups = in.bits(3).toInt
          if (nGroups < 2 || nGroups > 6) fail()
          val nSelectors = in.bits(15).toInt
          if (nSelectors < 1) fail()
          // selectors, MTF-coded in unary
          val selMtf = Array.tabulate(nGroups)(identity)
          val selectors = new Array[Int](nSelectors)
          i = 0
          while (i < nSelectors) {
            var j = 0
            while (in.bit() == 1) { j += 1; if (j >= nGroups) fail() }
            val v = selMtf(j)
            while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
            selMtf(0) = v
            selectors(i) = v
            i += 1
          }
          // per-group delta-coded code lengths → limit/base/perm tables
          val len = Array.ofDim[Int](nGroups, alphaSize)
          var g = 0
          while (g < nGroups) {
            var c = in.bits(5).toInt
            var s = 0
            while (s < alphaSize) {
              var cont = true
              while (cont) {
                if (c < 1 || c > 23) fail()
                if (in.bit() == 0) cont = false
                else if (in.bit() == 0) c += 1
                else c -= 1
              }
              len(g)(s) = c
              s += 1
            }
            g += 1
          }
          val limit = Array.ofDim[Int](nGroups, 24)
          val base = Array.ofDim[Int](nGroups, 24)
          val perm = Array.ofDim[Int](nGroups, alphaSize)
          val minLens = new Array[Int](nGroups)
          g = 0
          while (g < nGroups) {
            var minLen = 23; var maxLen = 1
            var s = 0
            while (s < alphaSize) {
              if (len(g)(s) > maxLen) maxLen = len(g)(s)
              if (len(g)(s) < minLen) minLen = len(g)(s)
              s += 1
            }
            // perm: symbols ordered by code length (stable)
            var pp = 0
            var l = minLen
            while (l <= maxLen) {
              s = 0
              while (s < alphaSize) {
                if (len(g)(s) == l) { perm(g)(pp) = s; pp += 1 }
                s += 1
              }
              l += 1
            }
            val cnt = new Array[Int](24)
            s = 0
            while (s < alphaSize) { cnt(len(g)(s) + 1) += 1; s += 1 }
            var li = 1
            while (li < 24) { cnt(li) += cnt(li - 1); li += 1 }
            var vec = 0
            l = minLen
            while (l <= maxLen) {
              vec += cnt(l + 1) - cnt(l)
              limit(g)(l) = vec - 1
              vec <<= 1
              l += 1
            }
            l = minLen + 1
            while (l <= maxLen) {
              base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
              l += 1
            }
            minLens(g) = minLen
            g += 1
          }
          def huffDecode(gi: Int): Int = {
            var l = minLens(gi)
            var v = in.bits(l).toInt
            while (l <= 23 && v > limit(gi)(l)) {
              l += 1
              if (l > 23) fail()
              v = (v << 1) | in.bit()
            }
            val idx = v - base(gi)(l)
            if (idx < 0 || idx >= alphaSize) fail()
            perm(gi)(idx)
          }
          // MTF + RLE2 decode into the BWT column
          val mtf = seqToUnseq.clone()
          val bwt = new Array[Byte](maxBlock)
          var n = 0
          var groupPos = 0
          var selIdx = -1
          var curG = 0
          def nextSym(): Int = {
            if (groupPos == 0) {
              selIdx += 1
              if (selIdx >= nSelectors) fail()
              curG = selectors(selIdx)
              groupPos = 50
            }
            groupPos -= 1
            huffDecode(curG)
          }
          val eob = alphaSize - 1
          var sym = nextSym()
          while (sym != eob) {
            if (sym <= 1) { // RUNA/RUNB: bijective base-2 zero run
              var run = 0L
              var w = 1L
              while (sym <= 1) {
                run += (sym + 1) * w
                w <<= 1
                if (run > maxBlock) fail()
                sym = nextSym()
                if (sym == eob) {
                  // run then end: emit and finish below
                  var k = 0L
                  while (k < run) { if (n >= maxBlock) fail(); bwt(n) = mtf(0).toByte; n += 1; k += 1 }
                  run = -1
                }
              }
              if (run >= 0) {
                var k = 0L
                while (k < run) { if (n >= maxBlock) fail(); bwt(n) = mtf(0).toByte; n += 1; k += 1 }
              } else sym = eob // consumed by the inner emit
            }
            if (sym != eob) {
              // MTF value sym-1+... symbol v (2..alpha-2) = mtf index v-1
              val j0 = sym - 1
              if (j0 < 1 || j0 >= nUsed) fail()
              val v = mtf(j0)
              var j = j0
              while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
              mtf(0) = v
              if (n >= maxBlock) fail()
              bwt(n) = v.toByte
              n += 1
              sym = nextSym()
            }
          }
          if (origPtr >= n || n == 0) fail()
          // inverse BWT: counting sort → next vector, walk from origPtr
          val counts = new Array[Int](256)
          i = 0
          while (i < n) { counts(bwt(i) & 0xff) += 1; i += 1 }
          val starts = new Array[Int](256)
          var acc = 0
          i = 0
          while (i < 256) { starts(i) = acc; acc += counts(i); i += 1 }
          val next = new Array[Int](n)
          val fill = starts.clone()
          i = 0
          while (i < n) {
            val c = bwt(i) & 0xff
            next(fill(c)) = i
            fill(c) += 1
            i += 1
          }
          var p = next(origPtr)
          var blockCrc = 0xffffffff
          // RLE1 decode while walking
          var runLen = 0
          var lastByte = -1
          var emitted = 0L
          i = 0
          while (i < n) {
            val c = bwt(p) & 0xff
            p = next(p)
            if (runLen == 4) {
              // c is the repeat count for 4+c copies of lastByte
              var k = 0
              while (k < c) {
                blockCrc = crcUpdate(blockCrc, lastByte)
                out.write(lastByte)
                emitted += 1
                k += 1
              }
              if (emitted > maxBytes) fail()
              runLen = 0
              lastByte = -1
            } else {
              if (c == lastByte) runLen += 1 else { runLen = 1; lastByte = c }
              blockCrc = crcUpdate(blockCrc, c)
              out.write(c)
              emitted += 1
              if (emitted > maxBytes) fail()
            }
            i += 1
          }
          if (runLen == 4) fail() // run announced but its count byte missing
          val computed = ~blockCrc
          if (computed != blockCrcClaimed) fail()
          streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ computed
        }
      }
      Some(out.toByteArray)
    } catch { case _: Fail | _: ArrayIndexOutOfBoundsException => None }

  // ---------------------------------------------------------------------
  // Encoder: single block (level '1'), two identical Huffman tables (the
  // format minimum), all-zero selectors. Fixture builder + the CLI
  // differential's subject; NOT tuned for ratio.

  def encode(data: Array[Byte]): Array[Byte] = {
    require(data != null && data.length > 0 && data.length <= 40000, "fixture-size input")
    // RLE1
    val rle1 = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      var run = 1
      while (i + run < data.length && run < 255 + 4 && (data(i + run) & 0xff) == b) run += 1
      if (run >= 4) {
        (0 until 4).foreach(_ => rle1.write(b))
        rle1.write(run - 4)
      } else (0 until run).foreach(_ => rle1.write(b))
      i += run
    }
    val s = rle1.toByteArray
    val n = s.length
    // BWT by rotation sort (fixture sizes: O(n² log n) is fine)
    val idx = (0 until n).toArray.map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      var k = 0
      var r = 0
      while (k < n && r == 0) {
        r = (s((a + k) % n) & 0xff) - (s((b + k) % n) & 0xff)
        k += 1
      }
      r
    })
    var origPtr = -1
    val last = new Array[Byte](n)
    i = 0
    while (i < n) {
      val rot = idx(i).intValue
      if (rot == 0) origPtr = i
      last(i) = s((rot + n - 1) % n)
      i += 1
    }
    // symbol map + MTF + RLE2
    val inUse = new Array[Boolean](256)
    s.foreach(b => inUse(b & 0xff) = true)
    val seq = (0 until 256).filter(inUse).toArray
    val nUsed = seq.length
    val alphaSize = nUsed + 2
    val eob = alphaSize - 1
    val mtf = seq.clone()
    val syms = scala.collection.mutable.ArrayBuffer.empty[Int]
    var zeroRun = 0L
    def flushZeros(): Unit = {
      var r = zeroRun
      while (r > 0) {
        if ((r & 1) == 1) { syms += 0; r = (r - 1) >> 1 } // RUNA
        else { syms += 1; r = (r - 2) >> 1 }              // RUNB
      }
      zeroRun = 0
    }
    i = 0
    while (i < n) {
      val c = last(i) & 0xff
      val j0 = mtf.indexOf(c)
      if (j0 == 0) zeroRun += 1
      else {
        flushZeros()
        syms += j0 + 1
        var j = j0
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = c
      }
      i += 1
    }
    flushZeros()
    syms += eob
    // one Huffman table (emitted twice): plain Huffman over frequencies,
    // depth-capped by frequency flattening if needed
    var freqs = new Array[Long](alphaSize)
    syms.foreach(v => freqs(v) += 1)
    var lens: Array[Int] = null
    var ok = false
    while (!ok) {
      lens = huffLengths(freqs.map(f => math.max(1L, f)))
      if (lens.max <= 20) ok = true
      else freqs = freqs.map(f => math.max(1L, f / 2)) // flatten and retry
    }
    val codes = canonicalCodes(lens)
    // block CRC over the ORIGINAL data
    var crc = 0xffffffff
    data.foreach(b => crc = crcUpdate(crc, b & 0xff))
    val blockCrc = ~crc
    val streamCrc = blockCrc // single block
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('Z'); out.write('h'); out.write('1')
    val bw = new BitOut(out)
    bw.put(0x314159265359L, 48)
    bw.put(blockCrc & 0xffffffffL, 32)
    bw.put(0, 1) // not randomized
    bw.put(origPtr, 24)
    // symbol map
    var used16 = 0
    (0 until 16).foreach(k => if ((0 until 16).exists(j => inUse(k * 16 + j))) used16 |= 0x8000 >>> k)
    bw.put(used16, 16)
    (0 until 16).foreach { k =>
      if ((used16 & (0x8000 >>> k)) != 0) {
        var w = 0
        (0 until 16).foreach(j => if (inUse(k * 16 + j)) w |= 0x8000 >>> j)
        bw.put(w, 16)
      }
    }
    bw.put(2, 3) // nGroups = 2 (format minimum), identical tables
    val nSelectors = (syms.length + 49) / 50
    bw.put(nSelectors, 15)
    (0 until nSelectors).foreach(_ => bw.put(0, 1)) // selector 0, unary-terminated
    var g = 0
    while (g < 2) {
      var c = lens(0)
      bw.put(c, 5)
      var si = 0
      while (si < alphaSize) {
        while (c < lens(si)) { bw.put(2, 2); c += 1 } // 10 = increment
        while (c > lens(si)) { bw.put(3, 2); c -= 1 } // 11 = decrement
        bw.put(0, 1)
        si += 1
      }
      g += 1
    }
    syms.foreach { v => val (code, l) = codes(v); bw.put(code, l) }
    bw.put(0x177245385090L, 48)
    bw.put(streamCrc & 0xffffffffL, 32)
    bw.flush()
    out.toByteArray
  }

  /** Plain Huffman code lengths from frequencies (no length cap — the
    * caller retries with flattened freqs if a length exceeds 20). */
  private def huffLengths(freqs: Array[Long]): Array[Int] = {
    val m = freqs.length
    case class Node(w: Long, tie: Int, l: Int, r: Int) // leaves: l = -sym-1
    val pq = new scala.collection.mutable.PriorityQueue[Node]()(
      Ordering.by[Node, (Long, Int)](n => (n.w, n.tie)).reverse)
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    var tie = 0
    freqs.zipWithIndex.foreach { case (f, i) =>
      val nd = Node(f, tie, -i - 1, 0); tie += 1
      nodes += nd; pq.enqueue(nd)
    }
    val internal = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val id = scala.collection.mutable.Map.empty[Node, Int]
    nodes.zipWithIndex.foreach { case (nd, i) => id(nd) = i }
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      val nd = Node(a.w + b.w, tie, id(a), id(b)); tie += 1
      id(nd) = nodes.length
      internal += ((id(a), id(b)))
      nodes += nd
      pq.enqueue(nd)
    }
    val depth = new Array[Int](nodes.length)
    val lens = new Array[Int](m)
    var i = nodes.length - 1
    while (i >= 0) {
      val nd = nodes(i)
      if (nd.l < 0) lens(-nd.l - 1) = math.max(depth(i), if (m == 1) 1 else 0)
      else {
        depth(nd.l) = depth(i) + 1
        depth(nd.r) = depth(i) + 1
      }
      i -= 1
    }
    lens
  }

  private def canonicalCodes(lens: Array[Int]): Array[(Int, Int)] = {
    // bzip2 assigns codes in (length, symbol-order) exactly like the
    // decoder's perm construction
    val order = lens.indices.sortBy(i => (lens(i), i))
    var code = 0
    var prevLen = -1
    val out = new Array[(Int, Int)](lens.length)
    order.foreach { sRead =>
      val l = lens(sRead)
      if (prevLen >= 0 && l > prevLen) code <<= (l - prevLen)
      out(sRead) = (code, l)
      code += 1
      prevLen = l
    }
    out
  }
}
