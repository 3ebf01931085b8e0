package graft.sources

/** Minimal native PDF text extraction (S3,
  * `text_to_database.py:256-287` — the reference shells into Tika with
  * a 300 s timeout and NUL stripping).
  *
  * The sandbox carries no Tika artifact, but the common-case PDF —
  * content streams showing text with Tj / TJ / ' / " operators behind
  * the standard lossless filters — needs nothing beyond the JDK:
  * FlateDecode (`java.util.zip.Inflater`), ASCIIHexDecode, LZWDecode,
  * and RunLengthDecode are implemented natively, including filter
  * CHAINS (`/Filter [/ASCIIHexDecode /FlateDecode]`), nested
  * `/DecodeParms` sub-dicts, and PDF-1.5 xref-stream files (the linear
  * scan never walks the xref, and /Type /XRef//ObjStm//Image streams
  * are recognized and skipped). A small tokenizer reads the string
  * operands (with PDF escape and octal forms). This unblocks the
  * ingest path end-to-end; Tika remains the drop-in upgrade for
  * encrypted/CID-font documents (same `bytes → text` UDF slot,
  * `Ingest.pdfTextUdf`).
  *
  * Semantics preserved from the reference: extracted text is
  * NUL-stripped; failures yield null (quarantine channel) rather than
  * throwing. Line structure: each BT…ET block contributes its text
  * chunks space-joined as one paragraph, blocks separated by blank
  * lines — the paragraph splitter downstream works on blank-line
  * structure exactly as with Tika output.
  */
object PdfText {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Inflate a FlateDecode stream; None on corrupt data. The Inflater's
    * native zlib buffer is released on EVERY exit path (end() in
    * finally) — as a per-row UDF over a large corpus, waiting for
    * finalization would churn native memory.
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray) // stalled
      }
      Some(out.toByteArray)
    } catch { case _: Throwable => None }
    finally inf.end()
  }

  /** ASCIIHexDecode: hex pairs, whitespace ignored, `>` terminates, odd
    * final digit padded with 0 (PDF 32000-1 §7.4.2).
    */
  private[sources] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
      var hi = -1
      var done = false
      var i = 0
      while (i < data.length && !done) {
        val c = data(i).toChar
        if (c == '>') done = true
        else if (!c.isWhitespace) {
          val v = Character.digit(c, 16)
          if (v < 0) return None
          if (hi < 0) hi = v
          else { out.write(hi * 16 + v); hi = -1 }
        }
        i += 1
      }
      if (hi >= 0) out.write(hi * 16) // odd count: pad low nibble with 0
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** RunLengthDecode (PDF 32000-1 §7.4.5): length byte L — L ≤ 127
    * copies the next L+1 bytes, L ≥ 129 repeats the next byte 257−L
    * times, 128 is EOD.
    */
  private[sources] def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 2)
      var i = 0
      var done = false
      while (i < data.length && !done) {
        val l = data(i) & 0xff
        if (l == 128) done = true
        else if (l <= 127) {
          if (i + 1 + l + 1 > data.length) return None
          out.write(data, i + 1, l + 1)
          i += l + 2
        } else {
          if (i + 1 >= data.length) return None
          var n = 257 - l
          while (n > 0) { out.write(data(i + 1)); n -= 1 }
          i += 2
        }
      }
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  // ---- LZWDecode (PDF 32000-1 §7.4.4): variable 9→12-bit MSB-first
  // codes, 256 = clear table, 257 = EOD, early-change width bump (the
  // PDF default EarlyChange=1: width grows when the NEXT code would not
  // fit, i.e. when the table reaches 2^width − 1).

  private[sources] def lzwDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 3)
      var table = new Array[Array[Byte]](4096)
      def resetTable(): Int = {
        var i = 0
        while (i < 256) { table(i) = Array(i.toByte); i += 1 }
        258
      }
      var nextCode = resetTable()
      var width = 9
      var prev: Array[Byte] = null
      var acc = 0L
      var bits = 0
      var i = 0
      var done = false
      while (!done) {
        while (bits < width && i < data.length) {
          acc = (acc << 8) | (data(i) & 0xff); bits += 8; i += 1
        }
        if (bits < width) done = true // truncated stream: keep what we have
        else {
          val code = ((acc >> (bits - width)) & ((1L << width) - 1)).toInt
          bits -= width
          if (code == 257) done = true
          else if (code == 256) {
            nextCode = resetTable(); width = 9; prev = null
          } else {
            val entry: Array[Byte] =
              if (code < 256) table(code)
              else if (code < nextCode && table(code) != null) table(code)
              else if (code == nextCode && prev != null) prev :+ prev(0)
              else return None // spec violation
            out.write(entry, 0, entry.length)
            if (prev != null && nextCode < 4096) {
              table(nextCode) = prev :+ entry(0)
              nextCode += 1
              if (nextCode == (1 << width) - 1 && width < 12) width += 1
            }
            prev = entry
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** LZW encoder (the decoder's inverse, for fixtures/synthesis). Emits
    * an initial clear code; the width schedule SIMULATES THE DECODER's
    * early-change view — the decoder's table add lags the encoder's by
    * one code, and the widths must change at the same point in the code
    * stream on both sides.
    */
  private[sources] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    var acc = 0L
    var bits = 0
    var width = 9      // decoder-view width
    var simNext = 258  // decoder-view table size
    var emitted = 0    // data codes since the last clear
    def flushBits(): Unit = { while (bits >= 8) { out.write(((acc >> (bits - 8)) & 0xff).toInt); bits -= 8 } }
    def emit(code: Int): Unit = { acc = (acc << width) | code; bits += width; flushBits() }
    def emitData(code: Int): Unit = {
      emit(code)
      emitted += 1
      // decoder adds one entry after every data code except the first
      if (emitted >= 2) {
        simNext += 1
        if (simNext == (1 << width) - 1 && width < 12) width += 1
      }
    }
    var dict = scala.collection.mutable.HashMap.empty[String, Int]
    def resetDict(): Unit = { dict.clear(); var i = 0; while (i < 256) { dict += ("" + i.toChar) -> i; i += 1 } }
    resetDict()
    var dictNext = 258
    emit(256) // initial clear
    var w = ""
    for (b <- data) {
      val c = (b & 0xff).toChar
      val wc = w + c
      if (dict.contains(wc)) w = wc
      else {
        emitData(dict(w))
        if (dictNext < 4093) { dict += wc -> dictNext; dictNext += 1 }
        else { // table nearly full: clear and restart (both sides reset)
          emit(256); resetDict(); dictNext = 258; simNext = 258; width = 9; emitted = 0
        }
        w = "" + c
      }
    }
    if (w.nonEmpty) emitData(dict(w))
    emit(257) // EOD
    if (bits > 0) { out.write(((acc << (8 - bits)) & 0xff).toInt) }
    out.toByteArray
  }

  /** RunLength encoder (literal runs only — correct, not optimal). */
  private[sources] def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 128 + 2)
    var i = 0
    while (i < data.length) {
      val n = math.min(128, data.length - i)
      out.write(n - 1)
      out.write(data, i, n)
      i += n
    }
    out.write(128) // EOD
    out.toByteArray
  }

  private[sources] def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes(Latin1)

  // ---- Encryption (PDF 32000-1 §7.6, standard security handler with
  // an EMPTY user password — the scanned-court-PDF shape: encrypted for
  // permissions, readable by anyone; Tika's common decrypt path).
  // Supports V1/R2 (RC4-40), V2/R3 (RC4-128), V4/R4 /AESV2 (AES-128-CBC).

  private val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** plain RC4 (15 lines beats depending on a JCE provider alias) */
  private[sources] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    for (k <- data.indices) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
    }
    out
  }

  private def intLE(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: file encryption key from the (empty) user password. */
  private def fileKey(o: Array[Byte], p: Int, id0: Array[Byte],
                      r: Int, keyBytes: Int): Array[Byte] = {
    var key = md5(PasswordPad, o, intLE(p), id0).take(keyBytes)
    if (r >= 3)
      for (_ <- 0 until 50) key = md5(key).take(keyBytes)
    key
  }

  /** Algorithm 3: the /O entry for empty owner AND user passwords. */
  private def ownerEntry(r: Int, keyBytes: Int): Array[Byte] = {
    var k = md5(PasswordPad)
    if (r >= 3) for (_ <- 0 until 50) k = md5(k)
    val rc4Key = k.take(keyBytes)
    var o = rc4(rc4Key, PasswordPad)
    if (r >= 3)
      for (i <- 1 to 19)
        o = rc4(rc4Key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithms 4/5: the /U entry from the file key. */
  private def userEntry(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, PasswordPad)
    else {
      var u = rc4(key, md5(PasswordPad, id0))
      for (i <- 1 to 19) u = rc4(key.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16) // padded to 32 bytes (arbitrary per spec)
    }

  private val AesSalt = Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte) // "sAlT"

  // ---- V5/R6 (AES-256): ISO 32000-2 §7.6.4.3.3/4. The hardened hash
  // (Algorithm 2.B) replaces the MD5/RC4 derivation; streams and
  // strings are AES-256-CBC under the FILE key directly (V5 has no
  // per-object key).

  private def sha(alg: String)(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcRaw(mode: Int, key: Array[Byte], iv: Array[Byte],
                        data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B: the iterated SHA-256/384/512 password hash. At
    * least 64 rounds, then continue until the last byte of the AES
    * round output is <= round - 32.
    */
  private[sources] def hash2B(password: Array[Byte], salt: Array[Byte],
                              udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256")(password, salt, udata)
    var e = Array.empty[Byte]
    var round = 0
    while (round < 64 || (e.last & 0xff) > round - 32) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      for (i <- 0 until 64)
        System.arraycopy(block, 0, k1, i * block.length, block.length)
      e = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32), k1)
      k = (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => sha("SHA-256")(e)
        case 1 => sha("SHA-384")(e)
        case _ => sha("SHA-512")(e)
      }
      round += 1
    }
    k.take(32)
  }

  private final case class Decryptor(key: Array[Byte], aes: Boolean,
                                     v5: Boolean = false) {
    /** Algorithm 1 (<=R4): per-object key, then RC4 or AES-CBC
      * (IV-prefixed, PKCS#7-padded). Algorithm 1.A (V5): the file key
      * itself, always AES-CBC.
      */
    def decrypt(obj: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val objKey =
        if (v5) key
        else md5(Seq(key, intLE(obj).take(3), intLE(gen).take(2)) ++
          (if (aes) Seq(AesSalt) else Nil): _*)
          .take(math.min(key.length + 5, 16))
      if (!aes) rc4(objKey, data)
      else {
        if (data.length < 16 || (data.length - 16) % 16 != 0)
          return Array.empty
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        val plain = c.doFinal(data.drop(16))
        if (plain.isEmpty) plain
        else {
          val pad = plain.last & 0xff
          if (pad >= 1 && pad <= 16) plain.dropRight(pad) else plain
        }
      }
    }

    def encrypt(obj: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val objKey =
        if (v5) key
        else md5(Seq(key, intLE(obj).take(3), intLE(gen).take(2)) ++
          (if (aes) Seq(AesSalt) else Nil): _*)
          .take(math.min(key.length + 5, 16))
      if (!aes) rc4(objKey, data)
      else {
        val pad = 16 - data.length % 16
        val padded = data ++ Array.fill(pad)(pad.toByte)
        // deterministic IV (fixture writer only)
        val iv = md5(data).take(16)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(padded)
      }
    }
  }

  /** A string value from a dict: `<hex>` or `(literal)` form. The name
    * match is boundary-checked so `/O` never matches inside `/OE` or
    * `/U` inside `/UE` (the V5 dicts carry both).
    */
  private def stringValueAfter(dict: String, name: String): Option[Array[Byte]] = {
    var at = dict.indexOf(name)
    while (at >= 0 && at + name.length < dict.length &&
      Character.isLetterOrDigit(dict.charAt(at + name.length)))
      at = dict.indexOf(name, at + 1)
    if (at < 0) return None
    var i = at + name.length
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (i >= dict.length) None
    else if (dict.charAt(i) == '<') {
      val e = dict.indexOf('>', i)
      if (e < 0) None
      else {
        val hexs = dict.substring(i + 1, e).replaceAll("\\s+", "")
        Some(hexs.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
      }
    } else if (dict.charAt(i) == '(') {
      val (s, _) = literalString(dict, i)
      Some(s.getBytes(Latin1))
    } else None
  }

  private def intValueAfter(dict: String, name: String): Option[Int] =
    // parse as Long and truncate: real writers serialize /P UNSIGNED
    // (4294967292 = -4 as int32) and the low 32 bits are exactly what
    // the key derivation needs; a garbage width must not throw into
    // extract's catch-all and null the whole document
    ("""\Q""" + name + """\E\s+(-?\d+)""").r.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toLong.toInt).toOption)

  /** The dict body of object `num` (nesting-aware forward scan). */
  private def objectDict(hay: String, num: Int): Option[String] = {
    val m = (s"""(?<![0-9])$num\\s+(\\d+)\\s+obj""").r.findFirstMatchIn(hay)
    m.flatMap { mm =>
      val open = hay.indexOf("<<", mm.end)
      if (open < 0) None
      else {
        var depth = 0
        var j = open
        while (j < hay.length - 1) {
          if (hay.charAt(j) == '<' && hay.charAt(j + 1) == '<') { depth += 1; j += 2 }
          else if (hay.charAt(j) == '>' && hay.charAt(j + 1) == '>') {
            depth -= 1
            if (depth == 0) return Some(hay.substring(open, j + 2))
            j += 2
          } else j += 1
        }
        None
      }
    }
  }

  /** Build the decryptor when the trailer names a standard-handler
    * /Encrypt dict the empty-password path can open; None for
    * unencrypted files or unsupported handlers (those degrade to the
    * quarantine channel exactly like undecodable filters).
    */
  private def findDecryptor(hay: String): Option[Decryptor] = {
    val encRef = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(hay)
    encRef.flatMap { m =>
      val dict = objectDict(hay, m.group(1).toInt).getOrElse(return None)
      if (!dict.contains("/Standard")) return None
      val r = intValueAfter(dict, "/R").getOrElse(2)
      if (r >= 5) {
        // V5/R5-R6 (AES-256): derive the file key from /U + /UE with the
        // empty user password (Algorithm 2.A). An R5/R6 dict the empty
        // password can't open (or missing /UE) quarantines — falling
        // through to the RC4-era derivation would emit garbage text.
        val u = stringValueAfter(dict, "/U").getOrElse(return None)
        val ue = stringValueAfter(dict, "/UE").getOrElse(return None)
        if (u.length < 48 || ue.length != 32) return None
        val (hash, vSalt, kSalt) = (u.take(32), u.slice(32, 40), u.slice(40, 48))
        val none = Array.empty[Byte]
        if (!java.util.Arrays.equals(hash2B(none, vSalt, none), hash)) return None
        val ik = hash2B(none, kSalt, none)
        val fk = aesCbcRaw(javax.crypto.Cipher.DECRYPT_MODE, ik,
          new Array[Byte](16), ue)
        return Some(Decryptor(fk, aes = true, v5 = true))
      }
      val lengthBits = intValueAfter(dict, "/Length").getOrElse(40)
      val p = intValueAfter(dict, "/P").getOrElse(-1)
      val o = stringValueAfter(dict, "/O").getOrElse(return None)
      val aes = dict.contains("/AESV2")
      val id0 = """/ID\s*\[\s*<([0-9a-fA-F]+)>""".r.findFirstMatchIn(hay)
        .map(_.group(1).grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
        .getOrElse(Array.empty[Byte])
      val keyBytes = if (r == 2) 5 else lengthBits / 8
      Some(Decryptor(fileKey(o, p, id0, r, keyBytes), aes))
    }
  }

  /** The /Filter entry as an ordered decode chain: a single name or an
    * array of names (chains decode left-to-right, §7.4.1).
    */
  private[sources] def filtersOf(dict: String): Seq[String] = {
    val at = dict.indexOf("/Filter")
    if (at < 0) return Seq.empty
    var i = at + "/Filter".length
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    val names = "/([A-Za-z0-9]+)".r
    if (i < dict.length && dict.charAt(i) == '[') {
      val e = dict.indexOf(']', i)
      val body = if (e < 0) dict.substring(i + 1) else dict.substring(i + 1, e)
      names.findAllMatchIn(body).map(_.group(1)).toSeq
    } else names.findFirstMatchIn(dict.substring(i)).map(_.group(1)).toSeq
  }

  /** Undo PNG row predictors (PDF 32000-1 §7.4.4.4, /Predictor ≥ 10):
    * each row starts with a filter-type byte (None/Sub/Up/Average/
    * Paeth) over `rowLen` data bytes with pixel width `bpp`.
    */
  private[sources] def pngUnpredict(data: Array[Byte], colors: Int,
                                    bpc: Int, columns: Int): Option[Array[Byte]] =
    try {
      val bpp = math.max(1, colors * bpc / 8)
      val rowLen = (colors * bpc * columns + 7) / 8
      if (data.length % (rowLen + 1) != 0) return None
      val rows = data.length / (rowLen + 1)
      val out = new Array[Byte](rows * rowLen)
      var prev = new Array[Byte](rowLen)
      for (r <- 0 until rows) {
        val ft = data(r * (rowLen + 1)) & 0xff
        val row = java.util.Arrays.copyOfRange(
          data, r * (rowLen + 1) + 1, (r + 1) * (rowLen + 1))
        ft match {
          case 0 => // None
          case 1 => // Sub
            for (i <- bpp until rowLen) row(i) = (row(i) + row(i - bpp)).toByte
          case 2 => // Up
            for (i <- 0 until rowLen) row(i) = (row(i) + prev(i)).toByte
          case 3 => // Average
            for (i <- 0 until rowLen) {
              val left = if (i >= bpp) row(i - bpp) & 0xff else 0
              row(i) = (row(i) + (left + (prev(i) & 0xff)) / 2).toByte
            }
          case 4 => // Paeth
            for (i <- 0 until rowLen) {
              val a = if (i >= bpp) row(i - bpp) & 0xff else 0
              val b = prev(i) & 0xff
              val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
              val p = a + b - c
              val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              row(i) = (row(i) + pred).toByte
            }
          case _ => return None
        }
        System.arraycopy(row, 0, out, r * rowLen, rowLen)
        prev = row
      }
      Some(out)
    } catch { case _: Throwable => None }

  /** /DecodeParms (or legacy /DP) values for the predictor family. */
  private def parmInt(dict: String, name: String, default: Int): Int =
    intValueAfter(dict, name).getOrElse(default)

  /** Run the dict's filter chain over the raw stream bytes; None when a
    * filter is unknown or its data corrupt (the skip-and-log path).
    * Flate/LZW honor a PNG /Predictor in the DecodeParms sub-dict
    * (TIFF predictor 2 is image-only and rejected).
    */
  private def decodeStream(dict: String, data: Array[Byte]): Option[Array[Byte]] = {
    val chain = filtersOf(dict)
    def unpredicted(d: Array[Byte]): Option[Array[Byte]] = {
      val pred = parmInt(dict, "/Predictor", 1)
      if (pred == 1) Some(d)
      else if (pred >= 10)
        pngUnpredict(d, parmInt(dict, "/Colors", 1),
          parmInt(dict, "/BitsPerComponent", 8), parmInt(dict, "/Columns", 1))
      else None
    }
    if (chain.isEmpty) Some(data)
    else chain.foldLeft(Option(data)) { (acc, f) =>
      acc.flatMap { d =>
        f match {
          case "FlateDecode" | "Fl" => inflate(d).flatMap(unpredicted)
          case "LZWDecode" | "LZW" => lzwDecode(d).flatMap(unpredicted)
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
          case "RunLengthDecode" | "RL" => runLengthDecode(d)
          case _ => None // DCT/JPX/CCITT/Crypt: images or out of scope
        }
      }
    }
  }

  /** Start of the dict enclosing the `stream` keyword at `at` — tracks
    * `<<`/`>>` NESTING walking backwards, so a nested sub-dict (e.g.
    * /DecodeParms << ... >>) cannot truncate the captured dict and hide
    * its /Filter entry.
    */
  private def enclosingDictStart(hay: String, at: Int): Int = {
    var depth = 0
    var j = at - 1
    while (j > 0) {
      val c = hay.charAt(j)
      if (c == '>' && hay.charAt(j - 1) == '>') { depth += 1; j -= 2 }
      else if (c == '<' && hay.charAt(j - 1) == '<') {
        depth -= 1
        if (depth <= 0) return j - 1
        j -= 2
      }
      else j -= 1
    }
    -1
  }

  /** One scanned stream: owning object/generation (for per-object
    * decryption keys), its dict text, and the raw bytes.
    */
  private[sources] final case class RawStream(obj: Int, gen: Int, dict: String,
                                     data: Array[Byte])

  /** Nearest `N G obj` header before `dictStart` — the object whose
    * per-object decryption key applies to a stream. Backward scan with
    * NO byte cap (whitespace/comments can separate header and dict
    * arbitrarily; a fixed window resolved such objects to (0,0) and
    * derived a wrong key); an intervening `endobj` means the stream
    * belongs to no open object.
    */
  private[sources] def owningObject(hay: String, dictStart: Int): (Int, Int) = {
    if (dictStart <= 0) return (0, 0)
    var oAt = -1
    var search = dictStart
    while (oAt < 0 && search > 0) {
      val cand = hay.lastIndexOf("obj", search - 1)
      if (cand <= 0) search = 0
      else if (Character.isWhitespace(hay.charAt(cand - 1))) oAt = cand
      else search = cand // e.g. the "obj" inside "endobj"
    }
    val endAt = hay.lastIndexOf("endobj", dictStart - 1)
    if (oAt < 0 || endAt > oAt) return (0, 0)
    var i = oAt - 1
    def skipWs(): Unit =
      while (i >= 0 && Character.isWhitespace(hay.charAt(i))) i -= 1
    def readNum(): Int = {
      val e = i
      while (i >= 0 && hay.charAt(i).isDigit) i -= 1
      if (e == i || e - i > 9) -1 else hay.substring(i + 1, e + 1).toInt
    }
    skipWs(); val g = readNum(); skipWs(); val n = readNum()
    if (g < 0 || n < 0) (0, 0) else (n, g)
  }

  /** Streams found by a linear scan — no xref walk, so damaged files
    * and PDF-1.5 xref-STREAM files still yield their readable content
    * streams (Tika is similarly lenient; the xref stream itself is
    * recognized by its /Type and skipped).
    */
  // (?![0-9]) pins the capture to the FULL number: without it, an
  // indirect ref like "/Length 70 0 R" backtracks to capture "7" (the
  // ref-lookahead then passes) and truncates. Hoisted: compiling per
  // stream was measurable on the decode hot path.
  private val directLength = """/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)""".r

  private[sources] def streams(bytes: Array[Byte]): Seq[RawStream] = {
    val hay = new String(bytes, Latin1)
    val out = Vector.newBuilder[RawStream]
    var from = 0
    while ({
      val at = hay.indexOf("stream", from)
      if (at < 0) false
      // the "stream" inside an "endstream" token is not a stream start
      else if (at >= 3 && hay.regionMatches(at - 3, "end", 0, 3)) {
        from = at + 6
        true
      }
      else {
        // dict = the enclosing << ... >> just before (nesting-aware)
        val dictEnd = at
        val dictStart = enclosingDictStart(hay, at)
        val dict =
          if (dictStart >= 0) hay.substring(dictStart, dictEnd) else ""
        // the `N G obj` header before the dict names the object whose
        // per-object decryption key applies (uncapped backward scan)
        val (onum, ogen) = owningObject(hay, dictStart)
        // stream data starts after "stream" + EOL
        var s = at + "stream".length
        if (s < hay.length && hay.charAt(s) == '\r') s += 1
        if (s < hay.length && hay.charAt(s) == '\n') s += 1
        val e = hay.indexOf("endstream", s)
        if (e > s) {
          // honor a DIRECT /Length (an EOL precedes "endstream" and
          // must not count as data — a stray byte corrupts AES block
          // alignment), but only when it is CONSISTENT: everything
          // between the declared end and "endstream" must be EOL bytes.
          // A damaged file's wrong length falls back to EOL-trim
          // instead of silently truncating real data; indirect /Length
          // refs (unresolvable without an xref walk) also fall back.
          val declared = directLength.findFirstMatchIn(dict)
            .flatMap(m => scala.util.Try(m.group(1).toInt).toOption)
          var end = e
          declared match {
            case Some(l) if s + l <= e &&
                (s + l until e).forall(i => bytes(i) == '\n' || bytes(i) == '\r') =>
              end = s + l
            case _ =>
              if (end > s && bytes(end - 1) == '\n') end -= 1
              if (end > s && bytes(end - 1) == '\r') end -= 1
          }
          out += RawStream(onum, ogen, dict, java.util.Arrays.copyOfRange(bytes, s, end))
          from = e + 1
        } else from = at + 6
        true
      }
    }) ()
    out.result()
  }

  // ---- per-font /Tf scoping (mixed-font documents): a hex string's
  // decoding depends on the CURRENT font — simple fonts are
  // single-byte Latin-1, Type0/CID fonts are 2-byte codes through
  // THAT font's map. Resolved from the document's object graph
  // (resource /Font name → font dict → ToUnicode stream or embedded
  // FontFile2 cmap); names that cannot be resolved (fonts packed into
  // ObjStm, damaged graphs) fall back to the legacy merged-map
  // heuristic, so single-font documents behave identically.

  private[sources] final case class FontInfo(isCid: Boolean,
                                             cmap: Map[Int, String])

  /** Non-stream object dicts by object number: forward scan for
    * `N 0 obj` headers followed by a nesting-aware `<< … >>` capture
    * (a non-greedy regex would truncate at the first `>>` of a nested
    * sub-dict). Lenient: malformed candidates are skipped.
    */
  /** Nesting-aware `<< … >>` capture starting at `i` (must point at
    * the opening `<<`); None when unbalanced.
    */
  private def captureDict(hay: String, i: Int): Option[String] = {
    var depth = 0
    var j = i
    var end = -1
    while (end < 0 && j < hay.length - 1) {
      if (hay.charAt(j) == '<' && hay.charAt(j + 1) == '<') { depth += 1; j += 2 }
      else if (hay.charAt(j) == '>' && hay.charAt(j + 1) == '>') {
        depth -= 1; j += 2; if (depth == 0) end = j
      }
      else j += 1
    }
    if (end > 0) Some(hay.substring(i, end)) else None
  }

  private[sources] def objectDicts(hay: String): Map[Int, String] = {
    // indexOf scan, not a regex: this runs per DOCUMENT over the whole
    // byte haystack (like `streams`), and a `\d+\s+\d+\s+obj` regex
    // attempts a match at every offset — measured ~10× slower on the
    // CID probe fixture
    val out = Map.newBuilder[Int, String]
    var from = 0
    while ({ val at = hay.indexOf("obj", from); at >= 0 && {
      // standalone token only ("endobj" is preceded by 'd', not space)
      if (at >= 1 && Character.isWhitespace(hay.charAt(at - 1))) {
        var i = at - 1
        def skipWs(): Unit =
          while (i >= 0 && Character.isWhitespace(hay.charAt(i))) i -= 1
        def readNum(): Int = {
          val e = i
          while (i >= 0 && hay.charAt(i).isDigit) i -= 1
          if (e == i || e - i > 9) -1 else hay.substring(i + 1, e + 1).toInt
        }
        skipWs(); val g = readNum(); skipWs(); val n = readNum()
        if (g >= 0 && n >= 0) {
          var j = at + 3
          while (j < hay.length && Character.isWhitespace(hay.charAt(j))) j += 1
          if (j + 1 < hay.length && hay.charAt(j) == '<' && hay.charAt(j + 1) == '<')
            captureDict(hay, j).foreach(d => out += n -> d)
        }
      }
      from = at + 3
      true
    }}) ()
    out.result()
  }

  /** Objects packed in an ObjStm body (§7.5.7): `/N` pairs of
    * `objnum offset` before `/First`, objects at `First + offset`.
    * Dict-valued objects by number; bodies whose pairs header does not
    * parse fall back to the top-level headered scan (the lenient shape
    * some producers — and the m-gate fixtures — ship).
    */
  private[sources] def objStmDicts(dict: String, body: String): Map[Int, String] = {
    val n = objStmNRe.findFirstMatchIn(dict).map(_.group(1).toInt)
    val first = objStmFirstRe.findFirstMatchIn(dict).map(_.group(1).toInt)
    val packed = (n, first) match {
      case (Some(cnt), Some(f0)) if cnt > 0 && f0 > 0 && f0 <= body.length =>
        val header = body.substring(0, f0).trim.split("\\s+").filter(_.nonEmpty)
        if (header.length >= 2 * cnt &&
            header.take(2 * cnt).forall(t => t.nonEmpty && t.forall(_.isDigit) && t.length <= 9)) {
          val pairs = (0 until cnt).map(i => (header(2 * i).toInt, header(2 * i + 1).toInt))
          val out = Map.newBuilder[Int, String]
          for ((objNum, off) <- pairs) {
            var s = f0 + off
            while (s < body.length && Character.isWhitespace(body.charAt(s))) s += 1
            if (s + 1 < body.length && body.charAt(s) == '<' && body.charAt(s + 1) == '<')
              captureDict(body, s).foreach(d => out += objNum -> d)
          }
          out.result()
        } else Map.empty[Int, String]
      case _ => Map.empty[Int, String]
    }
    packed ++ objectDicts(body)
  }

  private val objStmNRe = """/N\s+(\d+)""".r
  private val objStmFirstRe = """/First\s+(\d+)""".r
  private val objStmTypeRe = "/Type\\s*/ObjStm".r
  private val skipStreamRe = "/(?:Type|Subtype)\\s*/(?:XRef|ObjStm|Image|Metadata)".r
  // ToUnicode CMap grammar, hoisted (compiling per document was the
  // round-4 hot-path lesson)
  private val bfcharRe = """(?s)beginbfchar(.*?)endbfchar""".r
  private val bfrangeRe = """(?s)beginbfrange(.*?)endbfrange""".r
  private val bfPairRe = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val bfTripleRe = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  // §9.10.3 array-destination form: <lo> <hi> [<d0> <d1> …]
  private val bfArrayRe =
    """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*\[((?:\s*<[0-9a-fA-F]+>)+)\s*\]""".r
  private val bfElementRe = """<([0-9a-fA-F]+)>""".r
  private val resourceFontRe = """/Font\s*<<([^>]*)>>""".r
  private val fontPairRe = """/(\w+)\s+(\d{1,9})\s+\d+\s+R""".r
  private val toUnicodeRefRe = """/ToUnicode\s+(\d{1,9})\s+\d+\s+R""".r
  private val descendantRefRe = """/DescendantFonts\s*\[\s*(\d{1,9})\s+\d+\s+R""".r
  private val fontDescRefRe = """/FontDescriptor\s+(\d{1,9})\s+\d+\s+R""".r
  private val fontFile2RefRe = """/FontFile2\s+(\d{1,9})\s+\d+\s+R""".r

  /** Resource font name → FontInfo over the resolved object graph.
    * `packedDicts`/`packedBodies` carry ObjStm-packed objects (PDF-1.5
    * documents keep font and page dicts there), `cmapByObj` maps
    * ToUnicode STREAM object numbers to parsed maps, `bytesByObj` maps
    * stream object numbers to decoded bytes (for FontFile2 programs).
    */
  private def resolveFonts(hay: String,
                           packedDicts: Map[Int, String],
                           packedBodies: Seq[String],
                           cmapByObj: Map[Int, Map[Int, String]],
                           bytesByObj: Map[Int, Array[Byte]]): Map[String, FontInfo] = {
    val dicts = objectDicts(hay) ++ packedDicts
    if (dicts.isEmpty) return Map.empty
    val refs = (hay +: packedBodies).iterator.flatMap(h =>
      resourceFontRe.findAllMatchIn(h).flatMap(rm =>
        fontPairRe.findAllMatchIn(rm.group(1)).map(p => p.group(1) -> p.group(2).toInt)))
    // first-wins keeps the earliest page's mapping stable under re-use
    val named = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for ((n, o) <- refs if !named.contains(n)) named(n) = o
    named.iterator.flatMap { case (name, objNum) =>
      dicts.get(objNum).map { d =>
        val isCid = d.contains("/Type0")
        val viaToUnicode = toUnicodeRefRe.findFirstMatchIn(d)
          .flatMap(m => cmapByObj.get(m.group(1).toInt))
        def viaFontProgram: Option[Map[Int, String]] = for {
          desc <- descendantRefRe.findFirstMatchIn(d).map(_.group(1).toInt)
          dd <- dicts.get(desc)
          // a non-Identity CIDToGIDMap (mapping stream) breaks CID=GID
          if !fontDescNonIdentityGid(dd)
          fd <- fontDescRefRe.findFirstMatchIn(dd).map(_.group(1).toInt)
          fdd <- dicts.get(fd)
          ff <- fontFile2RefRe.findFirstMatchIn(fdd).map(_.group(1).toInt)
          bytes <- bytesByObj.get(ff)
          m <- TrueTypeCmap.gidToUnicode(bytes)
        } yield m
        val cmap =
          if (!isCid) Map.empty[Int, String]
          else viaToUnicode.orElse(viaFontProgram).getOrElse(Map.empty)
        name -> FontInfo(isCid, cmap)
      }
    }.toMap
  }

  private val nonIdentityGidRe = "/CIDToGIDMap\\s*+(?!/Identity)\\S".r

  private def fontDescNonIdentityGid(descendantDict: String): Boolean =
    nonIdentityGidRe.findFirstIn(descendantDict).isDefined

  // ---- ToUnicode CMaps (CID/Type0 fonts, §9.10.3): 2-byte character
  // codes resolve through the font's bfchar/bfrange mappings; without a
  // resolving map, hex strings stay single-byte Latin-1 (simple fonts).

  private[sources] def parseToUnicode(cmap: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    def utf16(bs: Array[Byte]): String =
      new String(bs, java.nio.charset.StandardCharsets.UTF_16BE)
    def code(bs: Array[Byte]): Int =
      bs.foldLeft(0)((a, b) => (a << 8) | (b & 0xff))
    val bfchar = bfcharRe
    val bfrange = bfrangeRe
    val pair = bfPairRe
    val triple = bfTripleRe
    val arrayForm = bfArrayRe
    val element = bfElementRe
    for (m <- bfchar.findAllMatchIn(cmap); p <- pair.findAllMatchIn(m.group(1)))
      out += code(hex(p.group(1))) -> utf16(hex(p.group(2)))
    for (m <- bfrange.findAllMatchIn(cmap)) {
      val body = m.group(1)
      for (a <- arrayForm.findAllMatchIn(body)) {
        val lo = code(hex(a.group(1)))
        val hi = code(hex(a.group(2)))
        val dsts = element.findAllMatchIn(a.group(3)).map(_.group(1)).toVector
        for ((d, i) <- dsts.zipWithIndex if lo + i <= hi)
          out += (lo + i) -> utf16(hex(d))
      }
      // mask array-form entries so the triple scan cannot misread an
      // array's first element as a <dst> of the continuous form
      val masked = arrayForm.replaceAllIn(body, "")
      for (t <- triple.findAllMatchIn(masked)) {
        val lo = code(hex(t.group(1)))
        val hi = code(hex(t.group(2)))
        val dst = code(hex(t.group(3)))
        for (c <- lo to math.min(hi, lo + 65535))
          out += c -> new String(Character.toChars(dst + (c - lo)))
      }
    }
    out.result()
  }

  /** Decode one PDF literal string starting at `i` (positioned on the
    * opening paren); returns (decoded, index after closing paren).
    */
  private def literalString(s: String, i: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var j = i + 1
    while (j < s.length && depth > 0) {
      val c = s.charAt(j)
      if (c == '\\' && j + 1 < s.length) {
        val n = s.charAt(j + 1)
        n match {
          case 'n' => sb.append('\n'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'b' | 'f' => j += 2
          case '(' => sb.append('('); j += 2
          case ')' => sb.append(')'); j += 2
          case '\\' => sb.append('\\'); j += 2
          case d if d >= '0' && d <= '7' =>
            var k = j + 1; var v = 0; var cnt = 0
            while (k < s.length && cnt < 3 &&
              s.charAt(k) >= '0' && s.charAt(k) <= '7') {
              v = v * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1
            }
            sb.append(v.toChar); j = k
          case '\n' => j += 2 // line continuation
          // unknown escape: the backslash is dropped, the char kept
          // (PDF 32000-1 §7.3.4.2)
          case other => sb.append(other); j += 2
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) { j += 1 } }
        if (depth > 0) { sb.append(c); j += 1 }
      }
    }
    (sb.toString, j)
  }

  /** Block terminator scan that honors string literals — "ET" inside a
    * `(…)` operand must not end the block (found by the round-trip
    * property test: any shown text containing "ET" was truncated).
    */
  private def findBlockEnd(content: String, from: Int): Int = {
    var j = from
    while (j < content.length - 1) {
      content.charAt(j) match {
        case '(' => j = literalString(content, j)._2
        case 'E' if content.charAt(j + 1) == 'T' => return j
        case _ => j += 1
      }
    }
    -1
  }

  /** Text chunks of one content stream: BT…ET blocks, string operands
    * of Tj / ' / " and TJ arrays, block per line. `cmap` (merged
    * ToUnicode tables) resolves 2-byte CID hex strings; hex strings it
    * cannot fully resolve fall back to single-byte Latin-1. When
    * `fonts` resolves the document's resource names, each hex string
    * instead decodes under the font SELECTED by the last `/Name … Tf`
    * before it (simple → Latin-1; CID → that font's map; CID with no
    * map → skipped); unresolved names keep the legacy merged-map path.
    */
  private val tfRe = """/(\w+)\s+[-\d.]+\s+Tf""".r

  private def contentText(content: String,
                          cmap: Map[Int, String] = Map.empty,
                          skipHex: Boolean = false,
                          fonts: Map[String, FontInfo] = Map.empty): Seq[String] = {
    val switches: Array[(Int, String)] =
      if (fonts.isEmpty) Array.empty
      else tfRe.findAllMatchIn(content).map(m => (m.end, m.group(1))).toArray
    def activeFont(pos: Int): Option[FontInfo] = {
      var lo = 0; var hi = switches.length - 1; var best = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (switches(mid)._1 <= pos) { best = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (best < 0) None else fonts.get(switches(best)._2)
    }
    val lines = Vector.newBuilder[String]
    var i = 0
    while ({ val bt = content.indexOf("BT", i); bt >= 0 && {
      val et = findBlockEnd(content, bt + 2)
      val block = if (et > bt) content.substring(bt + 2, et)
                  else content.substring(bt + 2)
      val parts = Vector.newBuilder[String]
      var j = 0
      while (j < block.length) {
        block.charAt(j) match {
          case '(' =>
            val (str, nj) = literalString(block, j)
            parts += str
            j = nj
          // hex string <48656C6C6F>; << starts a dict, not a string
          case '<' if j + 1 < block.length && block.charAt(j + 1) != '<' =>
            val e = block.indexOf('>', j)
            if (e < 0) j = block.length
            else {
              val font = activeFont(bt + 2 + j)
              if (font.isEmpty && skipHex) j = e + 1 // CID, no map: undecodable
              else {
                val hexs = block.substring(j + 1, e).replaceAll("\\s+", "")
                val padded = if (hexs.length % 2 == 1) hexs + "0" else hexs
                def latin1(): Unit = {
                  val sb = new StringBuilder
                  var h = 0
                  while (h < padded.length) {
                    sb.append(Integer.parseInt(padded.substring(h, h + 2), 16).toChar)
                    h += 2
                  }
                  parts += sb.toString
                }
                try font match {
                  // scoped: the CURRENT font decides, per string
                  case Some(f) if !f.isCid => latin1()
                  case Some(f) if f.cmap.nonEmpty && padded.length % 4 == 0 =>
                    // unmapped codes emit nothing rather than fabricate
                    parts += padded.grouped(4)
                      .map(h => f.cmap.getOrElse(Integer.parseInt(h, 16), ""))
                      .mkString
                  case Some(_) => () // CID font without a map: skip
                  // legacy merged-map heuristic (unresolved font names)
                  case None =>
                    val cidCodes =
                      if (cmap.nonEmpty && padded.length % 4 == 0)
                        Some(padded.grouped(4).map(Integer.parseInt(_, 16)).toSeq)
                          .filter(_.forall(cmap.contains))
                      else None
                    cidCodes match {
                      case Some(codes) => parts += codes.map(cmap).mkString
                      case None => latin1()
                    }
                } catch { case _: NumberFormatException => () }
                j = e + 1
              }
            }
          case '<' => j += 2 // dict open
          case '%' => // comment to EOL
            val nl = block.indexOf('\n', j)
            j = if (nl < 0) block.length else nl + 1
          case _ => j += 1
        }
      }
      val text = parts.result().mkString(" ").replaceAll("\\s+", " ").trim
      if (text.nonEmpty) lines += text
      i = if (et > bt) et + 2 else block.length + bt + 2
      true
    } }) ()
    lines.result()
  }

  /** Minimal single-page PDF writer — the extractor's inverse, used by
    * the gated round-trip query and as a fixture builder. `flate`
    * compresses the content stream (Deflater), exercising the
    * FlateDecode read path.
    */
  def synthesize(text: String, flate: Boolean): Array[Byte] =
    synthesize(text, if (flate) Seq("FlateDecode") else Seq.empty)

  private def deflateBytes(in: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(in); d.finish()
      val buf = new Array[Byte](in.length * 2 + 64)
      val n = d.deflate(buf)
      java.util.Arrays.copyOf(buf, n)
    } finally d.end()
  }

  /** Synthesize with an explicit decode-filter chain (applied to the
    * content in REVERSE, so the written /Filter array decodes
    * left-to-right per §7.4.1). A nested /DecodeParms sub-dict is
    * emitted alongside FlateDecode to keep the nesting-aware dict scan
    * honest.
    */
  def synthesize(text: String, filters: Seq[String]): Array[Byte] = {
    // one BT block per input line — the shape real writers emit (a
    // block per paragraph/line group), so extract's blank-line block
    // join round-trips multi-paragraph fixtures
    val contents = text.split("\n", -1).zipWithIndex.map { case (line, i) =>
      val escaped = line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      s"BT /F1 12 Tf 72 ${720 - i * 14} Td ($escaped) Tj ET"
    }.mkString("\n")
    val content = filters.reverse.foldLeft(contents.getBytes(Latin1)) { (d, f) =>
      f match {
        case "FlateDecode" => deflateBytes(d)
        case "ASCIIHexDecode" => asciiHexEncode(d)
        case "LZWDecode" => lzwEncode(d)
        case "RunLengthDecode" => runLengthEncode(d)
        case other => throw new IllegalArgumentException(s"no encoder for $other")
      }
    }
    val filter = filters match {
      case Seq() => ""
      case Seq(one) => s" /Filter /$one"
      case many => many.map("/" + _).mkString(" /Filter [", " ", "]")
    }
    // real-world shape: FlateDecode dicts often carry nested DecodeParms
    val parms = if (filters.contains("FlateDecode"))
      " /DecodeParms << /Columns 1 /Predictor 1 >>" else ""
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length}$filter$parms >>\nstream\n").getBytes(Latin1)
    val tail = "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes(Latin1)
    head ++ content ++ tail
  }

  /** Synthesize an ENCRYPTED single-page PDF (standard security
    * handler, empty user+owner passwords — the court-corpus shape).
    * Modes: "rc4-40" (V1/R2), "rc4-128" (V2/R3), "aes-128" (V4/R4
    * /AESV2), "aes-256" (V5/R6 /AESV3). The writer derives
    * O/U(/OE/UE)/file-key with the spec algorithms, so extraction
    * exercises the real key-derivation path.
    */
  def synthesizeEncrypted(text: String, mode: String): Array[Byte] = {
    val escaped = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val contents = s"BT /F1 12 Tf 72 720 Td ($escaped) Tj ET".getBytes(Latin1)
    if (mode == "aes-256") return synthesizeAes256(escaped, contents)
    val (v, r, lengthBits, aes) = mode match {
      case "rc4-40" => (1, 2, 40, false)
      case "rc4-128" => (2, 3, 128, false)
      case "aes-128" => (4, 4, 128, true)
      case other => throw new IllegalArgumentException(s"mode $other")
    }
    val id0 = md5(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val p = -4
    val keyBytes = if (r == 2) 5 else lengthBits / 8
    val o = ownerEntry(r, keyBytes)
    val key = fileKey(o, p, id0, r, keyBytes)
    val u = userEntry(key, id0, r)
    val enc = Decryptor(key, aes).encrypt(4, 0, contents)
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val cf = if (aes)
      " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> /StmF /StdCF /StrF /StdCF"
      else ""
    val lengthEntry = if (r == 2) "" else s" /Length $lengthBits"
    val head = ("%PDF-1.6\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${enc.length} >>\nstream\n").getBytes(Latin1)
    val tail = ("\nendstream\nendobj\n" +
      s"5 0 obj << /Filter /Standard /V $v /R $r$lengthEntry /P $p" +
      s" /O <${hx(o)}> /U <${hx(u)}>$cf >> endobj\n" +
      s"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<${hx(id0)}> <${hx(id0)}>] >>\n%%EOF\n")
      .getBytes(Latin1)
    head ++ enc ++ tail
  }

  /** V5/R6 writer (ISO 32000-2 Algorithms 8-10): U/UE from the empty
    * user password, O/OE from the empty owner password over U, /Perms
    * AES-ECB under the file key. Salts and key are deterministic
    * functions of the text so fixtures are reproducible.
    */
  private def synthesizeAes256(escaped: String, contents: Array[Byte]): Array[Byte] = {
    val none = Array.empty[Byte]
    val seed = sha("SHA-256")(contents)
    val fk = sha("SHA-256")(seed, "filekey".getBytes(Latin1)) // 32 bytes
    def salt(tag: String) = sha("SHA-256")(seed, tag.getBytes(Latin1)).take(8)
    val (uvs, uks) = (salt("uv"), salt("uk"))
    val u = hash2B(none, uvs, none) ++ uvs ++ uks
    val ue = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(none, uks, none), new Array[Byte](16), fk)
    val (ovs, oks) = (salt("ov"), salt("ok"))
    val o = hash2B(none, ovs, u) ++ ovs ++ oks
    val oe = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(none, oks, u), new Array[Byte](16), fk)
    val p = -4
    val permsBlock = intLE(p) ++ Array.fill(4)(0xff.toByte) ++
      "Tadb".getBytes(Latin1) ++ salt("pr").take(4)
    val ecb = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    ecb.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fk, "AES"))
    val perms = ecb.doFinal(permsBlock)
    val enc = Decryptor(fk, aes = true, v5 = true).encrypt(4, 0, contents)
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val head = ("%PDF-2.0\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${enc.length} >>\nstream\n").getBytes(Latin1)
    val tail = ("\nendstream\nendobj\n" +
      "5 0 obj << /Filter /Standard /V 5 /R 6 /Length 256 " +
      s"/P $p /O <${hx(o)}> /U <${hx(u)}> /OE <${hx(oe)}> /UE <${hx(ue)}>" +
      s" /Perms <${hx(perms)}>" +
      " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >>" +
      " /StmF /StdCF /StrF /StdCF >> endobj\n" +
      "trailer << /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF\n").getBytes(Latin1)
    head ++ enc ++ tail
  }

  /** Synthesize a CID/Type0-font PDF: the text is shown as 2-byte
    * character codes resolved through a /ToUnicode CMap (Identity-H
    * shape) — arbitrary BMP unicode round-trips.
    */
  def synthesizeCid(text: String): Array[Byte] = {
    val chars = text.distinct
    val codeOf = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val hexCodes = text.map(c => f"${codeOf(c)}%04x").mkString
    val contents = s"BT /F1 12 Tf 72 720 Td <$hexCodes> Tj ET"
    val bfchars = chars
      .map(c => f"<${codeOf(c)}%04x> <${c.toInt}%04x>").mkString("\n")
    val cmapBody = ("/CIDInit /ProcSet findresource begin\n" +
      "12 dict begin begincmap\n" +
      s"${chars.length} beginbfchar\n$bfchars\nendbfchar\n" +
      "endcmap end end").getBytes(Latin1)
    (("%PDF-1.6\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      " /Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /F1" +
      " /Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n" +
      s"6 0 obj << /Length ${cmapBody.length} >>\nstream\n").getBytes(Latin1)) ++
      cmapBody ++
      ("\nendstream\nendobj\n" +
        s"4 0 obj << /Length ${contents.length} >>\nstream\n").getBytes(Latin1) ++
      contents.getBytes(Latin1) ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes(Latin1)
  }

  /** Synthesize a MIXED-FONT page: /F1 a simple (Latin-1) font, /F2 a
    * Type0/Identity-H font with a ToUnicode CMap — and the CID codes
    * deliberately CHOSen to collide with `simpleText`'s Latin-1 byte
    * pairs, so only per-font /Tf scoping decodes both strings right
    * (the merged-map heuristic would misread the simple string as CID).
    */
  def synthesizeMixedFonts(simpleText: String, cidText: String): Array[Byte] = {
    val collide = simpleText.getBytes(Latin1).grouped(2)
      .filter(_.length == 2)
      .map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toSeq.distinct
    val cidChars = cidText.distinct
    val codeOf = cidChars.zipWithIndex.map { case (c, i) =>
      c -> (if (i < collide.length) collide(i) else 0x3000 + i)
    }.toMap
    val simpleHex = simpleText.getBytes(Latin1).map(b => f"${b & 0xff}%02x").mkString
    val cidHex = cidText.map(c => f"${codeOf(c)}%04x").mkString
    val contents =
      s"BT /F1 12 Tf <$simpleHex> Tj ET\nBT /F2 12 Tf <$cidHex> Tj ET"
    val bfchars = cidChars
      .map(c => f"<${codeOf(c)}%04x> <${c.toInt}%04x>").mkString("\n")
    val cmapBody = ("/CIDInit /ProcSet findresource begin\n" +
      "12 dict begin begincmap\n" +
      s"${cidChars.length} beginbfchar\n$bfchars\nendbfchar\n" +
      "endcmap end end").getBytes(Latin1)
    (("%PDF-1.6\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      " /Resources << /Font << /F1 9 0 R /F2 5 0 R >> >> >> endobj\n" +
      "9 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /F2" +
      " /Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n" +
      s"6 0 obj << /Length ${cmapBody.length} >>\nstream\n").getBytes(Latin1)) ++
      cmapBody ++
      ("\nendstream\nendobj\n" +
        s"4 0 obj << /Length ${contents.length} >>\nstream\n").getBytes(Latin1) ++
      contents.getBytes(Latin1) ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes(Latin1)
  }

  /** Synthesize a Type0/Identity-H PDF with NO /ToUnicode but WITH an
    * embedded TrueType font program (/FontFile2) whose `cmap` maps the
    * text's characters — the realistic shape of the exotic-CID class
    * in real court corpora, recoverable through the font-program tier
    * (`TrueTypeCmap.gidToUnicode`). CIDs are glyph ids (Identity-H +
    * default /CIDToGIDMap /Identity), assigned 1+index over the text's
    * sorted distinct characters to match `TrueTypeCmap.synthesizeFont`.
    */
  def synthesizeCidTrueType(text: String): Array[Byte] = {
    val chars = text.distinct.sorted
    val gidOf = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val hexCodes = text.map(c => f"${gidOf(c)}%04x").mkString
    val contents = s"BT /F1 12 Tf 72 720 Td <$hexCodes> Tj ET"
    val font = TrueTypeCmap.synthesizeFont(chars)
    (("%PDF-1.6\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R" +
      " /Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /F1" +
      " /Encoding /Identity-H /DescendantFonts [6 0 R] >> endobj\n" +
      "6 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /F1" +
      " /CIDToGIDMap /Identity /FontDescriptor 7 0 R >> endobj\n" +
      "7 0 obj << /Type /FontDescriptor /FontName /F1 /FontFile2 8 0 R >> endobj\n" +
      s"8 0 obj << /Length ${font.length} /Length1 ${font.length} >>\nstream\n")
      .getBytes(Latin1)) ++
      font ++
      ("\nendstream\nendobj\n" +
        s"4 0 obj << /Length ${contents.length} >>\nstream\n").getBytes(Latin1) ++
      contents.getBytes(Latin1) ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes(Latin1)
  }

  /** Deliberately broken / exotic fixtures for the quarantine gate —
    * each `kind` is a damage class real court corpora contain. Classes
    * and their REQUIRED outcome (asserted in PdfHostileSpec / m5):
    * wrong-length recovers via the EOL-consistency fallback; every
    * other class must quarantine (null), never corrupt.
    */
  def synthesizeHostile(kind: String, text: String): Array[Byte] = {
    def wrap(dict: String, body: Array[Byte], tail: Boolean = true): Array[Byte] =
      (s"%PDF-1.4\n4 0 obj << $dict >>\nstream\n").getBytes(Latin1) ++ body ++
        (if (tail) "\nendstream\nendobj\ntrailer\n%%EOF\n".getBytes(Latin1)
         else Array.empty[Byte])
    val contents = s"BT /F1 12 Tf ($text) Tj ET".getBytes(Latin1)
    kind match {
      // declared length is WRONG but inconsistent with the data, so
      // the EOL-trim fallback recovers the full text
      case "wrong-length" => wrap(s"/Length 5", contents)
      // unknown decode filter: stream undecodable → no text → null
      case "bogus-filter" =>
        wrap(s"/Length ${contents.length} /Filter /FooDecode", contents)
      // file cut mid-stream (no endstream/EOF): scanner finds no
      // complete stream → null
      case "truncated" =>
        wrap(s"/Length ${contents.length}", contents, tail = false)
      // FlateDecode whose bytes are garbage: inflate fails → null
      case "corrupt-flate" =>
        wrap(s"/Length 8 /Filter /FlateDecode",
          Array[Byte](0x13, 0x37, -1, -2, 0x00, 0x42, 0x7f, -128))
      // Type0/Identity-H with NO ToUnicode: 2-byte codes unresolvable
      // without external predefined CMaps → must quarantine, not
      // misread the hex string as Latin-1
      case "identity-h-no-tounicode" =>
        val hex = text.flatMap(c => f"${c.toInt}%04x")
        val body = s"BT /F1 12 Tf <$hex> Tj ET".getBytes(Latin1)
        ("%PDF-1.6\n" +
          "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /F1" +
          " /Encoding /Identity-H >> endobj\n" +
          s"4 0 obj << /Length ${body.length} >>\nstream\n").getBytes(Latin1) ++
          body ++
          "\nendstream\nendobj\ntrailer\n%%EOF\n".getBytes(Latin1)
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }
  }

  /** bytes → extracted text (NUL-stripped), or null when nothing
    * decodable was found (the reference's skip-and-log path).
    */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 8) return null
    try {
      val hay = new String(bytes, Latin1)
      val decryptor = findDecryptor(hay)
      val skip = skipStreamRe
      // decryption applies BEFORE the filter chain (§7.6.2); the
      // /Encrypt dict's own strings (O, U) are never encrypted
      def decoded(st: RawStream): Array[Byte] = {
        val plain = decryptor.map(_.decrypt(st.obj, st.gen, st.data))
          .getOrElse(st.data)
        decodeStream(st.dict, plain).getOrElse(Array.empty)
      }
      // PDF-1.5 xref/object streams and images decode to non-text
      // binary — recognize and skip them instead of scanning for a
      // stray "BT" in compressed garbage. Decode each stream ONCE (the
      // decrypt + filter chain is the ingest hot path) and reuse for
      // both the CMap scan and the text pass.
      val scanned = streams(bytes)
      val decodedPairs = scanned
        .filter(st => skip.findFirstIn(st.dict).isEmpty)
        .map(st => (st, decoded(st)))
      // embedded font programs (FontFile2 sfnt binaries) are data for
      // the CID-recovery tier below, never text — and their bytes can
      // contain an accidental "BT", so keep them out of the text pass
      val fontPrograms = decodedPairs.map(_._2).filter(TrueTypeCmap.looksLikeSfnt)
      val all = decodedPairs
        .map(_._2)
        .filterNot(TrueTypeCmap.looksLikeSfnt)
        .map(new String(_, Latin1))
        .filter(_.nonEmpty)
      // merged ToUnicode tables (CID/Type0 text, §9.10.3): CMap streams
      // decrypt/decode like any other stream, then parse as data. Only
      // consulted when the document actually declares a Type0/CID font,
      // and only as the FALLBACK for hex strings whose font name the
      // per-font /Tf scoping below cannot resolve (fonts packed into
      // ObjStm, damaged object graphs, no /Resources).
      // PDF-1.5 files may pack the font dicts into compressed object
      // streams: decode each ObjStm ONCE and reuse the bodies for the
      // CID-marker search and the per-font resolution below.
      lazy val objStmPairs: Seq[(String, String)] = 
        scanned.filter(st => objStmTypeRe.findFirstIn(st.dict).isDefined)
          .map(st => (st.dict, new String(decoded(st), Latin1)))
      def declaresCidFont: Boolean =
        hay.contains("/Type0") || hay.contains("/Identity-H") ||
          objStmPairs.exists { case (_, s) =>
            s.contains("/Type0") || s.contains("/Identity-H") }
      val cidDeclared = declaresCidFont
      val cmap =
        if (!cidDeclared) Map.empty[Int, String]
        else all.filter(_.contains("begincmap"))
          .map(parseToUnicode)
          .foldLeft(Map.empty[Int, String])(_ ++ _)
      // a CID/Type0 document with NO embedded ToUnicode falls back to
      // the FONT-PROGRAM tier (the Tika/PDFBox approach,
      // `text_to_database.py:256-287` territory): under Identity-H with
      // the default /CIDToGIDMap, CID = glyph id, and the embedded
      // TrueType font's own `cmap` table inverts glyph id → Unicode
      // (sources.TrueTypeCmap). A non-Identity /CIDToGIDMap (a mapping
      // stream) would break the CID=GID premise, so its presence
      // disables the tier. With NO usable font program either, the
      // class is terminal: skip the hex strings rather than misread
      // their 2-byte codes as Latin-1 garbage, keep any simple-font
      // literal text, and let an all-CID document quarantine naturally
      // (the reference logs + skips such rows).
      val nonIdentityGidMap = nonIdentityGidRe.findFirstIn(hay).isDefined
      val fontCmap =
        if (cmap.nonEmpty || !cidDeclared || nonIdentityGidMap) Map.empty[Int, String]
        else fontPrograms.iterator
          .flatMap(TrueTypeCmap.gidToUnicode(_).iterator)
          .nextOption().getOrElse(Map.empty)
      val effCmap = if (cmap.nonEmpty) cmap else fontCmap
      val cidNoMap = cidDeclared && effCmap.isEmpty
      // per-font /Tf scoping for mixed-font documents: resolve each
      // resource font name through the object graph so a simple-font
      // hex string never runs through another font's CID map (and vice
      // versa). Only attempted when the document declares a CID font —
      // single-family documents keep the one-pass legacy path; names
      // the graph cannot resolve also fall back to it per string.
      val fonts: Map[String, FontInfo] =
        if (!cidDeclared) Map.empty
        else {
          val cmapByObj = decodedPairs.collect {
            case (st, b) if st.obj > 0 =>
              val s = new String(b, Latin1)
              if (s.contains("begincmap")) Some(st.obj -> parseToUnicode(s)) else None
          }.flatten.toMap
          val bytesByObj = decodedPairs.collect {
            case (st, b) if st.obj > 0 => st.obj -> b
          }.toMap
          val packedDicts = objStmPairs
            .map { case (d, b) => objStmDicts(d, b) }
            .foldLeft(Map.empty[Int, String])(_ ++ _)
          resolveFonts(hay, packedDicts, objStmPairs.map(_._2),
            cmapByObj, bytesByObj)
        }
      val texts = all.flatMap { s =>
        if (s.contains("BT") && !s.contains("begincmap"))
          contentText(s, effCmap, skipHex = cidNoMap, fonts = fonts)
        else Nil
      }
      // blocks join with a BLANK line, mirroring Tika's paragraph
      // output: each BT…ET group is a layout unit, and the downstream
      // paragraph splitter (TextFunctions.pdfToParagraphs) divides on
      // \n\n — a single-\n join would glue every native-extracted PDF
      // into one paragraph and starve the section fold of markers
      if (texts.isEmpty) null
      else texts.mkString("\n\n").replace("\u0000", "")
    } catch { case _: Throwable => null }
  }

  /** Synthesize a PDF carrying an embedded IMAGE XObject with REAL
    * encoded image bytes — /DCTDecode means the stream IS a raw JPEG
    * (PDF 32000-1 §7.4.8): the standard hybrid shape of scanned court
    * documents (text layer + page scans). The text page is unchanged;
    * the image rides as its own object.
    */
  def synthesizeWithImage(text: String, image: Array[Byte], w: Int, h: Int,
                          filter: String = "DCTDecode"): Array[Byte] = {
    val base = synthesize(text, Seq("FlateDecode"))
    val tail = "trailer << /Root 1 0 R >>\n%%EOF\n"
    val s = new String(base, Latin1)
    val idx = s.lastIndexOf(tail)
    val head = s.substring(0, idx).getBytes(Latin1)
    val obj = (s"5 0 obj << /Type /XObject /Subtype /Image /Width $w /Height $h " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      s"/Filter /$filter /Length ${image.length} >>\nstream\n").getBytes(Latin1)
    head ++ obj ++ image ++ "\nendstream\nendobj\n".getBytes(Latin1) ++
      tail.getBytes(Latin1)
  }

  /** Scan a PDF for image XObjects: (declared width, declared height,
    * raw stream payload — for /DCTDecode that payload is a decodable
    * JPEG). Linear Latin-1 scan (byte-faithful, same discipline as the
    * text extractor); malformed structures yield what parses, never a
    * throw.
    */
  def imageXObjects(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] =
    try {
      val s = new String(bytes, Latin1)
      val out = Seq.newBuilder[(Int, Int, Array[Byte])]
      val widthRe = "/Width\\s+(\\d+)".r
      val heightRe = "/Height\\s+(\\d+)".r
      val lenRe = "/Length\\s+(\\d+)".r
      var from = 0
      var at = s.indexOf("/Subtype /Image", from)
      while (at >= 0) {
        val dictStart = s.lastIndexOf("<<", at)
        val dictEnd = s.indexOf(">>", at)
        if (dictStart >= 0 && dictEnd > at) {
          val dict = s.substring(dictStart, dictEnd)
          for {
            w <- widthRe.findFirstMatchIn(dict).map(_.group(1).toInt)
            h <- heightRe.findFirstMatchIn(dict).map(_.group(1).toInt)
            len <- lenRe.findFirstMatchIn(dict).map(_.group(1).toInt)
          } {
            val streamKw = s.indexOf("stream", dictEnd)
            if (streamKw >= 0) {
              var payloadStart = streamKw + "stream".length
              if (payloadStart < s.length && s.charAt(payloadStart) == '\r') payloadStart += 1
              if (payloadStart < s.length && s.charAt(payloadStart) == '\n') payloadStart += 1
              if (payloadStart + len <= bytes.length)
                out += ((w, h, java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len)))
            }
          }
        }
        from = at + 1
        at = s.indexOf("/Subtype /Image", from)
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Nil }
}
