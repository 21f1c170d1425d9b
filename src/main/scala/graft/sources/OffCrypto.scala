package graft.sources

/** Minimal Compound File Binary reader + ECMA-376 encryption
  * decryptors, for the reference's default-password Excel path
  * (excel.py:132-150: agencies publish workbooks implicitly encrypted
  * with Excel's 'VelvetSweatshop' default; the reference opens them via
  * msoffcrypto). All formats are public Microsoft specs: [MS-CFB] for
  * the container, [MS-OFFCRYPTO] §2.3.4 for Standard Encryption
  * (SHA-1 spin key derivation + AES-ECB package encryption) and
  * §2.3.4.10 for Agile Encryption (the XML descriptor Excel 2013+
  * writes: per-algorithm hash spin, AES-CBC with per-segment IVs,
  * password-wrapped intermediate key), and §2.3.5 for RC4 CryptoAPI
  * (the ≤2003-era scheme: SHA-1 block-keyed RC4 over 512-byte
  * blocks). Extensible/unknown schemes are detected and fail loud.
  *
  * Everything here is driver-side, single-file work (an xlsx open),
  * never on the executor hot path.
  */
object Cfb {
  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o).toLong & 0xFFFFFFFFL) | ((u32(b, o + 4).toLong & 0xFFFFFFFFL) << 32)

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(Magic)

  /** Stream name → content for every stream entry in the directory
    * (flat namespace: encryption streams live directly under root).
    * Supports v3 (512 B) and v4 (4096 B) sectors, DIFAT chaining, and
    * the mini stream (real EncryptionInfo streams are ~200 bytes and
    * live there). Cycle-guarded: corrupt chains fail loud, never spin. */
  def streams(b: Array[Byte]): Map[String, Array[Byte]] = {
    require(isCfb(b), "not a CFB container")
    val sectorSize = 1 << u16(b, 30)
    require(sectorSize == 512 || sectorSize == 4096,
      s"CFB: unsupported sector size $sectorSize")
    val miniSize = 1 << u16(b, 32)
    val firstDir = u32(b, 48)
    val miniCutoff = u32(b, 56)
    val firstMiniFat = u32(b, 60)
    val firstDifat = u32(b, 68)
    val maxSectors = (b.length / sectorSize) + 1

    def sector(i: Int): Array[Byte] = {
      val off = (i + 1) * sectorSize
      require(i >= 0 && off + sectorSize <= b.length + sectorSize - 1 && off < b.length,
        s"CFB: sector $i out of bounds")
      java.util.Arrays.copyOfRange(b, off, math.min(off + sectorSize, b.length))
    }

    // FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    val fatSectors = {
      val ids = Seq.newBuilder[Int]
      var i = 0
      while (i < 109) {
        val s = u32(b, 76 + 4 * i)
        if (s != FreeSect && s != EndOfChain) ids += s
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < maxSectors) {
        val ds = sector(difat)
        val per = sectorSize / 4 - 1
        var j = 0
        while (j < per) {
          val s = u32(ds, 4 * j)
          if (s != FreeSect && s != EndOfChain) ids += s
          j += 1
        }
        difat = u32(ds, sectorSize - 4)
        guard += 1
      }
      require(guard < maxSectors, "CFB: DIFAT chain cycle")
      ids.result()
    }
    val fat: Array[Int] = fatSectors.iterator.flatMap { s =>
      val ss = sector(s)
      (0 until sectorSize / 4).iterator.map(j => u32(ss, 4 * j))
    }.toArray

    def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var cur = start
      var guard = 0
      while (cur != EndOfChain && cur != FreeSect && guard <= table.length) {
        require(cur >= 0 && cur < table.length, s"CFB: chain sector $cur out of FAT range")
        out += cur
        cur = table(cur)
        guard += 1
      }
      require(guard <= table.length, "CFB: sector chain cycle")
      out.result()
    }

    // directory entries (128 B each) across the directory chain
    val dirBytes = chain(firstDir, fat).toArray.flatMap(sector)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val o = k * 128
      val nameLen = u16(dirBytes, o + 64) // bytes incl. UTF-16 terminator
      val name =
        if (nameLen >= 2 && nameLen <= 64)
          new String(dirBytes, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      val size =
        if (sectorSize == 512) u32(dirBytes, o + 120).toLong & 0xFFFFFFFFL
        else u64(dirBytes, o + 120)
      Entry(name, dirBytes(o + 66) & 0xff, u32(dirBytes, o + 116), size)
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root directory entry"))

    // mini stream container + miniFAT (lazily — absent in some files)
    lazy val miniStream: Array[Byte] = chain(root.start, fat).toArray.flatMap(sector)
    lazy val miniFat: Array[Int] = chain(firstMiniFat, fat).iterator.flatMap { s =>
      val ss = sector(s)
      (0 until sectorSize / 4).iterator.map(j => u32(ss, 4 * j))
    }.toArray

    def readStream(e: Entry): Array[Byte] = {
      require(e.size <= Int.MaxValue, s"CFB: stream '${e.name}' too large")
      val raw: Array[Byte] =
        if (e.size < miniCutoff) {
          chain(e.start, miniFat).toArray.flatMap { m =>
            val off = m * miniSize
            require(off + miniSize <= miniStream.length + miniSize - 1 && off < miniStream.length,
              s"CFB: mini sector $m out of bounds")
            java.util.Arrays.copyOfRange(miniStream, off,
              math.min(off + miniSize, miniStream.length))
          }
        } else chain(e.start, fat).toArray.flatMap(sector)
      require(raw.length >= e.size,
        s"CFB: stream '${e.name}' truncated (${raw.length} < ${e.size})")
      java.util.Arrays.copyOf(raw, e.size.toInt)
    }

    entries.filter(_.objType == 2).map(e => e.name -> readStream(e)).toMap
  }
}

object OffCrypto {
  /** Excel's implicit default password: a workbook saved with
    * "no password" protection semantics is still encrypted, with this
    * well-known constant (public knowledge since Excel 97; the
    * reference relies on msoffcrypto's same default, excel.py:140). */
  val DefaultPassword = "VelvetSweatshop"

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o).toLong & 0xFFFFFFFFL) | ((u32(b, o + 4).toLong & 0xFFFFFFFFL) << 32)

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    parts.foreach(md.update)
    md.digest()
  }

  /** [MS-OFFCRYPTO] 2.3.4.7 Standard key derivation: SHA-1 spin of
    * 50000 iterations with a little-endian iterator PREPENDED each
    * round, block number 0 appended, then the 0x36/0x5C HMAC-style
    * expansion truncated to the header's key length. */
  private[graft] def deriveStandardKey(salt: Array[Byte], password: String,
                                         keyBytes: Int): Array[Byte] = {
    val pw = password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    var h = sha1(salt, pw)
    val it = new Array[Byte](4)
    var n = 0
    while (n < 50000) {
      it(0) = (n & 0xff).toByte
      it(1) = ((n >> 8) & 0xff).toByte
      it(2) = ((n >> 16) & 0xff).toByte
      it(3) = ((n >> 24) & 0xff).toByte
      h = sha1(it, h)
      n += 1
    }
    val hFinal = sha1(h, Array[Byte](0, 0, 0, 0)) // block number 0, LE
    def expand(pad: Byte): Array[Byte] = {
      val buf = Array.fill[Byte](64)(pad)
      var i = 0
      while (i < hFinal.length) { buf(i) = (buf(i) ^ hFinal(i)).toByte; i += 1 }
      sha1(buf)
    }
    val x = expand(0x36) ++ expand(0x5C.toByte)
    java.util.Arrays.copyOf(x, keyBytes)
  }

  private def aesEcb(key: Array[Byte], mode: Int, data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  private[graft] def aesEcbDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    aesEcb(key, javax.crypto.Cipher.DECRYPT_MODE, data)
  private[graft] def aesEcbEncrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    aesEcb(key, javax.crypto.Cipher.ENCRYPT_MODE, data)

  // ---- Agile Encryption ([MS-OFFCRYPTO] §2.3.4.10–15) --------------------

  /** Fixed per-purpose block keys (§2.3.4.13): appended to the spun
    * password hash to derive the three password-protected keys. */
  private val BkVerifierHashInput =
    Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b, 0x9e, 0x79).map(_.toByte)
  private val BkVerifierHashValue =
    Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61, 0x34, 0x4e).map(_.toByte)
  private val BkKeyValue =
    Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0, 0xd6).map(_.toByte)

  private def digestFor(xmlName: String): java.security.MessageDigest = {
    val jce = xmlName match {
      case "SHA1" => "SHA-1"
      case "SHA256" => "SHA-256"
      case "SHA384" => "SHA-384"
      case "SHA512" => "SHA-512"
      case other => throw new IllegalArgumentException(
        s"offcrypto: Agile hashAlgorithm '$other' not supported " +
          "(SHA1/SHA256/SHA384/SHA512 only)")
    }
    java.security.MessageDigest.getInstance(jce)
  }

  /** §2.3.4.12: keys and IVs derived from a hash are truncated to the
    * required length, or right-padded with 0x36 when the hash is
    * shorter. */
  private def padTruncate(h: Array[Byte], n: Int): Array[Byte] = {
    val out = Array.fill[Byte](n)(0x36)
    System.arraycopy(h, 0, out, 0, math.min(h.length, n))
    out
  }

  private def aesCbcDecrypt(key: Array[Byte], iv: Array[Byte],
                            data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** The spun Agile password hash (§2.3.4.11): H0 = H(salt ∥ UTF-16LE
    * password), then spinCount rounds of H(LE32(i) ∥ h). Shared by the
    * three block-key derivations. */
  private[graft] def agilePasswordHash(md: java.security.MessageDigest,
                                       salt: Array[Byte], password: String,
                                       spinCount: Int): Array[Byte] = {
    require(spinCount >= 0 && spinCount <= 10000000,
      s"offcrypto: unreasonable spinCount $spinCount")
    md.reset()
    md.update(salt)
    md.update(password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    var h = md.digest()
    val it = new Array[Byte](4)
    var i = 0
    while (i < spinCount) {
      it(0) = (i & 0xff).toByte
      it(1) = ((i >> 8) & 0xff).toByte
      it(2) = ((i >> 16) & 0xff).toByte
      it(3) = ((i >> 24) & 0xff).toByte
      md.reset(); md.update(it); md.update(h)
      h = md.digest()
      i += 1
    }
    h
  }

  /** Decrypt an Agile (4.4) EncryptionInfo + EncryptedPackage.
    * EncryptionInfo = 8-byte version/flags header + UTF-8 XML
    * descriptor; the password key-encryptor holds the verifier and the
    * encrypted intermediate key, keyData the package cipher params.
    * AES-CBC only (the scheme Excel writes); other ciphers/chaining
    * modes fail loud. */
  private def decryptAgile(info: Array[Byte], pkg: Array[Byte],
                           password: String): Array[Byte] = {
    val xml = new String(info, 8, info.length - 8,
      java.nio.charset.StandardCharsets.UTF_8)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)))
    def firstByLocalName(name: String): org.w3c.dom.Element = {
      val all = doc.getElementsByTagNameNS("*", name)
      require(all.getLength > 0, s"offcrypto: Agile descriptor has no <$name>")
      all.item(0).asInstanceOf[org.w3c.dom.Element]
    }
    def attr(e: org.w3c.dom.Element, a: String): String = {
      val v = e.getAttribute(a)
      require(v.nonEmpty, s"offcrypto: Agile <${e.getLocalName}> missing $a")
      v
    }
    val b64 = java.util.Base64.getDecoder
    val kd = firstByLocalName("keyData")
    require(attr(kd, "cipherAlgorithm") == "AES" &&
      attr(kd, "cipherChaining") == "ChainingModeCBC",
      s"offcrypto: Agile cipher ${kd.getAttribute("cipherAlgorithm")}/" +
        s"${kd.getAttribute("cipherChaining")} not supported (AES-CBC only)")
    val kdSalt = b64.decode(attr(kd, "saltValue"))
    val kdBlock = attr(kd, "blockSize").toInt
    val kdKeyBytes = attr(kd, "keyBits").toInt / 8
    val kdMd = digestFor(attr(kd, "hashAlgorithm"))

    // The PASSWORD key-encryptor's <p:encryptedKey> — selected by the
    // password namespace, not local name alone: a certificate
    // keyEncryptor carries an <encryptedKey> with the same local name
    // in its own namespace, and [MS-OFFCRYPTO] does not fix encryptor
    // order, so a cert-first descriptor is legal for a file the
    // default password still opens (the reference's msoffcrypto
    // filters by the .../keyEncryptor/password uri likewise).
    val ek = {
      val all = doc.getElementsByTagNameNS("*", "encryptedKey")
      val pwNs = "http://schemas.microsoft.com/office/2006/keyEncryptor/password"
      val pw = (0 until all.getLength).map(all.item(_).asInstanceOf[org.w3c.dom.Element])
        .find(e => pwNs == e.getNamespaceURI ||
          // some writers hang the password encryptor off the parent
          // <keyEncryptor uri="..."> instead of a prefixed namespace
          Option(e.getParentNode).collect {
            case p: org.w3c.dom.Element => p.getAttribute("uri")
          }.contains(pwNs))
      require(pw.isDefined,
        "offcrypto: Agile descriptor has no password keyEncryptor " +
          "(certificate/extensible encryptors are not supported)")
      pw.get
    }
    require(attr(ek, "cipherAlgorithm") == "AES" &&
      attr(ek, "cipherChaining") == "ChainingModeCBC",
      "offcrypto: Agile password-encryptor cipher not supported (AES-CBC only)")
    val ekSalt = b64.decode(attr(ek, "saltValue"))
    val ekBlock = attr(ek, "blockSize").toInt
    val ekKeyBytes = attr(ek, "keyBits").toInt / 8
    val ekMd = digestFor(attr(ek, "hashAlgorithm"))
    val spin = attr(ek, "spinCount").toInt
    val encVerInput = b64.decode(attr(ek, "encryptedVerifierHashInput"))
    val encVerValue = b64.decode(attr(ek, "encryptedVerifierHashValue"))
    val encKeyValue = b64.decode(attr(ek, "encryptedKeyValue"))

    val pwHash = agilePasswordHash(ekMd, ekSalt, password, spin)
    def blockKey(bk: Array[Byte]): Array[Byte] = {
      ekMd.reset(); ekMd.update(pwHash); ekMd.update(bk)
      padTruncate(ekMd.digest(), ekKeyBytes)
    }
    val iv0 = padTruncate(ekSalt, ekBlock)
    val verInput = java.util.Arrays.copyOf(
      aesCbcDecrypt(blockKey(BkVerifierHashInput), iv0, encVerInput), ekSalt.length)
    ekMd.reset()
    val expectHash = ekMd.digest(verInput)
    val verValue = java.util.Arrays.copyOf(
      aesCbcDecrypt(blockKey(BkVerifierHashValue), iv0, encVerValue), expectHash.length)
    if (!java.util.Arrays.equals(expectHash, verValue))
      throw new IllegalArgumentException(
        s"offcrypto: Agile password verifier mismatch — the workbook is " +
          s"not encrypted with the '$password' default (a real password was set)")
    val decryptedKeyValue = aesCbcDecrypt(blockKey(BkKeyValue), iv0, encKeyValue)
    // copyOf silently ZERO-PADS a short source; if the password
    // encryptor's keyBits are smaller than keyData's, the "key" would
    // be garbage and surface as an opaque zip failure three layers up.
    require(decryptedKeyValue.length >= kdKeyBytes,
      s"offcrypto: Agile keyEncryptor keyBits (${ekKeyBytes * 8}) decrypts to " +
        s"${decryptedKeyValue.length} bytes, fewer than the ${kdKeyBytes * 8}-bit " +
        "keyData cipher requires — cannot derive the package key")
    val packageKey = java.util.Arrays.copyOf(decryptedKeyValue, kdKeyBytes)

    // EncryptedPackage: u64 plaintext size, then 4096-byte segments,
    // each CBC-decrypted with IV = H(keyData salt ∥ LE32(segment)).
    val size = u64(pkg, 0)
    require(size >= 0 && size <= pkg.length.toLong * 2,
      s"offcrypto: implausible Agile package size $size")
    val out = new java.io.ByteArrayOutputStream()
    val Segment = 4096
    var off = 8
    var seg = 0
    while (off < pkg.length && out.size() < size) {
      val remain = pkg.length - off
      val segLen = math.min(Segment, remain - (remain % kdBlock))
      require(segLen > 0, s"offcrypto: Agile package has ragged tail ($remain bytes)")
      kdMd.reset()
      kdMd.update(kdSalt)
      kdMd.update(Array((seg & 0xff).toByte, ((seg >> 8) & 0xff).toByte,
        ((seg >> 16) & 0xff).toByte, ((seg >> 24) & 0xff).toByte))
      val iv = padTruncate(kdMd.digest(), kdBlock)
      out.write(aesCbcDecrypt(packageKey, iv,
        java.util.Arrays.copyOfRange(pkg, off, off + segLen)))
      off += segLen
      seg += 1
    }
    val plain = out.toByteArray
    require(size <= plain.length,
      s"offcrypto: declared Agile package size $size exceeds payload ${plain.length}")
    java.util.Arrays.copyOf(plain, size.toInt)
  }

  /** RC4 keystream XOR (the public ARCFOUR algorithm). Hand-rolled so
    * the decryptor carries no JCE-provider dependency (ARCFOUR is on
    * deprecation lists); the spec round-trips this implementation
    * against the JDK's independent one. Symmetric: the same call
    * encrypts and decrypts. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** [MS-OFFCRYPTO] §2.3.5.2 RC4 CryptoAPI key derivation:
    * H0 = SHA-1(salt ∥ UTF-16LE(password)), per-block key =
    * SHA-1(H0 ∥ LE32(block)) truncated to keyBits/8 — EXCEPT 40-bit
    * keys, which the spec zero-pads to 16 bytes (§2.3.5.2 step 4). */
  private[graft] def deriveRc4CryptoApiKey(salt: Array[Byte], password: String,
      keyBits: Int, block: Int): Array[Byte] = {
    val h0 = sha1(salt,
      password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    val hBlock = sha1(h0, Array((block & 0xff).toByte,
      ((block >> 8) & 0xff).toByte, ((block >> 16) & 0xff).toByte,
      ((block >> 24) & 0xff).toByte))
    if (keyBits == 40)
      java.util.Arrays.copyOf(java.util.Arrays.copyOf(hBlock, 5), 16)
    else java.util.Arrays.copyOf(hBlock, keyBits / 8)
  }

  /** [MS-OFFCRYPTO] §2.3.5 RC4 CryptoAPI decryption — the scheme
    * Office ≤2003-era writers emit. Header/verifier layout is the
    * §2.3.5.1 CryptoAPI EncryptionHeader (AlgID 0x6801); the verifier
    * is checked with ONE block-0 RC4 stream spanning
    * encryptedVerifier ∥ encryptedVerifierHash (stream cipher — no
    * padding, the hash field is SHA-1's exact 20 bytes, unlike the
    * AES path's padded 32); the payload decrypts in 512-byte blocks,
    * the RC4 stream re-keyed per block index (§2.3.5's block layout
    * for binary-document streams, applied to the EncryptedPackage's
    * u64-size-prefixed payload). The BIFF record layer of real .xls
    * files stays out of scope — the reference itself rejects .xls
    * (excel.py:280); this closes the CRYPTO layer of msoffcrypto
    * parity (excel.py:132-150). */
  private def decryptRc4CryptoApi(info: Array[Byte], pkg: Array[Byte],
      password: String, v: Int, keyBits0: Int): Array[Byte] = {
    // §2.3.5.1: KeySize 0 means 40-bit
    val keyBits = if (keyBits0 == 0) 40 else keyBits0
    require(keyBits >= 40 && keyBits <= 128 && keyBits % 8 == 0,
      s"offcrypto: RC4 CryptoAPI key size $keyBits bits outside [40,128]")
    val saltSize = u32(info, v)
    require(saltSize == 16, s"offcrypto: salt size $saltSize (expected 16)")
    val salt = java.util.Arrays.copyOfRange(info, v + 4, v + 20)
    val encVerifier = java.util.Arrays.copyOfRange(info, v + 20, v + 36)
    val verifierHashSize = u32(info, v + 36)
    require(verifierHashSize == 20,
      s"offcrypto: verifier hash size $verifierHashSize (expected SHA-1's 20)")
    val encVerifierHash = java.util.Arrays.copyOfRange(info, v + 40, v + 60)
    val st = rc4(deriveRc4CryptoApiKey(salt, password, keyBits, 0),
      encVerifier ++ encVerifierHash)
    val verifier = java.util.Arrays.copyOf(st, 16)
    val verifierHash = java.util.Arrays.copyOfRange(st, 16, 36)
    if (!java.util.Arrays.equals(sha1(verifier), verifierHash))
      throw new IllegalArgumentException(
        s"offcrypto: RC4 CryptoAPI password verifier mismatch — the " +
          s"workbook is not encrypted with the '$password' default " +
          "(a real password was set)")
    val size = u64(pkg, 0)
    require(size >= 0 && size <= pkg.length.toLong - 8,
      s"offcrypto: implausible RC4 package size $size for ${pkg.length} bytes")
    val out = new Array[Byte](pkg.length - 8)
    var off = 8
    var block = 0
    while (off < pkg.length) {
      val len = math.min(512, pkg.length - off)
      val dec = rc4(deriveRc4CryptoApiKey(salt, password, keyBits, block),
        java.util.Arrays.copyOfRange(pkg, off, off + len))
      System.arraycopy(dec, 0, out, off - 8, len)
      off += len
      block += 1
    }
    java.util.Arrays.copyOf(out, size.toInt)
  }

  /** Decrypt a CFB-wrapped encrypted OOXML package → the zip bytes.
    * Standard (§2.3.4), Agile (§2.3.4.10), and RC4 CryptoAPI (§2.3.5)
    * Encryption; extensible schemes fail loud with the scheme named. Wrong
    * password (a file encrypted with a REAL password, not the implicit
    * default) also fails loud — silently returning garbage zip bytes
    * would surface as an opaque zip error three layers up. */
  def decrypt(cfbBytes: Array[Byte], password: String = DefaultPassword): Array[Byte] = {
    val ss = Cfb.streams(cfbBytes)
    val info = ss.getOrElse("EncryptionInfo",
      throw new IllegalArgumentException("offcrypto: no EncryptionInfo stream"))
    val pkg = ss.getOrElse("EncryptedPackage",
      throw new IllegalArgumentException("offcrypto: no EncryptedPackage stream"))
    val (vMajor, vMinor) = (u16(info, 0), u16(info, 2))
    if (vMajor == 4 && vMinor == 4)
      return decryptAgile(info, pkg, password)
    require((vMajor == 2 || vMajor == 3 || vMajor == 4) && vMinor == 2,
      s"offcrypto: unsupported EncryptionInfo version $vMajor.$vMinor")
    val headerSize = u32(info, 8)
    val hdr = 12 // EncryptionHeader start
    val algId = u32(info, hdr + 8)
    val keyBits = u32(info, hdr + 16)
    val keyBytes = keyBits / 8
    if (algId == 0x6801) // RC4 ([MS-OFFCRYPTO] §2.3.5 CryptoAPI)
      return decryptRc4CryptoApi(info, pkg, password, hdr + headerSize, keyBits)
    val aesIds = Set(0x660E, 0x660F, 0x6610) // AES-128/192/256
    if (!aesIds.contains(algId))
      throw new IllegalArgumentException(
        f"offcrypto: AlgID 0x$algId%04X not supported (Standard AES " +
          "0x660E-0x6610 and RC4 CryptoAPI 0x6801 only)")
    // EncryptionVerifier follows the variable-length header
    val v = hdr + headerSize
    val saltSize = u32(info, v)
    require(saltSize == 16, s"offcrypto: salt size $saltSize (expected 16)")
    val salt = java.util.Arrays.copyOfRange(info, v + 4, v + 4 + 16)
    val encVerifier = java.util.Arrays.copyOfRange(info, v + 20, v + 36)
    val verifierHashSize = u32(info, v + 36)
    require(verifierHashSize == 20,
      s"offcrypto: verifier hash size $verifierHashSize (expected SHA-1's 20)")
    val encVerifierHash = java.util.Arrays.copyOfRange(info, v + 40, v + 72)

    val key = deriveStandardKey(salt, password, keyBytes)
    val verifier = aesEcbDecrypt(key, encVerifier)
    val verifierHash = aesEcbDecrypt(key, encVerifierHash)
    val expect = sha1(verifier)
    if (!java.util.Arrays.equals(expect,
        java.util.Arrays.copyOf(verifierHash, 20)))
      throw new IllegalArgumentException(
        s"offcrypto: password verifier mismatch — the workbook is not " +
          s"encrypted with the '$password' default (a real password was set)")

    val size = u64(pkg, 0)
    val body = java.util.Arrays.copyOfRange(pkg, 8, pkg.length - ((pkg.length - 8) % 16))
    val plain = aesEcbDecrypt(key, body)
    require(size <= plain.length,
      s"offcrypto: declared package size $size exceeds payload ${plain.length}")
    java.util.Arrays.copyOf(plain, size.toInt)
  }
}
