package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Cfb, OffCrypto, Xlsx}

/** Round-trip tests for the VelvetSweatshop default-password path: a
  * test-side [MS-CFB] WRITER + [MS-OFFCRYPTO] Standard ENCRYPTOR built
  * independently from the spec (the main side only decrypts), so the
  * decryptor is exercised against a second implementation of the same
  * public format — including the mini-stream placement real Excel
  * files use for the ~200-byte EncryptionInfo. */
class OffCryptoSpec extends AnyFunSuite {

  // ---- test-side Standard encryptor ------------------------------------

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    parts.foreach(md.update)
    md.digest()
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le64(v: Long): Array[Byte] = le32(v.toInt) ++ le32((v >> 32).toInt)

  /** Independent mirror of [MS-OFFCRYPTO] 2.3.4.7 (kept deliberately
    * separate from the main-side implementation). */
  private def deriveKey(salt: Array[Byte], password: String, keyBytes: Int): Array[Byte] = {
    var h = sha1(salt, password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    (0 until 50000).foreach(n => h = sha1(le32(n), h))
    val hFinal = sha1(h, le32(0))
    def expand(pad: Byte) = {
      val buf = Array.fill[Byte](64)(pad)
      hFinal.indices.foreach(i => buf(i) = (buf(i) ^ hFinal(i)).toByte)
      sha1(buf)
    }
    (expand(0x36) ++ expand(0x5C.toByte)).take(keyBytes)
  }

  private def aes(enc: Boolean, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(if (enc) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  /** EncryptionInfo (Standard, AES-128) + EncryptedPackage streams for
    * a zip payload under `password`. */
  private def encryptStandard(zip: Array[Byte], password: String,
                              salt: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val key = deriveKey(salt, password, 16)
    val rnd = new java.util.Random(7)
    val verifier = new Array[Byte](16)
    rnd.nextBytes(verifier)
    val verifierHash = sha1(verifier) ++ new Array[Byte](12) // pad 20 -> 32
    val cspName = "Microsoft Enhanced RSA and AES Cryptographic Provider\u0000"
      .getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val header = le32(0x24) ++ le32(0) ++ le32(0x660E) ++ le32(0x8004) ++
      le32(128) ++ le32(0x18) ++ le32(0) ++ le32(0) ++ cspName
    val info = le32(0) /* placeholder for version */ ++ le32(0x24) ++
      le32(header.length) ++ header ++
      le32(16) ++ salt ++ aes(enc = true, key, verifier) ++
      le32(20) ++ aes(enc = true, key, verifierHash)
    // version 3.2 (Office 2007 SP2 Standard)
    info(0) = 3; info(1) = 0; info(2) = 2; info(3) = 0
    val padded = zip ++ new Array[Byte]((16 - zip.length % 16) % 16)
    val pkg = le64(zip.length.toLong) ++ aes(enc = true, key, padded)
    (info, pkg)
  }

  // ---- test-side minimal CFB v3 writer ----------------------------------

  /** Two streams, spec-compliant placement: < 4096 bytes → mini stream
    * (64-byte mini sectors inside the root's container chain), ≥ 4096 →
    * regular 512-byte FAT sectors. */
  private def writeCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val S = 512
    val FREE = 0xFFFFFFFF
    val END = 0xFFFFFFFE
    val FATSECT = 0xFFFFFFFD
    val (minis, bigs) = streams.partition(_._2.length < 4096)
    // mini stream container content: each mini stream padded to 64
    val miniOffsets = scala.collection.mutable.Map[String, Int]() // first mini sector id
    val miniBuf = new java.io.ByteArrayOutputStream()
    var nextMini = 0
    minis.foreach { case (name, data) =>
      miniOffsets(name) = nextMini
      val sectors = math.max(1, (data.length + 63) / 64)
      miniBuf.write(data)
      miniBuf.write(new Array[Byte](sectors * 64 - data.length))
      nextMini += sectors
    }
    val miniBytes = miniBuf.toByteArray
    val miniFat = Array.fill(128)(FREE)
    minis.foreach { case (name, data) =>
      val first = miniOffsets(name)
      val n = math.max(1, (data.length + 63) / 64)
      (0 until n - 1).foreach(i => miniFat(first + i) = first + i + 1)
      miniFat(first + n - 1) = END
    }
    // sector layout: 0=FAT, 1=dir, 2=miniFAT, then mini container, then bigs
    val miniContainerSectors = (miniBytes.length + S - 1) / S
    var next = 3
    val miniContainerStart = next
    next += miniContainerSectors
    val bigStarts = scala.collection.mutable.Map[String, Int]()
    val bigSectors = scala.collection.mutable.Map[String, Int]()
    bigs.foreach { case (name, data) =>
      bigStarts(name) = next
      val n = (data.length + S - 1) / S
      bigSectors(name) = n
      next += n
    }
    val fat = Array.fill(S / 4)(FREE)
    fat(0) = FATSECT
    fat(1) = END // directory
    fat(2) = END // miniFAT
    (0 until miniContainerSectors - 1).foreach(i =>
      fat(miniContainerStart + i) = miniContainerStart + i + 1)
    if (miniContainerSectors > 0) fat(miniContainerStart + miniContainerSectors - 1) = END
    bigs.foreach { case (name, _) =>
      val s = bigStarts(name)
      val n = bigSectors(name)
      (0 until n - 1).foreach(i => fat(s + i) = s + i + 1)
      fat(s + n - 1) = END
    }
    // directory entries
    def dirEntry(name: String, objType: Int, start: Int, size: Long): Array[Byte] = {
      val e = new Array[Byte](128)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, e, 0, nb.length)
      val nameLen = nb.length + 2
      e(64) = (nameLen & 0xff).toByte; e(65) = ((nameLen >> 8) & 0xff).toByte
      e(66) = objType.toByte
      e(67) = 1 // black
      // sibling/child: NOSTREAM (readers here iterate flat)
      java.util.Arrays.fill(e, 68, 80, 0xFF.toByte)
      System.arraycopy(le32(start), 0, e, 116, 4)
      System.arraycopy(le64(size), 0, e, 120, 8)
      e
    }
    val entries = Seq(
      dirEntry("Root Entry", 5,
        if (miniContainerSectors > 0) miniContainerStart else END, miniBytes.length.toLong)) ++
      streams.map { case (name, data) =>
        val start =
          if (data.length < 4096) miniOffsets(name) else bigStarts(name)
        dirEntry(name, 2, start, data.length.toLong)
      }
    val dirBytes = entries.flatten.toArray ++
      new Array[Byte](S - (entries.length * 128) % S)
    // header
    val out = new java.io.ByteArrayOutputStream()
    val hdr = new Array[Byte](S)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, hdr, 0, 8)
    hdr(24) = 0x3E; hdr(26) = 3 // minor 0x3E, major 3
    hdr(28) = 0xFE.toByte; hdr(29) = 0xFF.toByte // byte order
    hdr(30) = 9 // sector shift 512
    hdr(32) = 6 // mini shift 64
    System.arraycopy(le32(1), 0, hdr, 44, 4) // one FAT sector
    System.arraycopy(le32(1), 0, hdr, 48, 4) // first directory sector
    System.arraycopy(le32(4096), 0, hdr, 56, 4) // mini cutoff
    System.arraycopy(le32(2), 0, hdr, 60, 4) // first miniFAT sector
    System.arraycopy(le32(1), 0, hdr, 64, 4) // one miniFAT sector
    System.arraycopy(le32(END), 0, hdr, 68, 4) // no DIFAT chain
    System.arraycopy(le32(0), 0, hdr, 72, 4)
    System.arraycopy(le32(0), 0, hdr, 76, 4) // DIFAT[0] = FAT at sector 0
    (1 until 109).foreach(i => System.arraycopy(le32(FREE), 0, hdr, 76 + 4 * i, 4))
    out.write(hdr)
    val fatBytes = fat.flatMap(le32)
    out.write(fatBytes)
    out.write(dirBytes.take(S))
    out.write(miniFat.flatMap(le32))
    out.write(miniBytes)
    out.write(new Array[Byte](miniContainerSectors * S - miniBytes.length))
    bigs.foreach { case (name, data) =>
      out.write(data)
      out.write(new Array[Byte](bigSectors(name) * S - data.length))
    }
    out.toByteArray
  }

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("offcrypto").toFile
    d.deleteOnExit()
    d
  }

  private def encryptFile(plainXlsx: String, encPath: String, password: String): Unit = {
    val zip = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plainXlsx))
    val salt = new Array[Byte](16)
    new java.util.Random(11).nextBytes(salt)
    val (info, pkg) = encryptStandard(zip, password, salt)
    // EncryptionInfo is ~150 bytes -> mini stream, like real files
    assert(info.length < 4096)
    val cfb = writeCfb(Seq("EncryptionInfo" -> info, "EncryptedPackage" -> pkg))
    java.nio.file.Files.write(java.nio.file.Paths.get(encPath), cfb)
  }

  // ---- tests -------------------------------------------------------------

  test("key derivation: deterministic, password- and salt-sensitive") {
    val salt = Array.tabulate[Byte](16)(_.toByte)
    val k1 = OffCrypto.deriveStandardKey(salt, "VelvetSweatshop", 16)
    val k2 = OffCrypto.deriveStandardKey(salt, "VelvetSweatshop", 16)
    assert(k1.sameElements(k2) && k1.length == 16)
    assert(!k1.sameElements(OffCrypto.deriveStandardKey(salt, "other", 16)))
    val salt2 = salt.clone(); salt2(0) = 99
    assert(!k1.sameElements(OffCrypto.deriveStandardKey(salt2, "VelvetSweatshop", 16)))
    // main-side and test-side spec mirrors agree
    assert(k1.sameElements(deriveKey(salt, "VelvetSweatshop", 16)))
  }

  test("VelvetSweatshop-encrypted workbook opens transparently and round-trips") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1",
      Seq(Seq("agency", "race", "count"),
        Seq("Springfield PD", "BLACK", "3"),
        Seq("Shelbyville PD", "WHITE", "2")))))
    val enc = s"$dir/enc.xlsx"
    encryptFile(plain, enc, "VelvetSweatshop")
    // the CFB container must NOT be a zip
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(enc)).take(8)
    assert(Cfb.isCfb(head))
    // decrypted read equals the plaintext read
    val (h1, r1) = Xlsx.headerAndRows(plain, "Sheet1")
    val (h2, r2) = Xlsx.headerAndRows(enc, "Sheet1")
    assert(h1.toSeq == h2.toSeq)
    assert(r1.map(_.toSeq) == r2.map(_.toSeq))
    assert(Xlsx.sheetNames(enc) == Seq("Sheet1"))
  }

  test("a REAL password (non-default) fails loud naming the default") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1", Seq(Seq("a"), Seq("1")))))
    val enc = s"$dir/enc.xlsx"
    encryptFile(plain, enc, "actual-secret")
    val ex = intercept[IllegalArgumentException](Xlsx.header(enc, "Sheet1"))
    assert(ex.getMessage.contains("VelvetSweatshop"))
    assert(ex.getMessage.contains("verifier mismatch") ||
      ex.getMessage.contains("failed"))
  }

  // ---- test-side Agile encryptor ([MS-OFFCRYPTO] §2.3.4.10) -------------
  // Independent spec mirror, like encryptStandard: SHA-512, AES-256-CBC,
  // the parameters Excel 2013+ actually writes.

  private def aesCbc(enc: Boolean, key: Array[Byte], iv: Array[Byte],
                     data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (enc) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def sha512(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-512")
    parts.foreach(md.update)
    md.digest()
  }

  private def pad36(x: Array[Byte], n: Int): Array[Byte] = {
    val out = Array.fill[Byte](n)(0x36)
    System.arraycopy(x, 0, out, 0, math.min(x.length, n))
    out
  }

  private def encryptAgile(zip: Array[Byte], password: String,
                           spin: Int = 100000,
                           certFirst: Boolean = false): (Array[Byte], Array[Byte]) = {
    val rnd = new java.util.Random(23)
    def rand(n: Int) = { val a = new Array[Byte](n); rnd.nextBytes(a); a }
    val kdSalt = rand(16); val ekSalt = rand(16)
    val verifierInput = rand(16); val pkgKey = rand(32)
    var h = sha512(ekSalt, password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    (0 until spin).foreach(i => h = sha512(le32(i), h))
    def keyFor(bk: Array[Byte]) = pad36(sha512(h, bk), 32)
    val bk1 = Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b, 0x9e, 0x79).map(_.toByte)
    val bk2 = Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61, 0x34, 0x4e).map(_.toByte)
    val bk3 = Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0, 0xd6).map(_.toByte)
    val encVerInput = aesCbc(enc = true, keyFor(bk1), ekSalt, verifierInput)
    val encVerValue = aesCbc(enc = true, keyFor(bk2), ekSalt, sha512(verifierInput))
    val encKeyValue = aesCbc(enc = true, keyFor(bk3), ekSalt, pkgKey)
    val pkgOut = new java.io.ByteArrayOutputStream()
    pkgOut.write(le64(zip.length.toLong))
    var off = 0; var seg = 0
    while (off < zip.length) {
      val n = math.min(4096, zip.length - off)
      val chunk = java.util.Arrays.copyOfRange(zip, off, off + n) ++
        new Array[Byte]((16 - n % 16) % 16)
      pkgOut.write(aesCbc(enc = true, pkgKey, pad36(sha512(kdSalt, le32(seg)), 16), chunk))
      off += n; seg += 1
    }
    def b64(x: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(x)
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption"""" +
      """ xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password">""" +
      s"""<keyData saltSize="16" blockSize="16" keyBits="256" hashSize="64"""" +
      s""" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512"""" +
      s""" saltValue="${b64(kdSalt)}"/><dataIntegrity encryptedHmacKey=""""" +
      s""" encryptedHmacValue=""/><keyEncryptors>""" +
      (if (certFirst)
        // a certificate keyEncryptor listed BEFORE the password one —
        // legal per [MS-OFFCRYPTO] (order unspecified); its
        // <encryptedKey> shares the local name but lives in the
        // certificate namespace and has no spinCount
        """<keyEncryptor uri="http://schemas.microsoft.com/office/2006/keyEncryptor/certificate">""" +
        """<c:encryptedKey xmlns:c="http://schemas.microsoft.com/office/2006/keyEncryptor/certificate"""" +
        """ encryptedKeyValue="AAAA" X509Certificate="AAAA"/></keyEncryptor>"""
      else "") +
      """<keyEncryptor uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password">""" +
      s"""<p:encryptedKey spinCount="$spin" saltSize="16" blockSize="16" keyBits="256"""" +
      s""" hashSize="64" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC"""" +
      s""" hashAlgorithm="SHA512" saltValue="${b64(ekSalt)}"""" +
      s""" encryptedVerifierHashInput="${b64(encVerInput)}"""" +
      s""" encryptedVerifierHashValue="${b64(encVerValue)}"""" +
      s""" encryptedKeyValue="${b64(encKeyValue)}"/></keyEncryptor></keyEncryptors>""" +
      """</encryption>"""
    val info = Array[Byte](4, 0, 4, 0) ++ le32(0x40) ++
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (info, pkgOut.toByteArray)
  }

  private def encryptFileAgile(plainXlsx: String, encPath: String,
                               password: String): Unit = {
    val zip = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plainXlsx))
    val (info, pkg) = encryptAgile(zip, password)
    val cfb = writeCfb(Seq("EncryptionInfo" -> info, "EncryptedPackage" -> pkg))
    java.nio.file.Files.write(java.nio.file.Paths.get(encPath), cfb)
  }

  test("Agile: certificate keyEncryptor listed first is skipped, password one used") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1",
      Seq(Seq("a", "b"), Seq("1", "2")))))
    val zip = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plain))
    val (info, pkg) = encryptAgile(zip, "VelvetSweatshop", certFirst = true)
    val enc = s"$dir/certfirst.xlsx"
    java.nio.file.Files.write(java.nio.file.Paths.get(enc),
      writeCfb(Seq("EncryptionInfo" -> info, "EncryptedPackage" -> pkg)))
    // selection by local name alone would pick the certificate
    // <encryptedKey> (no spinCount) and fail; namespace-filtered
    // selection opens the workbook
    val (h, r) = Xlsx.headerAndRows(enc, "Sheet1")
    assert(h.toSeq == Seq("a", "b"))
    assert(r.map(_.toSeq) == Seq(Seq("1", "2")))
  }

  test("Agile-encrypted workbook (Excel 2013+ default) opens transparently") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1",
      Seq(Seq("agency", "race", "count"),
        Seq("Springfield PD", "BLACK", "3"),
        Seq("Shelbyville PD", "WHITE", "2")))))
    val enc = s"$dir/agile.xlsx"
    encryptFileAgile(plain, enc, "VelvetSweatshop")
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(enc)).take(8)
    assert(Cfb.isCfb(head))
    val (h1, r1) = Xlsx.headerAndRows(plain, "Sheet1")
    val (h2, r2) = Xlsx.headerAndRows(enc, "Sheet1")
    assert(h1.toSeq == h2.toSeq)
    assert(r1.map(_.toSeq) == r2.map(_.toSeq))
    assert(Xlsx.sheetNames(enc) == Seq("Sheet1"))
  }

  test("Agile: a multi-segment (>4096 B) package round-trips exactly") {
    // straight OffCrypto.decrypt on a payload spanning 3 segments, so
    // the per-segment IV derivation H(kdSalt || LE32(seg)) is exercised
    val payload = Array.tabulate[Byte](4096 * 2 + 1234)(i => (i * 31 + 7).toByte)
    val (info, pkg) = encryptAgile(payload, "VelvetSweatshop", spin = 1000)
    val cfb = writeCfb(Seq("EncryptionInfo" -> info, "EncryptedPackage" -> pkg))
    val got = OffCrypto.decrypt(cfb)
    assert(got.length == payload.length)
    assert(got.sameElements(payload))
  }

  test("Agile with a REAL password fails loud naming the default") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1", Seq(Seq("a"), Seq("1")))))
    val enc = s"$dir/agile.xlsx"
    encryptFileAgile(plain, enc, "actual-secret")
    val ex = intercept[IllegalArgumentException](Xlsx.header(enc, "Sheet1"))
    assert(ex.getMessage.contains("VelvetSweatshop"))
  }

  test("malformed Agile descriptor fails loud naming the scheme") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1", Seq(Seq("a"), Seq("1")))))
    val zip = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plain))
    val info = Array[Byte](4, 0, 4, 0) ++ le32(0x40) ++ "<encryption/>".getBytes("UTF-8")
    val cfb = writeCfb(Seq("EncryptionInfo" -> info, "EncryptedPackage" -> (le64(0L) ++ zip)))
    val enc = s"$dir/agile.xlsx"
    java.nio.file.Files.write(java.nio.file.Paths.get(enc), cfb)
    val ex = intercept[Exception](Xlsx.header(enc, "Sheet1"))
    assert(ex.getMessage.contains("Agile"))
  }

  // ---- test-side RC4 CryptoAPI encryptor ([MS-OFFCRYPTO] §2.3.5) --------
  // The RC4 primitive here is the JDK's ARCFOUR — an implementation
  // independent from the main side's hand-rolled keystream.

  private def jdkRc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("ARCFOUR")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "ARCFOUR"))
    c.doFinal(data)
  }

  /** Independent mirror of §2.3.5.2 (incl. the 40-bit zero-pad rule). */
  private def rc4Key(salt: Array[Byte], password: String, keyBits: Int,
                     block: Int): Array[Byte] = {
    val h0 = sha1(salt, password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    val h = sha1(h0, le32(block))
    if (keyBits == 40) h.take(5) ++ new Array[Byte](11)
    else h.take(keyBits / 8)
  }

  private def encryptRc4CryptoApi(zip: Array[Byte], password: String,
      keyBits: Int, salt: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val rnd = new java.util.Random(23)
    val verifier = new Array[Byte](16)
    rnd.nextBytes(verifier)
    // one block-0 stream across verifier ∥ SHA1(verifier): no padding
    val encVer = jdkRc4(rc4Key(salt, password, keyBits, 0),
      verifier ++ sha1(verifier))
    val cspName = "Microsoft Base Cryptographic Provider v1.0 "
      .getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val header = le32(0x04 /* fCryptoAPI */) ++ le32(0) ++ le32(0x6801) ++
      le32(0x8004) ++ le32(keyBits) ++ le32(0x17) ++ le32(0) ++ le32(0) ++ cspName
    val info = le32(0) /* version placeholder */ ++ le32(0x04) ++
      le32(header.length) ++ header ++
      le32(16) ++ salt ++ encVer.take(16) ++ le32(20) ++ encVer.drop(16)
    info(0) = 3; info(1) = 0; info(2) = 2; info(3) = 0 // version 3.2
    // 512-byte blocks, re-keyed per block index
    val out = zip.grouped(512).zipWithIndex.map { case (chunk, b) =>
      jdkRc4(rc4Key(salt, password, keyBits, b), chunk)
    }.reduce(_ ++ _)
    (info, le64(zip.length.toLong) ++ out)
  }

  private def encryptFileRc4(plainXlsx: String, encPath: String,
      password: String, keyBits: Int): Unit = {
    val zip = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plainXlsx))
    val salt = new Array[Byte](16)
    new java.util.Random(29).nextBytes(salt)
    val (info, pkg) = encryptRc4CryptoApi(zip, password, keyBits, salt)
    val cfb = writeCfb(Seq("EncryptionInfo" -> info, "EncryptedPackage" -> pkg))
    java.nio.file.Files.write(java.nio.file.Paths.get(encPath), cfb)
  }

  test("rc4: hand-rolled keystream equals the JDK's ARCFOUR on random inputs") {
    val rnd = new java.util.Random(31)
    (1 to 20).foreach { _ =>
      val key = new Array[Byte](5 + rnd.nextInt(12))
      rnd.nextBytes(key)
      val data = new Array[Byte](1 + rnd.nextInt(2000))
      rnd.nextBytes(data)
      assert(OffCrypto.rc4(key, data).sameElements(jdkRc4(key, data)))
      // symmetric: decrypt(encrypt(x)) == x
      assert(OffCrypto.rc4(key, OffCrypto.rc4(key, data)).sameElements(data))
    }
  }

  test("rc4 key derivation: block-sensitive; 40-bit keys zero-pad to 16 bytes") {
    val salt = Array.tabulate[Byte](16)(i => (i * 3).toByte)
    val k0 = OffCrypto.deriveRc4CryptoApiKey(salt, "VelvetSweatshop", 128, 0)
    val k1 = OffCrypto.deriveRc4CryptoApiKey(salt, "VelvetSweatshop", 128, 1)
    assert(k0.length == 16 && !k0.sameElements(k1))
    assert(k0.sameElements(rc4Key(salt, "VelvetSweatshop", 128, 0)))
    val k40 = OffCrypto.deriveRc4CryptoApiKey(salt, "VelvetSweatshop", 40, 0)
    assert(k40.length == 16, "40-bit key must zero-pad to 16 bytes (§2.3.5.2)")
    assert(k40.drop(5).forall(_ == 0) && !k40.take(5).forall(_ == 0))
    assert(k40.take(5).sameElements(k0.take(5)))
    assert(k40.sameElements(rc4Key(salt, "VelvetSweatshop", 40, 0)))
  }

  test("RC4 CryptoAPI workbook (Office <=2003 writers) opens transparently") {
    for (keyBits <- Seq(40, 128)) {
      val dir = tmpDir()
      val plain = s"$dir/plain.xlsx"
      // enough rows that the zip spans several 512-byte RC4 blocks —
      // the per-block re-keying is what the round-trip must prove
      Xlsx.write(plain, Seq(("Sheet1",
        Seq(Seq("agency", "count")) ++
          (1 to 200).map(i => Seq(s"Agency $i", i.toString)))))
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(plain)) > 1024)
      val enc = s"$dir/enc.xlsx"
      encryptFileRc4(plain, enc, "VelvetSweatshop", keyBits)
      val (h1, r1) = Xlsx.headerAndRows(plain, "Sheet1")
      val (h2, r2) = Xlsx.headerAndRows(enc, "Sheet1")
      assert(h1.toSeq == h2.toSeq, s"keyBits=$keyBits")
      assert(r1.map(_.toSeq) == r2.map(_.toSeq), s"keyBits=$keyBits")
    }
  }

  test("RC4 CryptoAPI with a REAL password fails loud naming the default") {
    val dir = tmpDir()
    val plain = s"$dir/plain.xlsx"
    Xlsx.write(plain, Seq(("Sheet1", Seq(Seq("a"), Seq("1")))))
    val enc = s"$dir/enc.xlsx"
    encryptFileRc4(plain, enc, "actual-secret", 128)
    val ex = intercept[IllegalArgumentException](Xlsx.header(enc, "Sheet1"))
    assert(ex.getMessage.contains("VelvetSweatshop"))
    assert(ex.getMessage.contains("RC4 CryptoAPI"))
  }

  test("Cfb reader: mini and regular streams both exact") {
    val small = Array.tabulate[Byte](150)(i => (i * 7).toByte)   // mini
    val big = Array.tabulate[Byte](9000)(i => (i * 13).toByte)   // FAT
    val cfb = writeCfb(Seq("EncryptionInfo" -> small, "EncryptedPackage" -> big))
    val ss = Cfb.streams(cfb)
    assert(ss("EncryptionInfo").sameElements(small))
    assert(ss("EncryptedPackage").sameElements(big))
  }
}
