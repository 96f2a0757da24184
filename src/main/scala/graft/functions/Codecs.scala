package graft.functions

/** Pure scalar codecs mirroring the reference's key/value encodings
  * (ref: src/be_db_follower.hrl:1-5 base58/base64url macros,
  * src/be_db_gateway.erl:210 animal names, :233-237 H3 parent,
  * src/be_db_oui.erl:100-102 subnet unpack,
  * src/be_db_vars.erl:112-130 var value encoding).
  *
  * All functions are pure Scala so they are usable from plain code (the
  * fixture generator), as Spark UDFs, and in tests. The SQL-expressible
  * ones (base64url, subnet unpack, H3 parent — pure bit/byte math) also
  * have Column implementations built from builtins so the hot query
  * paths stay codegen'd; see [[CodecColumns]].
  */
object Codecs {

  // ---- base58 (Bitcoin alphabet; keys in the reference are b58-check
  //      strings via libp2p — we reproduce the classic b58 codec) ----

  val Base58Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val b58Index: Map[Char, Int] =
    Base58Alphabet.zipWithIndex.toMap

  def base58Encode(bytes: Array[Byte]): String = {
    if (bytes.isEmpty) return ""
    val zeros = bytes.takeWhile(_ == 0).length
    var num = BigInt(1, bytes)
    val sb = new StringBuilder
    while (num > 0) {
      val (q, r) = num /% 58
      sb.append(Base58Alphabet(r.toInt))
      num = q
    }
    ("1" * zeros) + sb.reverseInPlace().toString
  }

  def base58Decode(s: String): Array[Byte] = {
    if (s.isEmpty) return Array.emptyByteArray
    val zeros = s.takeWhile(_ == '1').length
    var num = BigInt(0)
    s.foreach { c =>
      val d = b58Index.getOrElse(c,
        throw new IllegalArgumentException(s"invalid base58 char '$c'"))
      num = num * 58 + d
    }
    val body = if (num == 0) Array.emptyByteArray
      else num.toByteArray.dropWhile(_ == 0)
    Array.fill[Byte](zeros)(0) ++ body
  }

  // ---- base64url without padding (?BIN_TO_B64) ----

  def base64UrlEncode(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  def base64UrlDecode(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  // ---- H3 index math (parent + string forms; pure bit arithmetic on
  //      the 64-bit index — no geo math, the fixtures carry lat/lon) ----

  /** Resolution field: bits 52-55. */
  def h3Resolution(h: Long): Int = ((h >>> 52) & 0xF).toInt

  /** Parent cell at `parentRes`: set the resolution field and fill the
    * digits below the parent resolution with 7 (the H3 "unused" digit).
    * Digit r (1-based) occupies bits (45-3r)..(47-3r).
    */
  def h3Parent(h: Long, parentRes: Int): Long = {
    val res = h3Resolution(h)
    require(parentRes >= 0 && parentRes <= res,
      s"parent res $parentRes out of range for res $res")
    var out = (h & ~(0xFL << 52)) | (parentRes.toLong << 52)
    var r = parentRes + 1
    while (r <= res) {
      out |= 0x7L << (45 - 3 * r)
      r += 1
    }
    out
  }

  def h3ToString(h: Long): String = java.lang.Long.toHexString(h)

  def h3FromString(s: String): Long = java.lang.Long.parseUnsignedLong(s, 16)

  // ---- animal names (deterministic three-word name from a b58 address;
  //      same shape as the reference's angry-purple-tiger naming, with
  //      our own word lists) ----

  private val Adjectives = Vector(
    "able", "brisk", "calm", "droll", "eager", "fancy", "glum", "hazy",
    "icy", "jolly", "keen", "lucky", "mellow", "nimble", "odd", "proud",
    "quaint", "rustic", "sly", "tidy", "upbeat", "vivid", "wry", "zesty")
  private val Colors = Vector(
    "amber", "blue", "coral", "dun", "ebony", "fuchsia", "gold", "hazel",
    "indigo", "jade", "khaki", "lilac", "maroon", "navy", "olive", "pearl",
    "quartz", "rose", "sepia", "teal", "umber", "violet", "white", "yellow")
  private val Animals = Vector(
    "ant", "bat", "cod", "deer", "eel", "fox", "gull", "hare",
    "ibis", "jay", "kiwi", "lynx", "mole", "newt", "orca", "pike",
    "quail", "ram", "seal", "toad", "urchin", "vole", "wren", "yak")

  def animalName(b58Address: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(b58Address.getBytes("UTF-8"))
    def pick(i: Int, from: Vector[String]) = from((d(i) & 0xFF) % from.size)
    s"${pick(0, Adjectives)}-${pick(1, Colors)}-${pick(2, Animals)}"
  }

  // ---- subnet unpack: 48-bit <<base:25, mask:23>> -> [base, mask]
  //      (ref: src/be_db_oui.erl:100-102) ----

  def subnetUnpack(subnet: Long): (Long, Long) =
    ((subnet >>> 23) & 0x1FFFFFFL, subnet & 0x7FFFFFL)

  // ---- var value encoding (ref: src/be_db_vars.erl:112-130): ints and
  //      atoms as text, floats 8-decimal compact, binaries as b64 ----

  def varValueEncode(v: Any): String = v match {
    case f: Double => BigDecimal(f).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case other => String.valueOf(other)
  }
}
