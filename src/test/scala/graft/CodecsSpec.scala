package graft

import graft.functions.Codecs
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class CodecsSpec extends AnyFunSuite {

  test("base58 round-trips random byte strings") {
    val rnd = new Random(10)
    (1 to 200).foreach { _ =>
      val bytes = Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt().toByte)
      assert(Codecs.base58Decode(Codecs.base58Encode(bytes)).toSeq === bytes.toSeq)
    }
  }

  test("base58 preserves leading zeros as '1'") {
    val bytes = Array[Byte](0, 0, 1, 2)
    val s = Codecs.base58Encode(bytes)
    assert(s.startsWith("11"))
    assert(Codecs.base58Decode(s).toSeq === bytes.toSeq)
  }

  test("base58 known vector") {
    // "Hello World!" — classic b58 test vector
    assert(Codecs.base58Encode("Hello World!".getBytes("UTF-8")) ===
      "2NEpo7TZRRrLZSi2U")
  }

  test("base58 rejects invalid characters") {
    intercept[IllegalArgumentException](Codecs.base58Decode("0OIl"))
  }

  test("base64url round-trips and is url-safe unpadded") {
    val rnd = new Random(11)
    (1 to 100).foreach { _ =>
      val bytes = Array.fill[Byte](rnd.nextInt(50))(rnd.nextInt().toByte)
      val s = Codecs.base64UrlEncode(bytes)
      assert(!s.contains('+') && !s.contains('/') && !s.contains('='))
      assert(Codecs.base64UrlDecode(s).toSeq === bytes.toSeq)
    }
  }

  test("h3 parent sets resolution and fills lower digits with 7") {
    // res-12 cell: mode 1, base cell 17, digits 1..12 = 3
    var h = (1L << 59) | (12L << 52) | (17L << 45)
    (1 to 12).foreach(r => h |= 3L << (45 - 3 * r))
    (13 to 15).foreach(r => h |= 0x7L << (45 - 3 * r))
    val p8 = Codecs.h3Parent(h, 8)
    assert(Codecs.h3Resolution(p8) === 8)
    // digits 1..8 unchanged (3), digits 9..12 now 7
    (1 to 8).foreach(r => assert(((p8 >> (45 - 3 * r)) & 0x7) === 3L))
    (9 to 12).foreach(r => assert(((p8 >> (45 - 3 * r)) & 0x7) === 0x7L))
    // parent of parent == direct parent
    assert(Codecs.h3Parent(Codecs.h3Parent(h, 10), 8) === p8)
    // parent at own res is identity
    assert(Codecs.h3Parent(h, 12) === h)
  }

  test("h3 string round-trip") {
    val rnd = new Random(12)
    (1 to 50).foreach { _ =>
      val h = rnd.nextLong() & 0x0FFFFFFFFFFFFFFFL
      assert(Codecs.h3FromString(Codecs.h3ToString(h)) === h)
    }
  }

  test("subnet unpack splits <<base:25, mask:23>>") {
    val base = 0x155AA55L & 0x1FFFFFFL
    val mask = 0x40FFFFL & 0x7FFFFFL
    val packed = (base << 23) | mask
    assert(Codecs.subnetUnpack(packed) === ((base, mask)))
    assert(Codecs.subnetUnpack(0L) === ((0L, 0L)))
  }

  test("animal name is deterministic three-word form") {
    val a = Codecs.animalName("4TYuEJiaebgTEFNmmHxzULeZxdeK")
    assert(a === Codecs.animalName("4TYuEJiaebgTEFNmmHxzULeZxdeK"))
    assert(a.split("-").length === 3)
    assert(a !== Codecs.animalName("other-address"))
  }

  test("var value encoding: float compact 8-decimals, others as text") {
    assert(Codecs.varValueEncode(0.5) === "0.5")
    assert(Codecs.varValueEncode(1.0 / 3.0) === "0.33333333")
    assert(Codecs.varValueEncode(42L) === "42")
    assert(Codecs.varValueEncode("atom") === "atom")
  }
}
