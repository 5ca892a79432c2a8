package graft

import graft.functions.{TextExprs, UnicodeNorm}
import org.apache.spark.sql.functions._

/** NFC normalization + the canonical cleaning pipeline: composed and
  * decomposed forms converge, controls strip, whitespace collapses —
  * and the fast path hands back already-normalized strings untouched. */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  test("decomposed e + combining acute composes to U+00E9") {
    val decomposed = "café" // "cafe" + combining acute
    val composed = "café"
    val out = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
      .select($"id", UnicodeNorm.nfc($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == composed)
    assert(out(2L) == composed)
  }

  test("normalizeText strips controls, collapses whitespace, trims") {
    val out = Seq(
      (1L, "  a\t\tb\r\nc  "),
      (2L, "a\u0001b"),            // bare control vanishes, no space split
      (3L, "x \u0001 y"),          // control between spaces -> ONE space
      (4L, "already clean"))
      .toDF("id", "t")
      .select($"id", TextExprs.normalizeText($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c")
    assert(out(2L) == "ab")
    assert(out(3L) == "x y")
    assert(out(4L) == "already clean")
  }

  test("null text stays null") {
    val out = Seq((1L, null: String)).toDF("id", "t")
      .select(UnicodeNorm.nfc($"t")).collect()
    assert(out(0).isNullAt(0))
  }

  test("evalNfc fast paths: all-ASCII returns the SAME instance (zero " +
    "alloc); normalized non-ASCII returns the input; decomposed composes") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii text 123!")
    assert(UnicodeNorm.evalNfc(ascii) eq ascii)
    val empty = UTF8String.fromString("")
    assert(UnicodeNorm.evalNfc(empty) eq empty)
    val composed = UTF8String.fromString("café") // already NFC
    assert(UnicodeNorm.evalNfc(composed) eq composed)
    val decomposed = UTF8String.fromString("café")
    assert(UnicodeNorm.evalNfc(decomposed).toString == "café")
  }
}
