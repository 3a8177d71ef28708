package graft.ops

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared walk/marshalling helpers for the native count-map expressions
  * ([[CtNgramCounts]], [[CtProfile]], [[WordNgramCounts]]) — one place
  * for the two things they must all agree on:
  *
  *  1. Character n-grams are n-grams of Unicode CODEPOINTS, never UTF-16
  *     code units: Spark's `length`/`substr` (the composed twins) and
  *     DuckDB's `text[i]` (the oracles) both count codepoints, so a
  *     UTF-16 walk would split surrogate pairs into malformed keys on
  *     any non-BMP text (review finding, round 6).
  *  2. String ordering ties are broken in CODEPOINT order (= UTF-8
  *     binary order, what Spark and DuckDB sort) — Java's
  *     `String.compareTo` is UTF-16 order, which ranks supplementary
  *     characters BELOW U+E000..U+FFFF.
  */
private[ops] object NgramWalk {

  /** Per-string codepoint n-gram counts, insertion-ordered. */
  def charNgramCounts(s: String, n: Int): java.util.LinkedHashMap[String, Integer] = {
    val counts = new java.util.LinkedHashMap[String, Integer]()
    val len = s.length
    // codepoint start offsets (+ end sentinel); substring between
    // boundary i and i+n is the n-gram of whole codepoints
    val starts = new Array[Int](s.codePointCount(0, len) + 1)
    var i = 0
    var c = 0
    while (i < len) {
      starts(c) = i
      i += Character.charCount(s.codePointAt(i))
      c += 1
    }
    starts(c) = len
    var k = 0
    while (k + n <= c) {
      counts.merge(s.substring(starts(k), starts(k + n)), 1, (a, b) => a + b)
      k += 1
    }
    counts
  }

  /** The string's codepoints, each as its own String (a surrogate PAIR
    * stays one symbol — `w.map(_.toString)` would split it in two).
    */
  def codePointStrings(s: String): Array[String] = {
    val out = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var c = 0
    while (i < s.length) {
      val j = i + Character.charCount(s.codePointAt(i))
      out(c) = s.substring(i, j)
      i = j
      c += 1
    }
    out
  }

  /** Codepoint-order string comparison (UTF-8 binary order). */
  def compareCodePoints(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** (string -> int) counts as a Catalyst map value. */
  def toMapData(counts: java.util.LinkedHashMap[String, Integer]): MapData = {
    val keys = new Array[Any](counts.size())
    val vals = new Array[Any](counts.size())
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue.intValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
