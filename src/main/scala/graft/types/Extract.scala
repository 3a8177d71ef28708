package graft.types

import java.text.{ParsePosition, SimpleDateFormat}

/** Minimal dynamic-value model the extractor walks (the reference walks
  * Clojure maps/vectors parsed from JSON lines, extract.clj:111-132).
  */
sealed trait JValue extends Serializable
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JInt(value: BigInt) extends JValue
final case class JReal(value: Double) extends JValue
final case class JStr(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
final case class JObj(fields: Map[String, JValue]) extends JValue

object JValue {
  def obj(fields: (String, JValue)*): JObj = JObj(fields.toMap)
  def arr(items: JValue*): JArr = JArr(items.toVector)
  implicit def fromInt(v: Int): JValue = JInt(BigInt(v))
  implicit def fromLong(v: Long): JValue = JInt(BigInt(v))
  implicit def fromDouble(v: Double): JValue = JReal(v)
  implicit def fromString(s: String): JValue = JStr(s)
  implicit def fromBoolean(b: Boolean): JValue = JBool(b)
}

/** Exception-free date sniffing (reference extract.clj:48-79).
  *
  * A string "is a date" iff >=1 configured SimpleDateFormat pattern parses a
  * NON-EMPTY PREFIX of it — `ParsePosition` semantics, so "2013-01-01asdf"
  * IS a date (documented quirk, extract_test.clj:38-43). Formats are lenient
  * (SimpleDateFormat default), so "2-10-10" matches "yyyy-MM-dd"
  * (extract_test.clj:155-157). Parser objects are cached per-thread
  * (SimpleDateFormat is not thread-safe); the reference memoizes
  * construction (extract.clj:71-72).
  */
final class DateSniffer(val patterns: Seq[String]) extends Serializable {
  @transient private lazy val formats =
    new ThreadLocal[Array[SimpleDateFormat]] {
      override def initialValue(): Array[SimpleDateFormat] =
        patterns.map(p => new SimpleDateFormat(p)).toArray
    }

  private def parseablePrefix(fmt: SimpleDateFormat, s: String): Boolean = {
    val pos = new ParsePosition(0)
    fmt.parse(s, pos)
    pos.getIndex != 0
  }

  /** All patterns that match, in configured order. */
  def matching(s: String): Seq[String] = {
    if (patterns.isEmpty) return Nil
    val fs = formats.get()
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < fs.length) {
      if (parseablePrefix(fs(i), s)) out += patterns(i)
      i += 1
    }
    out.result()
  }

  def isDate(s: String): Boolean = matching(s).nonEmpty
}

/** The special-scalar extension channel (reference extract.clj:81-90:
  * special-id?/make-special — "prove out we can do things like handle
  * mongo's date and id representations"). A recognizer claims a value and
  * maps it to a [[SpecialT]]; registered recognizers are consulted FIRST,
  * before every built-in kind, mirroring the reference cond order
  * (extract.clj:115-116 puts `special?` ahead of even `null?`). The
  * reference ships only the always-false stub; the default registry here
  * is correspondingly empty.
  */
trait SpecialScalar extends Serializable {
  def name: String
  def matches(x: JValue): Boolean
}

/** Per-value type extraction (reference extract.clj:111-132): value ->
  * scalar type with stats; object -> DocT (recurse per key); array ->
  * collection whose element types are unified eagerly BY THE POLICY'S
  * REDUCER — merge vs simplify produce different types for the same single
  * record (extract_test.clj:300-337).
  */
final class TypeExtractor(
    policy: MergePolicy,
    dateFormatPatterns: Seq[String] = Nil,
    specials: Seq[SpecialScalar] = Nil) extends Serializable {

  private val sniffer = new DateSniffer(dateFormatPatterns)

  def extract(x: JValue): SchemaType =
    specials.find(_.matches(x)) match {
      case Some(sp) => SpecialT(sp.name)
      case None => x match {
        case JNull       => NullT
        case JBool(_)    => BoolT
        case JInt(v)     => IntT(v, v)
        case JReal(v)    => RealT(v, v)
        case JStr(s) =>
          val fmts = sniffer.matching(s)
          if (fmts.nonEmpty) DateT(fmts.toSet) else StrT.of(s)
        case JObj(fields) =>
          DocT(fields.map { case (k, v) => k -> extract(v) })
        case JArr(items) =>
          policy.turnIntoCollection(items.map(extract))
      }
    }
}

object TypeExtractor {
  def merging(dateFormatPatterns: Seq[String] = Nil): TypeExtractor =
    new TypeExtractor(StrictMerge, dateFormatPatterns)
  def simplifying(dateFormatPatterns: Seq[String] = Nil): TypeExtractor =
    new TypeExtractor(SimplifyMerge, dateFormatPatterns)
}
