package graft.export

import graft.types._

import java.util.concurrent.atomic.AtomicLong

/** Observed type -> Avro schema JSON (reference export/avro.clj:9-41):
  * null/boolean/long/float/string map directly, collections become Avro
  * arrays, documents become records (with generated names, like the
  * reference's gensym), unions become Avro unions. Dates (absent from the
  * reference's multimethod) render as strings.
  */
object AvroExport {
  private val recordCounter = new AtomicLong(0)

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\""

  def toAvro(t: SchemaType): String = t match {
    case NullT     => q("null")
    case BoolT     => q("boolean")
    case _: IntT   => q("long")
    case _: RealT  => q("float")
    case _: StrT   => q("string")
    case _: DateT  => q("string")
    case CollT(None) => s"""{"type": "array", "items": ${q("null")}}"""
    case CollT(Some(e)) => s"""{"type": "array", "items": ${toAvro(e)}}"""
    case DocT(fields) =>
      val name = s"record_${recordCounter.incrementAndGet()}"
      val fs = fields.toSeq.sortBy(_._1).map { case (k, v) =>
        s"""{"name": ${q(k)}, "type": ${toAvro(v)}}"""
      }.mkString(", ")
      s"""{"type": "record", "name": ${q(name)}, "fields": [$fs]}"""
    case UnionT(ts) =>
      ts.toSeq.map(toAvro).sorted.mkString("[", ", ", "]")
  }

  /** Round-trip check helper: parse with the Avro library bundled with
    * Spark to validate the emitted schema.
    */
  def validate(json: String): org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(json)
}
