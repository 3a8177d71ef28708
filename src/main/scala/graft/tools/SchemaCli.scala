package graft.tools

import graft.json.JsonParser
import graft.types._

import scala.io.Source

/** Local (non-Spark) schema analysis driver — the analog of the reference's
  * top-level entry point `analyze-json-schema` (core.clj:57-67): JSON-lines
  * files -> merged observed schema, printing `Analyzed N entries. K failed.`
  * For the distributed path over Parquet/JSONL at scale, see
  * [[graft.ingest.JsonSchemaInference]].
  *
  * Usage: SchemaCli [--analysis comprehensive|simple] [--date-format P]... file...
  */
object SchemaCli {
  def main(args: Array[String]): Unit = {
    var analysis = "comprehensive"
    var dateFormats = Vector.empty[String]
    var files = Vector.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--analysis"    => analysis = args(i + 1); i += 2
        case "--date-format" => dateFormats :+= args(i + 1); i += 2
        case f               => files :+= f; i += 1
      }
    }
    require(files.nonEmpty, "usage: SchemaCli [--analysis comprehensive|simple] [--date-format PATTERN]... FILE...")
    val policy: MergePolicy = analysis match {
      case "comprehensive" => StrictMerge
      case "simple"        => SimplifyMerge
      case other => sys.error(s"unknown --analysis '$other' (want comprehensive|simple)")
    }
    val extractor = new TypeExtractor(policy, dateFormats)

    var n = 0
    var failed = 0
    var schema: Option[SchemaType] = None
    files.foreach { f =>
      val src = Source.fromFile(f, "UTF-8")
      try src.getLines().foreach { line =>
        n += 1
        JsonParser.parseJsonLine(line) match {
          case Left(err) =>
            failed += 1
            System.err.println(s"Line #: $n, $err\n$line\n---------")
          case Right(obj) =>
            val t = extractor.extract(obj)
            schema = Some(schema.fold(t)(s => policy.mergeTwo(s, t)))
        }
      } finally src.close()
    }
    println(s"Analyzed $n entries. $failed failed.")
    schema.foreach(s => println(SchemaType.render(s)))
  }
}
