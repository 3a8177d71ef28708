package graft.dbtypes

import org.scalatest.funsuite.AnyFunSuite

import graft.types._

/** Full dialect-conformance matrix extracted from the reference's own
  * test suites (mysql_types_test.clj / sql_server_types_test.clj /
  * vertica_types_test.clj / simple_types_test.clj): every
  * `col-type->json-type` golden with its expected type kind and, where
  * the reference asserts them, the exact capacity min/max (Str cases
  * carry LENGTH bounds, per types.clj:42-47). Cases whose expected
  * bounds are non-integer literals (Real capacities) assert the kind
  * only — their exact values are covered by DbTypesSpec.
  */
class DbTypesConformanceSpec extends AnyFunSuite {

  private val translators: Map[String, DbTypeTranslator] = Map(
    "MySql" -> MySqlTranslator, "SqlServer" -> SqlServerTranslator,
    "Vertica" -> VerticaTranslator, "Simple" -> SimpleTranslator)

  // (dialect, column definition, expected kind, expected min, expected max)
  private val cases: Seq[(String, String, String, Option[BigInt], Option[BigInt])] = Seq(
    ("MySql", "tinyint(1)", "Int", Some(BigInt("-128")), Some(BigInt("127"))),
    ("MySql", "tinyint(1) unsigned", "Int", Some(BigInt("0")), Some(BigInt("255"))),
    ("MySql", "smallint(2)", "Int", Some(BigInt("-32768")), Some(BigInt("32767"))),
    ("MySql", "smallint(2) unsigned", "Int", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "mediumint(3)", "Int", Some(BigInt("-8388608")), Some(BigInt("8388607"))),
    ("MySql", "mediumint(3) unsigned", "Int", Some(BigInt("0")), Some(BigInt("16777215"))),
    ("MySql", "int(10)", "Int", Some(BigInt("-2147483648")), Some(BigInt("2147483647"))),
    ("MySql", "int(11) unsigned", "Int", Some(BigInt("0")), Some(BigInt("4294967295"))),
    ("MySql", "bigint(20)", "Int", Some(BigInt("-9223372036854775808")), Some(BigInt("9223372036854775807"))),
    ("MySql", "bigint(21) unsigned", "Int", Some(BigInt("0")), Some(BigInt("18446744073709551615"))),
    ("MySql", "decimal(3,0)", "Real", None, None),
    ("MySql", "decimal", "Real", None, None),
    ("MySql", "numeric(2,4)", "Real", None, None),
    ("MySql", "numeric", "Real", None, None),
    ("MySql", "float", "Real", None, None),
    ("MySql", "float unsigned", "Real", None, None),
    ("MySql", "double", "Real", None, None),
    ("MySql", "double unsigned", "Real", None, None),
    ("MySql", "char(10)", "Str", Some(BigInt("0")), Some(BigInt("10"))),
    ("MySql", "varchar(255)", "Str", Some(BigInt("0")), Some(BigInt("255"))),
    ("MySql", "blob", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "text", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "enum", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "set", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "date", "Date", None, None),
    ("MySql", "datetime", "Date", None, None),
    ("MySql", "timestamp", "Date", None, None),
    ("MySql", "bool", "Bool", None, None),
    ("MySql", "boolean", "Bool", None, None),
    ("MySql", "bit", "Int", Some(BigInt("1")), Some(BigInt("64"))),
    ("MySql", "tinyint(1)", "Int", Some(BigInt("-128")), Some(BigInt("127"))),
    ("MySql", "tinyint(1) unsigned", "Int", Some(BigInt("0")), Some(BigInt("255"))),
    ("MySql", "smallint(2)", "Int", Some(BigInt("-32768")), Some(BigInt("32767"))),
    ("MySql", "smallint(2) unsigned", "Int", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "mediumint(3)", "Int", Some(BigInt("-8388608")), Some(BigInt("8388607"))),
    ("MySql", "mediumint(3) unsigned", "Int", Some(BigInt("0")), Some(BigInt("16777215"))),
    ("MySql", "int(10)", "Int", Some(BigInt("-2147483648")), Some(BigInt("2147483647"))),
    ("MySql", "int(11) unsigned", "Int", Some(BigInt("0")), Some(BigInt("4294967295"))),
    ("MySql", "bigint(20)", "Int", Some(BigInt("-9223372036854775808")), Some(BigInt("9223372036854775807"))),
    ("MySql", "bigint(21) unsigned", "Int", Some(BigInt("0")), Some(BigInt("18446744073709551615"))),
    ("MySql", "decimal(3,0)", "Real", None, None),
    ("MySql", "decimal", "Real", None, None),
    ("MySql", "numeric(2,4)", "Real", None, None),
    ("MySql", "numeric", "Real", None, None),
    ("MySql", "float", "Real", None, None),
    ("MySql", "float unsigned", "Real", None, None),
    ("MySql", "double", "Real", None, None),
    ("MySql", "double unsigned", "Real", None, None),
    ("MySql", "char(10)", "Str", Some(BigInt("0")), Some(BigInt("10"))),
    ("MySql", "varchar(255)", "Str", Some(BigInt("0")), Some(BigInt("255"))),
    ("MySql", "blob", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "mediumblob", "Str", None, None),
    ("MySql", "longblob", "Str", None, None),
    ("MySql", "text", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "mediumtext", "Str", None, None),
    ("MySql", "longtext", "Str", None, None),
    ("MySql", "enum", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "set", "Str", Some(BigInt("0")), Some(BigInt("65535"))),
    ("MySql", "date", "Date", None, None),
    ("MySql", "datetime", "Date", None, None),
    ("MySql", "timestamp", "Date", None, None),
    ("MySql", "bool", "Bool", None, None),
    ("MySql", "boolean", "Bool", None, None),
    ("MySql", "bit", "Int", Some(BigInt("1")), Some(BigInt("64"))),
    ("SqlServer", "tinyint", "Int", Some(BigInt("0")), Some(BigInt("255"))),
    ("SqlServer", "smallint", "Int", None, None),
    ("SqlServer", "int", "Int", None, None),
    ("SqlServer", "bigint", "Int", None, None),
    ("SqlServer", "float", "Real", None, None),
    ("SqlServer", "real", "Real", None, None),
    ("SqlServer", "decimal", "Real", None, None),
    ("SqlServer", "numeric", "Real", None, None),
    ("SqlServer", "money", "Real", None, None),
    ("SqlServer", "smallmoney", "Real", None, None),
    ("SqlServer", "date", "Date", None, None),
    ("SqlServer", "datetime", "Date", None, None),
    ("SqlServer", "datetime2", "Date", None, None),
    ("SqlServer", "datetimeoffset", "Date", None, None),
    ("SqlServer", "smalldatetime", "Date", None, None),
    ("SqlServer", "time", "Date", None, None),
    ("SqlServer", "char", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "char(10)", "Str", Some(BigInt("1")), Some(BigInt("10"))),
    ("SqlServer", "char(9999)", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "varchar", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "varchar(10)", "Str", Some(BigInt("1")), Some(BigInt("10"))),
    ("SqlServer", "varchar(9999)", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "varchar(max)", "Str", None, None),
    ("SqlServer", "nchar", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "nchar(10)", "Str", Some(BigInt("1")), Some(BigInt("10"))),
    ("SqlServer", "nchar(9999)", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "nchar(max)", "Str", None, None),
    ("SqlServer", "nvarchar", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "nvarchar(10)", "Str", Some(BigInt("1")), Some(BigInt("10"))),
    ("SqlServer", "nvarchar(9999)", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "nvarchar(max)", "Str", None, None),
    ("SqlServer", "binary", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "binary(10)", "Str", Some(BigInt("1")), Some(BigInt("10"))),
    ("SqlServer", "binary(9999)", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "varbinary", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "varbinary(10)", "Str", Some(BigInt("1")), Some(BigInt("10"))),
    ("SqlServer", "varbinary(9999)", "Str", Some(BigInt("1")), Some(BigInt("8000"))),
    ("SqlServer", "varbinary(max)", "Str", None, None),
    ("SqlServer", "text", "Str", None, None),
    ("SqlServer", "image", "Str", None, None),
    ("SqlServer", "ntext", "Str", None, None),
    ("SqlServer", "rowversion", "Int", None, None),
    ("SqlServer", "timestamp", "Int", None, None),
    ("Vertica", "tinyint", "Int", None, None),
    ("Vertica", "smallint", "Int", None, None),
    ("Vertica", "int8", "Int", None, None),
    ("Vertica", "int", "Int", None, None),
    ("Vertica", "integer", "Int", None, None),
    ("Vertica", "boolean", "Bool", None, None),
    ("Vertica", "binary", "Str", None, None),
    ("Vertica", "binary(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "binary(999999)", "Str", None, None),
    ("Vertica", "varbinary", "Str", None, None),
    ("Vertica", "varbinary(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "varbinary(999999)", "Str", None, None),
    ("Vertica", "bytea", "Str", None, None),
    ("Vertica", "bytea(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "bytea(999999)", "Str", None, None),
    ("Vertica", "raw", "Str", None, None),
    ("Vertica", "raw(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "raw(999999)", "Str", None, None),
    ("Vertica", "character", "Str", None, None),
    ("Vertica", "character(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "character(999999)", "Str", None, None),
    ("Vertica", "char", "Str", None, None),
    ("Vertica", "char(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "char(999999)", "Str", None, None),
    ("Vertica", "varchar", "Str", None, None),
    ("Vertica", "varchar(1000)", "Str", Some(BigInt("1000")), Some(BigInt("1000"))),
    ("Vertica", "varchar(999999)", "Str", None, None),
    ("Vertica", "date", "Date", None, None),
    ("Vertica", "datetime", "Date", None, None),
    ("Vertica", "smalldatetime", "Date", None, None),
    ("Vertica", "timestamp", "Date", None, None),
    ("Vertica", "interval", "Real", None, None),
    ("Vertica", "interval", "Real", None, None),
    ("Vertica", "decimal", "Real", None, None),
    ("Vertica", "number", "Real", None, None),
    ("Vertica", "money", "Real", None, None),
    ("Vertica", "double", "Real", None, None),
    ("Vertica", "float", "Real", None, None),
    ("Vertica", "float8", "Real", None, None),
    ("Vertica", "real", "Real", None, None),
    ("Simple", "int", "Int", None, None),
    ("Simple", "str", "Str", Some(BigInt("0")), Some(BigInt("80"))),
    ("Simple", "bool", "Bool", None, None),
    ("Simple", "real", "Real", None, None),
    ("Simple", "date(yyyy-mm-dd)", "Date", None, None)
  )

  test(s"reference conformance matrix: ${cases.size} col-def goldens across 4 dialects") {
    cases.foreach { case (dialect, cdef, kind, mn, mx) =>
      val t = translators(dialect).colTypeToSchemaType(cdef)
      def ctx = s"$dialect '$cdef' -> $t"
      (kind, t) match {
        case ("Int", IntT(lo, hi)) =>
          mn.foreach(m => assert(lo == m, ctx))
          mx.foreach(m => assert(hi == m, ctx))
        case ("Str", StrT(lo, hi)) =>
          mn.foreach(m => assert(BigInt(lo) == m, ctx))
          mx.foreach(m => assert(BigInt(hi) == m, ctx))
        case ("Real", RealT(lo, hi)) =>
          mn.foreach(m => assert(BigDecimal(lo) == BigDecimal(m), ctx))
          mx.foreach(m => assert(BigDecimal(hi) == BigDecimal(m), ctx))
        case ("Bool", BoolT) => ()
        case ("Date", DateT(_)) => ()
        case (k, other) => fail(s"$ctx: expected kind $k")
      }
    }
  }
}
