package graft.dbtypes

import org.scalatest.funsuite.AnyFunSuite
import graft.types._

/** Dialect conformance goldens ported from mysql_types_test.clj,
  * sql_server_types_test.clj, vertica_types_test.clj,
  * simple_types_test.clj, common_db_types_test.clj.
  */
class DbTypesSpec extends AnyFunSuite {

  test("wider? truncation matrix (common_db_types_test.clj:8-51)") {
    assert(!Wider.wider(IntT(10, 10), IntT(10, 10)))
    assert(Wider.wider(IntT(11, 11), IntT(10, 10)))
    assert(!Wider.wider(IntT(10, 10), IntT(11, 11)))
    // int vs str: DIGIT COUNT of the numeric max vs the string capacity
    assert(!Wider.wider(IntT(99, 99), StrT(2, 2)))
    assert(Wider.wider(IntT(9999, 9999), StrT(3, 3)))
    assert(!Wider.wider(IntT(9999, 9999), StrT(5, 5)))
    // str vs int: str length vs digit count of numeric max
    assert(!Wider.wider(StrT(2, 2), IntT(99, 99)))
    assert(Wider.wider(StrT(3, 3), IntT(99, 99)))
    assert(!Wider.wider(StrT(3, 3), IntT(9999, 9999)))
  }

  test("mysql integer bounds (mysql_types_test.clj:16-74)") {
    assert(MySqlTranslator.colTypeToSchemaType("tinyint(1)") == IntT(-128, 127))
    assert(MySqlTranslator.colTypeToSchemaType("tinyint(1) unsigned") == IntT(0, 255))
    assert(MySqlTranslator.colTypeToSchemaType("smallint(2)") == IntT(-32768, 32767))
    assert(MySqlTranslator.colTypeToSchemaType("smallint(2) unsigned") == IntT(0, 65535))
    assert(MySqlTranslator.colTypeToSchemaType("mediumint(3)") == IntT(-8388608, 8388607))
    assert(MySqlTranslator.colTypeToSchemaType("mediumint(3) unsigned") == IntT(0, 16777215))
    assert(MySqlTranslator.colTypeToSchemaType("int(10)") == IntT(-2147483648L, 2147483647L))
    assert(MySqlTranslator.colTypeToSchemaType("int(11) unsigned") == IntT(0, 4294967295L))
    assert(MySqlTranslator.colTypeToSchemaType("bigint(20)") ==
      IntT(BigInt(Long.MinValue), BigInt(Long.MaxValue)))
    assert(MySqlTranslator.colTypeToSchemaType("bigint(21) unsigned") ==
      IntT(0, BigInt("18446744073709551615")))
    assert(MySqlTranslator.colTypeToSchemaType("bit") == IntT(1, 64))
  }

  test("mysql real/string/date/bool (mysql_types_test.clj:77-193)") {
    val dec = MySqlTranslator.colTypeToSchemaType("decimal(3,0)")
    assert(dec == RealT(-1e35, 1e35))
    assert(MySqlTranslator.colTypeToSchemaType("numeric") == dec)
    assert(MySqlTranslator.colTypeToSchemaType("float unsigned") == dec)
    assert(MySqlTranslator.colTypeToSchemaType("double") == dec)
    assert(MySqlTranslator.colTypeToSchemaType("char(10)") == StrT(0, 10))
    assert(MySqlTranslator.colTypeToSchemaType("varchar(255)") == StrT(0, 255))
    assert(MySqlTranslator.colTypeToSchemaType("blob") == StrT(0, 65535))
    assert(MySqlTranslator.colTypeToSchemaType("text") == StrT(0, 65535))
    assert(MySqlTranslator.colTypeToSchemaType("mediumtext") == StrT(0, (1L << 24) - 1))
    assert(MySqlTranslator.colTypeToSchemaType("longtext") == StrT(0, (1L << 32) - 1))
    assert(MySqlTranslator.colTypeToSchemaType("enum") == StrT(0, 65535))
    assert(MySqlTranslator.colTypeToSchemaType("set") == StrT(0, 65535))
    assert(MySqlTranslator.colTypeToSchemaType("date") == DateT(Set("yyyy-MM-dd")))
    assert(MySqlTranslator.colTypeToSchemaType("datetime") ==
      DateT(Set("yyyy-MM-dd HH:mm:ss")))
    assert(MySqlTranslator.colTypeToSchemaType("timestamp") ==
      DateT(Set("yyyy-MM-dd HH:mm:ss")))
    assert(MySqlTranslator.colTypeToSchemaType("bool") == BoolT)
    assert(MySqlTranslator.colTypeToSchemaType("boolean") == BoolT)
  }

  test("mysql reverse mapping (mysql_types_test.clj:465-512)") {
    assert(MySqlTranslator.schemaTypeToColType(IntT.of(1024)) == "int")
    assert(MySqlTranslator.schemaTypeToColType(IntT.of(BigInt(2147483648L))) == "bigint")
    assert(MySqlTranslator.schemaTypeToColType(StrT(1024, 1024)) == "varchar(1024)")
    assert(MySqlTranslator.schemaTypeToColType(StrT(65536, 65536)) == "mediumtext")
    assert(MySqlTranslator.schemaTypeToColType(StrT((1L << 24) - 1, (1L << 24) - 1)) == "mediumtext")
    assert(MySqlTranslator.schemaTypeToColType(StrT((1L << 32) - 1, (1L << 32) - 1)) == "longtext")
    assert(MySqlTranslator.schemaTypeToColType(BoolT) == "bool")
    assert(MySqlTranslator.schemaTypeToColType(RealT(1024, 1024)) == "decimal")
  }

  test("sqlserver integers incl rowversion/timestamp synonyms (sql_server_types_test.clj)") {
    assert(SqlServerTranslator.colTypeToSchemaType("tinyint") == IntT(0, 255))
    assert(SqlServerTranslator.colTypeToSchemaType("smallint") ==
      IntT(-BigInt(2).pow(15), BigInt(2).pow(15) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("int") ==
      IntT(-BigInt(2).pow(31), BigInt(2).pow(31) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("bigint") ==
      IntT(-BigInt(2).pow(63), BigInt(2).pow(63) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("rowversion").isInstanceOf[IntT])
    assert(SqlServerTranslator.colTypeToSchemaType("timestamp").isInstanceOf[IntT])
  }

  test("sqlserver strings: defaults, params, max, deprecated types") {
    assert(SqlServerTranslator.colTypeToSchemaType("char") == StrT(1, 8000))
    assert(SqlServerTranslator.colTypeToSchemaType("nvarchar(10)") == StrT(1, 10))
    assert(SqlServerTranslator.colTypeToSchemaType("nvarchar(9999)") == StrT(1, 8000))
    assert(SqlServerTranslator.colTypeToSchemaType("nvarchar(max)") ==
      StrT(1, (1L << 31) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("varbinary(10)") == StrT(1, 10))
    assert(SqlServerTranslator.colTypeToSchemaType("varbinary(max)") ==
      StrT(1, (1L << 31) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("text") ==
      StrT((1L << 31) - 1, (1L << 31) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("image") ==
      StrT((1L << 31) - 1, (1L << 31) - 1))
    assert(SqlServerTranslator.colTypeToSchemaType("ntext") ==
      StrT((1L << 30) - 1, (1L << 30) - 1))
  }

  test("sqlserver reals and dates") {
    assert(SqlServerTranslator.colTypeToSchemaType("float") == RealT(-1.79e308, 1.79e308))
    assert(SqlServerTranslator.colTypeToSchemaType("real") == RealT(-3.40e38, 3.40e38))
    assert(SqlServerTranslator.colTypeToSchemaType("money") ==
      RealT(-922337203685477.5808, 922337203685477.5807))
    assert(SqlServerTranslator.colTypeToSchemaType("smallmoney") ==
      RealT(-214748.3648, 214748.3647))
    assert(SqlServerTranslator.colTypeToSchemaType("numeric") ==
      SqlServerTranslator.colTypeToSchemaType("decimal"))
    assert(SqlServerTranslator.colTypeToSchemaType("date") == DateT(Set("YYYY-MM-DD")))
    assert(SqlServerTranslator.colTypeToSchemaType("datetime2") ==
      DateT(Set("yyyy-MM-dd HH:mm:ss.SSSSSSS")))
    assert(SqlServerTranslator.colTypeToSchemaType("smalldatetime") ==
      DateT(Set("yyyy-MM-dd HH:mm:00")))
  }

  test("vertica: all ints are 64-bit; binary/char defaults and caps") {
    import VerticaTranslator._
    for (t <- Seq("tinyint", "smallint", "int8", "int", "integer", "bigint"))
      assert(colTypeToSchemaType(t) == IntT(SIGNED_64_INT_MIN, SIGNED_64_INT_MAX), t)
    assert(colTypeToSchemaType("binary") == StrT(1, 1))
    assert(colTypeToSchemaType("binary(1000)") == StrT(1000, 1000))
    assert(colTypeToSchemaType("binary(999999)") == StrT(65000, 65000))
    assert(colTypeToSchemaType("varbinary") == StrT(80, 80))
    assert(colTypeToSchemaType("bytea(1000)") == StrT(1000, 1000))
    assert(colTypeToSchemaType("raw") == StrT(80, 80))
    assert(colTypeToSchemaType("character") == StrT(1, 1))
    assert(colTypeToSchemaType("char(1000)") == StrT(1000, 1000))
    assert(colTypeToSchemaType("character(999999)") == StrT(65000, 65000))
    assert(colTypeToSchemaType("varchar") == StrT(80, 80))
    assert(colTypeToSchemaType("varchar(999999)") == StrT(65000, 65000))
    assert(colTypeToSchemaType("boolean") == BoolT)
  }

  test("vertica dates, reals, interval-as-numeric, reverse mapping") {
    import VerticaTranslator._
    assert(colTypeToSchemaType("date") == DateT(Set("yyyy-MM-dd")))
    assert(colTypeToSchemaType("datetime") ==
      DateT(Set("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ssZ")))
    assert(colTypeToSchemaType("timestamptz") == colTypeToSchemaType("timestamp"))
    // interval aliases to numeric (vertica.clj:220-229)
    assert(colTypeToSchemaType("interval") == colTypeToSchemaType("numeric"))
    assert(colTypeToSchemaType("float8") == colTypeToSchemaType("double"))
    assert(schemaTypeToColType(StrT(1024, 1024)) == "varchar(1024)")
    assert(schemaTypeToColType(StrT(100000, 100000)) == "varchar(65000)")
    assert(schemaTypeToColType(IntT.of(7)) == "int")
    assert(schemaTypeToColType(RealT(1024, 1024)) == "decimal")
    intercept[IllegalArgumentException] {
      schemaTypeToColType(IntT(0, BigInt("18446744073709551615")))
    }
  }

  test("simple dialect (simple_types_test.clj)") {
    import SimpleTranslator._
    assert(colTypeToSchemaType("int") == IntT(SIGNED_64_INT_MIN, SIGNED_64_INT_MAX))
    assert(colTypeToSchemaType("str") == StrT(0, 80))
    assert(colTypeToSchemaType("bool") == BoolT)
    assert(colTypeToSchemaType("real").isInstanceOf[RealT])
    assert(colTypeToSchemaType("date(yyyy-mm-dd)") == DateT(Set("yyyy-mm-dd")))
    assert(colTypeToSchemaType("date(yyyy-MM-dd, yyyy.MM.dd)") ==
      DateT(Set("yyyy-MM-dd", "yyyy.MM.dd")))
    assert(schemaTypeToColType(IntT.of(1)) == "int")
    assert(schemaTypeToColType(StrT(1, 1)) == "string")
  }
}
