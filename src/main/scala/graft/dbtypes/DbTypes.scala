package graft.dbtypes

import graft.types._

/** Declared-schema side door: parse SQL column-definition strings of four
  * dialects into stat-bearing SchemaTypes whose min/max are the column's
  * CAPACITY bounds, enabling observed-vs-declared truncation checks via
  * [[Wider]] (reference db_types package, README.md:86-104).
  */
trait DbTypeTranslator {
  /** e.g. "int(10) unsigned" -> IntT(0, 4294967295) */
  def colTypeToSchemaType(colDef: String): SchemaType
  /** narrowest fitting column DDL for an observed type */
  def schemaTypeToColType(t: SchemaType): String
}

/** Column-def string munging (reference db_types/common.clj:140-163). */
object ColDef {
  final case class Parsed(typeName: String, length: Option[String], unsigned: Boolean)

  def parse(colDef: String): Parsed = {
    val typeName = colDef.split("[^\\w]+")(0)
    val length = "\\(([^)]+)\\)".r.findFirstMatchIn(colDef).map(_.group(1))
    val parts = colDef.toLowerCase.trim.split("\\s+")
    Parsed(typeName, length, parts.length == 2 && parts(1) == "unsigned")
  }

  def lengthAsInt(p: Parsed): Option[Long] = p.length.flatMap(_.toLongOption)

  /** coalesce-with-limit (common.clj:123-126). */
  def coalesceWithLimit(value: Option[Long], default: Long, max: Long): Long =
    value.fold(default)(v => math.min(v, max))
}

/** Truncation-risk predicate: "would a value of observed type L overflow a
  * column of declared type R?" — port of the reference's 25-case
  * multimethod (db_types/common.clj:20-115), including its quirky
  * digit-count comparisons (numeric-vs-str compares the numeric max value
  * against the CHARACTER COUNT of the str length, common.clj:10-13).
  *
  * Deviations from the reference, documented: the reference's
  * [:date :str] and [:date :date] methods dereference the wrong operand
  * (they would throw / always return false, common.clj:102-110, untested
  * there); we implement the evident intent.
  */
object Wider {

  private def numStr(t: SchemaType): String = t match {
    case IntT(_, mx)  => mx.toString
    case RealT(_, mx) => mx.toString
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  /** Digit count of the numeric max vs the string capacity. NB the
    * reference's IMPLEMENTATION (common.clj:10-13) compares the raw
    * numeric max against the digit count of the str length — which
    * contradicts its own test suite (common_db_types_test.clj:23-36,
    * e.g. Int(99) vs Str(2,2) must NOT be wider). We implement what the
    * tests pin.
    */
  private def numericWiderThanStr(num: SchemaType, str: StrT): Boolean =
    numStr(num).length > str.maxLen

  private def strWiderThanNumeric(str: StrT, num: SchemaType): Boolean =
    str.maxLen > numStr(num).length

  private def maxFmtLen(d: DateT): Int = d.formats.map(_.length).max

  def wider(l: SchemaType, r: SchemaType): Boolean = (l, r) match {
    case (BoolT, _) => false
    case (_: IntT, BoolT) => true
    case (_: IntT, _: DateT) => false
    case (i: IntT, s: StrT) => numericWiderThanStr(i, s)
    case (_: RealT, BoolT) => true
    case (rl: RealT, s: StrT) => numericWiderThanStr(rl, s)
    case (_: RealT, _: DateT) => true
    case (s: StrT, BoolT) => s.maxLen > 1
    case (s: StrT, i: IntT) => strWiderThanNumeric(s, i)
    case (s: StrT, rr: RealT) => strWiderThanNumeric(s, rr)
    case (s: StrT, d: DateT) => s.maxLen > maxFmtLen(d)
    case (_: DateT, BoolT) => true
    case (_: DateT, _: IntT) => true
    case (_: DateT, _: RealT) => true
    case (d: DateT, s: StrT) => maxFmtLen(d) > s.maxLen
    case (d1: DateT, d2: DateT) => maxFmtLen(d1) > maxFmtLen(d2)
    // default: compare max values (common.clj:114-115)
    case (IntT(_, a), IntT(_, b)) => a > b
    case (IntT(_, a), RealT(_, b)) => BigDecimal(a) > BigDecimal(b)
    case (RealT(_, a), IntT(_, b)) => BigDecimal(a) > BigDecimal(b)
    case (RealT(_, a), RealT(_, b)) => a > b
    case (StrT(_, a), StrT(_, b)) => a > b
    case other =>
      throw new IllegalArgumentException(s"wider? undefined for $other")
  }

  def eqWidthOrNarrower(l: SchemaType, r: SchemaType): Boolean = !wider(l, r)
}

/** MySQL 5.1 dialect (reference db_types/mysql.clj). */
object MySqlTranslator extends DbTypeTranslator {
  private val kindOf: Map[String, String] = Map(
    "tinyint" -> "int", "smallint" -> "int", "mediumint" -> "int",
    "int" -> "int", "integer" -> "int", "bigint" -> "int", "bit" -> "int",
    "decimal" -> "real", "numeric" -> "real", "float" -> "real", "double" -> "real",
    "char" -> "str", "varchar" -> "str", "blob" -> "str", "mediumblob" -> "str",
    "longblob" -> "str", "text" -> "str", "mediumtext" -> "str",
    "longtext" -> "str", "enum" -> "str", "set" -> "str",
    "boolean" -> "bool", "bool" -> "bool",
    "datetime" -> "date", "date" -> "date", "timestamp" -> "date")

  private val intBounds: Map[String, (BigInt, BigInt)] = Map(
    "bit" -> (BigInt(1), BigInt(64)),
    "tinyint" -> (BigInt(-128), BigInt(127)),
    "tinyint_unsigned" -> (BigInt(0), BigInt(255)),
    "smallint" -> (BigInt(-32768), BigInt(32767)),
    "smallint_unsigned" -> (BigInt(0), BigInt(65535)),
    "mediumint" -> (BigInt(-8388608), BigInt(8388607)),
    "mediumint_unsigned" -> (BigInt(0), BigInt(16777215)),
    "int" -> (BigInt(-2147483648L), BigInt(2147483647L)),
    "int_unsigned" -> (BigInt(0), BigInt(4294967295L)),
    "bigint" -> (BigInt(Long.MinValue), BigInt(Long.MaxValue)),
    "bigint_unsigned" -> (BigInt(0), BigInt("18446744073709551615")))

  val DECIMAL_MAX: Double = 1e35
  val STR_LENGTH_MAX: Long = 65535L
  val MEDIUMTEXT_LENGTH_MAX: Long = (1L << 24) - 1
  val LONGTEXT_LENGTH_MAX: Long = (1L << 32) - 1

  private val implicitStrMax: Map[String, Long] = Map(
    "varchar" -> STR_LENGTH_MAX, "enum" -> STR_LENGTH_MAX,
    "set" -> STR_LENGTH_MAX, "blob" -> STR_LENGTH_MAX,
    "text" -> STR_LENGTH_MAX,
    "mediumtext" -> MEDIUMTEXT_LENGTH_MAX, "longtext" -> LONGTEXT_LENGTH_MAX,
    "mediumblob" -> MEDIUMTEXT_LENGTH_MAX, "longblob" -> LONGTEXT_LENGTH_MAX)

  def colTypeToSchemaType(colDef: String): SchemaType = {
    val p = ColDef.parse(colDef)
    val key = if (p.unsigned) s"${p.typeName}_unsigned" else p.typeName
    kindOf.getOrElse(p.typeName,
      throw new IllegalArgumentException(s"unknown mysql type: $colDef")) match {
      case "int" =>
        val (mn, mx) = intBounds(key); IntT(mn, mx)
      case "real" => RealT(-DECIMAL_MAX, DECIMAL_MAX)
      case "str" =>
        val mx = ColDef.lengthAsInt(p).getOrElse(
          implicitStrMax.getOrElse(p.typeName,
            throw new IllegalArgumentException(
              s"no implicit length for mysql ${p.typeName}")))
        StrT(0, mx)
      case "bool" => BoolT
      case "date" => p.typeName match {
        case "date" => DateT(Set("yyyy-MM-dd"))
        case _      => DateT(Set("yyyy-MM-dd HH:mm:ss"))
      }
    }
  }

  def schemaTypeToColType(t: SchemaType): String = t match {
    case IntT(_, mx) =>
      if (mx > BigInt(2147483647L)) "bigint" else "int"
    case StrT(_, mx) =>
      if (mx <= STR_LENGTH_MAX) s"varchar($mx)"
      else if (mx <= MEDIUMTEXT_LENGTH_MAX) "mediumtext"
      else if (mx <= LONGTEXT_LENGTH_MAX) "longtext"
      else throw new IllegalArgumentException(s"unsupported string length $mx")
    case BoolT => "bool"
    case _: RealT => "decimal"
    case _: DateT => "timestamp"
    case other => throw new IllegalArgumentException(s"no mysql type for $other")
  }
}

/** SQL Server (T-SQL) dialect (reference db_types/sql_server.clj). */
object SqlServerTranslator extends DbTypeTranslator {
  private val kindOf: Map[String, String] = Map(
    "tinyint" -> "int", "smallint" -> "int", "int" -> "int", "bigint" -> "int",
    "rowversion" -> "int", "timestamp" -> "int",
    "real" -> "real", "float" -> "real", "decimal" -> "real",
    "numeric" -> "real", "money" -> "real", "smallmoney" -> "real",
    "date" -> "date", "datetime" -> "date", "datetime2" -> "date",
    "smalldatetime" -> "date", "datetimeoffset" -> "date", "time" -> "date",
    "char" -> "str", "varchar" -> "str", "nchar" -> "str", "nvarchar" -> "str",
    "binary" -> "str", "varbinary" -> "str", "text" -> "str", "ntext" -> "str",
    "image" -> "str", "uniqueidentifier" -> "str", "xml" -> "str")

  private val intBounds: Map[String, (BigInt, BigInt)] = Map(
    "tinyint" -> (BigInt(0), BigInt(255)),
    "smallint" -> (-BigInt(2).pow(15), BigInt(2).pow(15) - 1),
    "int" -> (-BigInt(2).pow(31), BigInt(2).pow(31) - 1),
    "bigint" -> (-BigInt(2).pow(63), BigInt(2).pow(63) - 1))

  private val intSynonyms = Map("rowversion" -> "int", "timestamp" -> "int")
  private val strSynonyms = Map(
    "character" -> "varchar", "char" -> "varchar", "nchar" -> "varchar",
    "nvarchar" -> "varchar", "binary" -> "varchar", "varbinary" -> "varchar",
    "uniqueidentifier" -> "varchar", "image" -> "text", "xml" -> "text")
  private val realSynonyms = Map("numeric" -> "decimal")

  val MAX_31_BIT: Long = (1L << 31) - 1
  val MAX_30_BIT: Long = (1L << 30) - 1

  private val strDefaults: Map[String, (Long, Long, Long)] = Map(
    // (default, min, max)
    "varchar" -> (1L, 1L, 8000L),
    "text" -> (MAX_31_BIT, MAX_31_BIT, MAX_31_BIT),
    "ntext" -> (MAX_30_BIT, MAX_30_BIT, MAX_30_BIT))

  private val realBounds: Map[String, (Double, Double)] = Map(
    "float" -> (-1.79e308, 1.79e308),
    "real" -> (-3.40e38, 3.40e38),
    "decimal" -> (-(math.pow(10, 38) - 1), math.pow(10, 38) - 1),
    "money" -> (-922337203685477.5808, 922337203685477.5807),
    "smallmoney" -> (-214748.3648, 214748.3647))

  private val dateFormats: Map[String, Set[String]] = Map(
    "date" -> Set("YYYY-MM-DD"),
    "datetime" -> Set("yyyy-MM-dd HH:mm:ss"),
    "datetime2" -> Set("yyyy-MM-dd HH:mm:ss.SSSSSSS"),
    "datetimeoffset" -> Set("yyyy-MM-dd HH:mm:ss.SSSSSSSXXX"),
    "smalldatetime" -> Set("yyyy-MM-dd HH:mm:00"),
    "time" -> Set("HH:mm:ss.SSSSSSS"))

  def colTypeToSchemaType(colDef: String): SchemaType = {
    val p = ColDef.parse(colDef)
    kindOf.getOrElse(p.typeName,
      throw new IllegalArgumentException(s"unknown sqlserver type: $colDef")) match {
      case "int" =>
        val canonical = intSynonyms.getOrElse(p.typeName, p.typeName)
        val (mn, mx) = intBounds(canonical); IntT(mn, mx)
      case "real" =>
        val canonical = realSynonyms.getOrElse(p.typeName, p.typeName)
        val (mn, mx) = realBounds(canonical); RealT(mn, mx)
      case "date" => DateT(dateFormats(p.typeName))
      case "str" =>
        val canonical = strSynonyms.getOrElse(p.typeName, p.typeName)
        val (default, mn, mx) = strDefaults(canonical)
        // no parameter -> the type's own max (sql_server.clj:150-161: nil
        // returns the default min-max map whole); "max" -> 2^31-1; n ->
        // min(n, max)
        val upper = p.length match {
          case Some("max") if canonical == "varchar" => MAX_31_BIT
          case None => mx
          case some => ColDef.coalesceWithLimit(some.flatMap(_.toLongOption), default, mx)
        }
        StrT(mn, upper)
    }
  }

  def schemaTypeToColType(t: SchemaType): String =
    throw new UnsupportedOperationException(
      "reference defines no reverse mapping for SQL Server (sql_server.clj:295-300)")
}

/** Vertica 6 dialect (reference db_types/vertica.clj). All integer types
  * are signed 64-bit; NUMERIC's 1024-digit bounds are clamped to IEEE
  * double max here (documented deviation — our RealT carries doubles).
  */
object VerticaTranslator extends DbTypeTranslator {
  val SIGNED_64_INT_MAX: BigInt = BigInt(2).pow(63) - 1
  val SIGNED_64_INT_MIN: BigInt = -BigInt(2).pow(63) + 1
  val DEFAULT_BINARY_LENGTH = 1L
  val DEFAULT_VARBINARY_LENGTH = 80L
  val MAX_BINARY_LENGTH = 65000L
  val DEFAULT_CHAR_LENGTH = 1L
  val DEFAULT_VARCHAR_LENGTH = 80L
  val MAX_CHAR_LENGTH = 65000L

  private val kindOf: Map[String, String] = Map(
    "tinyint" -> "int", "smallint" -> "int", "int8" -> "int", "int" -> "int",
    "integer" -> "int", "bigint" -> "int", "boolean" -> "bool",
    "binary" -> "binary", "varbinary" -> "binary", "bytea" -> "binary",
    "raw" -> "binary", "character" -> "str", "char" -> "str",
    "varchar" -> "str", "date" -> "date", "datetime" -> "date",
    "timestamp" -> "date", "timestamptz" -> "date", "interval" -> "real",
    "smalldatetime" -> "date", "double" -> "real", "float" -> "real",
    "float8" -> "real", "real" -> "real", "number" -> "real",
    "money" -> "real", "decimal" -> "real", "numeric" -> "real")

  private val binSynonyms = Map("bytea" -> "varbinary", "raw" -> "varbinary")
  private val strSynonyms = Map("character" -> "char")
  private val dateSynonyms = Map(
    "datetime" -> "timestamp", "smalldatetime" -> "timestamp",
    "timestamptz" -> "timestamp")
  private val realSynonyms = Map(
    "float" -> "double", "float8" -> "double", "real" -> "double",
    "decimal" -> "numeric", "number" -> "numeric", "money" -> "numeric",
    "interval" -> "numeric", "numeric" -> "numeric")

  private val dateFormats: Map[String, Set[String]] = Map(
    "date" -> Set("yyyy-MM-dd"),
    "timestamp" -> Set("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ssZ"),
    "time" -> Set("HH:mm:ss", "HH:mm:ssZ"))

  def colTypeToSchemaType(colDef: String): SchemaType = {
    val p = ColDef.parse(colDef)
    kindOf.getOrElse(p.typeName,
      throw new IllegalArgumentException(s"unknown vertica type: $colDef")) match {
      case "int"  => IntT(SIGNED_64_INT_MIN, SIGNED_64_INT_MAX)
      case "bool" => BoolT
      case "binary" =>
        val canonical = binSynonyms.getOrElse(p.typeName, p.typeName)
        val default =
          if (canonical == "binary") DEFAULT_BINARY_LENGTH else DEFAULT_VARBINARY_LENGTH
        val len = ColDef.coalesceWithLimit(ColDef.lengthAsInt(p), default, MAX_BINARY_LENGTH)
        StrT(len, len)
      case "str" =>
        val canonical = strSynonyms.getOrElse(p.typeName, p.typeName)
        val default =
          if (canonical == "char") DEFAULT_CHAR_LENGTH else DEFAULT_VARCHAR_LENGTH
        val len = ColDef.coalesceWithLimit(ColDef.lengthAsInt(p), default, MAX_CHAR_LENGTH)
        StrT(len, len)
      case "date" =>
        val canonical = dateSynonyms.getOrElse(p.typeName, p.typeName)
        DateT(dateFormats(canonical))
      case "real" =>
        realSynonyms.getOrElse(p.typeName, p.typeName) match {
          // reference vertica.clj:243-244 swaps the MIN/MAX constant names;
          // the stored values are (Double.MAX_VALUE, Double.MIN_VALUE) —
          // preserved bug-for-bug
          case "double"  => RealT(Double.MaxValue, Double.MinPositiveValue)
          case "numeric" => RealT(-Double.MaxValue, Double.MaxValue) // 1024-nines clamped
        }
    }
  }

  def schemaTypeToColType(t: SchemaType): String = t match {
    case IntT(_, mx) =>
      if (mx <= SIGNED_64_INT_MAX) "int"
      else throw new IllegalArgumentException(
        s"integer range out of bounds ($mx) for Vertica Int (max: $SIGNED_64_INT_MAX)")
    case StrT(_, mx) => s"varchar(${math.min(mx, MAX_CHAR_LENGTH)})"
    case BoolT => "bool"
    case _: RealT => "decimal"
    case _: DateT => "date" // vertica.clj:313-316 (condition is vacuous there)
    case other => throw new IllegalArgumentException(s"no vertica type for $other")
  }
}

/** Minimal dialect (reference db_types/simple.clj); its date "length" is a
  * comma-separated format list.
  */
object SimpleTranslator extends DbTypeTranslator {
  val SIGNED_64_INT_MAX: BigInt = BigInt(2).pow(63) - 1
  val SIGNED_64_INT_MIN: BigInt = -BigInt(2).pow(63) + 1
  val MAX_STR_LENGTH = 65535L
  val DEFAULT_STR_LENGTH = 80L

  def colTypeToSchemaType(colDef: String): SchemaType = {
    val p = ColDef.parse(colDef)
    p.typeName match {
      case "int" => IntT(SIGNED_64_INT_MIN, SIGNED_64_INT_MAX)
      case "str" | "varchar" =>
        StrT(0, ColDef.coalesceWithLimit(ColDef.lengthAsInt(p),
          DEFAULT_STR_LENGTH, MAX_STR_LENGTH))
      case "date" =>
        DateT(p.length.fold(Set.empty[String])(
          _.replaceAll("\\s+", "").split(",").toSet))
      case "real" => RealT(Double.MaxValue, Double.MinPositiveValue) // bug-compat swap
      case "bool" => BoolT
      case other =>
        throw new IllegalArgumentException(s"unknown simple type: $other")
    }
  }

  def schemaTypeToColType(t: SchemaType): String = t match {
    case _: IntT  => "int"
    case _: StrT  => "string"
    case _: DateT => "date"
    case _: RealT => "real"
    case BoolT    => "bool"
    case other => throw new IllegalArgumentException(s"no simple type for $other")
  }
}
