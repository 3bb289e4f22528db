package graft.engine

import org.apache.spark.sql.types._
import graft.nutql.Ast

/** NutQL → Spark type mapping (SURVEY §1.2).
  *
  * Nullability is opt-in via `Nullable(T)` (ClickHouse model, reference
  * ast/item.rs:15-68): fields are non-nullable unless wrapped. 128-bit and
  * unsigned-64 integers map onto DecimalType (documented compromise);
  * unsigned 8/16/32 map to the next-larger signed type so the range is
  * preserved exactly.
  */
object TypeMap {

  /** Spark type for a NutQL type (without the nullability bit). */
  def toSpark(t: Ast.NutType): DataType = t match {
    case Ast.ScalarType(name, params) => scalar(name, params)
    case Ast.ArrayType(e) => ArrayType(toSpark(e), containsNull = isNullable(e))
    case Ast.EnumType(_) => StringType // labels stored; ids kept in metadata
    case Ast.TupleType(items) =>
      StructType(items.zipWithIndex.map { case (it, i) =>
        StructField(s"_${i + 1}", toSpark(it), nullable = isNullable(it))
      })
    case Ast.MapType(k, v) => MapType(toSpark(k), toSpark(v), valueContainsNull = isNullable(v))
    case Ast.DictionaryType(v) => toSpark(v) // storage hint only; parquet dict-encodes
    case Ast.NullableType(inner) => toSpark(inner)
  }

  def isNullable(t: Ast.NutType): Boolean = t match {
    case Ast.NullableType(_) => true
    case Ast.DictionaryType(v) => isNullable(v)
    case _ => false
  }

  private def scalar(name: String, params: Seq[Int]): DataType = name match {
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" => LongType
    case "int128" => DecimalType(38, 0)
    case "uint8" => ShortType
    case "uint16" => IntegerType
    case "uint32" => LongType
    case "uint64" => DecimalType(20, 0)
    case "uint128" => DecimalType(38, 0)
    case "serial32" => IntegerType
    case "serial64" => LongType
    case "serial128" => DecimalType(38, 0)
    case "userial32" => LongType
    case "userial64" => DecimalType(20, 0)
    case "userial128" => DecimalType(38, 0)
    case "decimal32" => DecimalType(9, params.head)
    case "decimal64" => DecimalType(18, params.head)
    case "float32" => FloatType
    case "float64" => DoubleType
    case "boolean" => BooleanType
    case "chars" => StringType // fixed length enforced on insert, not storage
    case "string" => StringType
    case "uuid" => StringType // canonical 36-char form
    case "date" => DateType
    case "datetime" => TimestampType
    case other => throw new IllegalArgumentException(s"unknown scalar type $other")
  }

  /** StructField incl. nullability + comment/default metadata. */
  def toField(c: Ast.ColumnDef): StructField = {
    val mb = new MetadataBuilder()
    c.comment.foreach(mb.putString("comment", _))
    c.dataType match {
      case Ast.EnumType(binds) =>
        mb.putString("enum", binds.map { case (l, i) => s"$l=$i" }.mkString(","))
      case _ => ()
    }
    StructField(c.name, toSpark(c.dataType), nullable = isNullable(c.dataType), mb.build())
  }

  /** Render a NutQL type back to text (DESCRIBE output). */
  def render(t: Ast.NutType): String = t match {
    case Ast.ScalarType(n, Nil) => camel(n)
    case Ast.ScalarType(n, ps) => s"${camel(n)}(${ps.mkString(", ")})"
    case Ast.ArrayType(e) => s"Array(${render(e)})"
    case Ast.EnumType(binds) =>
      s"Enum(${binds.map { case (l, i) => s"'$l' = $i" }.mkString(", ")})"
    case Ast.TupleType(items) => s"Tuple(${items.map(render).mkString(", ")})"
    case Ast.MapType(k, v) => s"Map(${render(k)}, ${render(v)})"
    case Ast.DictionaryType(v) => s"Dictionary(${render(v)})"
    case Ast.NullableType(v) => s"Nullable(${render(v)})"
  }

  private def camel(n: String): String = n match {
    case "int8" => "Int8"; case "int16" => "Int16"; case "int32" => "Int32"
    case "int64" => "Int64"; case "int128" => "Int128"
    case "uint8" => "UInt8"; case "uint16" => "UInt16"; case "uint32" => "UInt32"
    case "uint64" => "UInt64"; case "uint128" => "UInt128"
    case "serial32" => "Serial32"; case "serial64" => "Serial64"; case "serial128" => "Serial128"
    case "userial32" => "USerial32"; case "userial64" => "USerial64"; case "userial128" => "USerial128"
    case "decimal32" => "Decimal32"; case "decimal64" => "Decimal64"
    case "float32" => "Float32"; case "float64" => "Float64"
    case "boolean" => "Boolean"; case "chars" => "Chars"; case "string" => "String"
    case "uuid" => "Uuid"; case "date" => "Date"; case "datetime" => "Datetime"
    case other => other.capitalize
  }
}
