package graft

import org.apache.spark.sql.types._

/** Catalog-wide output-dtype lint (r11 verdict №2): no declared query
  * may emit a DECIMAL column. Spark writes decimal(38,0) to parquet as
  * a Decimal object while DuckDB materializes its HUGEINT through
  * float64, so two EQUAL values hash differently under the driver's
  * exact encoding — this is precisely how q262_cuped and
  * q284_shapley_r2 shipped locally-green in round 11 and failed the
  * driver (the r1–r3 signed-zero gap's sibling, one layer up the type
  * lattice). Decimals remain fine — necessary — as INTERMEDIATES; the
  * lint only polices the output boundary, where every exact-integer
  * readout must land BIGINT (cast, or `div` which returns LongType)
  * and every ratio must land DOUBLE.
  *
  * The whitelist is the portable set `tools/check.py` canonicalizes
  * loss-free across both engines: integer widths unify via int(),
  * float32 widens to float64, timestamps render via isoformat, arrays
  * element-wise. Anything outside it is a new portability risk and
  * must be adjudicated here EXPLICITLY before it ships.
  */
class OutputSchemaLintSpec extends SparkSpec {

  private def ok(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case DoubleType | FloatType                        => true
    case StringType | BooleanType                      => true
    case DateType | TimestampType | TimestampNTZType   => true
    case BinaryType                                    => true
    case ArrayType(et, _)                              => ok(et)
    case StructType(fs)                                => fs.forall(f => ok(f.dataType))
    case _                                             => false // DecimalType and friends
  }

  test("no declared query emits a decimal (or otherwise non-portable) column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sf).schema
        schema.fields.collect {
          case f if !ok(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      s"\nDecimal/non-portable OUTPUT columns (cast to BIGINT/DOUBLE at " +
        s"the select boundary; keep decimal only for intermediates):\n  " +
        offenders.mkString("\n  "))
  }
}
