package graft

import org.apache.spark.sql.types._

/**
 * Output-type contract for the whole oracle surface (DESIGN.md §3, round-4
 * lesson): the driver's comparator hashes TYPED data, and DECIMAL columns hash
 * differently across engines even when every value is bit-identical — both r3
 * hash failures were exactly this, with `tools/check_oracle.py`'s value-level
 * compare blind to them. The checker now enforces the ban on the DuckDB side;
 * this spec enforces it on the Spark side for every declared query, so a new
 * query with a decimal output fails `sbt test` before it ever reaches a drive.
 * DECIMAL arithmetic INSIDE a query is fine (q_agg_decimal exercises it) —
 * only the output encoding is constrained: scaled BIGINT or pinned strings.
 */
class SchemaContractSpec extends GraftSuite {

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case _ => false
  }

  test("no oracle query emits a DECIMAL output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfTiny).schema.fields.collect {
          case f if hasDecimal(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"decimal output columns are driver-hash-unsafe; emit scaled BIGINT or " +
        s"pinned-scale strings instead:\n  ${offenders.mkString("\n  ")}")
  }

  test("every oracle entry names a declared query and vice-versa gaps are known") {
    // A oracleSql key without a queries entry is dead SQL the driver never
    // compares; a queries entry without oracleSql is a deliberate rows-only
    // check (none today). Pin both sets so drift is loud.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"query without oracle SQL (rows-only): ${(q -- o).toSeq.sorted}")
  }
}
