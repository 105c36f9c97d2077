package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional data skipping. A 100 TB table clustered by z-value
  * and split into z-range files gives every file a NARROW min/max range
  * on EACH interleaved dimension simultaneously, so point/range
  * predicates on any of the dimensions prune files — the layout op
  * behind `OPTIMIZE ... ZORDER BY` in public lakehouse engines (the
  * published Morton-curve data-skipping construction, not copied code).
  *
  * The z-value is a pure narrow expression (literal shifts and masks,
  * whole-stage codegen): computing it costs one map pass, and the actual
  * clustering is then `repartitionByRange(zval)` + sorted write — shuffle
  * is the range exchange only, identical in shape to any global sort.
  * Bucket stats (per z-range bucket: row count + per-dimension min/max)
  * are a plain map-side-combined aggregation — they are the file-skipping
  * index a writer would persist in the table manifest.
  */
object Layout {

  /** Morton/Z interleave of the low `bits` bits of two non-negative
    * columns: bit j of `a` lands at z-bit 2j, bit j of `b` at 2j+1.
    * Built from literal-shift primitives — fully codegen, no UDF. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { j =>
      shiftleft(shiftright(al, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(bl, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** The identical computation as DuckDB SQL over column expressions
    * `a`/`b` (both already BIGINT), for oracle replay. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { j =>
      s"((($a >> $j) & 1) * ${1L << (2 * j)} + " +
        s"(($b >> $j) & 1) * ${1L << (2 * j + 1)})"
    }.mkString("(", " + ", ")")
}
