package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) clustering so scans
  * filtering on ANY of the clustered columns prune most files via
  * parquet min/max stats — the open-source equivalent of Delta/Iceberg
  * Z-ORDER table maintenance.
  *
  * `zValue` interleaves the bits of the (rank-normalized) dimensions with
  * a pure expression (codegen-friendly, no UDF); [[zorderBy]] then
  * range-partitions and locally sorts on it, giving every output file a
  * small hyper-rectangle of the key space.
  */
object Layout {

  /** 32-bit Morton code of two non-negative int columns (16 bits each —
    * callers should pre-bucket high-cardinality keys, e.g. `pmod(x, 65536)`). */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)).cast("long"), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)).cast("long"), 2 * i + 1)
    }.reduce(_ + _)

  /** Rewrite `df` clustered by the Z-order of two columns into
    * `nPartitions` partitions (→ output files). */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int): DataFrame = {
    val z = df.withColumn("__z",
      zValue(col(xCol).cast("int"), col(yCol).cast("int")))
    z.repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
