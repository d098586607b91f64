package org.apache.spark.sql.execution.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.RowToColumnConverter
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Narrow bridge to Spark's `private[execution]` row→columnar converter
  * (the one `RowToColumnarExec` uses), for the slice reader's straddling
  *-batch copy — re-implementing the full nested-type append logic would
  * duplicate code Spark already maintains. Bridge usage only: no private
  * state is touched, just the one public-within-package constructor. */
object RowToColumnarBridge {
  def converter(schema: StructType): (InternalRow, Array[WritableColumnVector]) => Unit = {
    val c = new RowToColumnConverter(schema)
    (row, vecs) => c.convert(row, vecs)
  }
}
