package org.apache.spark.sql.connector.catalog

import org.apache.spark.sql.types.StructType

/** In-package shim (the GraftParquetIO pattern): Spark's
  * [[CatalogV2Util.v2ColumnsToStructType]] — the exact conversion the
  * interface-default `TableCatalog.createTable(ident, columns, ...)`
  * applies, including default-value and comment metadata — is
  * `private[sql]`; a catalog overriding the Column[] door to read
  * generation expressions must produce the SAME StructType Spark
  * would have handed the StructType door. */
object GraftV2Columns {
  def toStructType(columns: Array[Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(columns)
}
