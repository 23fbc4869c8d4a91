package object graft {
  /** DDL string → DataType (from_json wants a DataType in Scala). */
  def ddl(s: String): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromDDL(s)
}
