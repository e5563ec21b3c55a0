package graft.sources

import java.sql.Types
import graft.config.{ColumnMeta, TypeClass}

/** Target-schema reflection (SURVEY S9): the reference binds live table
  * metadata via SQLAlchemy `reflect=True` (`ParquetFileInsertion.py:20`)
  * and consults `c.type.python_type` / `c.nullable` to pick per-type
  * cleanups. Here the same information comes from JDBC
  * `DatabaseMetaData.getColumns` — portable across SQL Server/Derby/
  * Postgres — and lands directly in the [[ColumnMeta]] model that drives
  * the transform pipeline, so a config can be bootstrapped from a live
  * database exactly like the reference's
  * `test_create_table_under_test_by_name.py` generator.
  */
object TargetSchema {

  /** Map a JDBC type to the cleanup-driving type class. Unbounded
    * char/clob types are NVARCHAR(MAX)-like → TextMax (T6); int-likes →
    * T2/T3; timestamp-likes → T5. */
  def typeClassOf(jdbcType: Int, columnSize: Int): TypeClass = jdbcType match {
    case Types.TINYINT | Types.SMALLINT | Types.INTEGER | Types.BIGINT =>
      TypeClass.IntLike
    case Types.TIMESTAMP | Types.TIMESTAMP_WITH_TIMEZONE | Types.DATE =>
      TypeClass.DateTime
    case Types.CLOB | Types.NCLOB | Types.LONGVARCHAR | Types.LONGNVARCHAR =>
      TypeClass.TextMax
    case Types.VARCHAR | Types.NVARCHAR if columnSize >= 1073741823 =>
      TypeClass.TextMax // SQL Server NVARCHAR(MAX) reports 2^30-1
    case _ => TypeClass.Str
  }

  /** Reflect one table's ordered column metadata. */
  def reflect(url: String, props: java.util.Properties,
      schema: String, table: String): Seq[ColumnMeta] = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = c.getMetaData
      val rs = md.getColumns(null, schema, table, null)
      val buf = scala.collection.mutable.ArrayBuffer[(Int, ColumnMeta)]()
      while (rs.next()) {
        val pos = rs.getInt("ORDINAL_POSITION")
        val name = rs.getString("COLUMN_NAME")
        val jdbcType = rs.getInt("DATA_TYPE")
        val size = rs.getInt("COLUMN_SIZE")
        val nullable =
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls
        buf += pos -> ColumnMeta(name, typeClassOf(jdbcType, size), nullable)
      }
      rs.close()
      buf.sortBy(_._1).map(_._2).toSeq
    } finally c.close()
  }
}
