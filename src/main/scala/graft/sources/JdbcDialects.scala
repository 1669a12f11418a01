package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** eel's JDBC dialect surface (reference: eel-core .../component/jdbc/
  * dialect/{JdbcDialect,GenericJdbcDialect}.scala:1-108), Spark-first.
  *
  * eel hand-rolls both directions of the type mapping (`toJdbcType` for
  * DDL/insert, `fromJdbcType` for ResultSetMetaData→schema) because its
  * engine owns the JDBC I/O loop. Spark already owns that loop and has
  * the same two hooks on `org.apache.spark.sql.jdbc.JdbcDialect`
  * (`getJDBCType`, `getCatalystType`) — so a graft dialect IS a Spark
  * dialect, registered with `JdbcDialects.registerDialect`, and every
  * JdbcSource/JdbcSink in the session picks it up with no per-source
  * plumbing. */
object GraftJdbcDialects {

  /** A dialect scoped to a URL prefix, carrying eel's
    * GenericJdbcDialect type choices where Spark's defaults differ:
    * strings map to TEXT (eel: `StringType => "text"`) rather than
    * Spark's CLOB, and boolean to BOOLEAN. Override maps extend it
    * per-database without a new class. */
  final class PrefixDialect(prefix: String,
                            write: Map[DataType, JdbcType] = Map.empty,
                            read: Map[Int, DataType] = Map.empty)
    extends JdbcDialect {

    override def canHandle(url: String): Boolean = url.startsWith(prefix)

    override def getJDBCType(dt: DataType): Option[JdbcType] =
      write.get(dt).orElse(dt match {
        case StringType => Some(JdbcType("TEXT", java.sql.Types.VARCHAR))
        case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
        case _ => None // Spark's JdbcUtils default mapping
      })

    override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                                 md: MetadataBuilder): Option[DataType] =
      read.get(sqlType)
  }

  /** Register a dialect for a URL prefix; returns it for unregister. */
  def register(prefix: String,
               write: Map[DataType, JdbcType] = Map.empty,
               read: Map[Int, DataType] = Map.empty): JdbcDialect = {
    val d = new PrefixDialect(prefix, write, read)
    JdbcDialects.registerDialect(d)
    d
  }

  def unregister(d: JdbcDialect): Unit = JdbcDialects.unregisterDialect(d)
}

/** eel JdbcStoredProcSource (reference: eel-core .../component/jdbc/
  * JdbcStoredProcSource.scala:1-79): execute `{call proc(?,...)}` and
  * expose its result set as a relation.
  *
  * A stored-procedure result is a SINGLE cursor on a single connection
  * — there is nothing to partition (eel also reads it as one part), so
  * this source materializes the cursor once and parallelizes the rows.
  * Procs are control-plane-sized by nature; for bulk data use
  * [[JdbcSource]] with a partition strategy. Schema is taken from the
  * ResultSetMetaData via the session's registered dialect (the same
  * mapping eel's `fromJdbcType` hand-rolls). */
final case class JdbcStoredProcSource(url: String,
                                      call: String,
                                      params: Seq[Any] = Nil,
                                      fetchSize: Int = 100) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val stmt = conn.prepareCall(call)
      try {
        stmt.setFetchSize(fetchSize)
        params.zipWithIndex.foreach { case (p, i) => stmt.setObject(i + 1, p) }
        stmt.execute()
        val rs = stmt.getResultSet
        val dialect = JdbcDialects.get(url)
        // schema from ResultSetMetaData + row conversion via Spark's own
        // JDBC machinery — the exact mapping eel's fromJdbcType hand-rolls
        val schema = JdbcUtils.getSchema(conn, rs, dialect)
        val rows: java.util.List[Row] = JdbcUtils.resultSetToRows(rs, schema, dialect).toSeq.asJava
        spark.createDataFrame(rows, schema)
      } finally stmt.close()
    } finally conn.close()
  }
}
