package graft

import graft.sources._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcType
import org.apache.spark.sql.types._

/** Derby-hosted Java stored procedure target: Derby calls the static
  * forwarder `graft.DerbyProcs.topRegions` and hands back the opened
  * cursor as the procedure's dynamic result set. */
object DerbyProcs {
  def topRegions(maxKey: Int, data: Array[java.sql.ResultSet]): Unit = {
    val conn = java.sql.DriverManager.getConnection("jdbc:default:connection")
    val ps = conn.prepareStatement(
      """SELECT "r_regionkey", "r_name" FROM dlg_region WHERE "r_regionkey" <= ? ORDER BY "r_regionkey"""")
    ps.setInt(1, maxKey)
    data(0) = ps.executeQuery()
  }
}

/** eel dialect + stored-proc surface on embedded Derby (reference:
  * eel-core .../component/jdbc/dialect/GenericJdbcDialect.scala,
  * JdbcStoredProcSource.scala). The dialect is registered under a URL
  * prefix unique to this suite's in-memory DB so the global
  * JdbcDialects registry can't leak into other suites. */
class JdbcDialectSpec extends SparkSpec {

  System.setProperty("derby.system.home", "/tmp/graft_derby")
  private val url = "jdbc:derby:memory:dialectdb;create=true"

  test("registered dialect overrides Catalyst->JDBC DDL and JDBC->Catalyst read types") {
    val d = GraftJdbcDialects.register("jdbc:derby:memory:dialectdb",
      write = Map[DataType, JdbcType](
        StringType -> JdbcType("VARCHAR(123)", java.sql.Types.VARCHAR)),
      read = Map(java.sql.Types.DOUBLE -> DecimalType(10, 2)))
    try {
      import spark.implicits._
      JdbcSink(url, "dlg_typed").write(Seq((1L, "a", 2.5)).toDF("k", "s", "v"))
      // write side: the string column was created as VARCHAR(123)
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val cols = conn.getMetaData.getColumns(null, null, "DLG_TYPED", "s")
        assert(cols.next())
        assert(cols.getString("TYPE_NAME") == "VARCHAR" && cols.getInt("COLUMN_SIZE") == 123)
      } finally conn.close()
      // read side: Derby DOUBLE surfaces as decimal(10,2) per the dialect
      val back = JdbcSource(url, "SELECT * FROM dlg_typed").read(spark)
      assert(back.schema("v").dataType == DecimalType(10, 2))
      assert(back.head().getDecimal(back.schema.fieldIndex("v")).doubleValue() == 2.5)
    } finally GraftJdbcDialects.unregister(d)
  }

  test("JdbcStoredProcSource executes {call proc(?)} and relates its result set") {
    JdbcSink(url, "dlg_region").write(
      Tables.table(spark, sfDir, "region").select("r_regionkey", "r_name"))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE PROCEDURE TOP_REGIONS(IN MAXKEY INT) PARAMETER STYLE JAVA " +
          "LANGUAGE JAVA READS SQL DATA DYNAMIC RESULT SETS 1 " +
          "EXTERNAL NAME 'graft.DerbyProcs.topRegions'")
    } finally conn.close()
    val df = JdbcStoredProcSource(url, "{call TOP_REGIONS(?)}", Seq(Int.box(2))).read(spark)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("r_regionkey", "r_name"))
    assert(df.count() == 3) // region keys 0,1,2
    assert(df.agg(max(col("r_regionkey").cast("long"))).head().getLong(0) == 2L)
  }
}
