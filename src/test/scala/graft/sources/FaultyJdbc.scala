package graft.sources

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

/** Fault-injecting JDBC shim for the claim-CAS ambiguity tests: a
  * registered Driver that delegates `jdbc:glfaulty:...` to Derby
  * through dynamic proxies which fail the gl_commits INSERT (and,
  * in mode 3, its verify SELECT) the way a dropping connection does.
  *
  * Modes: 0 = transparent; 1 = the INSERT EXECUTES but the ack is
  * lost (SQLException after the row lands — the classic in-doubt
  * write); 2 = the INSERT fails before executing; 3 = mode 2 plus
  * every gl_commits SELECT fails too (arbiter unreachable for the
  * verify read, on any connection). */
object FaultyJdbc {

  val url = "jdbc:glfaulty:memory:glcas;create=true"
  val mode = new java.util.concurrent.atomic.AtomicInteger(0)

  private def argv(args: Array[AnyRef]): Array[AnyRef] =
    if (args == null) Array.empty else args

  private def unwrap(t: Throwable): Throwable = t match {
    case e: InvocationTargetException => e.getCause
    case e => e
  }

  private def proxy[T](iface: Class[T], h: InvocationHandler): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), h)
      .asInstanceOf[T]

  private def wrapInsert(real: PreparedStatement): PreparedStatement =
    proxy(classOf[PreparedStatement], (_, m: Method, args: Array[AnyRef]) =>
      if (m.getName == "executeUpdate") mode.get match {
        case 1 =>
          try m.invoke(real, argv(args): _*)
          catch { case t: Throwable => throw unwrap(t) }
          throw new SQLException("simulated lost ack after execute", "08006")
        case 2 | 3 =>
          throw new SQLException("simulated connection drop", "08006")
        case _ =>
          try m.invoke(real, argv(args): _*)
          catch { case t: Throwable => throw unwrap(t) }
      } else {
        try m.invoke(real, argv(args): _*)
        catch { case t: Throwable => throw unwrap(t) }
      })

  private def wrapSelect(real: PreparedStatement): PreparedStatement =
    proxy(classOf[PreparedStatement], (_, m: Method, args: Array[AnyRef]) =>
      if (m.getName == "executeQuery" && mode.get == 3)
        throw new SQLException("simulated arbiter unreachable", "08006")
      else {
        try m.invoke(real, argv(args): _*)
        catch { case t: Throwable => throw unwrap(t) }
      })

  private def wrapConn(real: Connection): Connection =
    proxy(classOf[Connection], (_, m: Method, args: Array[AnyRef]) => {
      val out =
        try m.invoke(real, argv(args): _*)
        catch { case t: Throwable => throw unwrap(t) }
      if (m.getName == "prepareStatement" && args != null
          && args.nonEmpty && args(0).isInstanceOf[String]) {
        val sql = args(0).asInstanceOf[String]
        if (sql.startsWith("INSERT INTO gl_commits"))
          wrapInsert(out.asInstanceOf[PreparedStatement])
        else if (sql.startsWith("SELECT tmp, complete FROM gl_commits"))
          wrapSelect(out.asInstanceOf[PreparedStatement])
        else out
      } else out
    })

  @volatile private var registered = false

  def register(): Unit = synchronized {
    if (registered) return
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    DriverManager.registerDriver(new java.sql.Driver {
      override def connect(u: String,
          info: java.util.Properties): Connection =
        if (!acceptsURL(u)) null
        else wrapConn(DriverManager.getConnection(
          u.replaceFirst("^jdbc:glfaulty:", "jdbc:derby:"), info))
      override def acceptsURL(u: String): Boolean =
        u != null && u.startsWith("jdbc:glfaulty:")
      override def getPropertyInfo(u: String, info: java.util.Properties) =
        Array.empty
      override def getMajorVersion: Int = 1
      override def getMinorVersion: Int = 0
      override def jdbcCompliant(): Boolean = false
      override def getParentLogger =
        throw new java.sql.SQLFeatureNotSupportedException()
    })
    registered = true
  }
}
