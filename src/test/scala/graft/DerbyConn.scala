package graft

import java.sql.{Connection, DriverManager}

/** Connection factories that close over only the URL string — safe to ship
  * into executor closures (a spec-instance-capturing lambda is not). */
object DerbyConn {
  def factory(url: String): () => Connection = {
    val u = url
    () => DriverManager.getConnection(u)
  }
}
