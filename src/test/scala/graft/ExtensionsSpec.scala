package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions installs the custom functions session-wide. */
class ExtensionsSpec extends AnyFunSuite {

  test("fdot/minhash128 resolve via SparkSessionExtensions in plain SQL") {
    // force a NEW session (extensions bind at session build; getOrCreate
    // would return the suite-shared one) — reuses the same SparkContext
    val prev = TestSpark.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = s.sql(
        """SELECT fdot(array(cast(1.0 as float), cast(2.0 as float)),
          |            array(cast(3.0 as float), cast(4.0 as float))) AS d"""
          .stripMargin).head.getDouble(0)
      assert(dot == 11.0)
      val mh = s.sql(
        """SELECT minhash128(h) AS mh
          |FROM (SELECT xxhash64(x) AS h FROM VALUES ('a'), ('b') AS t(x))"""
          .stripMargin).head.getSeq[Long](0)
      assert(mh.length == 128)
      val sigs = s.sql(
        """SELECT lsh_sigs(array_repeat(cast(0.5 as float), 64)) AS sigs""")
        .head.getSeq[Int](0)
      assert(sigs.length == graft.queries.AnnLsh.tables)
      assert(sigs.forall(v => v >= 0 && v < (1 << graft.queries.AnnLsh.bits)))
    } finally {
      // restore the shared session; don't stop the JVM-wide SparkContext
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
