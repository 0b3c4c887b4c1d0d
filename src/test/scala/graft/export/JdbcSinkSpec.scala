package graft.export

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** W7: the JDBC option set is built correctly (no live database in this
  * environment — `save()` is exercised only in real deployments). */
class JdbcSinkSpec extends SparkSpec {

  test("options map carries url/table/auth/batching/connection-cap") {
    val opts = JdbcSink.options(JdbcSink.JdbcConfig(
      url = "jdbc:postgresql://db:5432/ckan", table = "datastore_resource",
      user = "ckan", password = "secret"))
    assert(opts("url") == "jdbc:postgresql://db:5432/ckan")
    assert(opts("dbtable") == "datastore_resource")
    assert(opts("user") == "ckan" && opts("password") == "secret")
    assert(opts("batchsize") == "1000")
    assert(opts("numPartitions") == "8")
    assert(opts("driver") == "org.postgresql.Driver")
    assert(opts("truncate") == "false")
  }

  test("overrides: driverless config, truncate-overwrite, extra options") {
    val opts = JdbcSink.options(JdbcSink.JdbcConfig(
      url = "jdbc:h2:mem:t", table = "t", user = "u", password = "p",
      driver = None, mode = SaveMode.Overwrite, truncate = true,
      batchSize = 250, numPartitions = 2,
      extraOptions = Map("stringtype" -> "unspecified")))
    assert(!opts.contains("driver"))
    assert(opts("truncate") == "true" && opts("batchsize") == "250")
    assert(opts("stringtype") == "unspecified")
  }

  test("writer builds a jdbc-format plan without a live connection") {
    val df = spark.range(3).toDF("id")
    val w = JdbcSink.writer(df, JdbcSink.JdbcConfig(
      url = "jdbc:postgresql://db/x", table = "t", user = "u", password = "p"))
    assert(w != null) // construction must not touch the database
  }
}
