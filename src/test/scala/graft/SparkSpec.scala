package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, local[4]). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  // scalastyle:off import
  protected def sqlImplicits: org.apache.spark.sql.SQLImplicits =
    spark.implicits.asInstanceOf[org.apache.spark.sql.SQLImplicits]
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.get("local[4]", 4)
}
