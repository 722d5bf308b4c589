package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

object SparkTestSession {
  /** Not a lazy val: the r18 driver-regime `sbt test` run had the shared
    * SparkContext die between suites (environmental — a stall-storming
    * host; no test stops it) and every later suite failed at its first
    * job with "SparkContext has been shutdown". GraftSession.local goes
    * through getOrCreate, which returns the live default session and
    * transparently builds a fresh one when the default's context has
    * stopped — so a mid-run context death now costs at most the suite
    * that already captured the dead instance, not the rest of the run.
    * Suites keep their `lazy val spark = SparkTestSession.spark` (a
    * stable identifier is required for `import spark.implicits._`);
    * each suite's first access re-resolves liveness here. */
  def spark: SparkSession = synchronized {
    val s = GraftSession.local(4)
    if (s.sparkContext.isStopped) {
      System.err.println("[SparkTestSession] shared SparkContext was " +
        "stopped mid-run; building a fresh session")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      GraftSession.local(4)
    } else s
  }
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows at sf0.001") {
    Registry.entries.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"query ${q.name} returned no rows")
    }
  }

  test("query names are unique and every oracle has a query") {
    val names = Registry.entries.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.oracles.keySet.subsetOf(Registry.queries.keySet))
  }

  test("agg_group_by_sum_mean: groups match distinct flag/status pairs") {
    val agg = Registry.queries("agg_group_by_sum_mean")(spark, sf)
    val distinct = Registry.queries("distinct_pairs")(spark, sf)
    assert(agg.count() == distinct.count())
  }

  test("filter_sort_take returns exactly 20 descending prices") {
    val rows = Registry.queries("filter_sort_take")(spark, sf).collect()
    assert(rows.length == 20)
    val prices = rows.map(_.getAs[Double]("l_extendedprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("exists + without partition the customer set") {
    import org.apache.spark.sql.functions._
    val c = Tables.customer(spark, sf).count()
    val withBig = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val withoutBig = Registry.queries("without_antijoin")(spark, sf)
      .agg(sum("n_customers_no_big_orders")).collect()(0).getLong(0)
    assert(withBig + withoutBig == c)
  }

  test("enumerate_rank indexes are 0..99 with strictly ordered totalprice") {
    val rows = Registry.queries("enumerate_rank")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("idx")).toSeq == (0 until 100))
  }
}
