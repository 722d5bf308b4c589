package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
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
