package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Quantity._

class QuantitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("same-unit arithmetic and comparison work") {
    import spark.implicits._
    val df = Seq((100.0, 25.0)).toDF("a", "b")
      .select(quantity(col("a"), "dollars").as("qa"),
        quantity(col("b"), "dollars").as("qb"))
    val r = df.select(
      value(qAdd(col("qa"), col("qb"))).as("sum"),
      value(qSubtract(col("qa"), col("qb"))).as("diff"),
      value(qScale(col("qa"), lit(2))).as("scaled"),
      unit(qAdd(col("qa"), col("qb"))).as("u"),
      qGt(col("qa"), col("qb")).as("gt"),
      qEq(col("qa"), col("qa")).as("eq")).collect()(0)
    assert(r.getDouble(0) == 125.0 && r.getDouble(1) == 75.0)
    assert(r.getDouble(2) == 200.0 && r.getString(3) == "dollars")
    assert(r.getBoolean(4) && r.getBoolean(5))
  }

  test("unit mismatch is an ERROR, not null (zef scalars.h:140-156)") {
    import spark.implicits._
    val df = Seq((100.0, 25.0)).toDF("a", "b")
      .select(quantity(col("a"), "dollars").as("qa"),
        quantity(col("b"), "euros").as("qb"))
    val e = intercept[Exception] {
      df.select(qAdd(col("qa"), col("qb"))).collect()
    }
    assert(e.getMessage.contains("unit mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("unit mismatch"))
    intercept[Exception] {
      df.select(qLt(col("qa"), col("qb"))).collect()
    }
  }

  test("NULL quantities null-propagate instead of aborting the job") {
    import spark.implicits._
    // one null row in a column must not raise_error the whole query
    // (Spark convention: null in -> null out; mismatch stays an ERROR)
    val df = Seq((Some(100.0), "dollars"), (None, "dollars"))
      .toDF("a", "u")
      .select(when(col("a").isNotNull, quantity(col("a"), col("u")))
        .as("qa"),
        quantity(lit(5.0), "dollars").as("qb"))
    val rows = df.select(
      value(qAdd(col("qa"), col("qb"))).as("sum"),
      qLt(col("qa"), col("qb")).as("lt")).collect()
    assert(rows.length == 2)
    val byNull = rows.partition(_.isNullAt(0))
    assert(byNull._1.length == 1 && byNull._1.forall(_.isNullAt(1)))
    assert(byNull._2.head.getDouble(0) == 105.0)
  }

  test("quantities group and aggregate within unit partitions") {
    import spark.implicits._
    val df = Seq(("dollars", 10.0), ("dollars", 20.0), ("euros", 5.0))
      .toDF("u", "v").select(quantity(col("v"), col("u")).as("q"))
    val agg = df.groupBy(unit(col("q")).as("unit"))
      .agg(sum(value(col("q"))).as("total")).orderBy("unit")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(agg.toSeq == Seq("dollars" -> 30.0, "euros" -> 5.0))
  }

  test("enums: equality within type, error across types") {
    import spark.implicits._
    val df = Seq(("usd", "usd")).toDF("x", "y").select(
      `enum`("Unit", col("x")).as("ea"), `enum`("Unit", col("y")).as("eb"),
      `enum`("Color", col("x")).as("ec"))
    assert(df.select(enumEq(col("ea"), col("eb"))).collect()(0).getBoolean(0))
    intercept[Exception] {
      df.select(enumEq(col("ea"), col("ec"))).collect()
    }
  }
}
