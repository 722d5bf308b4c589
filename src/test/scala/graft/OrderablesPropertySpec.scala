package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Orderables

/** Property tests for the canonical tie-key transform behind every
  * deterministic-tie contract (AsOfJoin payload ties, maxBy/minBy): the
  * canonical key must be a pure function of CONTENT — equal maps built in
  * different entry orders get equal keys, distinct content gets distinct
  * keys (injectivity over the canonicalizable domain), and the recursion
  * closes nested map/struct/array shapes. A physical (bucket-order)
  * dependence here silently reintroduces partition-dependent winners. */
class OrderablesPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def keyOf(df: org.apache.spark.sql.DataFrame,
      colName: String): Seq[String] = {
    val dt = df.schema(colName).dataType
    val k = Orderables.canonicalKey(dt, col(colName))
      .getOrElse(fail(s"$dt should be canonicalizable"))
    // render via to_json over a wrapper struct: a STRING face of the key
    // that is equal iff the key content is equal
    df.select(to_json(struct(k.as("k"))).as("j"))
      .collect().map(_.getString(0)).toSeq
  }

  test("map keys: entry order never matters, content always does") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 12).foreach { _ =>
      val n = rnd.nextInt(6) + 1
      val entries = (0 until n).map(i => s"k${rnd.nextInt(8)}" -> rnd.nextInt(5))
        .distinctBy(_._1)
      val shuffled = rnd.shuffle(entries)
      val df = Seq(
        (1, entries.toMap), (2, shuffled.toMap),
        // distinct content: bump one value (or add a key when empty-safe)
        (3, (entries.init :+ (entries.last._1 -> (entries.last._2 + 100))).toMap)
      ).toDF("id", "m")
      val keys = keyOf(df, "m")
      assert(keys(0) == keys(1),
        s"equal content, different order diverged: ${keys(0)} vs ${keys(1)}")
      assert(keys(0) != keys(2),
        s"distinct content collided: ${keys(0)}")
    }
  }

  test("nested map-of-struct and array-of-map canonicalize recursively") {
    val s = spark; import s.implicits._
    val a = Map("x" -> Map("b" -> 2, "a" -> 1), "y" -> Map("c" -> 3))
    val b = Map("y" -> Map("c" -> 3), "x" -> Map("a" -> 1, "b" -> 2))
    val c = Map("x" -> Map("b" -> 2, "a" -> 9), "y" -> Map("c" -> 3))
    val df = Seq((1, a), (2, b), (3, c)).toDF("id", "m")
    val keys = keyOf(df, "m")
    assert(keys(0) == keys(1) && keys(0) != keys(2))
    val arr = Seq((1, Seq(Map("b" -> 2, "a" -> 1))),
      (2, Seq(Map("a" -> 1, "b" -> 2))),
      (3, Seq(Map("a" -> 1), Map("b" -> 2)))).toDF("id", "xs")
    val ak = keyOf(arr, "xs")
    assert(ak(0) == ak(1) && ak(0) != ak(2))
  }

  test("a NULL struct keeps a distinct key from an all-null-fields struct") {
    val s = spark; import s.implicits._
    val df = Seq((1, Map("k" -> (Option.empty[Int], Option.empty[String]))),
      (2, Map("k" -> null.asInstanceOf[(Option[Int], Option[String])])))
      .toDF("id", "m")
    val keys = keyOf(df, "m")
    assert(keys(0) != keys(1),
      "NULL struct collided with all-null fields — ties go unspecified again")
  }

  test("non-canonicalizable leaves degrade to None, never a partial key") {
    import org.apache.spark.sql.types._
    // CalendarInterval has no canonical order: as a bare leaf, inside a
    // map value, and inside a struct field, the transform must refuse
    val iv = CalendarIntervalType
    assert(Orderables.canonicalKey(iv, lit(null)).isEmpty)
    assert(Orderables.canonicalKey(
      MapType(StringType, iv), lit(null)).isEmpty)
    assert(Orderables.canonicalKey(
      StructType(Seq(StructField("a", LongType), StructField("b", iv))),
      lit(null)).isEmpty)
    // but an orderable sibling shape stays canonicalizable
    assert(Orderables.canonicalKey(
      MapType(StringType, LongType), lit(null)).nonEmpty)
  }
}
