package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.ops.VT
import graft.ops.ZOps._

/** Hardening: empty inputs, missing fields, nulls, degenerate parameters. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("empty graph: every read op returns empty, maxSlice is 0") {
    val g = Graph.empty(spark)
    assert(g.maxSlice == 0)
    assert(g.now.all("Anything").count() == 0)
    assert(g.now.all("X").outs("Y").count() == 0)
    assert(g.now.byTag("nope").count() == 0)
    assert(g.events(0, 100).count() == 0)
    assert(g.blueprint.count() == 0)
    assert(g.now.all("X").field("F").count() == 0)
  }

  test("field on a type with no such relation returns empty, fields gives nulls") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutField("a", "Known", 1L)))
    assert(g.now.all("P").field("Unknown").count() == 0)
    val row = g.now.all("P")
      .fields(("Known", "v_long", "k"), ("Unknown", "v_str", "u"))
      .collect()(0)
    assert(row.getAs[Long]("k") == 1L)
    assert(row.isNullAt(row.fieldIndex("u")))
  }

  test("ins_and_outs and relationsTo") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutEntity("P", "b"), PutEntity("P", "c"),
      PutRelation("Knows", "a", "b"), PutRelation("Knows", "c", "a")))
    val aSet = AtomSet(g.now, g.atoms.filter(col("atom_id") === "e:P/a"))
    // a knows b (out) and is known by c (in) → both neighbors
    assert(aSet.insAndOuts("Knows").df.collect()
      .map(_.getAs[String]("atom_id")).toSet == Set("e:P/b", "e:P/c"))
    val bSet = AtomSet(g.now, g.atoms.filter(col("atom_id") === "e:P/b"))
    assert(aSet.relationsTo(bSet, "Knows").count() == 1) // has_relation true
    assert(bSet.relationsTo(aSet, "Knows").count() == 0) // direction matters
  }

  test("VT predicates handle nulls without crashing") {
    val s = spark; import s.implicits._
    val df = Seq(Some(5), None, Some(20)).toDF("x")
    // null never satisfies Between; Complement of Between excludes nulls too
    assert(df.zFilter("x", VT.Between(1, 10)).count() == 1)
    assert(df.zFilter("x", !VT.Between(1, 10)).count() == 1)
    assert(df.zFilter("x", VT.IsNull).count() == 1)
  }

  test("zTake negative takes from the end; zSkip beyond size is empty") {
    val s = spark; import s.implicits._
    val df = (1 to 10).toDF("n")
    assert(df.zTake(-3, Seq(col("n"))).collect().map(_.getInt(0)).toSet ==
      Set(10, 9, 8))
    assert(df.zSkip(99, Seq(col("n"))).count() == 0)
  }

  test("zAssert passes clean data through, fails on violation with message") {
    val s = spark; import s.implicits._
    val df = (1 to 5).toDF("n")
    assert(df.zAssert(col("n") > 0, "positive").count() == 5)
    val e = intercept[Exception] {
      df.zAssert(col("n") < 5, "all under five").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("all under five")))
  }

  test("transact with empty wish list still advances the slice") {
    val (g1, r) = Transactor.transact(Graph.empty(spark), Seq())
    assert(r.slice == 1 && g1.maxSlice == 1)
    assert(g1.now.aliveAtoms.count() == 0)
  }

  test("duplicate PutEntity in one tx is idempotent") {
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutEntity("P", "a")))
    assert(g.atoms.count() == 1)
  }
}
