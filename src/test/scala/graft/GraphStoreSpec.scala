package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class GraphStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("save/load round-trip preserves graph semantics and prunes by type") {
    val (g1, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("Person", "joe"), PutField("joe", "Name", "Joe"),
      PutEntity("Pet", "spot"), PutRelation("HasPet", "joe", "spot"),
      TagAtom("joe", "hero")))
    val (g2, _) = Transactor.transact(g1, Seq(
      AssignField("e:Person/joe", "Name", "Joseph")))

    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    GraphStore.save(g2, dir)
    val loaded = GraphStore.load(spark, dir)

    assert(loaded.maxSlice == 2)
    assert(loaded.now.all("Person").fieldValue("Name", "v_str", "n")
      .collect()(0).getAs[String]("n") == "Joseph")
    assert(loaded.at(1).all("Person").fieldValue("Name", "v_str", "n")
      .collect()(0).getAs[String]("n") == "Joe")
    assert(loaded.now.byTag("hero").count() == 1)
    assert(loaded.now.all("Person").outs("HasPet").count() == 1)

    // physical layout: per-(kind, atype) directories exist → partition
    // pruning applies to all[ET.X] scans
    assert(new java.io.File(s"$dir/atoms/kind=entity/atype=Person").exists())
    assert(new java.io.File(s"$dir/atoms/kind=relation/atype=HasPet").exists())
    // and the pruned scan plan reads only the one partition
    val plan = loaded.now.all("Person").df.queryExecution.executedPlan.toString
    assert(!plan.contains("atype=Pet") || plan.contains("PartitionFilters"))
  }
}
