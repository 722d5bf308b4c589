package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx.DocsGraph

/** Docs-as-data: the operator inventory is a regular graph, so every graph
  * op works on it — the documentation queries ARE engine queries. */
class DocsGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: Graph = DocsGraph.build(spark)

  test("catalog mirrors the live registry (no drift possible)") {
    val nQueries = g.now.all("Query").count()
    assert(nQueries == queries.Registry.entries.size.toLong)
    val nOps = g.now.all("ZefOp").count()
    assert(nOps ==
      queries.Registry.entries.flatMap(_.ops).distinct.size.toLong)
    // every op→query edge resolves: relation count = Σ |ops per query|
    assert(g.now.allRelations("DemonstratedBy").count() ==
      queries.Registry.entries.map(_.ops.size).sum.toLong)
  }

  test("docs are queryable with the engine's own ops") {
    // select_by_field: which queries demonstrate >= 5 operators each?
    val busy = g.now.all("ZefOp")
      .fieldValue("NQueries", "v_long", "n")
      .filter(col("n") >= 3)
    assert(busy.count() > 0)
    // traversal: from the `combinations` op to its demonstrating queries
    val demos = AtomSet(g.now,
      g.atoms.filter(col("atom_id") === "e:ZefOp/combinations"))
      .outs("DemonstratedBy")
      .df.select("atom_id").collect().map(_.getString(0)).toSet
    assert(demos.contains("e:Query/dsl_combinations"))
    assert(demos.contains("e:Query/dsl_permutations"))
    // field read: a query's oracle SQL is data on the graph
    val sql = AtomSet(g.now,
      g.atoms.filter(col("atom_id") === "e:Query/dsl_combinations"))
      .fieldValue("OracleSql", "v_str", "sql")
      .collect()(0).getAs[String]("sql")
    assert(sql.contains("generate_subscripts"))
    // aggregate over documentation: family histogram matches the registry
    val fams = g.now.all("Query").fieldValue("Family", "v_str", "family")
      .groupBy("family").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fams.values.sum == queries.Registry.entries.size.toLong)
    assert(fams.keySet.contains("dsl") && fams("dsl") >= 7)
  }

  test("yo on a docs atom reports its fields and relations") {
    val report = AtomSet(g.now,
      g.atoms.filter(col("atom_id") === "e:ZefOp/combinations")).yo
    val facts = report.collect()
    assert(facts.nonEmpty)
    // the op's out-relations to queries appear in the report
    assert(facts.exists(r =>
      Option(r.getAs[String]("label")).exists(_.contains("DemonstratedBy"))
        || Option(r.getAs[String]("detail"))
          .exists(_.contains("DemonstratedBy"))))
  }
}
