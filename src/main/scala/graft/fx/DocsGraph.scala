package graft.fx

import graft.core._
import graft.queries.Registry

/** Docs-as-data (reference `docs` tooling + SURVEY §2.11 adjunct): the
  * engine's own operator inventory, transacted into a regular [[Graph]] so
  * it is queryable with the same ops it documents — `all[ZefOp]`,
  * `select_by_field`, `gather`, `yo`, GraphQL — instead of living only in
  * markdown. The reference stores op documentation as graph data and
  * serves `docs` queries from it; this is that capability on the Spark
  * engine, sourced from the live query registry (so it can never drift
  * from what is actually registered).
  *
  * Shape: one `ET.ZefOp` entity per demonstrated operator, one `ET.Query`
  * entity per registered query (carrying its family, oracle SQL and
  * oracle-presence flag as fields), and a `RT.DemonstratedBy` relation
  * from each op to every query that exercises it.
  */
object DocsGraph {

  def build(spark: org.apache.spark.sql.SparkSession): Graph = {
    // an op name may equal a query name (e.g. `frequencies`), and raw-key
    // resolution is type-blind within a tx — address every owned field and
    // relation endpoint by FULL atom id (which resolution passes through)
    val byFamily = Registry.namedModules
    val queryWishes = byFamily.flatMap { case (fam, qs) =>
      qs.flatMap { q =>
        val id = s"e:Query/${q.name}"
        Seq(PutEntity("Query", q.name),
          PutField(id, "Family", fam),
          PutField(id, "HasOracle", q.oracle.isDefined)) ++
          q.oracle.map(sql => PutField(id, "OracleSql", sql))
      }
    }
    val ops = Registry.entries.flatMap(q => q.ops.map(_ -> q.name))
    // distinct query names per op in ONE pass: a duplicate op tag inside a
    // QueryDef would inflate a raw pair count while the duplicate
    // DemonstratedBy relation below dedups — the stored count must agree
    // with what the graph can answer
    val queriesPerOp = ops.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val opWishes = queriesPerOp.keys.toSeq.sorted.flatMap { op =>
      Seq(PutEntity("ZefOp", op),
        PutField(s"e:ZefOp/$op", "NQueries", queriesPerOp(op)))
    }
    val relWishes = ops.map { case (op, q) =>
      PutRelation("DemonstratedBy", s"e:ZefOp/$op", s"e:Query/$q")
    }
    val (g, _) = Transactor.transact(Graph.empty(spark),
      queryWishes ++ opWishes ++ relWishes)
    g
  }
}
