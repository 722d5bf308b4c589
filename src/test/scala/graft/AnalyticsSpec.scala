package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.GraphAlgos
import graft.core._

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("pageRank: sink of a star graph outranks leaves") {
    val wishes = (1 to 6).map(i => PutEntity("P", s"u$i")) ++
      (2 to 6).map(i => PutRelation("Links", s"u$i", "u1")) :+
      PutRelation("Links", "u1", "u2")
    val (g, _) = Transactor.transact(Graph.empty(spark), wishes)
    val ranks = GraphAlgos.pageRank(g.now, Seq("Links"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("e:P/u1") > ranks("e:P/u3"))
    assert(ranks("e:P/u2") > ranks("e:P/u3")) // u1 links only to u2
  }

  test("dedupClusters: connected components form dedup groups") {
    import spark.implicits._
    // pairs: {1-2, 2-3} one cluster; {10-11} another; 99 isolated (absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = GraphAlgos.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == clusters(2L) && clusters(2L) == clusters(3L))
    assert(clusters(10L) == clusters(11L))
    assert(clusters(1L) != clusters(10L))
    assert(clusters(1L) == 1L) // min-id labeling
  }

  test("end-to-end near-dup clustering: LSH pairs -> components -> survivors") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 60)
    val pairs = graft.wrangling.Dedup.minhashDedupPairs(
      docs, "doc_id", "text", threshold = 0.9, shingleN = 1)
    if (pairs.count() > 0) {
      val clusters = GraphAlgos.dedupClusters(pairs.select("id_a", "id_b"))
      val survivors = clusters.groupBy("cluster_id")
        .agg(min("id").as("survivor"))
      // every cluster keeps exactly one survivor = its min id
      assert(survivors.count() == clusters.select("cluster_id").distinct().count())
      assert(survivors.filter(col("survivor") =!= col("cluster_id")).count() == 0)
    }
  }
}
