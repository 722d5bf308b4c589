package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.gql.GqlLite
import graft.ops.StructOps
import graft.wrangling.EntityResolution

class ExtendedOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  def chainGraph: Graph = {
    // a -Knows-> b -Knows-> c -Knows-> d; c -Owns-> x
    val (g, _) = Transactor.transact(Graph.empty(spark), Seq(
      PutEntity("P", "a"), PutEntity("P", "b"), PutEntity("P", "c"),
      PutEntity("P", "d"), PutEntity("Thing", "x"),
      PutRelation("Knows", "a", "b"), PutRelation("Knows", "b", "c"),
      PutRelation("Knows", "c", "d"), PutRelation("Owns", "c", "x"),
      TagAtom("a", "root-person")))
    g
  }

  test("gather: bounded BFS collects subgraph with relation atoms") {
    val g = chainGraph
    val seed = AtomSet(g.now, g.atoms.filter(col("atom_id") === "e:P/a"))
    val oneHop = seed.gather(Seq("Knows"), 1)
    // a, b + the a->b relation atom
    assert(oneHop.df.filter(col("kind") === "entity").count() == 2)
    assert(oneHop.df.filter(col("kind") === "relation").count() == 1)
    val all = seed.gather(Seq("Knows", "Owns"), 10)
    assert(all.df.filter(col("kind") === "entity").count() == 5)
    assert(all.df.filter(col("kind") === "relation").count() == 4)
    // early stop: maxSteps larger than diameter is fine (loop exits)
  }

  test("tags: bind, resolve as-of, rebind, tombstone") {
    var g = chainGraph
    assert(g.now.byTag("root-person").df.collect()(0)
      .getAs[String]("atom_id") == "e:P/a")
    val s1 = g.maxSlice
    val (g2, _) = Transactor.transact(g, Seq(TagAtom("e:P/b", "root-person")))
    val (g3, _) = Transactor.transact(g2, Seq(UntagAtom("root-person")))
    assert(g3.at(s1).byTag("root-person").df.collect()(0)
      .getAs[String]("atom_id") == "e:P/a") // old frame sees old binding
    assert(g3.at(s1 + 1).byTag("root-person").df.collect()(0)
      .getAs[String]("atom_id") == "e:P/b")
    assert(g3.now.byTag("root-person").count() == 0) // tombstoned
  }

  test("GqlLite: filter/sort/pagination compile to one plan") {
    import GqlLite._
    val g = GraphEncoder.encodeTpch(spark, sf)
    val q = Query("Customer",
      fields = Seq(("c_name", "v_str", "name"),
        ("c_acctbal", "v_double", "acctbal"),
        ("c_mktsegment", "v_str", "segment")),
      filter = Some(And(Cmp("acctbal", "gt", 1000.0),
        In("segment", Seq("BUILDING", "MACHINERY")))),
      sort = Seq(SortKey("acctbal", asc = false)),
      first = Some(5), offset = Some(2))
    val rows = GqlLite.run(g.now, q).collect()
    assert(rows.length == 5)
    val bals = rows.map(_.getAs[Double]("acctbal"))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => Seq("BUILDING", "MACHINERY")
      .contains(r.getAs[String]("segment"))))
    // aggregate root: one agg() pass
    val agg = GqlLite.aggregate(g.now, "Customer",
      Seq(("c_acctbal", "v_double", "acctbal")),
      filter = Some(Cmp("acctbal", "gt", 1000.0))).collect()(0)
    assert(agg.getAs[Long]("count") > 0)
    assert(agg.getAs[Double]("acctbal_min") > 1000.0)
  }

  test("GqlLite nested first:k — WindowGroupLimit pre-prune keeps the " +
    "same page as the full collect; null sort keys order last") {
    val (g, _) = Transactor.transact(Graph.empty(spark),
      Seq(PutEntity("P", "p")) ++
        (1 to 6).map(i => PutEntity("C", s"c$i")) ++
        (1 to 6).map(i => PutRelation("Has", "p", s"c$i")) ++
        // scores: c1=5, c3=9, c4=1, c6=7; c2/c5 have NO score (null key)
        Seq(PutField("c1", "score", 5.0), PutField("c3", "score", 9.0),
          PutField("c4", "score", 1.0), PutField("c6", "score", 7.0)))
    val child = g.now.all("C").fields(("score", "v_double", "score"))
      .select(col("atom_id"), col("score"),
        col("score").as("__sort_score"))
    def page(first: Option[Int], offset: Option[Int]): Seq[String] = {
      val q = GqlLite.Query("P", fields = Seq(),
        nested = Seq(GqlLite.NestedJoin("Has", incoming = false,
          as = "children", child = child, childCols = Seq("score"),
          sort = Seq(GqlLite.SortKey("__sort_score", asc = false)),
          first = first, offset = offset)))
      GqlLite.run(g.now, q).collect()(0)
        .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
        .map(r => Option(r.getAs[java.lang.Double]("score"))
          .map(_.toString).getOrElse("null")).toSeq
    }
    // desc: 9, 7, 5, 1, then the two null-score children (nulls LAST)
    assert(page(Some(3), None) == Seq("9.0", "7.0", "5.0"))
    assert(page(Some(2), Some(1)) == Seq("7.0", "5.0"))
    // page spanning into the null tail: pre-prune must keep null rows too
    assert(page(Some(6), None) ==
      Seq("9.0", "7.0", "5.0", "1.0", "null", "null"))
    assert(page(Some(2), Some(4)) == Seq("null", "null"))
    // asc direction: nulls still last
    val qAsc = GqlLite.Query("P", fields = Seq(),
      nested = Seq(GqlLite.NestedJoin("Has", incoming = false,
        as = "children", child = child, childCols = Seq("score"),
        sort = Seq(GqlLite.SortKey("__sort_score", asc = true)),
        first = Some(6))))
    val asc = GqlLite.run(g.now, qAsc).collect()(0)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("children")
      .map(r => Option(r.getAs[java.lang.Double]("score"))
        .map(_.toString).getOrElse("null")).toSeq
    assert(asc == Seq("1.0", "5.0", "7.0", "9.0", "null", "null"))
  }

  test("inferTypes: shape rules classify JSON, unknown falls through") {
    import spark.implicits._
    import EntityResolution._
    val df = Seq(
      """{"name":"joe","age":"33"}""",
      """{"title":"spark","pages":"300"}""",
      """{"whatever":"x"}""").toDF("j")
    val out = inferTypes(df, "j", Seq(
      TypeRule("Person", Seq("name", "age")),
      TypeRule("Book", Seq("title")))).collect()
    assert(out.map(_.getAs[String]("inferred_type")).toSeq ==
      Seq("Person", "Book", "ZEF_Unknown"))
  }

  test("identifyEntities: lookup join against existing graph entities") {
    import spark.implicits._
    val g = GraphEncoder.encodeTpch(spark, sf)
    val incoming = Seq("Customer#000000001", "Customer#000000002", "nobody")
      .toDF("cname")
    val out = EntityResolution.identifyEntities(
      incoming, g.now, "Customer", "c_name", "cname").collect()
    val byName = out.map(r => r.getAs[String]("cname") ->
      r.getAs[String]("matched_atom_id")).toMap
    assert(byName("Customer#000000001") == "e:Customer/1")
    assert(byName("nobody") == null)
  }

  test("identifyEntities: ambiguous field values never multiply incoming rows") {
    import spark.implicits._
    val g = GraphEncoder.encodeTpch(spark, sf)
    // many customers share a market segment — one incoming row must come
    // back as ONE row with the deterministic (min atom_id) match, not one
    // row per matching entity
    val incoming = Seq("BUILDING").toDF("seg")
    val out = EntityResolution.identifyEntities(
      incoming, g.now, "Customer", "c_mktsegment", "seg").collect()
    assert(out.length == 1, s"row multiplied: ${out.length}")
    val matched = out(0).getAs[String]("matched_atom_id")
    assert(matched != null)
    val again = EntityResolution.identifyEntities(
      incoming, g.now, "Customer", "c_mktsegment", "seg").collect()
    assert(again(0).getAs[String]("matched_atom_id") == matched)
  }

  test("review pass 19: inferTypes keeps user columns; identifyEntities rejects reserved names") {
    import spark.implicits._
    import EntityResolution._
    // the old temp-column form silently destroyed an input column named
    // __m; the map now rides inline in the type expression
    val df = Seq(("""{"name":"joe","age":"3"}""", "keepme")).toDF("j", "__m")
    val out = inferTypes(df, "j", Seq(TypeRule("Person", Seq("name")))).collect()
    assert(out(0).getAs[String]("__m") == "keepme")
    assert(out(0).getAs[String]("inferred_type") == "Person")
    // a where predicate that evaluates to NULL (missing key) is a
    // no-match that falls through to the next rule, not a crash/match
    val out2 = inferTypes(Seq("""{"name":"x"}""").toDF("j"), "j", Seq(
      TypeRule("Adult", Seq("name"),
        m => element_at(m, "age").cast("int") >= 18),
      TypeRule("Person", Seq("name")))).collect()
    assert(out2(0).getAs[String]("inferred_type") == "Person")
    // reserved working names reject loudly instead of silently dropping
    // the user's column in the post-join drop("__field_value")
    val g = GraphEncoder.encodeTpch(spark, sf)
    intercept[IllegalArgumentException] {
      EntityResolution.identifyEntities(
        Seq(("a", "b")).toDF("cname", "__field_value"),
        g.now, "Customer", "c_name", "cname")
    }
    intercept[IllegalArgumentException] {
      EntityResolution.identifyEntities(
        Seq(("a", "b")).toDF("cname", "matched_atom_id"),
        g.now, "Customer", "c_name", "cname")
    }
  }

  test("StructOps: flatten/unflatten round-trip, nested edits, transpose") {
    import spark.implicits._
    val df = Seq((1, ("x", (2.5, true)))).toDF("id", "s")
      .select(col("id"), col("s._1").as("a"),
        struct(col("s._2._1").as("p"), col("s._2._2").as("q")).as("inner"))
    val flat = StructOps.flattenStruct(df)
    assert(flat.columns.toSet == Set("id", "a", "inner_p", "inner_q"))
    val back = StructOps.unflattenStruct(flat)
    assert(back.select("inner.p").collect()(0).getDouble(0) == 2.5)
    val edited = df.select(StructOps.updateIn(col("inner"), Seq("p"), _ * 2).as("e"))
    assert(edited.select("e.p").collect()(0).getDouble(0) == 5.0)
    val t = Seq(Seq(Seq(1, 2, 3), Seq(4, 5, 6))).toDF("m")
      .select(StructOps.transpose(col("m")).as("t")).collect()(0)
      .getSeq[Seq[Int]](0)
    assert(t == Seq(Seq(1, 4), Seq(2, 5), Seq(3, 6)))
    // zip semantics at the edges: an empty inner row (or empty outer)
    // transposes to [] — unguarded this ANSI-threw on element_at(row, 0)
    val edges = Seq(
      Seq(Seq(1, 2), Seq.empty[Int]),
      Seq.empty[Seq[Int]],
      Seq(Seq(7), Seq(8, 9))).toDF("m")
      .select(StructOps.transpose(col("m")).as("t")).collect()
      .map(_.getSeq[Seq[Int]](0))
    assert(edges(0) == Seq.empty)
    assert(edges(1) == Seq.empty)
    assert(edges(2) == Seq(Seq(7, 8)))
    // bare column colliding with a group prefix rejects loudly (the select
    // would otherwise emit two columns named 'a')
    val clash = Seq((1, 2)).toDF("a", "a_b")
    val ex = intercept[IllegalArgumentException] {
      StructOps.unflattenStruct(clash)
    }
    assert(ex.getMessage.contains("collide"))
    // flatten is loud on its mirror-image collision too (a_b beside
    // struct a{b} emitted two same-named columns — AMBIGUOUS_REFERENCE
    // far from the cause)
    val fc = Seq((1, 2)).toDF("a_b", "x")
      .withColumn("a", struct(lit(9).as("b")))
    val exF = intercept[IllegalArgumentException](StructOps.flattenStruct(fc))
    assert(exF.getMessage.contains("collide"))
    // dotted FIELD names resolve (backtick-quoted segments; a field named
    // "a.b" used to parse as extra nesting and fail analysis)
    val dotted = Seq((1, 2)).toDF("id", "v")
      .select(col("id"), struct(col("v").as("a.b")).as("s"))
    val df2 = StructOps.flattenStruct(dotted)
    assert(df2.columns.toSeq == Seq("id", "s_a.b"))
    // unflatten is ORDER-FAITHFUL: struct field order and column
    // positions come back as flattened (alphabetical sorting silently
    // reordered positional consumers)
    val ordered = Seq((1, 9, 8, 7)).toDF("z", "m_b", "m_a", "tail")
    val uf = StructOps.unflattenStruct(ordered)
    assert(uf.columns.toSeq == Seq("z", "m", "tail"))
    assert(uf.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("b", "a"))
  }
}
