package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.wrangling.NestedInfer
import graft.wrangling.NestedInfer._

/** Nested `infer_types` fixpoint (reference data_wrangling.py:19-163):
  * flatten → rule fixpoint → graph emission, incl. rule-ORDER precedence
  * and array-field semantics (every element kept, order preserved). */
class NestedInferSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "doc")
  }

  test("flatten: nested objects, arrays and scalars with positions") {
    val flat = NestedInfer.flatten(
      docs(1 -> """{"name":"n1","child":{"x":"1"},"tags":["a","b","c"],
                   |"kids":[{"y":"2"},{"y":"3"}]}""".stripMargin.replace("\n", "")),
      "doc_id", "doc")
    val objs = flat.objects.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // root + child + 2 array-object kids, all untyped (no "type" key)
    assert(objs.keySet == Set("1:$", "1:$/child", "1:$/kids[0]", "1:$/kids[1]"))
    assert(objs.values.toSet == Set(NestedInfer.UnknownType))
    val trips = flat.triples.collect()
    // scalar field: no pos
    assert(trips.exists(t => t.getString(1) == "name" &&
      t.getString(3) == "n1" && t.isNullAt(4)))
    // array scalars: one triple per element WITH its index
    val tags = trips.filter(_.getString(1) == "tags")
      .map(t => t.getInt(4) -> t.getString(3)).sortBy(_._1)
    assert(tags.toSeq == Seq(0 -> "a", 1 -> "b", 2 -> "c"))
    // array objects: object triples carry the index too
    val kids = trips.filter(t => t.getString(1) == "kids" && !t.isNullAt(2))
      .map(t => t.getInt(4) -> t.getString(2)).sortBy(_._1)
    assert(kids.toSeq == Seq(0 -> "1:$/kids[0]", 1 -> "1:$/kids[1]"))
    // nested scalar under child
    assert(trips.exists(t => t.getString(0) == "1:$/child" &&
      t.getString(1) == "x" && t.getString(3) == "1"))
  }

  test("flatten: explicit type key is respected (reference create_object)") {
    val flat = NestedInfer.flatten(
      docs(7 -> """{"type":"Person","name":"joe","pet":{"kind":"dog"}}"""),
      "doc_id", "doc")
    val objs = flat.objects.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(objs("7:$") == "Person")
    assert(objs("7:$/pet") == NestedInfer.UnknownType)
    // "type" never becomes a triple
    assert(!flat.triples.collect().exists(_.getString(1) == "type"))
  }

  test("fixpoint: chained rules converge across rounds; non-matches stay Unknown") {
    val flat = NestedInfer.flatten(
      docs(
        1 -> """{"segment":"B","name":"c1","nation":{"name":"DE"}}""",
        2 -> """{"segment":"M","name":"c2","nation":{"name":"FR"}}""",
        3 -> """{"whatever":"x"}"""),
      "doc_id", "doc")
    val rules = Seq(
      // typed by own field
      TripleRule(ZP, V("segment"), AnyP, "Customer"),
      // typed by TYPED parent — can only fire once rule 1 has fired
      TripleRule(T("Customer"), V("nation"), ZP, "Nation"))
    val typed = NestedInfer.fixpoint(flat, rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(typed("1:$") == "Customer" && typed("2:$") == "Customer")
    assert(typed("1:$/nation") == "Nation" && typed("2:$/nation") == "Nation")
    assert(typed("3:$") == NestedInfer.UnknownType)
  }

  test("fixpoint: first matching rule wins (reference rule-list order)") {
    val flat = NestedInfer.flatten(
      docs(1 -> """{"name":"x","kind":"thing"}"""), "doc_id", "doc")
    val rules = Seq(
      TripleRule(ZP, V("name"), AnyP, "Named"),
      TripleRule(ZP, V("kind"), AnyP, "Kinded")) // also matches, loses on order
    val typed = NestedInfer.fixpoint(flat, rules).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(typed("1:$") == "Named")
  }

  test("fixpoint: already-typed objects are never re-typed (resolve_unknown)") {
    val flat = NestedInfer.flatten(
      docs(1 -> """{"type":"Robot","name":"r2"}"""), "doc_id", "doc")
    val rules = Seq(TripleRule(ZP, V("name"), AnyP, "Named"))
    val typed = NestedInfer.fixpoint(flat, rules).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(typed("1:$") == "Robot")
  }

  test("toGraph: array field keeps EVERY element with order; traversal works") {
    val flat = NestedInfer.inferTypes(
      docs(1 -> """{"segment":"B","name":"c1","phones":["111","222","333"],
                   |"nation":{"name":"DE"}}""".stripMargin.replace("\n", "")),
      "doc_id", "doc",
      Seq(TripleRule(ZP, V("segment"), AnyP, "Customer"),
        TripleRule(T("Customer"), V("nation"), ZP, "Nation")))
    val g = NestedInfer.toGraph(flat)
    val cust = g.now.all("Customer")
    assert(cust.count() == 1)
    // one AE per array element, ids ordered by position
    val phones = cust.field("phones").select("v_str")
      .collect().map(_.getString(0)).sorted
    assert(phones.toSeq == Seq("111", "222", "333"))
    // element order is recoverable from the AE identity's [pos] suffix
    val aeIds = g.atoms
      .filter(col("kind") === core.Kind.AttributeEntity &&
        col("atype") === "phones")
      .select("atom_id").collect().map(_.getString(0)).sorted
    assert(aeIds.toSeq == Seq("ae:phones[0]/1:$", "ae:phones[1]/1:$",
      "ae:phones[2]/1:$"))
    // typed traversal: Customer -> nation -> name
    val nname = cust.outsWithSource("nation").df
      .filter(col("atype") === "Nation")
    assert(core.AtomSet(g.now, nname).field("name")
      .select("v_str").collect().map(_.getString(0)).toSeq == Seq("DE"))
  }

  test("flatten: scalar strings with JSON-ish prefixes stay scalar values") {
    // "[sic] quote" / "{draft" are NOT valid JSON — prefix-only routing
    // silently dropped them (array parse -> null -> no rows) or left a
    // dangling child triple; parse-success classification keeps them
    val flat = NestedInfer.flatten(
      docs(1 -> """{"note":"[sic] quote","draft":"{draft notes",
                   |"tags":["[x] done","{y}-ish"],"real":{"k":"v"}}"""
        .stripMargin.replace("\n", "")), "doc_id", "doc")
    val scalars = flat.triples.filter(col("tgt_value").isNotNull)
      .select("rel", "tgt_value").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(scalars.contains("note" -> "[sic] quote"))
    assert(scalars.contains("draft" -> "{draft notes"))
    assert(scalars.contains("tags" -> "[x] done"))
    assert(scalars.count(_._1 == "tags") == 2)
    // the genuinely-nested object still flattens as an object
    val objs = flat.triples.filter(col("tgt_id").isNotNull)
      .select("rel").collect().map(_.getString(0)).toSeq
    assert(objs == Seq("real"))
    // no dangling child triples: every tgt_id has an objects row
    val dangling = flat.triples.filter(col("tgt_id").isNotNull)
      .join(flat.objects.withColumnRenamed("obj_id", "tgt_id"),
        Seq("tgt_id"), "left_anti")
    assert(dangling.isEmpty)
  }

  test("flatten: deeper than maxDepth rejects loudly, never truncates") {
    val deep = docs(1 -> """{"a":{"b":{"c":{"d":"leaf"}}}}""")
    val ex = intercept[IllegalArgumentException] {
      NestedInfer.flatten(deep, "doc_id", "doc", maxDepth = 2)
    }
    assert(ex.getMessage.contains("maxDepth"))
    // one level deeper is enough
    assert(NestedInfer.flatten(deep, "doc_id", "doc", maxDepth = 4)
      .objects.count() == 4)
  }

  test("fixpoint: empty rule list is the identity, not a crash") {
    val flat = NestedInfer.flatten(
      docs(1 -> """{"name":"x","child":{"k":"v"}}"""), "doc_id", "doc")
    val typed = NestedInfer.fixpoint(flat, Seq.empty).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(typed.values.toSet == Set(NestedInfer.UnknownType))
    assert(typed.size == 2)
  }

  test("toGraph: colliding ENTITY ids reject loudly (path-separator keys)") {
    // both children derive obj_id "1:$/a/b" — a literal '/' in a key
    // collides with a path-derived id; must throw, not silently duplicate
    val flat = NestedInfer.flatten(
      docs(1 -> """{"a/b":{"x":"1"},"a":{"b":{"y":"2"}}}"""), "doc_id", "doc")
    val ex = intercept[IllegalArgumentException] {
      NestedInfer.toGraph(flat)
    }
    assert(ex.getMessage.contains("colliding atom ids"))
  }

  test("fixpoint: duplicate root ids and maxIters exhaustion reject loudly") {
    // duplicate ROOT doc ids collide whole obj_id subtrees — the
    // types-view join would silently multiply rows; fixpoint rejects at
    // its own boundary (toGraph's atom check is one stage too late)
    val dup = NestedInfer.flatten(
      docs(1 -> """{"a":"x"}""", 1 -> """{"b":"y"}"""), "doc_id", "doc")
    val e = intercept[IllegalArgumentException] {
      NestedInfer.fixpoint(dup, Seq(TripleRule(ZP, V("a"), AnyP, "T")))
    }
    assert(e.getMessage.contains("duplicate object ids"), e.getMessage)

    // a NULL root id propagates null through every obj_id path; it must
    // be diagnosed as a null-id input defect, NOT a phantom "duplicate"
    // (count_distinct ignores nulls, so count(1) vs count_distinct alone
    // would misattribute the mismatch)
    import spark.implicits._
    val nullIds = NestedInfer.flatten(
      Seq((Some(1), """{"a":"x"}"""), (None, """{"b":"y"}"""))
        .toDF("doc_id", "doc"), "doc_id", "doc")
    val en = intercept[IllegalArgumentException] {
      NestedInfer.fixpoint(nullIds, Seq(TripleRule(ZP, V("a"), AnyP, "T")))
    }
    assert(en.getMessage.contains("NULL id"), en.getMessage)

    // a type-dependency chain through a deep object path needs one round
    // per link — exhausting maxIters mid-chain must throw, not return the
    // half-typed table (a silent wrong answer no downstream check can
    // attribute)
    val chain = (1 to 5).foldLeft("""{"type":"Node","v":"leaf"}""") {
      (inner, _) => s"""{"next":$inner,"v":"n"}"""
    }
    val flat = NestedInfer.flatten(docs(9 -> chain), "doc_id", "doc")
    val rules = Seq(TripleRule(ZP, V("next"), T("Node"), "Node"))
    val ok = NestedInfer.fixpoint(flat, rules).collect()
    assert(ok.count(_.getString(1) == "Node") == 6, ok.mkString(", "))
    val e2 = intercept[IllegalStateException] {
      NestedInfer.fixpoint(flat, rules, maxIters = 3)
    }
    assert(e2.getMessage.contains("not converged"), e2.getMessage)
  }
}
