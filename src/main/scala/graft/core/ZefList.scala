package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered list entities — zef `to_zef_list` (impl.py:8840): the reference
  * builds an ET.ZEF_List whose element relations are chained by next-edges
  * (a linked list). The Spark-first restatement (SURVEY §2.10) keeps the
  * SAME atoms (list entity + element relations + order) but stores order as
  * an Index field ON each element relation (a meta-relation field) — random
  * access and ordered scans are then one join + sort instead of a
  * pointer chase.
  */
object ZefList {

  val ListType = "ZEF_List"
  val ElementRt = "ZEF_ListElement"
  val IndexRt = "Index"

  /** Wishes building a list over existing atoms (by tx key or atom_id). */
  def createWishes(listKey: String, itemKeys: Seq[String]): Seq[Wish] =
    PutEntity(ListType, listKey) +: itemKeys.zipWithIndex.flatMap {
      case (item, i) =>
        val relKey = s"$listKey#$i"
        Seq(
          PutRelation(ElementRt, listKey, item, relKey),
          // index lives on the relation atom (meta-relation field); the
          // tx-local relation KEY resolves through Transactor's own id
          // scheme — hand-building "r:.../..." here would duplicate it
          PutField(relKey, IndexRt, i.toLong))
    }

  def create(g: Graph, listKey: String, itemKeys: Seq[String]): (Graph, Receipt) =
    Transactor.transact(g, createWishes(listKey, itemKeys))

  /** Ordered elements of a list as of a frame: (idx, atom_id of element). */
  def elements(slice: GraphSlice, listKey: String): DataFrame = {
    val listId = s"e:$ListType/$listKey"
    val rels = slice.aliveRelations(ElementRt)
      .filter(col("src_id") === listId)
    val relSet = AtomSet(slice, rels)
    relSet.fieldValue(IndexRt, "v_long", "idx")
      .join(rels.select(col("atom_id"), col("dst_id")), "atom_id")
      .select(col("idx"), col("dst_id").as("element_id"))
      .orderBy(col("idx"))
  }
}
