package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Nested-structure ops (SURVEY §2.6): `flatten_dict` / `unflatten_dict`
  * (reference impl.py:10047,10089) over StructType columns — schema-driven
  * pure projections (resolved at plan time; zero runtime cost beyond the
  * projection itself).
  */
object StructOps {

  /** zef `flatten_dict`: expand every nested struct field into a top-level
    * column named by its path joined with `sep`. */
  def flattenStruct(df: DataFrame, sep: String = "_"): DataFrame = {
    def fieldPaths(schema: StructType, prefix: Seq[String]): Seq[(Seq[String], Column)] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => fieldPaths(s, path)
          // backtick-quoted per segment: a field (or column) name
          // containing '.' otherwise parses as extra nesting levels and
          // fails analysis (legal in StructType, common from JSON)
          case _ => Seq(path ->
            col(path.map(seg => "`" + seg.replace("`", "``") + "`")
              .mkString(".")))
        }
      }
    val paths = fieldPaths(df.schema, Nil)
    val names = paths.map(_._1.mkString(sep))
    // loud, not ambiguous: a flattened path colliding with another (a_b
    // beside struct a{b}) emitted two same-named columns, and every later
    // reference died with AMBIGUOUS_REFERENCE far from the cause
    val dup = names.groupBy(identity).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"flattenStruct: flattened names collide: ${dup.mkString(", ")} — " +
        "pick a different sep or rename before flattening")
    df.select(paths.zip(names).map { case ((_, c), n) => c.as(n) }: _*)
  }

  /** zef `unflatten_dict`: rebuild nested structs from `sep`-joined column
    * names (inverse of flattenStruct for one nesting level per separator). */
  def unflattenStruct(df: DataFrame, sep: String = "_"): DataFrame = {
    val groups = df.columns.groupBy(c =>
      if (c.contains(sep)) c.split(java.util.regex.Pattern.quote(sep), 2)(0) else "")
    // a bare column can share its name with a rebuilt group ("a" beside
    // "a_b"): the select would emit two columns named 'a' and every later
    // reference dies with AMBIGUOUS_REFERENCE — reject here with the cause
    val bare = groups.getOrElse("", Array.empty[String]).toSet
    val clash = groups.keySet.intersect(bare) - ""
    require(clash.isEmpty,
      s"unflattenStruct: bare column(s) ${clash.mkString(", ")} collide with " +
        s"group prefixes of the same name — rename before unflattening")
    // ORDER-FAITHFUL inverse: emit columns in their original positions
    // (each struct at its first member's position, members in column
    // order) — the old alphabetical sort reordered fields and top-level
    // columns, silently breaking positional consumers of the declared
    // "inverse of flattenStruct" (union by position, parquet
    // schema-compat, Row index access)
    val qsep = java.util.regex.Pattern.quote(sep)
    val emitted = scala.collection.mutable.Set.empty[String]
    val cols: Seq[Column] = df.columns.toSeq.flatMap { c =>
      val prefix = if (c.contains(sep)) c.split(qsep, 2)(0) else ""
      if (prefix == "") Seq(col(c))
      else if (emitted.add(prefix))
        Seq(struct(groups(prefix).toSeq.map { m =>
          col(m).as(m.split(qsep, 2)(1))
        }: _*).as(prefix))
      else Nil
    }
    df.select(cols: _*)
  }

  /** zef `get_in[path]` (impl.py:820): nested field access by path. */
  def getIn(c: Column, path: Seq[String]): Column =
    path.foldLeft(c)(_ getField _)

  /** zef `update_in[path][f]` (impl.py:923): nested field update. */
  def updateIn(c: Column, path: Seq[String], f: Column => Column): Column =
    path match {
      case Seq(last) => c.withField(last, f(c.getField(last)))
      case head +: tail =>
        c.withField(head, updateIn(c.getField(head), tail, f))
    }

  /** zef `insert_in[path][v]` (impl.py:851). */
  def insertIn(c: Column, path: Seq[String], v: Column): Column =
    path match {
      case Seq(last) => c.withField(last, v)
      case head +: tail => c.withField(head, insertIn(c.getField(head), tail, v))
    }

  /** zef `remove_in[path]` (impl.py:886). */
  def removeIn(c: Column, path: Seq[String]): Column =
    path match {
      case Seq(last) => c.dropFields(last)
      case head +: tail => c.withField(head, removeIn(c.getField(head), tail))
    }

  /** zef `transpose` (impl.py:365): list-of-lists row/col swap for an
    * ArrayType(ArrayType) column (ragged input truncates to the shortest
    * row, matching zip semantics — so ANY empty inner row, or an empty
    * outer list, transposes to []). The guard matters under ANSI mode:
    * unguarded, sequence(0, -1) descends and element_at(row, 0) aborts
    * the job on the first row containing an empty inner array. */
  def transpose(c: Column): Column = {
    val minLen = array_min(transform(c, r => size(r)))
    when(size(c) === 0 || minLen < 1, slice(c, 1, 0)).otherwise(
      transform(sequence(lit(0), minLen - 1),
        i => transform(c, row => element_at(row, i + 1))))
  }
}
