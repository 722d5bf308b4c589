package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextArt

/** `text_art` (implementation_typing_functions.py:7618): banner shape,
  * comment prefix, space widening, and Scala-side parity with the generated
  * SQL lowering (same font constant drives both).
  */
class TextArtSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def render(s: String): String = {
    val sp = spark; import sp.implicits._
    Seq(s).toDF("x").select(TextArt.textArt(col("x")).as("a"))
      .collect()(0).getString(0)
  }

  test("banner shape: 5 rows, comment prefix, equal widths, uppercased") {
    val art = render("Hi 5")
    val rows = art.split("\n", -1)
    assert(rows.length == 5)
    assert(rows.forall(_.startsWith("#  ")))
    assert(rows.map(_.length).distinct.length == 1) // fixed-width font
    // 3 glyphs of width 6 (5 + gap) + widened space (3) + prefix (3)
    assert(rows.head.length == 3 + 6 + 6 + 3 + 6)
    assert(art.contains("#####")) // H's crossbar row exists
  }

  test("known glyph render: 'I' exact rows") {
    val art = render("I")
    assert(art == Seq(
      "#  ##### ",
      "#    #   ",
      "#    #   ",
      "#    #   ",
      "#  ##### ").mkString("\n"))
  }

  test("reference lowering parity: Scala replace-chain == generated SQL") {
    // Run the generated oracle expression through Spark's own SQL engine
    // (same ANSI replace/upper/||/chr semantics DuckDB applies) and compare
    // with the Column lowering — one font constant, two emitters.
    val sp = spark; import sp.implicits._
    val df = Seq("UNITED KINGDOM", "abc 019", "ZQX", "O'NEIL-7.x~").toDF("x")
    df.createOrReplaceTempView("text_art_in")
    val viaSql = spark
      .sql(s"SELECT ${TextArt.oracleSqlExpr("x", "spark")} AS a " +
        "FROM text_art_in ORDER BY x")
      .collect().map(_.getString(0))
    val viaCol = df.select(col("x"), TextArt.textArt(col("x")).as("a"))
      .orderBy("x").collect().map(_.getString(1))
    assert(viaSql.toSeq == viaCol.toSeq)
    df.sparkSession.catalog.dropTempView("text_art_in")
  }

  test("general input: punctuation and the sentinel char sanitize away") {
    // '~' is the internal space sentinel and '-'/'.' are not in the font;
    // all must strip rather than corrupt the fixed-width banner
    assert(render("A-B.C~") == render("ABC"))
    assert(render("O'NEIL") == render("ONEIL"))
    val rows = render("X- .~Y").split("\n", -1)
    assert(rows.map(_.length).distinct.length == 1,
      "sanitized banner lost fixed width")
    // the widened space survives sanitization
    assert(render("X .Y") == render("X Y"))
  }

  test("NULL input: Column form and generated SQL agree (both null)") {
    val s = spark; import s.implicits._
    val df = Seq(Some("HI"), None).toDF("t")
    val viaCol = df.select(TextArt.textArt(col("t")).as("a")).collect()
    assert(viaCol.count(_.isNullAt(0)) == 1) // concat_ws would have said ""
    df.createOrReplaceTempView("ta_null_probe")
    val viaSql = spark.sql(
      s"SELECT ${TextArt.oracleSqlExpr("t", dialect = "spark")} AS a " +
        "FROM ta_null_probe").collect()
    assert(viaSql.count(_.isNullAt(0)) == 1)
    assert(viaCol.map(r => Option(r.getString(0))).toSet ==
      viaSql.map(r => Option(r.getString(0))).toSet)
  }

  test("every font glyph is 5 rows of width 5 over {#, space}") {
    TextArt.font.foreach { case (ch, rows) =>
      assert(rows.length == 5, s"$ch")
      assert(rows.forall(r => r.length == 5 && r.forall(c => c == '#' || c == ' ')), s"$ch")
    }
    assert(TextArt.font.map(_._1).distinct.length == TextArt.font.length)
  }
}
