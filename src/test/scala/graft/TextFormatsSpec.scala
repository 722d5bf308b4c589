package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.{Parse, TextFormats}
import graft.ops.Parse._

/** YAML/TOML text formats + parse[grammar] combinators (impl.py:7678-7766,
  * 9984) — driver-side parsing that bridges to the engine via toJson. */
class TextFormatsSpec extends AnyFunSuite {

  test("YAML: nested mappings, sequences, flow lists, typed scalars") {
    val doc =
      """# a config
        |name: graft
        |version: 3
        |ratio: 0.75
        |active: true
        |nothing: ~
        |tags: [spark, "graph db", olap]
        |server:
        |  host: example.local
        |  ports:
        |    - 8080
        |    - 9090
        |users:
        |  - name: ann
        |    admin: true
        |  - name: bob
        |    admin: false
        |""".stripMargin
    val v = TextFormats.fromYaml(doc).asInstanceOf[Map[String, Any]]
    assert(v("name") == "graft" && v("version") == 3L && v("ratio") == 0.75)
    assert(v("active") == true && v("nothing") == null)
    assert(v("tags") == Vector("spark", "graph db", "olap"))
    val server = v("server").asInstanceOf[Map[String, Any]]
    assert(server("host") == "example.local")
    assert(server("ports") == Vector(8080L, 9090L))
    val users = v("users").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(users.map(_("name")) == Vector("ann", "bob"))
    assert(users.map(_("admin")) == Vector(true, false))
  }

  test("YAML round-trip: toYaml -> fromYaml is identity on trees") {
    val tree = Map(
      "a" -> 1L, "b" -> Map("c" -> "x y", "d" -> Vector(1L, 2L)),
      "e" -> Vector(Map("k" -> "v")), "f" -> true)
    assert(TextFormats.fromYaml(TextFormats.toYaml(tree)) == tree)
  }

  test("YAML: quoted/mid-token '#' is data, empty colls and bare dashes survive") {
    // '#' inside quotes or glued to a token is NOT a comment (the old
    // quote-blind takeWhile truncated "#fff" to '"' and URLs at the #)
    val t = TextFormats.fromYaml(
      "color: \"#fff\"\nurl: http://x#frag\nnote: hi # real comment")
      .asInstanceOf[Map[String, Any]]
    assert(t("color") == "#fff")
    assert(t("url") == "http://x#frag")
    assert(t("note") == "hi")
    // a trailing bare '-' is a null item, not IndexOutOfBoundsException
    assert(TextFormats.fromYaml("- x\n-") == Vector("x", null))
    // empty collections round-trip as {} / [] (was Scala debris "Vector()")
    val tree = Map("a" -> Vector.empty[Any], "b" -> Map.empty[String, Any])
    assert(TextFormats.fromYaml(TextFormats.toYaml(tree)) == tree)
  }

  test("YAML: type-faithful round-trips, escapes, loud tails, deep dash items") {
    import graft.ops.TextFormats._
    // type-ambiguous STRINGS survive the round-trip quoted: emitted bare,
    // "true"/"123"/"1.5"/"null"/" x" all came back as different TYPES
    val tricky = Map("a" -> "true", "b" -> "123", "c" -> "1.5",
      "d" -> "null", "e" -> " padded ", "f" -> true, "g" -> 123L)
    assert(fromYaml(toYaml(tricky)) == tricky)
    // left-to-right unescape: "a\\nb" is a,BACKSLASH,n,b (the old chained
    // replace turned it into a newline); Windows paths keep single slashes
    assert(scalar("\"a\\\\nb\"") == "a\\nb")
    assert(scalar("\"C:\\\\dir\"") == "C:\\dir")
    // a backslash-escaped quote does not flip comment/colon tracking
    assert(fromYaml("k: \"a\\\" # b\"").asInstanceOf[Map[String, Any]]("k")
      == "a\" # b")
    // beyond-Long integers stay the ORIGINAL STRING (a Double fallback
    // always succeeds on digit runs and silently lost precision on 19+
    // digit numeric ids: 12345678901234567890 read back as
    // 1.2345678901234568E19) — lossless round-trip, no exception
    assert(scalar("123456789012345678901234567890") ==
      "123456789012345678901234567890")
    assert(scalar("12345678901234567890") == "12345678901234567890")
    assert(scalar("9223372036854775807") == Long.MaxValue) // still Long
    // non-finite doubles bridge to JSON null, not invalid 'Infinity'
    assert(yamlToJson("a: 1e999") == "{\"a\":null}")
    // a '- ' item with EXTRA spaces keeps its sibling keys (the hardcoded
    // +2 item indent dropped every key after the first)
    assert(fromYaml("-  a: 1\n   b: 2") ==
      Vector(Map("a" -> 1L, "b" -> 2L)))
    // unconsumed tails are LOUD, not silently discarded
    intercept[IllegalArgumentException](fromYaml("a: 1\n - x"))
  }

  test("TOML: tables, dotted headers, arrays, comments") {
    val doc =
      """title = "graft" # inline comment
        |n = 42
        |[db]
        |host = "localhost"
        |ports = [5432, 5433]
        |[db.auth]
        |user = "ann"
        |enabled = true
        |""".stripMargin
    val v = TextFormats.fromToml(doc)
    assert(v("title") == "graft" && v("n") == 42L)
    val db = v("db").asInstanceOf[Map[String, Any]]
    assert(db("host") == "localhost" && db("ports") == Vector(5432L, 5433L))
    val auth = db("auth").asInstanceOf[Map[String, Any]]
    assert(auth("user") == "ann" && auth("enabled") == true)
  }

  test("toJson bridge: yaml/toml -> json parses cleanly") {
    val json = TextFormats.yamlToJson("a: 1\nb: [x, y]\nc:\n  d: true")
    assert(json == """{"a":1,"b":["x","y"],"c":{"d":true}}""")
    assert(TextFormats.tomlToJson("k = \"v\"\n[t]\nx = 1") ==
      """{"k":"v","t":{"x":1}}""")
  }

  test("parse[grammar]: recursive arithmetic grammar evaluates") {
    // expr := term (('+'|'-') term)* ; term := factor (('*'|'/') factor)* ;
    // factor := number | '(' expr ')'
    lazy val expr: P[Double] = defer {
      (term ~ ((tok("+") | tok("-")) ~ term).rep).map { case (h, t) =>
        t.foldLeft(h) { case (acc, ("+", x)) => acc + x
                        case (acc, (_, x)) => acc - x } }
    }
    lazy val term: P[Double] = defer {
      (factor ~ ((tok("*") | tok("/")) ~ factor).rep).map { case (h, t) =>
        t.foldLeft(h) { case (acc, ("*", x)) => acc * x
                        case (acc, (_, x)) => acc / x } }
    }
    lazy val factor: P[Double] = defer {
      number | (tok("(") ~> expr <~ tok(")"))
    }
    assert(expr.parseAll("1 + 2 * 3") == 7.0)
    assert(expr.parseAll("(1 + 2) * 3 - 4 / 2") == 7.0)
    // furthest-failure offset is reported
    val e = intercept[IllegalArgumentException](expr.parseAll("1 + * 2"))
    assert(e.getMessage.contains("offset 4"))
  }

  test("parse[grammar]: sepBy / quoted / ident combinators") {
    val kv = ((ident <~ tok("=")) ~ (quoted | number.map(_.toString)))
    val line = kv.sepBy(tok(";")).map(_.toMap)
    assert(line.parseAll("""a = "x"; b = 2; c = "q\"z"""") ==
      Map("a" -> "x", "b" -> "2.0", "c" -> "q\"z"))
  }

  test("parseColumn: log-line grammar over a DataFrame, null on non-match") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // "<LEVEL> <code> \"<message>\"" -> struct(level, code, msg)
    val logLine: P[LogLine] =
      (ident ~ number ~ quoted).map { case ((lvl, code), msg) =>
        LogLine(lvl, code.toLong, msg) }
    val df = Seq(
      """ERROR 503 "upstream timeout"""",
      """INFO 200 "ok"""",
      "not a log line").toDF("raw")
    val out = df.select(Parse.parseColumn(logLine, col("raw")).as("log"))
      .select("log.level", "log.code", "log.msg")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("ERROR", 503L, "upstream timeout"),
      ("INFO", 200L, "ok"),
      (null, -1L, null)))
  }
}

/** Top-level so the udf TypeTag resolves (local case classes don't encode). */
case class LogLine(level: String, code: Long, msg: String)
