package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `text_art`: string → ASCII-art banner (reference:
  * python/zef/core/op_implementations/implementation_typing_functions.py:7618
  * — FIGlet-style render, every output row prefixed with `#  ` so the banner
  * can be pasted as a code comment, input spaces widened to a larger gap).
  *
  * Spark-first lowering: a fixed 5-row bitmap font applied as a chain of
  * literal `replace` calls per output row — no UDF, fully codegen'd, and the
  * same chain is emitted as ANSI SQL for the DuckDB oracle from the SAME font
  * constant, so engine parity is structural rather than hoped-for. The chain
  * is safe because glyph rows contain only `#` and spaces (never letters or
  * digits), so later replacements cannot touch earlier glyph output; input
  * spaces are swapped to a sentinel first and widened last for the same
  * reason.
  */
object TextArt {

  /** 5×5 glyphs (uppercase letters + digits), one trailing gap column added
    * at render time. Rows use only '#' and ' '.
    */
  val font: Seq[(Char, Seq[String])] = Seq(
    'A' -> Seq(" ### ", "#   #", "#####", "#   #", "#   #"),
    'B' -> Seq("#### ", "#   #", "#### ", "#   #", "#### "),
    'C' -> Seq(" ####", "#    ", "#    ", "#    ", " ####"),
    'D' -> Seq("#### ", "#   #", "#   #", "#   #", "#### "),
    'E' -> Seq("#####", "#    ", "#### ", "#    ", "#####"),
    'F' -> Seq("#####", "#    ", "#### ", "#    ", "#    "),
    'G' -> Seq(" ####", "#    ", "#  ##", "#   #", " ### "),
    'H' -> Seq("#   #", "#   #", "#####", "#   #", "#   #"),
    'I' -> Seq("#####", "  #  ", "  #  ", "  #  ", "#####"),
    'J' -> Seq("#####", "   # ", "   # ", "#  # ", " ##  "),
    'K' -> Seq("#   #", "#  # ", "###  ", "#  # ", "#   #"),
    'L' -> Seq("#    ", "#    ", "#    ", "#    ", "#####"),
    'M' -> Seq("#   #", "## ##", "# # #", "#   #", "#   #"),
    'N' -> Seq("#   #", "##  #", "# # #", "#  ##", "#   #"),
    'O' -> Seq(" ### ", "#   #", "#   #", "#   #", " ### "),
    'P' -> Seq("#### ", "#   #", "#### ", "#    ", "#    "),
    'Q' -> Seq(" ### ", "#   #", "# # #", "#  # ", " ## #"),
    'R' -> Seq("#### ", "#   #", "#### ", "#  # ", "#   #"),
    'S' -> Seq(" ####", "#    ", " ### ", "    #", "#### "),
    'T' -> Seq("#####", "  #  ", "  #  ", "  #  ", "  #  "),
    'U' -> Seq("#   #", "#   #", "#   #", "#   #", " ### "),
    'V' -> Seq("#   #", "#   #", "#   #", " # # ", "  #  "),
    'W' -> Seq("#   #", "#   #", "# # #", "## ##", "#   #"),
    'X' -> Seq("#   #", " # # ", "  #  ", " # # ", "#   #"),
    'Y' -> Seq("#   #", " # # ", "  #  ", "  #  ", "  #  "),
    'Z' -> Seq("#####", "   # ", "  #  ", " #   ", "#####"),
    '0' -> Seq(" ### ", "#  ##", "# # #", "##  #", " ### "),
    '1' -> Seq("  #  ", " ##  ", "  #  ", "  #  ", "#####"),
    '2' -> Seq(" ### ", "#   #", "  ## ", " #   ", "#####"),
    '3' -> Seq("#####", "   # ", "  ## ", "#   #", " ### "),
    '4' -> Seq("#  # ", "#  # ", "#####", "   # ", "   # "),
    '5' -> Seq("#####", "#    ", "#### ", "    #", "#### "),
    '6' -> Seq(" ####", "#    ", "#### ", "#   #", " ### "),
    '7' -> Seq("#####", "    #", "   # ", "  #  ", "  #  "),
    '8' -> Seq(" ### ", "#   #", " ### ", "#   #", " ### "),
    '9' -> Seq(" ### ", "#   #", " ####", "    #", "#### "))

  private val RowPrefix = "#  " // comment style, per the reference
  private val Sentinel = "~" // outside the sanitized alphabet by construction
  private val WideSpace = "   " // input space → wider gap

  /** One banner row: sentinel the spaces, replace every known char with its
    * glyph row plus a gap column, widen the sentinel last.
    */
  private def rowCol(src: Column, row: Int): Column = {
    val spaced = replace(src, lit(" "), lit(Sentinel))
    val glyphed = font.foldLeft(spaced) { case (acc, (ch, rows)) =>
      replace(acc, lit(ch.toString), lit(rows(row) + " "))
    }
    concat(lit(RowPrefix), replace(glyphed, lit(Sentinel), lit(WideSpace)))
  }

  /** The banner as one newline-joined string; input is uppercased first
    * (the font is uppercase-only, mirroring typical FIGlet fonts) and then
    * SANITIZED to the renderable alphabet `[A-Z0-9 ]` — without this, a
    * character outside the font (punctuation, or the space sentinel
    * itself) would pass through the replace-chain verbatim and corrupt
    * the fixed-width banner rows for general inputs.
    */
  def textArt(c: Column): Column = {
    val src = regexp_replace(upper(c), "[^A-Z0-9 ]", "")
    // NULL propagates (matching the generated SQL's null-propagating ||
    // chain): concat_ws SKIPS null parts, so unguarded it would return ""
    // where the oracle side returns NULL — a silent parity split on the
    // first nullable input column
    when(c.isNull, lit(null).cast("string"))
      .otherwise(concat_ws("\n", (0 until 5).map(rowCol(src, _)): _*))
  }

  /** The IDENTICAL lowering as an ANSI SQL expression over `col`, generated
    * from the same font constant — the DuckDB side of the oracle. The one
    * dialect split: DuckDB's regexp_replace needs the 'g' flag for a
    * global replace, Spark's is always global and rejects the flag arg
    * (the parity spec runs the generated SQL through Spark too).
    */
  def oracleSqlExpr(col: String, dialect: String = "duckdb"): String = {
    val g = if (dialect == "duckdb") ", 'g'" else ""
    def lit(s: String): String = "'" + s.replace("'", "''") + "'"
    def row(r: Int): String = {
      // same sanitize-then-render pipeline as [[textArt]]
      val spaced = s"replace(regexp_replace(upper($col), '[^A-Z0-9 ]', ''$g)," +
        s" ' ', ${lit(Sentinel)})"
      val glyphed = font.foldLeft(spaced) { case (acc, (ch, rows)) =>
        s"replace($acc, ${lit(ch.toString)}, ${lit(rows(r) + " ")})"
      }
      s"${lit(RowPrefix)} || replace($glyphed, ${lit(Sentinel)}, ${lit(WideSpace)})"
    }
    (0 until 5).map(row).mkString(" || chr(10) || ")
  }
}
