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
  private val Sentinel = "~" // never appears in glyph rows or inputs
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
    * (the font is uppercase-only, mirroring typical FIGlet fonts).
    */
  def textArt(c: Column): Column = {
    val src = upper(c)
    concat_ws("\n", (0 until 5).map(rowCol(src, _)): _*)
  }

  /** The IDENTICAL lowering as an ANSI SQL expression over `col`, generated
    * from the same font constant — the DuckDB side of the oracle.
    */
  def oracleSqlExpr(col: String): String = {
    def lit(s: String): String = "'" + s.replace("'", "''") + "'"
    def row(r: Int): String = {
      val spaced = s"replace(upper($col), ' ', ${lit(Sentinel)})"
      val glyphed = font.foldLeft(spaced) { case (acc, (ch, rows)) =>
        s"replace($acc, ${lit(ch.toString)}, ${lit(rows(r) + " ")})"
      }
      s"${lit(RowPrefix)} || replace($glyphed, ${lit(Sentinel)}, ${lit(WideSpace)})"
    }
    (0 until 5).map(row).mkString(" || chr(10) || ")
  }
}
