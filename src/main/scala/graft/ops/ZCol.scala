package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar/string/dict ZefOps as `Column` functions (SURVEY §2.3, §2.6,
  * §2.7). Thin by design: each op is the Catalyst-native lowering of one
  * reference op (cited), so chains of them stay inside whole-stage codegen.
  * Ops Spark already names identically (add/subtract/floor/ceil/...) are
  * not wrapped — users call `functions._` directly; this object covers the
  * ops that need a non-obvious lowering or don't exist.
  */
object ZCol {

  // ---- math (impl.py:2765-3030) ----
  /** zef `clamp[lo][hi]` (impl.py:3158). */
  def clamp(c: Column, lo: Column, hi: Column): Column = least(greatest(c, lo), hi)
  /** zef `sign` (impl.py:8241). */
  def sign(c: Column): Column = signum(c)
  /** zef `is_between[a][b]` — inclusive (impl.py:9143). */
  def isBetween(c: Column, lo: Any, hi: Any): Column = c.between(lit(lo), lit(hi))
  /** zef `If[pred][then][else]` (impl.py:4186). */
  def zIf(pred: Column, t: Column, f: Column): Column = when(pred, t).otherwise(f)
  /** zef `attempt[op][alternative]` (impl.py:4222): null-safe fallback. */
  def attempt(c: Column, alternative: Column): Column = coalesce(c, alternative)
  /** zef `always[v]` (impl.py:2582). */
  def always(v: Any): Column = lit(v)

  // ---- string case conversions (impl.py:8608-8759) ----
  private def words(c: Column): Column =
    filter(split(regexp_replace(
      // split camelCase/PascalCase boundaries, then non-alnum separators
      regexp_replace(c, "([a-z0-9])([A-Z])", "$1 $2"), "[^A-Za-z0-9]+", " "), " "),
      w => length(w) > lit(0))

  /** zef `to_snake_case`. */
  def toSnakeCase(c: Column): Column = lower(concat_ws("_", words(c)))
  /** zef `to_screaming_snake_case`. */
  def toScreamingSnakeCase(c: Column): Column = upper(concat_ws("_", words(c)))
  /** zef `to_kebab_case`. */
  def toKebabCase(c: Column): Column = lower(concat_ws("-", words(c)))
  /** zef `to_pascal_case`. */
  def toPascalCase(c: Column): Column =
    concat_ws("", transform(words(c), w => initcap(lower(w))))
  /** zef `to_camel_case`. */
  def toCamelCase(c: Column): Column = {
    val p = toPascalCase(c)
    concat(lower(p.substr(lit(1), lit(1))), p.substr(lit(2), length(p)))
  }

  /** zef `pad_center` (impl.py:8318-8417; lpad/rpad are native): pad both
    * sides to `len`, left side gets the smaller half. */
  def padCenter(c: Column, len: Int, pad: String): Column = {
    val total = greatest(lit(len) - length(c), lit(0))
    val left = (total / 2).cast("int")
    val padSrc = lit(pad * (len + 1))
    concat(padSrc.substr(lit(1), left), c,
      padSrc.substr(lit(1), total - left))
  }

  // ---- predicates (impl.py:8468-8549) ----
  /** zef `is_alpha`. */
  def isAlpha(c: Column): Column = c.rlike("^[A-Za-z]+$")
  /** zef `is_numeric`. */
  def isNumeric(c: Column): Column = c.rlike("^[0-9]+$")
  /** zef `is_alpha_numeric`. */
  def isAlphaNumeric(c: Column): Column = c.rlike("^[A-Za-z0-9]+$")

  /** zef `int_to_alpha` (impl.py:8431): 1→a, 2→b, ..., 27→aa.
    * Base-26 bijective numeration, 7 static levels — exact through
    * 8,353,082,582 (sum of 26^k, k=1..7; beyond any key space this op
    * meets). Past the cap it errors LOUDLY: the old 4-level chain just
    * dropped the 5th letter above 475k, silently COLLIDING different
    * integers onto one string. Inputs < 1 error too (the numeration is
    * defined on positive ints). */
  def intToAlpha(c: Column): Column = {
    val chars = "abcdefghijklmnopqrstuvwxyz"
    def letter(n: Column): Column = element_at(lit(chars.split("")), n.cast("int"))
    val levels = 7
    val cap = (1 to levels).map(k => math.pow(26.0, k.toDouble).toLong).sum
    // y_1 = c-1; y_{k+1} = floor(y_k / 26) - 1; letter k = y_k mod 26 + 1,
    // emitted while y_k >= 0 (the same recurrence the 4-level chain
    // hand-unrolled)
    val ys = Seq.iterate((c - 1).cast("long"), levels)(y =>
      (floor(y / lit(26)) - 1).cast("long"))
    val letters = ys.zipWithIndex.map { case (y, k) =>
      val l = letter(pmod(y, lit(26)) + 1)
      if (k == 0) l else when(y >= 0, l).otherwise(lit(""))
    }
    when(c.cast("long") < 1 || c.cast("long") > cap,
      raise_error(concat(lit(s"int_to_alpha: input out of [1, $cap]: "),
        c.cast("string"))).cast("string"))
      .otherwise(concat(letters.reverse: _*))
  }

  // ---- dict/map ops over MapType columns (SURVEY §2.6) ----
  /** zef `get[k][default]` (impl.py:1654). */
  def get(m: Column, k: Any, default: Column): Column =
    coalesce(element_at(m, lit(k)), default)
  /** zef `insert[k][v]` (impl.py:1487). */
  def insert(m: Column, k: Any, v: Column): Column =
    map_concat(map_filter(m, (key, _) => key =!= lit(k)), map(lit(k), v))
  /** zef `remove[k]` (impl.py:1620). */
  def remove(m: Column, k: Any): Column = map_filter(m, (key, _) => key =!= lit(k))
  /** zef `update[k][f]` (impl.py:1127). */
  def update(m: Column, k: Any, f: Column => Column): Column =
    insert(m, k, f(element_at(m, lit(k))))
  /** zef `merge_with[f]` (impl.py:7517): combine values on key collision. */
  def mergeWith(a: Column, b: Column, f: (Column, Column) => Column): Column =
    map_zip_with(a, b, (_, x, y) =>
      when(x.isNotNull && y.isNotNull, f(x, y)).otherwise(coalesce(x, y)))
  /** zef `select_keys` (impl.py:6057). */
  def selectKeys(m: Column, keys: Seq[String]): Column =
    map_filter(m, (k, _) => k.isInCollection(keys))
  /** zef `items/keys/values` → native map_entries/map_keys/map_values. */

  // ---- serialization (impl.py:7638, 9047-9142) ----
  /** zef `value_hash` (impl.py:8808) — content address (md5 here; the
    * reference uses blake3, equivalence is "stable content hash"). */
  def valueHash(c: Column): Column = md5(c.cast("string").cast("binary"))
  /** zef `to_bytes`/`utf8bytes_to_string`. */
  def toBytes(c: Column): Column = c.cast("binary")
  def bytesToString(c: Column): Column = c.cast("string")
}
