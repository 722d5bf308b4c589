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

  /** zef `int_to_alpha` (impl.py:8431): 1→a, 2→b, ..., 27→aa. */
  def intToAlpha(c: Column): Column = {
    // base-26 bijective numeration, max 4 letters (suffices to 475k)
    val chars = "abcdefghijklmnopqrstuvwxyz"
    def letter(n: Column): Column = element_at(lit(chars.split("")), n.cast("int"))
    def idiv(x: Column): Column = floor(x / lit(26)).cast("long")
    val n1 = pmod(c - 1, lit(26)) + 1
    val r1 = idiv(c - 1)
    val n2 = pmod(r1 - 1, lit(26)) + 1
    val r2 = idiv(r1 - 1)
    val n3 = pmod(r2 - 1, lit(26)) + 1
    val r3 = idiv(r2 - 1)
    val n4 = pmod(r3 - 1, lit(26)) + 1
    concat(
      when(r3 > 0, letter(n4)).otherwise(lit("")),
      when(r2 > 0, letter(n3)).otherwise(lit("")),
      when(r1 > 0, letter(n2)).otherwise(lit("")),
      letter(n1))
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
