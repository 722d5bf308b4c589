package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array edit ops (SURVEY §2.5: `insert_at/remove_at/update_at/replace_at/
  * splice/permute_to/indexes_of`, reference impl.py:964-1156, 8186, 8450,
  * 9777, 9937). All 0-based like the reference's Python list semantics;
  * Spark's `slice`/`element_at` 1-based indexing is an internal detail.
  * Pure higher-order-function expressions — codegen'd, no UDFs.
  */
object ZArr {

  /** Plan-time index guard: negative indices are REJECTED loudly here —
    * the reference's Python negative indexing is not implemented, and
    * without the guard a negative idx either silently no-oped (updateAt:
    * the non-negative lambda counter never equals it) or died at
    * execution in slice() far from the call site. */
  private def requireIndex(op: String, idx: Int): Unit =
    require(idx >= 0,
      s"$op: negative index $idx — Python-style negative indexing is not " +
        "supported; compute size(arr)+idx at the call site")

  /** zef `insert_at[idx][el]` (impl.py:1037). */
  def insertAt(arr: Column, idx: Int, el: Column): Column = {
    requireIndex("insertAt", idx)
    concat(slice(arr, 1, idx), array(el),
      slice(arr, idx + 1, Int.MaxValue - idx - 1))
  }

  /** zef `remove_at[idx]` (impl.py:1156). */
  def removeAt(arr: Column, idx: Int): Column = {
    requireIndex("removeAt", idx)
    concat(slice(arr, 1, idx), slice(arr, idx + 2, Int.MaxValue - idx - 2))
  }

  /** zef `update_at[idx][f]` (impl.py:964). */
  def updateAt(arr: Column, idx: Int, f: Column => Column): Column = {
    requireIndex("updateAt", idx)
    transform(arr, (el, i) => when(i === idx, f(el)).otherwise(el))
  }

  /** zef `replace_at[idx][el]` (impl.py:8186). */
  def replaceAt(arr: Column, idx: Int, el: Column): Column =
    updateAt(arr, idx, _ => el)

  /** zef `splice[start][n][repl]` (impl.py:9937): remove n elements at
    * start, insert repl there. */
  def splice(arr: Column, start: Int, n: Int, repl: Column): Column = {
    requireIndex("splice", start)
    require(n >= 0, s"splice: negative removal count $n")
    concat(slice(arr, 1, start), repl,
      slice(arr, start + n + 1, Int.MaxValue - start - n - 1))
  }

  /** zef `permute_to[indices]` (impl.py:8450): reorder by 0-based index
    * list. */
  def permuteTo(arr: Column, indices: Seq[Int]): Column =
    array(indices.map(i => element_at(arr, i + 1)): _*)

  /** zef `indexes_of[el]` (impl.py:9777): 0-based positions of matches.
    * Null-SAFE equality (<=>): a null element matches a null probe and
    * never matches a non-null one — the Python-list reference semantics
    * (None == None); plain === made null elements unmatchable and a null
    * probe match nothing. */
  def indexesOf(arr: Column, el: Column): Column =
    filter(transform(arr, (x, i) => when(x <=> el, i).otherwise(lit(-1))),
      i => i >= 0)

  /** zef `trim/trim_left/trim_right[el]` list variants (impl.py:2199-2322):
    * drop leading/trailing elements equal to el. Null-safe like
    * [[indexesOf]]: a leading null is KEPT unless el is null (plain =!=
    * evaluated to NULL on null elements and silently trimmed them). */
  def trimLeft(arr: Column, el: Column): Column = {
    val firstKeep = array_position(transform(arr, x => !(x <=> el)), true)
    // length = size(arr) (clamps): a MaxValue literal overflows start+len
    // in the INTERPRETED Slice eval (raw iadd) and silently returns []
    when(firstKeep === 0, slice(arr, 1, 0)) // all-separator → empty, typed
      .otherwise(slice(arr, firstKeep.cast("int"), size(arr)))
  }
  def trimRight(arr: Column, el: Column): Column = reverse(trimLeft(reverse(arr), el))
  def trim(arr: Column, el: Column): Column = trimRight(trimLeft(arr, el), el)

  /** zef `cycle[n]` / `repeat[n]` (impl.py:1857,1899). */
  def cycle(arr: Column, n: Int): Column = flatten(array_repeat(arr, n))

  /** `removeAt` with a runtime (Column) index — the building block the
    * combinatorics ops below need inside a `transform` lambda. */
  private def removeAtCol(arr: Column, idx: Column): Column =
    concat(slice(arr, lit(1), idx), slice(arr, idx + 2, size(arr) - idx - 1))

  /** zef `combinations[n]` (implementation_typing_functions.py:2561): all
    * length-n subsequences in position order — `[1,2,3] | combinations[2]`
    * → `[[1,2],[1,3],[2,3]]`. Positions are distinct (itertools semantics:
    * duplicated VALUES yield duplicated outputs). Recursive HOF expression,
    * tree depth n — pure Column algebra, codegen'd, no UDF. Output order is
    * lexicographic by position, matching itertools.
    *
    * Scale note: output size is C(m,n) PER ROW — combinatorics of long
    * arrays belongs behind an explicit length guard at the call site. */
  def combinations(arr: Column, n: Int): Column = {
    require(n >= 1, "combinations: n >= 1")
    if (n == 1) transform(arr, x => array(x))
    else
      flatten(transform(arr, (x, i) =>
        transform(
          combinations(slice(arr, i + 2, size(arr) - i - 1), n - 1),
          rest => concat(array(x), rest))))
  }

  /** zef `permutations[n]` (implementation_typing_functions.py:2517): all
    * ordered length-n selections of distinct positions —
    * `[1,2,3] | permutations[2]` → `[[1,2],[1,3],[2,1],[2,3],[3,1],[3,2]]`.
    * Same recursion as [[combinations]] but each level removes the chosen
    * position instead of truncating the prefix. */
  def permutations(arr: Column, n: Int): Column = {
    require(n >= 1, "permutations: n >= 1")
    if (n == 1) transform(arr, x => array(x))
    else
      flatten(transform(arr, (x, i) =>
        transform(
          permutations(removeAtCol(arr, i), n - 1),
          rest => concat(array(x), rest))))
  }

  /** zef `permutations` with no length (full reorderings). The output
    * length must be known at plan time for the static recursion, so the
    * caller bounds it: arrays longer than maxLen yield null (the honest
    * answer — m! of a long list is a scale hazard, not a query). */
  def permutationsAll(arr: Column, maxLen: Int): Column = {
    require(maxLen >= 1 && maxLen <= 8, "permutationsAll: 1 <= maxLen <= 8")
    val cases = (1 to maxLen).foldLeft(
      when(size(arr) === 0, array(array()))) {
      case (acc, k) => acc.when(size(arr) === k, permutations(arr, k))
    }
    cases.otherwise(lit(null))
  }

  /** zef `split[el]` on lists (impl.py:4684): split into runs at separator
    * elements (separator not included). One pass for the separator
    * positions, then one slice per segment between consecutive bounds —
    * O(m) per row. (The previous lowering re-filtered the array prefix per
    * element AND the tagged array per segment: O(m²) per row, a real wall
    * on 10k-token arrays inside an interpreted HOF.) */
  def splitOn(arr: Column, el: Column): Column = {
    // 0-based separator positions (null-safe, shared with indexesOf —
    // this used to inline the same expression and would have diverged
    // on the null-safety fix), framed by -1 and size(arr)
    val seps = indexesOf(arr, el)
    val bounds = concat(array(lit(-1)), seps, array(size(arr)))
    transform(sequence(lit(0), size(seps)), s =>
      slice(arr, element_at(bounds, s + 1) + 2,
        element_at(bounds, s + 2) - element_at(bounds, s + 1) - 1))
  }
}
