package graft.core

/** Greedy order-preserving bin-packing over UTF-8 byte budgets.
  *
  * Two reference variants, reproduced exactly:
  *  - `group_chunks_by_length` (reference mapreduce.py:53-91):
  *    singleton groups allowed; note the reference emits a LEADING
  *    EMPTY GROUP when the very first item alone exceeds the budget
  *    (its `current_group` starts empty and is appended on overflow)
  *    — we reproduce that observable behavior.
  *  - `group_strings_by_length` (reference mapreduce.py:287-326):
  *    forces ≥2 items per group so the reduce loop converges.
  *
  * Inherently sequential (a running byte-sum decides group breaks) —
  * run it over item *lengths only* on the driver (thousands of longs),
  * never over item contents. At 100 TB the mapreduce fold packs
  * per-partition first (hierarchical reduce preserves semantics, see
  * SURVEY.md §7.4.1).
  */
object BinPack {

  /** `group_chunks_by_length`: close the current group whenever adding
    * the next item would exceed `maxLen`.
    */
  def groupChunks[T](items: Seq[T], maxLen: Long)(len: T => Long): Vector[Vector[T]] =
    pack(items, maxLen, minPerGroup = 0)(len)

  /** `group_strings_by_length`: close only when the group already has
    * ≥2 items (convergence guarantee).
    */
  def groupStrings[T](items: Seq[T], maxLen: Long)(len: T => Long): Vector[Vector[T]] =
    pack(items, maxLen, minPerGroup = 2)(len)

  private def pack[T](items: Seq[T], maxLen: Long, minPerGroup: Int)(
      len: T => Long): Vector[Vector[T]] = {
    require(maxLen > 0, "max_length must be positive")
    val groups = Vector.newBuilder[Vector[T]]
    var cur = Vector.newBuilder[T]
    var curN = 0
    var curLen = 0L
    items.foreach { it =>
      val l = len(it)
      if (curLen + l > maxLen && curN >= minPerGroup) {
        groups += cur.result()
        cur = Vector.newBuilder[T]
        cur += it; curN = 1; curLen = l
      } else { cur += it; curN += 1; curLen += l }
    }
    if (curN > 0) groups += cur.result()
    groups.result()
  }

  /** Group ids for items given in order: `groupIds(lens, maxLen, min)`
    * returns for each item the 0-based group index, matching the
    * corresponding pack variant. Used to broadcast a tiny ord→group
    * mapping to executors instead of shuffling contents to one node.
    * Note: a leading empty group (chunks variant, oversized first
    * item) shifts ids by one, matching the reference's group count.
    */
  def groupIds(lens: Seq[Long], maxLen: Long, minPerGroup: Int): Array[Int] = {
    require(maxLen > 0, "max_length must be positive")
    val ids = new Array[Int](lens.length)
    var g = 0
    var curN = 0
    var curLen = 0L
    var i = 0
    lens.foreach { l =>
      if (curLen + l > maxLen && curN >= minPerGroup) {
        g += 1
        ids(i) = g; curN = 1; curLen = l
      } else { ids(i) = g; curN += 1; curLen += l }
      i += 1
    }
    ids
  }
}
