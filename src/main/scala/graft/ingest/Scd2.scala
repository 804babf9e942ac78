package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — the scale-grade upgrade of the
  * reference's DELETE+INSERT dimension rebuild (`scripts/ingest.py:
  * 221-236`, our S4): instead of discarding history on every ingest,
  * each attribute change CLOSES the current version row (valid_to =
  * snapshot date) and opens a new one, so any fact can be joined to the
  * dimension AS OF its own date — the standard warehouse history
  * contract.
  *
  * Apply semantics for one snapshot at `asOf`:
  *  - already-closed history rows pass through untouched;
  *  - current rows whose tracked attributes equal the snapshot's (or
  *    whose id is absent from the snapshot) stay current;
  *  - current rows whose tracked attributes differ are closed at
  *    `asOf`, and the snapshot's values open a new current row;
  *  - ids new to the snapshot open their first row at `asOf`.
  * Null-safe comparison (`<=>`) throughout, so NULL→value and
  * value→NULL transitions version correctly.
  *
  * Scale shape: ONE full-outer equi-join of the current slice against
  * the snapshot on the natural key, plus shuffle-free unions — the
  * dimension history never rewrites rows it doesn't touch. Both sides
  * bucketed by id on disk (Load.writeBucketed) make the join
  * shuffle-free too; the closed slice streams straight through.
  */
object Scd2 {

  /** `history` must carry `id`, the tracked `attrs`, and
    * `valid_from`/`valid_to` DATE columns (valid_to NULL = current);
    * `snapshot` carries `id` + `attrs`. Returns the new full history.
    */
  def apply(history: DataFrame, snapshot: DataFrame, attrs: Seq[String],
            asOf: String): DataFrame = {
    require(attrs.nonEmpty,
      "Scd2.apply needs at least one tracked attribute column")
    val asOfD = lit(asOf).cast("date")
    val closed = history.filter(col("valid_to").isNotNull)
    val cur = history.filter(col("valid_to").isNull)
    val j = cur.as("cur")
      .join(snapshot.as("snap"), col("cur.id") === col("snap.id"),
        "full_outer")
    val changed = attrs.map(a => !(col(s"cur.$a") <=> col(s"snap.$a")))
      .reduce(_ || _)
    val curCols = (Seq("id") ++ attrs).map(a => col(s"cur.$a").as(a))
    val snapCols = (Seq("id") ++ attrs).map(a => col(s"snap.$a").as(a))
    // unchanged current rows + ids absent from the snapshot: stay open
    val stillCurrent = j
      .filter(col("cur.id").isNotNull &&
        (col("snap.id").isNull || !changed))
      .select(curCols :+ col("cur.valid_from").as("valid_from")
        :+ col("cur.valid_to").as("valid_to"): _*)
    val changedRows = j.filter(col("cur.id").isNotNull &&
      col("snap.id").isNotNull && changed)
    val nowClosed = changedRows
      .select(curCols :+ col("cur.valid_from").as("valid_from")
        :+ asOfD.as("valid_to"): _*)
    val newVersions = changedRows
      .select(snapCols :+ asOfD.as("valid_from")
        :+ lit(null).cast("date").as("valid_to"): _*)
    val born = j.filter(col("cur.id").isNull)
      .select(snapCols :+ asOfD.as("valid_from")
        :+ lit(null).cast("date").as("valid_to"): _*)
    closed.select(stillCurrent.columns.map(col).toIndexedSeq: _*)
      .unionByName(stillCurrent).unionByName(nowClosed)
      .unionByName(newVersions).unionByName(born)
  }

  /** AS-OF dimension lookup against the history: the version whose
    * [valid_from, valid_to) interval covers `date` (open valid_to =
    * +∞). The point of keeping history — facts join the dimension as it
    * was on THEIR date, not today's.
    */
  def asOfSlice(history: DataFrame, date: String): DataFrame =
    history.filter(col("valid_from") <= lit(date).cast("date") &&
      (col("valid_to").isNull || col("valid_to") > lit(date).cast("date")))
}
