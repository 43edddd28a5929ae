package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental table maintenance (SURVEY.md §2c extension surface):
  * latest-wins upsert (SCD type 1) — the merge step that folds a
  * day's changed/new rows into a snapshot, the batch analog of
  * `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`.
  *
  * Shape: survivors of the base = anti join against the update keys,
  * then a union with the updates — no window pass, no sort. The anti
  * join broadcasts whenever the update batch is small (the common
  * case: daily deltas vs a 100 TB snapshot), so the snapshot never
  * shuffles; with a large delta it degrades to one keyed shuffle.
  * Same plan family as the dd09 incremental-dedup registry anti join.
  *
  * `updates` must carry one row per key (enforce upstream with
  * dropDuplicates or a max-version pre-aggregation); with that
  * contract the result is a pure function of the inputs — no
  * tie-breaking, engine-portable.
  */
object Merge {

  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    base.join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(updates)
}
