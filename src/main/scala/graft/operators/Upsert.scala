package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE semantics over immutable storage (SURVEY §2.1 S7/S8: the
  * reference's ON CONFLICT upserts).
  *
  * With plain Parquet the idempotent formulation is new-wins union:
  * updates ∪ (current ⟕anti updates). The anti join shuffles both sides
  * on the key (or broadcasts small updates) — the same plan a Delta MERGE
  * produces for the matched/not-matched split. Run twice = same result
  * (idempotence is property-tested in UpsertSpec).
  */
object Upsert {

  /** ON CONFLICT (keys) DO UPDATE — incoming rows win on key collision. */
  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(current.join(updates, keys, "left_anti"))

  /** ON CONFLICT (keys) DO NOTHING — existing rows win; incoming only
    * fills absent keys.
    */
  def insertIfAbsent(current: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    current.unionByName(incoming.join(current, keys, "left_anti"))
}
