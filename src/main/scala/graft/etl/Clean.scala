package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's cleaning chain (reference `dags/dag2_clean_validate.py`):
  * four DELETE passes re-expressed as the kept complement (SURVEY §2.2-2.3).
  * Each step is a narrow transformation Catalyst pushes into the scan; the
  * only shuffle is the dedup exchange on the dedup keys.
  *
  * Scale notes: `dropDuplicates` hash-partitions on the key columns — at
  * 100 TB that is one full shuffle of the fact table, unavoidable for exact
  * dedup; AQE handles skew (no key here is hot: the key includes invoice+
  * product). The filter steps are shuffle-free and combine into a single
  * scan predicate. Composing all four into one lineage means one pass over
  * the data, vs the reference's four table-rewriting DELETEs.
  */
object Clean {

  /** F1: drop rows null in any critical column
    * (reference `dags/dag2_clean_validate.py:27-34`). */
  def dropNulls(staging: DataFrame): DataFrame =
    staging.na.drop("any", Staging.criticalCols)

  /** D1: keep-first dedup on the reference's key set — Description/Country
    * are NOT keys; null customers dedup together via COALESCE(...,'')
    * (reference `dags/dag2_clean_validate.py:48-63`). The reference
    * tiebreaks by physical ctid (arbitrary); `dropDuplicates` keeps an
    * arbitrary row — the same contract. On exact-duplicate keys the
    * surviving row is identical in every column anyway (description and
    * country are functionally dependent on the keys). */
  def dedup(df: DataFrame): DataFrame =
    df.withColumn("cust_dedup_key", coalesce(col("customer_id"), lit("")))
      .dropDuplicates(Staging.dedupKeys)
      .drop("cust_dedup_key")

  /** F2: drop zero quantities; negatives are KEPT — they are returns
    * (reference `dags/dag2_clean_validate.py:72-80`). */
  def dropZeroQty(df: DataFrame): DataFrame =
    df.filter(col("quantity") =!= 0)

  /** F3: drop non-positive prices (reference `dags/dag2_clean_validate.py:94-97`). */
  def dropBadPrice(df: DataFrame): DataFrame =
    df.filter(col("unit_price") > 0)

  /** Full chain F1 -> D1 -> F2 -> F3. */
  def cleaned(staging: DataFrame): DataFrame =
    dropBadPrice(dropZeroQty(dedup(dropNulls(staging))))

  /** Q1: the reference's hard row-count gate, scaled by fixture size
    * (reference `dags/dag2_clean_validate.py:132-136` gates at >=400k of
    * 541,909 = 73.8%; we gate on the same retention ratio). */
  def rowCountGate(rawCount: Long, cleanedCount: Long): Boolean =
    cleanedCount >= (rawCount * 0.738).toLong
}
