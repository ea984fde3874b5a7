package graft.etl

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Materialized-once warehouse lineage (reference shape: verification runs
  * against the already-loaded Postgres tables, `scripts/verify_ingestion.py:158-245`
  * — it never re-runs the ETL per check).
  *
  * r1 rebuilt the full staging-join + dedup + dims + fact lineage from raw
  * parquet inside EVERY quality query; at 100 TB that is re-running the
  * whole ETL dozens of times per verification pass. This layer builds each
  * stage once per (session, sf-dir), persists it (MEMORY_AND_DISK — spills
  * instead of OOMing when the cleaned table outgrows executor memory), and
  * every downstream query reuses the cached stage. On a real cluster the
  * same role is played by the parquet warehouse [[Transform.writeWarehouse]]
  * writes (and [[Pipeline]] runs); for the in-session query surface the
  * cache avoids the write-read cycle while keeping one-pass semantics.
  */
final case class Warehouse(
    staging: DataFrame,
    cleaned: DataFrame,
    dimProduct: DataFrame,
    dimCustomer: DataFrame,
    dimDate: DataFrame,
    fact: DataFrame)

object Warehouse {

  private val cache = TrieMap.empty[(String, String), Warehouse]

  def apply(spark: SparkSession, dir: String): Warehouse = {
    val wh = cache.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir), build(spark, dir))
    // The memo is APP-scoped but a DataFrame is bound to the session that
    // analyzed it: hand a sibling session (bench warm-up workers) frames
    // re-rooted onto ITS session, or temp views / SQL-function
    // registrations made by the caller would land on the wrong catalog
    // (SessionShim.rebind; the shared cache manager matches the rebound
    // plan by canonicalization, so the persisted stages are still hit).
    def rb(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.SessionShim.rebind(spark, df)
    if (wh.staging.sparkSession eq spark) wh
    else Warehouse(rb(wh.staging), rb(wh.cleaned), rb(wh.dimProduct),
      rb(wh.dimCustomer), rb(wh.dimDate), rb(wh.fact))
  }

  /** Evict this session's cached warehouse stages (and the rank
    * intermediates they pin) — the release path for long-lived sessions.
    * Rebuilds transparently on next [[apply]].
    *
    * PRECONDITION: no still-unmaterialized consumer of a PRE-evict
    * DataFrame may run afterwards. Eviction chains
    * [[graft.functions.Keys.release]], and a stale ranked lineage that
    * recomputes after its range-partitioned intermediate is unpersisted
    * re-samples partition boundaries under a new RDD id — partition ids
    * can then disagree with the already-collected rank offsets and
    * silently corrupt surrogate keys. Call evict only at a quiescent
    * point (outputs written or collected); AFTER evict, obtain fresh
    * frames via [[apply]] — never re-run held references. The
    * evict-then-reuse contract is exercised by TransformSpec. */
  def evict(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    cache.keys.filter(_._1 == app).foreach { k =>
      cache.remove(k).foreach { wh =>
        Seq(wh.fact, wh.dimDate, wh.dimCustomer, wh.dimProduct, wh.cleaned, wh.staging)
          .foreach(_.unpersist(blocking = false))
      }
    }
    graft.functions.Keys.release(spark)
    graft.functions.Memo.evict(spark)
  }

  private def build(spark: SparkSession, dir: String): Warehouse = {
    def p(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)
    val staging = p(Staging.staging(spark, dir))
    val cleaned = p(Clean.cleaned(staging))
    // The dim builds are EAGER (surrogate-key ranking runs a range-sample
    // job + a partition-counts job each — Keys.withRank), and construction
    // used to run them back-to-back: 3 × (2 small jobs + a persist), each
    // leaving most of the cluster idle. Materialize `cleaned` once so the
    // dims never race to fill its cache, then build the three dims from a
    // thread pool so their jobs back-fill each other's stragglers
    // (opt guide §2.6 — overlap independent jobs; actions are sequential
    // only because driver code calls them sequentially).
    cleaned.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fP = Future(p(Transform.dimProduct(cleaned)))
    val fC = Future(p(Transform.dimCustomer(cleaned)))
    val fD = Future(p(Transform.dimDate(cleaned)))
    val dimP = Await.result(fP, Duration.Inf)
    val dimC = Await.result(fC, Duration.Inf)
    val dimD = Await.result(fD, Duration.Inf)
    val fact = p(Transform.factSales(cleaned, dimP, dimC, dimD))
    Warehouse(staging, cleaned, dimP, dimC, dimD, fact)
  }
}
