package graft

import org.apache.spark.sql.SparkSession

/** Session-wide cache release — ONE call that composes every layer's
  * evict hook, for long-lived sessions cycling through fixture dirs (or
  * fixtures rewritten in place):
  *
  *  - [[etl.Warehouse.evict]] — warehouse stage frames, which itself
  *    chains [[functions.Keys.release]] (rank intermediates) and
  *    [[functions.Memo.evict]] (operator intermediates: MinHash
  *    signatures, LSH codes, cluster labels, near-dup pairs, checks);
  *  - [[operators.CorpusPipeline.evict]] — corpus pipeline stage frames;
  *  - [[operators.Corpus.evictIndexes]] — digest-index registrations;
  *  - [[operators.Similarity.evictCentroids]] — IVF index metadata.
  *
  * Everything rebuilds transparently (and deterministically — see
  * DeterminismSpec, which uses this to force rebuilds under different
  * partitioning) on next use. Call at a quiescent point: the
  * [[etl.Warehouse.evict]] precondition applies to all layers. */
object Caches {
  def evictAll(spark: SparkSession): Unit = {
    etl.Warehouse.evict(spark)
    operators.CorpusPipeline.evict(spark)
    operators.Corpus.evictIndexes(spark)
    operators.Similarity.evictCentroids(spark)
    operators.Similarity.evictPqCodebooks(spark)
    operators.Similarity.evictResidualBooks(spark)
    operators.Similarity.evictCodeIndexes(spark)
    ext.Skipping.evictFixtures(spark)
  }
}
