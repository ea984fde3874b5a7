package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltSpec extends AnyFunSuite {

  test("salted join equals the unsalted join on a skewed key distribution") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 90% of rows share one hot key — the shape salting exists for
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i.toLong))
      .toDF("k", "payload")
    val small = (Seq("HOT") ++ (10 to 2000 by 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, v) => (k, s"v$v") }.toDF("k", "dim")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    val salted = Salt.saltedJoin(big, small, "k", col("payload"), k = 8)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 2000)
  }

  /** AQE-vs-salting comparison (VERDICT r4 item 7). Same hot-key shape,
    * run through Spark's runtime skew-join handling instead of salting:
    * with broadcast disabled and skew thresholds scaled to the fixture,
    * AQE must detect the hot partition in the sort-merge join and split
    * it (skew=true in the final adaptive plan) — no code change, same
    * result. The recorded trade (also in Salt's scaladoc and SURVEY §8):
    * AQE wins for plain shuffled equi-joins — it reacts to ACTUAL runtime
    * sizes with zero small-side replication; salting wins when the skew
    * sits where AQE's rule does not apply — broadcast-incompatible joins
    * that must keep a hash partitioning for a downstream stage, skewed
    * AGGREGATIONS (AQE skew handling is join-only; salting generalizes to
    * two-phase agg), or a key so hot that even one key's matches exceed
    * an executor (AQE splits partitions, not keys, on the build side it
    * replicates). */
  test("AQE skew-join splits the hot partition at runtime and matches the salted result") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keys = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB")
    val old = keys.keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~95% of rows on one hot key, padded so the hot shuffle partition
      // crosses the (lowered) skew threshold
      val big = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit("HOT"))
          .otherwise(concat(lit("k"), col("id"))).as("k"),
        col("id").as("payload"),
        lpad(col("id").cast("string"), 100, "x").as("pad"))
      // built WITHOUT distinct(): a HashAggregate between the shuffle
      // stage and the sort would break OptimizeSkewedJoin's pattern
      // (SMJ over Sort+ShuffleQueryStage on both sides) — itself part of
      // the recorded finding: AQE skew handling only matches plain
      // shuffled join inputs
      val small = spark.range(0, 200000, 20)
        .select(concat(lit("k"), col("id")).as("k"))
        .union(Seq("HOT").toDF("k"))
        .withColumn("dim", concat(lit("v"), col("k")))
      // keep pad in the output so the hot shuffle partition stays heavy
      // (column pruning would otherwise shrink it below the threshold)
      val joined = big.join(small, Seq("k")).select("k", "payload", "pad", "dim")
      // materialize THIS queryExecution (count() would spawn its own)
      val n = joined.collect().length.toLong
      // unwrap the adaptive plan and find the skew-split sort-merge join
      val sb = new StringBuilder
      def go(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        sb.append(p.toString).append('\n')
        p.foreach {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            go(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
          case _ => ()
        }
      }
      go(joined.queryExecution.executedPlan)
      assert(sb.toString.contains("skew=true"),
        s"AQE did not split the hot partition:\n${sb.toString.take(4000)}")
      // identical result through the salted planning-time path
      val nSalted = Salt.saltedJoin(big, small, "k", col("payload"), k = 8)
        .select("k", "payload", "dim").count()
      assert(n === 200000L && nSalted === n)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salts are deterministic (stable under recomputation/retries)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 500).map(_.toLong).toDF("id")
    val a = Salt.withSalt(df, col("id"), 8).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Salt.withSalt(df, col("id"), 8).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
    assert(a.map(_._2).forall(s => s >= 0 && s < 8))
  }
}
