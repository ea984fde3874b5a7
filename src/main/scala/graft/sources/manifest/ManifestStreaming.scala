package graft.sources.manifest

import graft.ext.{Dfs, Manifests}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** A fixed, pruning-free file listing as a `PartitioningAwareFileIndex`
  * — the per-micro-batch index: a streaming batch reads EXACTLY the
  * files its version diff added (or the snapshot's files), so there is
  * nothing to prune and the listing is the contract. */
private[manifest] final class ExplicitFilesIndex(spark: SparkSession,
    base: String, fileList: Seq[FileStatus])
    extends PartitioningAwareFileIndex(spark, Map.empty, None) {
  override def rootPaths: Seq[Path] = Seq(new Path(base))
  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec
  override def partitionSchema: StructType = new StructType()
  override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    fileList.foreach(s => m += (s.getPath -> s))
    m
  }
  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    fileList.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, fileList.toArray))
  override def inputFiles: Array[String] =
    fileList.map(_.getPath.toString).toArray
  override def sizeInBytes: Long = fileList.map(_.getLen).sum
  override def allFiles(): Seq[FileStatus] = fileList
  override def refresh(): Unit = ()
}

/** `spark.readStream.table("graft.ns.t")` — the DSv2 micro-batch twin
  * of the V1 manifest streaming source: offsets ARE committed manifest
  * versions, batch (a, b] reads exactly the files version b lists that
  * a did not (manifest set arithmetic — no directory scans, no
  * modification-time races, replay-exact after restart). Admission
  * control and Trigger.AvailableNow carry over: `startingVersion`
  * (int | "latest"; absent → first batch is a full snapshot),
  * `maxVersionsPerTrigger`, `maxBytesPerTrigger` (per-version added
  * bytes from the commit summary — no data-file statusing per
  * trigger), `allowNonAppend`. Non-append versions refuse by default,
  * exactly like the V1 source. Schema is pinned at query start. */
private[manifest] class ManifestMicroBatchStream(spark: SparkSession,
    base: String, schema: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private case class V(v: Int) extends Offset {
    override def json: String = v.toString
  }

  protected def verOf(o: Offset): Int = o.asInstanceOf[V].v

  private def opt(k: String): Option[String] = Option(options.get(k))

  private val allowNonAppend = opt("allowNonAppend").exists(_.toBoolean)

  private val startingVersion: Option[Int] = opt("startingVersion").map {
    case "latest" => Manifests.latestVersion(spark, base).getOrElse(
      sys.error(s"no committed version under $base"))
    case n => n.toInt
  }

  private val maxVersionsPerTrigger: Option[Int] =
    opt("maxVersionsPerTrigger").map(_.toInt)
  private val maxBytesPerTrigger: Option[Long] =
    opt("maxBytesPerTrigger").map(_.toLong)

  // -1 = "no batch served yet": the first batch is a whole-snapshot
  // read of the version it ends at (unless startingVersion pins a diff
  // base). Mirrors the V1 source's None/Some(start) split.
  override def initialOffset(): Offset = V(startingVersion.getOrElse(-1))

  override def deserializeOffset(json: String): Offset = V(json.toInt)

  private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowTarget =
      Some(Manifests.latestVersion(spark, base).getOrElse(-1))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    sys.error("admission-controlled source: engine must call " +
      "latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[V].v
    Manifests.latestVersion(spark, base).map { l0 =>
      val latest = availableNowTarget.fold(l0)(math.min(l0, _))
      if (latest <= from) start
      else {
        val byVersions = (maxVersionsPerTrigger, from) match {
          case (Some(cap), f) if f >= 0 => math.min(latest, f + cap)
          case _ => latest // snapshot start: one version, read whole
        }
        val capped = (maxBytesPerTrigger, from) match {
          case (Some(maxB), f) if f >= 0 =>
            var v = f
            var acc = 0L
            var stop = false
            while (!stop && v < byVersions) {
              val nb = Manifests.addedBytesOf(spark, base, v + 1)
                .getOrElse(Long.MaxValue)
              if (acc == 0L ||
                  (nb < Long.MaxValue - acc && acc + nb <= maxB)) {
                acc += math.min(nb, Long.MaxValue / 4); v += 1
              } else stop = true
            }
            v
          case _ => byVersions
        }
        if (capped <= from) start else V(capped)
      }
    }.getOrElse(start)
  }

  override def reportLatestOffset(): Offset =
    Manifests.latestVersion(spark, base).map(V).orNull

  /** Files of the batch (start, end]: the snapshot whole at first
    * serve, the version-diff ADDED files after — refusing non-append
    * diffs exactly as the V1 source does. */
  private def batchFiles(from: Int, to: Int): Seq[String] =
    if (from < 0) {
      // the snapshot batch is a raw file read: deletion vectors cannot
      // apply through the parquet-scan path, and a MoR delete landing
      // between plan time and the first trigger would otherwise
      // resurrect its deleted rows into the stream — refuse, exactly
      // like the batch relation (compact() materializes the vectors)
      require(Manifests.dvFiles(spark, base, to).isEmpty,
        s"version $to of $base carries deletion vectors — a streaming " +
          "snapshot is a raw file read; run compact() first")
      Manifests.files(spark, base, to)
    } else {
      val fa = Manifests.files(spark, base, from).map(Dfs.canonical)
      val fb = Manifests.files(spark, base, to).map(Dfs.canonical)
      val removed = fa.filterNot(fb.toSet)
      val dvChanged =
        Manifests.dvFiles(spark, base, from).map(Dfs.canonical) !=
          Manifests.dvFiles(spark, base, to).map(Dfs.canonical)
      if ((removed.nonEmpty || dvChanged) && !allowNonAppend)
        sys.error(s"versions ($from, $to] of $base are not append-only " +
          s"(${removed.size} files removed, vectors changed: $dvChanged); " +
          "a streaming read emits appends — restart from a snapshot or " +
          "set allowNonAppend=true to re-emit rewritten files")
      fb.filterNot(fa.toSet)
    }

  /** A per-batch `ParquetScan` over the explicit file list: partitions
    * and reader factory come from Spark's own parquet scan machinery
    * (vectorized reader, codegen), so the stream's read path is the
    * batch read path over fewer files. */
  protected def scanFor(fs: Seq[String]): ParquetScan = {
    // statuses come from ONE listing per parent directory, not one
    // getFileStatus RPC per file: a snapshot batch lists every live
    // file, and per-file driver round-trips on an object store would
    // stall the first trigger for seconds per thousand files
    val wanted = fs.map(Dfs.canonical).toSet
    val statuses = fs.map(f => new Path(f).getParent).distinct
      .flatMap(dir => Dfs.dataFiles(spark, dir.toString))
      .filter(st => wanted.contains(Dfs.canonical(st.getPath.toString)))
    ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(
        options.asCaseSensitiveMap()
          .asInstanceOf[java.util.Map[String, String]].asScala.toMap),
      new ExplicitFilesIndex(spark, base, statuses),
      schema, schema, new StructType(), Array.empty, options, None,
      Seq.empty, Seq.empty)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val to = end.asInstanceOf[V].v
    val fs = batchFiles(start.asInstanceOf[V].v, to)
    // pre-RENAME files hold the column under its old physical name —
    // this stream's raw parquet scan would null-fill it. Post-rename
    // appends never trip this (their files are not in any event's
    // pre-file list), so a renamed table still streams its new
    // versions; only a snapshot/catch-up over old files refuses, with
    // the same escape hatches as the DV case.
    val pre = Manifests.renamesOf(spark, base, to)
      .flatMap(_.preFiles).toSet
    if (pre.nonEmpty)
      require(!fs.exists(f => pre.contains(Dfs.canonical(f))),
        s"a streaming batch of $base covers files that predate a " +
          "RENAME COLUMN — the raw parquet scan cannot re-map physical " +
          "names; compact() the table first, or consume the .changes " +
          "feed (era-aware)")
    if (fs.isEmpty) Array.empty
    else scanFor(fs).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the factory depends on schema/conf only, never the file list —
    // any non-empty template works, and an empty one works too
    scanFor(Seq.empty).createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"ManifestMicroBatchStream[$base]"
}

/** `spark.readStream.table("graft.ns.t.changes")` — the CHANGE-FEED
  * twin of the catalog stream, mirroring the V1 source's
  * `readChangeFeed=true`: every version — append, CoW rewrite,
  * merge-on-read delete — streams as rows tagged `_change_type` ∈
  * {insert, delete}, so the name-addressed incremental-MV loop works
  * without path plumbing. Offsets, admission control
  * (`startingVersion`, `maxVersionsPerTrigger`, `maxBytesPerTrigger`)
  * and AvailableNow are inherited; non-append versions are the POINT
  * here, never a refusal.
  *
  * The exact feed is a composed diff ([[Manifests.changesBetween]]:
  * manifest multiset arithmetic over the files unique to either side,
  * plus DV-churn anti-joins), not a file listing — but a DSv2 stream
  * must serve `InputPartition`s. Each batch therefore MATERIALIZES its
  * feed once under the query's checkpoint (marker-guarded: replays and
  * restarts reuse the files instead of recomputing — which also makes
  * a replayed batch stable under concurrent vacuum) and serves plain
  * parquet partitions over it. Cost: one extra write+read of the FEED
  * — churned files only, never the table; a version that touched 0.1%
  * of a 100 TB table materializes 0.1%-sized changes. The snapshot
  * batch reads THROUGH deletion vectors (`readAt` applies them),
  * unlike the raw-file non-CDF snapshot which must refuse. */
private[manifest] class ManifestChangesMicroBatchStream(
    spark: SparkSession, base: String, schema: StructType,
    options: CaseInsensitiveStringMap, checkpointDir: String)
    extends ManifestMicroBatchStream(spark, base, schema, options) {

  private val updateImages =
    Option(options.get("updateImages")).exists(_.toBoolean)

  /** The feed SHAPE (netting vs per-version update-image replay — tag
    * vocabulary and netting semantics differ) is part of the stream's
    * identity, but the option arrives per RUN: a restart that flips
    * `updateImages` would silently change semantics from the restart
    * offset onward. The shape persists in the checkpoint on first
    * materialization and a mismatched restart refuses loudly. */
  @volatile private var shapeChecked = false
  private def assertShape(): Unit = if (!shapeChecked) {
    val marker = s"$checkpointDir/graft_cdf/_shape"
    val want = if (updateImages) "updateImages" else "netting"
    Dfs.statOf(spark, marker) match {
      case None =>
        Dfs.mkdirs(spark, s"$checkpointDir/graft_cdf")
        Dfs.writeBytes(spark, marker, want.getBytes("UTF-8"))
      case Some(_) =>
        val got = new String(Dfs.readBytes(spark, marker), "UTF-8").trim
        require(got == want,
          s"this checkpoint's .changes feed of $base was started with " +
            s"shape '$got' but the restart supplies '$want' " +
            "(updateImages flipped) — feed semantics would change " +
            "mid-stream; restore the original option or start a fresh " +
            "checkpoint")
    }
    shapeChecked = true
  }

  private def materialized(from: Int, to: Int): Seq[String] = {
    assertShape()
    // the flag is part of the feed's identity: a checkpoint written
    // under one shape must never be served for the other
    val shape = if (updateImages) "u" else ""
    val dir = s"$checkpointDir/graft_cdf/b${from}_$to$shape"
    val marker = s"$dir/_graft_cdf_done"
    if (!Dfs.exists(spark, marker)) {
      ManifestChanges.feedBetween(spark, base, from, to, schema,
        updateImages)
        .write.mode("overwrite").parquet(dir)
      Dfs.touch(spark, marker)
    }
    Dfs.dataFiles(spark, dir).map(_.getPath.toString).toSeq
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val fs = materialized(verOf(start), verOf(end))
    if (fs.isEmpty) Array.empty
    else scanFor(fs).toBatch.planInputPartitions()
  }

  /** Batch commit is the purge point that keeps the checkpoint BOUNDED:
    * a feed dir whose `to` version is strictly below the committed
    * offset can never be re-planned (the engine replays at most the
    * last uncommitted batch, and every later batch starts at or above
    * the committed offset), so it is dead weight — without this, a
    * long-running stream grows the checkpoint by one feed-sized dir per
    * micro-batch. The dir ending exactly AT the committed offset is
    * kept one cycle as replay headroom. Cleanup failure never fails the
    * batch: the feed dirs are a cache, not the source of truth. */
  override def commit(end: Offset): Unit = {
    val committed = verOf(end)
    val root = s"$checkpointDir/graft_cdf"
    try {
      if (Dfs.exists(spark, root))
        Dfs.list(spark, root).foreach { st =>
          ManifestChanges.batchDirPattern.findFirstMatchIn(
              st.getPath.getName).foreach { m =>
            if (m.group(2).toInt < committed)
              Dfs.delete(spark, st.getPath.toString, recursive = true): Unit
          }
        }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  override def toString: String = s"ManifestChangesMicroBatchStream[$base]"
}

/** Shared feed construction for the `.changes` faces (stream batches
  * and the batch `table_changes` read). */
private[manifest] object ManifestChanges {

  /** Materialized feed dirs under `<checkpoint>/graft_cdf/`. */
  // the optional "u" suffix marks update-image-shaped feeds (the flag
  // is part of a materialized dir's identity); cleanup matches both
  val batchDirPattern: scala.util.matching.Regex =
    "^b(-?\\d+)_(-?\\d+)u?$".r

  /** The change rows of versions `(from, to]` (from < 0 → the whole
    * snapshot of `to`, tagged insert), ALIGNED to `schema`:
    * [[Manifests.changesBetween]] builds the feed under the from/to
    * versions' union schema, so a catch-up batch over versions
    * predating an ADD COLUMN lacks the added column — each missing
    * field null-fills (mirroring evolveSchema's read contract) and the
    * select fixes column order, so the rows always match the schema
    * the stream or batch relation resolved with. */
  def feedBetween(spark: SparkSession, base: String, from: Int, to: Int,
      schema: StructType,
      updateImages: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val raw =
      if (from < 0)
        // the initial snapshot attributes to the snapshot version and
        // its recorded commit instant (Delta's CDF initial-snapshot
        // tagging)
        Manifests.readAt(spark, base, to)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(to))
          .withColumn("_commit_timestamp", lit(new java.sql.Timestamp(
            Manifests.commitTimestampOf(spark, base, to))))
      // updateImages=true serves the PER-VERSION replay: versions whose
      // write recorded its classification (graft.cdf.updateImages)
      // re-emit update_preimage/update_postimage pairs; unflagged
      // versions fall back to the content diff per step. Delta CDF's
      // semantics — intermediate changes visible — vs the endpoint
      // diff's netting, so the two option shapes are deliberately
      // distinct feeds, not one with extra tags.
      else if (updateImages)
        Manifests.changesBetweenWithUpdates(spark, base, from, to)
      // attributed shape: single-step ranges (every steady-state
      // streaming micro-batch) carry real _commit_version/_commit_
      // timestamp; multi-step netting ranges leave them to null-fill
      else Manifests.changesBetweenAttributed(spark, base, from, to)
    val have = raw.columns.map(_.toLowerCase).toSet
    // the table's full rename HISTORY (latest version's event list —
    // emptied events survive as one-line name records precisely for
    // this): a resolved schema and a feed range can sit on opposite
    // sides of a rename, in either direction
    val evs =
      Manifests.latestVersion(spark, base)
        .map(Manifests.renamesOf(spark, base, _)).getOrElse(Seq.empty)
    val widened = schema.fields.foldLeft(raw) { (df, f) =>
      if (have.contains(f.name.toLowerCase)) df
      else {
        // a field the resolved schema knows under ONE era's name may
        // sit in the feed under another era's: a post-rename reader
        // catching up over pre-rename versions meets the OLD name, a
        // pre-rename reader crossing the rename meets the NEW one. The
        // column's identity set is the closure of its name over the
        // rename history (tombstones guarantee names are never reused,
        // so the closure is one column's aliases and the feed carries
        // at most one of them) — alias whichever is present instead of
        // null-filling real values away; genuinely absent fields
        // (pre-ADD COLUMN catch-up) null-fill as before
        // the closure is computed over LOWERCASED names, consistent
        // with the `have` presence set: a case-spelling difference
        // between the resolved schema and the recorded rename events
        // must not miss the alias and null-fill real pre-rename values
        val names = scala.collection.mutable.LinkedHashSet(
          f.name.toLowerCase)
        var grew = true
        while (grew) {
          grew = false
          evs.foreach { e =>
            val (fl, tl) = (e.from.toLowerCase, e.to.toLowerCase)
            if (names.contains(fl) && names.add(tl)) grew = true
            if (names.contains(tl) && names.add(fl)) grew = true
          }
        }
        names.iterator.drop(1).filter(have.contains)
          .flatMap(n => raw.columns.find(_.toLowerCase == n))
          .nextOption() match {
          case Some(n) => df.withColumn(f.name, col(s"`$n`"))
          case None => df.withColumn(f.name, lit(null).cast(f.dataType))
        }
      }
    }
    // a catch-up batch over versions predating an ALTER COLUMN TYPE
    // carries the column under its old NARROWER type (the feed builds
    // under the range endpoints' union schema) — cast it UP to the
    // resolved type, the read-side mirror of widenColumn's whitelist
    // (lossless by construction). The reverse — a stream that resolved
    // BEFORE a widening landing mid-run — must never silently narrow
    // real values: refuse, the reader restarts and re-resolves at the
    // wide schema (Delta CDF's schema-change stance).
    val byName = widened.schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    widened.select(schema.fields.toIndexedSeq.map { f =>
      val c = col(s"`${f.name}`")
      byName.get(f.name.toLowerCase).filter(_ != f.dataType) match {
        case Some(ft) if Manifests.isWideningConversion(ft, f.dataType) =>
          c.cast(f.dataType).as(f.name)
        case Some(ft) =>
          sys.error(s"change feed of $base: column ${f.name} evolved " +
            s"from this reader's resolved ${f.dataType.simpleString} to " +
            s"${ft.simpleString} — restart the stream to re-resolve at " +
            "the current schema")
        case None => c
      }
    }: _*)
  }
}

/** The `.changes` metadata table: a table's change feed as a
  * name-addressed relation (the readable face of
  * [[ManifestChangesMicroBatchStream]]) — Delta's `table_changes` /
  * Iceberg's changes table. A separate table (rather than an option on
  * the main one) because a DSv2 plan's schema is fixed by
  * `Table.schema()` at resolution: the tag column must BE the schema,
  * not appear later.
  *
  * Two faces over one feed construction ([[ManifestChanges.feedBetween]]):
  *  - STREAMING: `spark.readStream.table("graft.ns.t.changes")` — the
  *    micro-batch stream above, offsets = versions;
  *  - BATCH: `spark.read.option("startingVersion", a)
  *    .option("endingVersion", b).table("graft.ns.t.changes")` — the
  *    changes of versions `(a, b]` as one relation (Delta's
  *    `table_changes(t, a+1, b)`). `startingVersion` is the version the
  *    diff starts FROM (exclusive — the same convention as the
  *    streaming source's option and [[Manifests.changesBetween]]);
  *    `endingVersion` defaults to latest; both options absent → the
  *    whole latest snapshot tagged `insert`. Served as a
  *    [[org.apache.spark.sql.connector.read.V1Scan]] over the composed
  *    diff plan: the feed is churned-files-sized by construction, so
  *    nothing is materialized and the anti-join/exceptAll machinery
  *    runs as an ordinary distributed plan.
  *
  * Schema (table schema + `_change_type`) is computed ONCE at table
  * construction: `schema()` is called at analysis and the scan builds
  * later, and a schema-evolving commit landing between the two must not
  * make the scan emit rows the analyzed plan does not expect. */
private[manifest] class ManifestChangesTable(spark: SparkSession,
    base: String, ident: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  private val feedSchema: StructType = {
    val v = Manifests.latestVersion(spark, base).getOrElse(
      sys.error(s"$base has no committed version — nothing to stream"))
    val s = Manifests.schemaOf(spark, base, v).getOrElse(
      spark.read.parquet(Manifests.files(spark, base, v).head).schema)
    // Delta `table_changes` parity: the catalog faces carry the
    // provenance pair beside the tag. Nullable — the endpoint-diff
    // feed shape nets across versions and cannot attribute a row to
    // one commit (per-version attribution rides the updateImages /
    // streaming per-step shapes, where changesAt stamps real values).
    StructType(s.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.IntegerType, nullable = true),
      org.apache.spark.sql.types.StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType, nullable = true)))
  }

  override def name(): String = ident

  override def schema(): StructType = feedSchema

  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    val s = new java.util.HashSet[
      org.apache.spark.sql.connector.catalog.TableCapability]()
    s.add(org.apache.spark.sql.connector.catalog.TableCapability
      .MICRO_BATCH_READ)
    s.add(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan
            with org.apache.spark.sql.connector.read.V1Scan {
          override def readSchema(): StructType = feedSchema
          override def description(): String = s"manifest-changes($base)"
          override def toMicroBatchStream(checkpointLocation: String)
              : MicroBatchStream =
            new ManifestChangesMicroBatchStream(spark, base, feedSchema,
              options, checkpointLocation)
          override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan](
              context: org.apache.spark.sql.SQLContext): T = {
            // `latest` is accepted exactly as on the streaming face
            // (diff from the current head — an explicit endingVersion
            // past it can still yield changes); a non-integer otherwise
            // refuses with the option name, never a bare parse error
            def opt(k: String): Option[Int] =
              Option(options.get(k)).map {
                case "latest" => Manifests.latestVersion(spark, base)
                  .getOrElse(sys.error(s"$base has no committed version"))
                case s if s.nonEmpty && s.forall(_.isDigit) => s.toInt
                case s => sys.error(s"option $k must be a version " +
                  s"number or 'latest' (got '$s')")
              }
            val to = opt("endingVersion").getOrElse(
              Manifests.latestVersion(spark, base).getOrElse(
                sys.error(s"$base has no committed version")))
            val from = opt("startingVersion").getOrElse(-1)
            require(from <= to,
              s"startingVersion $from is past endingVersion $to of $base")
            val sch = feedSchema
            val updImages =
              Option(options.get("updateImages")).exists(_.toBoolean)
            new org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan {
              override def sqlContext: org.apache.spark.sql.SQLContext = context
              override def schema: StructType = sch
              override def buildScan()
                  : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
                ManifestChanges.feedBetween(spark, base, from, to, sch,
                  updImages).rdd
            }.asInstanceOf[T]
          }
        }
    }
}

/** `df.writeStream.toTable("graft.ns.t")` — the DSv2 streaming WRITE:
  * tasks stream parquet into per-epoch subdirectories of one
  * query-scoped data directory, and each epoch commits through the
  * manifest append protocol with the epoch id as the replay key — the
  * same exactly-once contract as `appendBatch` (the manifest IS the
  * batch-done record: a replayed epoch finds its `/epoch_<id>/` files
  * referenced by the latest manifest and no-ops). Append output mode
  * only; assumes the query is the table's only concurrent writer,
  * like every streaming sink here. */
private[manifest] class ManifestStreamingWrite(spark: SparkSession,
    base: String, schema: StructType, queryId: String,
    partCols: Seq[String]) extends StreamingWrite {

  // the replay key must be QUERY-scoped: two streaming queries into the
  // same table both start at epoch 0, and a bare /epoch_0/ marker would
  // read the other query's files as "this epoch already landed" —
  // silently discarding early epochs. queryId is stable across restarts
  // (it lives in the checkpoint), which is exactly the identity replay
  // detection needs.
  private val qTag =
    "q" + queryId.replaceAll("[^a-zA-Z0-9-]", "").take(36)

  private val dir =
    s"$base/data_stream_${java.util.UUID.randomUUID().toString.take(8)}"

  private[manifest] def epochMarker(epochId: Long): String =
    s"/${qTag}_epoch_$epochId/"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Dfs.mkdirs(spark, dir)
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sessionState.newHadoopConf())
    val factory = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      job.getConfiguration)
    ManifestStreamingWriterFactory(dir, qTag, schema, factory, conf)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val written = messages.flatMap {
      case ManifestWriteMessage(paths) => paths
      case _ => Seq.empty
    }.toSeq.map(Dfs.qualified(spark, _))
    if (written.nonEmpty) {
      // the (queryId, epoch) pair also lands in the transaction ledger
      // (Delta's txn action), so epoch replay detection stays O(1) and
      // survives later DML rewriting this epoch's files away
      Manifests.appendWrittenFiles(spark, base, written, schema,
        replayMarker = Some(epochMarker(epochId)),
        bootstrapPartCols = partCols,
        txn = Some((qTag, epochId)))
      ()
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    try Dfs.delete(spark, s"$dir/${qTag}_epoch_$epochId", recursive = true)
    catch { case scala.util.control.NonFatal(_) => () }

  override def toString: String = s"ManifestStreamingWrite[$base]"
}

/** [[ManifestWriterFactory]]'s streaming twin: same task-side parquet
  * writer, epoch-scoped subdirectory so replay detection keys on the
  * path. */
private[manifest] case class ManifestStreamingWriterFactory(dir: String,
    qTag: String, schema: StructType,
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    ManifestWriterFactory(s"$dir/${qTag}_epoch_$epochId", schema, factory,
      conf).createWriter(partitionId, taskId)
}
