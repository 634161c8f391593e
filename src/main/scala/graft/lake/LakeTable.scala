package graft.lake

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DateType,
  DoubleType, FloatType, IntegerType, LongType, ShortType, StringType,
  StructField, StructType, TimestampNTZType, TimestampType}

/** Minimal Iceberg-style snapshot-committed Parquet table.
  *
  * Layout:
  * {{{
  *   <root>/metadata/v%05d.json          -- immutable snapshot metadata
  *   <root>/metadata/manifest-<id>.json  -- immutable data-file lists
  *   <root>/metadata/version-hint.text
  *   <root>/data/commit-<v>-<id>/_bucket=<k>/part-*.parquet
  * }}}
  *
  * Snapshot metadata is MANIFEST-STYLE (Iceberg's shape): a snapshot
  * holds a list of immutable manifest files, each listing data files.
  * A commit writes one new manifest for its new files and REUSES every
  * prior manifest untouched by the commit; only manifests that lose a
  * file (copy-on-write / compaction) are rewritten. Metadata written per
  * commit is therefore O(changed files), not O(total files) — at
  * thousands of buckets × delta commits the full-file-list-per-snapshot
  * alternative rewrites megabytes of JSON per commit.
  *
  * Semantics (the subset of the Iceberg spec the north rule needs):
  *  - a snapshot is an immutable list of data files; readers only see
  *    files referenced by a committed snapshot (orphan files from failed
  *    commits are invisible);
  *  - commits are atomic via exclusive-create of the next version file;
  *  - idempotent re-commit: each snapshot records `(checkpointId →
  *    lastBatchId)`; replaying an already-applied micro-batch is a no-op —
  *    this is the exactly-once anchor for `foreachBatch` replay;
  *  - schema evolution: additive nullable columns recorded in metadata;
  *    old files read through the new schema (missing columns → null);
  *  - time travel: read any retained version — used by the replay-parity
  *    tests; `expireSnapshots` bounds metadata growth, `vacuum` removes
  *    data files no retained snapshot references;
  *  - data is hash-bucketed by key so MERGE only reads + rewrites the
  *    buckets the delta batch touches (copy-on-write partition pruning:
  *    at 10^10 rows a batch touching 5% of buckets reads 5% of the table).
  *  - per-commit lineage: op counts, source offset range, rows written —
  *    the north rule's per-partition lineage + metrics.
  *
  * Two MERGE strategies:
  *  - `merge` — copy-on-write: affected buckets are read, joined with the
  *    delta batch and rewritten. Reads stay cheapest (plain scans), but a
  *    hot batch touching every bucket rewrites the whole table — commit
  *    cost is O(affected table data).
  *  - `mergeDeltas` — merge-on-read: the reduced batch is written as
  *    bucket-partitioned DELTA files (payload + `operation`) and the
  *    snapshot just appends them; nothing is read or rewritten, so commit
  *    cost is O(batch) regardless of table size — the 10^10-row streaming
  *    hot path. Readers reconstruct a bucket by last-writer-wins over the
  *    commit sequence (one ObjectHashAggregate over base+delta files of
  *    buckets that have deltas; delta-free buckets scan directly).
  *    `compact` folds a bucket's deltas back into a base file; merges
  *    auto-compact once a bucket accumulates `autoCompact` delta commits,
  *    bounding the read tax.
  */
class LakeTable(val spark: SparkSession, val root: String) {

  private val mapper = new ObjectMapper()
  private def fs: FileSystem = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def metaDir = new Path(root, "metadata")
  private def versionFile(v: Int) = new Path(metaDir, f"v$v%05d.json")

  /** `seq` = version of the commit that wrote the file (orders writers for
    * merge-on-read reconstruction); `delta` = file carries `operation`
    * rows to overlay, not final base rows; `patch` = delta rows may be
    * PARTIAL updates (`_patch_mask` column), so reconstruction must fold
    * in seq order instead of last-writer-wins; `stats` = per-column
    * (min, max) in canonical form (Long / Double / String), harvested
    * from the parquet FOOTER at commit time for the table's
    * `statsColumns` — the basis for manifest-level data skipping
    * ([[readWhere]]). Absent = unknown, never prunes. */
  case class DataFile(path: String, bucket: Int, seq: Int = 0,
      delta: Boolean = false, patch: Boolean = false,
      stats: Map[String, (Any, Any)] = Map.empty,
      nulls: Map[String, Long] = Map.empty,
      rows: Long = -1L)
  /** Immutable list of data files, stored once under `metadata/` and
    * reused by every later snapshot that doesn't remove one of its
    * files. An empty `path` marks a legacy inline file list (pre-manifest
    * snapshots), always rewritten on the next commit. */
  case class Manifest(path: String, files: Seq[DataFile])
  case class Snapshot(
      version: Int,
      schema: StructType,
      keyColumns: Seq[String],
      nBuckets: Int,
      manifests: Seq[Manifest],
      commits: Map[String, Long],
      lineage: Option[JsonNode],
      statsColumns: Seq[String] = Nil,
      bloomColumns: Seq[String] = Nil,
      /** Commit wall-clock (epoch ms), stamped at publish; -1 for
        * snapshots written before the field existed. */
      committedAtMs: Long = -1L,
      /** Free-form table properties carried commit to commit (e.g. the
        * stored z-order cut points enabling incremental re-zorder). */
      properties: Map[String, String] = Map.empty) {
    def files: Seq[DataFile] = manifests.flatMap(_.files)
  }

  /** Manifests are immutable once written — cache their parsed contents
    * JVM-WIDE (keyed by absolute path) so the SQL/DML paths, which build
    * a fresh LakeTable per statement/relation, don't re-read and
    * re-parse every manifest per statement. Safe: a manifest file never
    * changes after publish, and vacuum only deletes manifests no
    * retained snapshot references (so a stale entry is never looked up;
    * it is evicted on delete anyway). */
  private def manifestCache = LakeTable.manifestCache
  private def manifestKey(rel: String) = s"$root/$rel"

  // ------------------------------------------------------------ metadata

  private def listVersions: Seq[Int] = {
    if (!fs.exists(metaDir)) return Nil
    fs.listStatus(metaDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt).toSeq.sorted
  }

  def currentVersion: Option[Int] = listVersions.lastOption

  private def parseFiles(arr: JsonNode): Seq[DataFile] =
    arr.elements().asScala.map { f =>
      val stats: Map[String, (Any, Any)] =
        if (!f.has("stats")) Map.empty
        else f.get("stats").fields().asScala.map { e =>
          e.getKey -> ((statVal(e.getValue.get("min")), statVal(e.getValue.get("max"))))
        }.toMap
      val nulls: Map[String, Long] =
        if (!f.has("nulls")) Map.empty
        else f.get("nulls").fields().asScala.map { e =>
          e.getKey -> e.getValue.asLong()
        }.toMap
      DataFile(f.get("path").asText(), f.get("bucket").asInt(),
        if (f.has("seq")) f.get("seq").asInt() else 0,
        f.has("delta") && f.get("delta").asBoolean(),
        f.has("patch") && f.get("patch").asBoolean(),
        stats, nulls,
        if (f.has("rows")) f.get("rows").asLong() else -1L)
    }.toSeq

  private def statVal(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else n.asText()

  private def loadManifest(path: String): Manifest =
    Manifest(path, manifestCache.getOrElseUpdate(manifestKey(path),
      parseFiles(mapper.readTree(readFully(new Path(root, path)))))
      .asInstanceOf[Seq[DataFile]]) // same case class; cache is per-root

  def snapshot(version: Int): Snapshot = {
    val node = mapper.readTree(readFully(versionFile(version)))
    val manifests =
      if (node.has("manifests"))
        node.get("manifests").elements().asScala.map(p => loadManifest(p.asText())).toSeq
      else // legacy inline file list: treated as a manifest that is always rewritten
        Seq(Manifest("", parseFiles(node.get("files")))).filter(_.files.nonEmpty)
    Snapshot(
      version = node.get("version").asInt(),
      schema = DataType.fromJson(node.get("schemaJson").asText()).asInstanceOf[StructType],
      keyColumns = node.get("keyColumns").elements().asScala.map(_.asText()).toSeq,
      nBuckets = node.get("nBuckets").asInt(),
      manifests = manifests,
      commits = node.get("commits").fields().asScala
        .map(e => e.getKey -> e.getValue.asLong()).toMap,
      lineage = Option(node.get("lineage")),
      statsColumns =
        if (node.has("statsColumns"))
          node.get("statsColumns").elements().asScala.map(_.asText()).toSeq
        else Nil,
      bloomColumns =
        if (node.has("bloomColumns"))
          node.get("bloomColumns").elements().asScala.map(_.asText()).toSeq
        else Nil,
      committedAtMs =
        if (node.has("committedAtMs")) node.get("committedAtMs").asLong() else -1L,
      properties =
        if (node.has("properties"))
          node.get("properties").fields().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        else Map.empty)
  }

  def currentSnapshot: Option[Snapshot] = currentVersion.map(snapshot)

  private def readFully(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Persist a data-file list as an immutable manifest (None when empty). */
  private def writeManifest(files: Seq[DataFile]): Option[Manifest] = {
    if (files.isEmpty) return None
    val rel = s"metadata/manifest-${java.util.UUID.randomUUID()}.json"
    val arr = mapper.createArrayNode()
    files.foreach { f =>
      val o = arr.addObject(); o.put("path", f.path); o.put("bucket", f.bucket)
      o.put("seq", f.seq); o.put("delta", f.delta); o.put("patch", f.patch)
      if (f.rows >= 0) o.put("rows", f.rows)
      if (f.nulls.nonEmpty) {
        val nn = o.putObject("nulls")
        f.nulls.foreach { case (c, n) => nn.put(c, n) }
      }
      if (f.stats.nonEmpty) {
        val st = o.putObject("stats")
        f.stats.foreach { case (c, (mn, mx)) =>
          val cn = st.putObject(c)
          def put(k: String, v: Any): Unit = v match {
            case l: Long => cn.put(k, l)
            case d: Double => cn.put(k, d)
            case s: String => cn.put(k, s)
            case other => sys.error(s"BUG: unserializable stat $other")
          }
          put("min", mn); put("max", mx)
        }
      }
    }
    val out = fs.create(new Path(root, rel), false)
    try out.write(mapper.writeValueAsBytes(arr)) finally out.close()
    manifestCache.put(manifestKey(rel), files)
    Some(Manifest(rel, files))
  }

  /** Next snapshot's manifest list: manifests containing no removed file
    * are REUSED verbatim; survivors of touched manifests are folded into
    * one rewritten manifest; `added` files get their own new manifest.
    * Metadata written = O(removed + added files). */
  private def nextManifests(cur: Snapshot, removed: DataFile => Boolean,
      added: Seq[DataFile]): Seq[Manifest] = {
    val (touched, untouched) = cur.manifests.partition(
      m => m.path.isEmpty || m.files.exists(removed))
    val survivors = touched.flatMap(_.files).filterNot(removed)
    untouched ++ writeManifest(survivors) ++ writeManifest(added)
  }

  private def writeSnapshot(s: Snapshot): Unit = {
    val hook = preCommitHook; preCommitHook = () => (); hook()
    require(s.manifests.forall(_.path.nonEmpty),
      "BUG: committing a snapshot with an unmaterialized legacy manifest")
    val lineage: JsonNode = s.lineage.orNull
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    node.put("schemaJson", s.schema.json)
    val kc = node.putArray("keyColumns"); s.keyColumns.foreach(kc.add)
    node.put("nBuckets", s.nBuckets)
    val ma = node.putArray("manifests")
    s.manifests.foreach(m => ma.add(m.path))
    val cm = node.putObject("commits")
    s.commits.foreach { case (k, v) => cm.put(k, v) }
    node.put("committedAtMs", System.currentTimeMillis())
    if (s.statsColumns.nonEmpty) {
      val sc = node.putArray("statsColumns"); s.statsColumns.foreach(sc.add)
    }
    if (s.bloomColumns.nonEmpty) {
      val bc = node.putArray("bloomColumns"); s.bloomColumns.foreach(bc.add)
    }
    if (s.properties.nonEmpty) {
      val pr = node.putObject("properties")
      s.properties.toSeq.sortBy(_._1).foreach { case (k, v) => pr.put(k, v) }
    }
    if (lineage != null) node.set[ObjectNode]("lineage", lineage.deepCopy())

    val target = versionFile(s.version)
    if (fs.exists(target)) // fast path; the real race is decided below
      throw new ConcurrentCommitException(s"concurrent commit: $target already exists")
    val tmp = new Path(metaDir, s"v${s.version}.json.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
    publishExclusive(tmp, target)
    val hint = new Path(metaDir, "version-hint.text")
    val h = fs.create(hint, true)
    try h.write(s.version.toString.getBytes("UTF-8")) finally h.close()
  }

  /** Publish a fully-written temp file at `target`, failing if `target`
    * exists — ATOMICALLY on the optimistic-concurrency race.
    *
    * POSIX rename(2) silently REPLACES an existing destination, so on a
    * local filesystem two racing committers would both "succeed" and one
    * commit's files silently vanish from the snapshot. link(2) is the
    * exclusive-create primitive: it fails with EEXIST if the target
    * appeared, and the content is complete before it becomes visible.
    * On HDFS, rename already refuses an existing destination atomically
    * at the namenode. */
  private def publishExclusive(tmp: Path, target: Path): Unit = {
    if ("file".equals(fs.getUri.getScheme)) {
      val src = java.nio.file.Paths.get(tmp.toUri.getPath)
      val dst = java.nio.file.Paths.get(target.toUri.getPath)
      try java.nio.file.Files.createLink(dst, src)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          throw new ConcurrentCommitException(s"concurrent commit: $target already exists")
      }
      fs.delete(tmp, false)
    } else {
      if (!fs.rename(tmp, target)) {
        fs.delete(tmp, false)
        throw new ConcurrentCommitException(s"concurrent commit: rename to $target failed")
      }
    }
  }

  /** Test seam for commit-race injection: fires ONCE immediately before
    * the next snapshot publish on this instance, then resets (so a
    * rebase retry doesn't re-fire it). Specs use it to interleave a
    * competing writer's commit inside this writer's race window. */
  private[graft] var preCommitHook: () => Unit = () => ()

  /** Validate that a commit built against `base` may be REBASED onto the
    * new head `cur` without changing its meaning; throws
    * [[ConcurrentCommitException]] otherwise. `ourBuckets = Some(b)`
    * marks a copy-on-write commit that REWRITES those buckets — it
    * conflicts with any interim commit touching them (the interim
    * writer's files would be silently dropped from the snapshot: the
    * lost-update anomaly). `None` marks an append-only commit (delta or
    * base file additions), which serializes AFTER any interim commit by
    * construction — merge-on-read reconstruction orders by commit seq,
    * and the rebase re-stamps the new files with the final version. */
  private def rebaseCheck(base: Snapshot, cur: Snapshot,
      ourBuckets: Option[Set[Int]],
      allowedOps: Option[Set[String]] = None): Unit = {
    def conflict(msg: String): Nothing = throw new ConcurrentCommitException(
      s"concurrent commit conflict (base v${base.version} -> head v${cur.version}): $msg")
    if (cur.schema != base.schema) conflict("schema changed concurrently")
    if (cur.keyColumns != base.keyColumns) conflict("key columns changed concurrently")
    if (cur.nBuckets != base.nBuckets) conflict("bucket count changed concurrently")
    var prev = base
    var v = base.version + 1
    while (v <= cur.version) {
      val s =
        try snapshot(v)
        catch { case scala.util.control.NonFatal(_) => conflict(s"cannot read interim v$v") }
      val op = s.lineage.flatMap(n => Option(n.get("operation")).map(_.asText()))
        .getOrElse("")
      if (op == "rebucket" || op == "rollback" || op.isEmpty)
        conflict(s"interim commit v$v is ${if (op.isEmpty) "of unknown provenance" else op}")
      allowedOps.foreach { ok =>
        if (!ok(op)) conflict(s"interim commit v$v ($op) is not composable " +
          "with this maintenance rewrite")
      }
      ourBuckets.foreach { mine =>
        val prevPaths = prev.files.map(_.path).toSet
        val curPaths = s.files.map(_.path).toSet
        val touched = (s.files.filterNot(f => prevPaths(f.path)) ++
          prev.files.filterNot(f => curPaths(f.path))).map(_.bucket).toSet
        val overlap = touched.intersect(mine)
        if (overlap.nonEmpty) conflict(s"interim commit v$v ($op) touched bucket(s) " +
          s"${overlap.toSeq.sorted.take(8).mkString(",")} this commit also rewrites")
      }
      prev = s
      v += 1
    }
  }

  /** Publish `build(base)` with optimistic-concurrency retry: losing the
    * version race triggers [[rebaseCheck]] against the new head and, if
    * sound, an O(metadata) rebase — the already-written data files are
    * re-stamped with the final commit seq and the snapshot is rebuilt;
    * no data is rewritten. `replayKey` re-applies the idempotence check
    * against the head (a racing writer may have committed the SAME
    * batch — dual drivers — in which case the rebase degenerates to the
    * no-op replay and this writer's staged files become vacuum-able
    * orphans). */
  private def publishOptimistic(base0: Snapshot, build: Snapshot => Snapshot,
      ourBuckets: Option[Set[Int]], replayKey: Option[(String, Long)],
      allowedOps: Option[Set[String]] = None): Snapshot = {
    var base = base0
    var attempt = build(base)
    var tries = 0
    while (tries <= 10) {
      try { writeSnapshot(attempt); return attempt }
      catch {
        case e: ConcurrentCommitException =>
          tries += 1
          if (tries > 10) throw e
          val head =
            try currentSnapshot.getOrElse(throw e)
            catch { case scala.util.control.NonFatal(_) => throw e }
          for ((cp, b) <- replayKey)
            if (head.commits.get(cp).exists(_ >= b)) return head.copy(lineage = None)
          rebaseCheck(base, head, ourBuckets, allowedOps)
          System.err.println(s"[lake-occ] rebasing onto v${head.version} (attempt $tries)")
          base = head
          attempt = build(base)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Interim ops a FOLDED maintenance rewrite (compact/cluster/zorder)
    * composes with when it loses the version race: append-only commits —
    * their files survive the rebase (removal is by PATH, not bucket) and
    * OVERLAY the folded output, which is stamped with the ORIGINAL base
    * version as its seq, strictly below any interim commit — plus
    * metadata-only stats/bloom changes. Everything else (COW merge,
    * delete/update, another fold, rebucket, rollback, schema change)
    * rewrites or re-keys state the fold didn't read, and must win. */
  private val maintenanceComposableOps = Set(
    "mergeDeltas", "append", "setStatsColumns", "setBloomColumns")

  /** Publish a key-preserving folded rewrite with OCC rebase: racing
    * ingest (merge-on-read deltas / appends) does NOT abort maintenance
    * — compaction can run beside live writers. */
  private def publishMaintenance(cur: Snapshot, removedPaths: Set[String],
      newFiles: Seq[DataFile], lineage: ObjectNode,
      propsUpdate: Map[String, String] = Map.empty): Snapshot =
    publishOptimistic(cur, base => base.copy(version = base.version + 1,
      manifests = nextManifests(base, f => removedPaths.contains(f.path), newFiles),
      lineage = Some(lineage),
      properties = base.properties ++ propsUpdate),
      ourBuckets = None, replayKey = None,
      allowedOps = Some(maintenanceComposableOps))

  /** Data directory for a commit's files — version-tagged for humans,
    * uniquified so two RACING writers staging the same next version
    * never interleave files in one directory (the loser's staged files
    * are invisible to snapshots and vacuumable if its rebase aborts). */
  private def newCommitDir(prefix: String, v: Int): Path =
    new Path(root, s"data/$prefix-$v-${java.util.UUID.randomUUID().toString.take(8)}")

  // ------------------------------------------------------------ lifecycle

  /** `statsColumns`: columns whose per-file min/max are harvested from
    * parquet footers at commit time and recorded in manifests, enabling
    * [[readWhere]] data skipping. Supported types: integral, float
    * family, string, date, timestamp (others are rejected — no sound
    * ordering is recorded for them). Empty (the default) = zero
    * overhead.
    *
    * `bloomColumns`: columns that get a parquet BLOOM FILTER per data
    * file (adaptive sizing, written by every commit from then on).
    * Min/max stats can't prune point lookups over hash-distributed
    * values (every file spans nearly the full domain); a bloom answers
    * "definitely not in this row group" for `=` / `IN` predicates, so
    * [[readKeys]] skips the row groups of files that don't hold the key
    * — the sub-bucket half of point-lookup pruning (bucket pruning
    * bounds the lookup to keys/nBuckets of the table; blooms bound it
    * to the files actually containing the keys). */
  def create(schema: StructType, keyColumns: Seq[String], nBuckets: Int = 32,
      statsColumns: Seq[String] = Nil, bloomColumns: Seq[String] = Nil): Unit = {
    require(currentVersion.isEmpty, s"table already exists at $root")
    validateStatsColumns(schema, statsColumns)
    validateStatsColumns(schema, bloomColumns)
    fs.mkdirs(metaDir)
    writeSnapshot(Snapshot(0, schema, keyColumns, nBuckets, Nil: Seq[Manifest],
      Map.empty, None, statsColumns, bloomColumns))
  }

  private def validateStatsColumns(schema: StructType, cols: Seq[String]): Unit =
    cols.foreach { c =>
      val idx = schema.fieldNames.indexOf(c)
      require(idx >= 0, s"stats column '$c' not in schema")
      val ok = schema(idx).dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType | DateType | TimestampType |
             TimestampNTZType => true
        case _ => false
      }
      require(ok, s"stats column '$c': unsupported type ${schema(idx).dataType.simpleString}")
    }

  /** Change the harvested stats columns (metadata-only commit): files
    * written AFTER this carry the new stats; existing files keep theirs
    * (absent stats never prune, so reads stay correct). */
  def setStatsColumns(cols: Seq[String]): Snapshot = {
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    validateStatsColumns(cur.schema, cols)
    val next = cur.copy(version = cur.version + 1,
      manifests = nextManifests(cur, _ => false, Nil),
      statsColumns = cols,
      lineage = Some(lineageNode("setStatsColumns",
        Map("columns" -> cols.mkString(",")))))
    writeSnapshot(next)
    next
  }

  /** Change the bloom-filtered columns (metadata-only commit): files
    * written AFTER this carry blooms; files without one are simply not
    * row-group-skippable (reads stay correct). */
  def setBloomColumns(cols: Seq[String]): Snapshot = {
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    validateStatsColumns(cur.schema, cols)
    val next = cur.copy(version = cur.version + 1,
      manifests = nextManifests(cur, _ => false, Nil),
      bloomColumns = cols,
      lineage = Some(lineageNode("setBloomColumns",
        Map("columns" -> cols.mkString(",")))))
    writeSnapshot(next)
    next
  }

  /** Schema evolution: new nullable columns appended, and existing
    * columns may WIDEN to a type the old one up-casts to losslessly
    * (`Cast.canUpCast`: int→long, float→double, decimal precision
    * growth, …) — the parquet vectorized reader up-casts old files
    * per-column at scan time, so no data is rewritten (verified for
    * the integral/float/decimal families; metadata-only commit either
    * way). Narrowing or incompatible type changes are rejected —
    * as is tightening nullability (old files may hold nulls). */
  def evolveSchema(newSchema: StructType): Snapshot = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    val existing = cur.schema.fieldNames.toSet
    val added = newSchema.fields.filterNot(f => existing.contains(f.name))
    require(added.forall(_.nullable), "evolved columns must be nullable")
    require(cur.schema.fieldNames.forall(newSchema.fieldNames.contains),
      "column drops are not supported")
    val widened = cur.schema.fields.flatMap { old =>
      val neu = newSchema(newSchema.fieldIndex(old.name))
      require(neu.dataType == old.dataType ||
        Cast.canUpCast(old.dataType, neu.dataType),
        s"column '${old.name}': ${old.dataType.simpleString} -> " +
          s"${neu.dataType.simpleString} is not a lossless widening")
      // a key column's TYPE is part of the physical layout: murmur3
      // hashes int 5 and long 5 differently, so widening a key would
      // silently re-route every existing key's bucket
      require(neu.dataType == old.dataType || !cur.keyColumns.contains(old.name),
        s"key column '${old.name}' cannot change type (bucket routing " +
          "hashes the declared type); rebucket into a new table instead")
      require(neu.nullable || !old.nullable,
        s"column '${old.name}': cannot tighten nullability (old files may hold nulls)")
      if (neu.dataType != old.dataType)
        Some(s"${old.name}:${old.dataType.simpleString}->${neu.dataType.simpleString}")
      else None
    }
    val next = cur.copy(version = cur.version + 1, schema = newSchema,
      manifests = nextManifests(cur, _ => false, Nil),
      lineage = Some(lineageNode("evolveSchema",
        Map("addedColumns" -> added.map(_.name).mkString(","),
          "widenedColumns" -> widened.mkString(",")))))
    writeSnapshot(next)
    next
  }

  private def lineageNode(opType: String, kv: Map[String, String]): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("operation", opType)
    kv.foreach { case (k, v) => o.put(k, v) }
    o
  }

  // ------------------------------------------------------------ read

  private def bucketCol(keyColumns: Seq[String], nBuckets: Int) =
    pmod(hash(keyColumns.map(col): _*), lit(nBuckets))

  /** Driver-side evaluation of [[bucketCol]] for a set of key tuples:
    * binds the SAME catalyst nodes (`Pmod(Murmur3Hash(seed=42), n)`) to
    * the key schema and evals per key — identical bucket routing to the
    * column expression by construction (pinned by LakeDataSkipSpec's
    * parity test), with no job launch per lookup. */
  private def driverBuckets(keys: Seq[Seq[Any]], keySchema: StructType,
      nBuckets: Int): Set[Int] = {
    import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash, Pmod, Literal => CatLit}
    val refs = keySchema.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }
    val expr = Pmod(new Murmur3Hash(refs.toSeq), CatLit(nBuckets))
    val conv = CatalystTypeConverters.createToCatalystConverter(keySchema)
    keys.map { k =>
      expr.eval(conv(org.apache.spark.sql.Row.fromSeq(k)).asInstanceOf[InternalRow])
        .asInstanceOf[Int]
    }.toSet
  }

  /** Write parallelism is DECOUPLED from the table's bucket count: when
    * the session has more shuffle partitions than the table has buckets,
    * rows are additionally salted inside each bucket so a commit writes
    * with full cluster parallelism (several files per bucket) instead of
    * being capped at nBuckets tasks — the create-time bucket constant must
    * not cap a 1000-executor writer. 1 when nBuckets already saturates. */
  private def filesPerBucket(nBuckets: Int): Int = {
    val target = spark.sessionState.conf.numShufflePartitions
    math.max(1, target / math.max(1, nBuckets))
  }

  /** In-bucket salt: deterministic on the key (a key's rows stay in one
    * file per commit), independent of the bucket hash. */
  private def saltCol(keyColumns: Seq[String], fpb: Int) =
    if (fpb <= 1) lit(0)
    else pmod(hash(keyColumns.map(col) :+ lit("graft-salt"): _*), lit(fpb))

  /** Repartition a bucketed write so every (bucket, salt) slot occupies
    * exactly ONE shuffle partition. The former
    * `repartition(n, _bucket, salt)` hashed ~n distinct slot values into
    * n partitions, which leaves ~1/e of the write tasks empty and gives
    * others 2-3 buckets (guide §2.5: synthetic partitioning keys with
    * too few distinct values) — a built-in straggler tail on every
    * commit's write stage at any scale. Rows are instead routed by a
    * driver-computed murmur3 PREIMAGE of their slot id
    * ([[LakeTable.partitionPreimages]]), giving perfect 1:1 packing.
    * `buckets` = the bucket ids this write can produce (driver-known on
    * every commit path; non-dense sets map through a literal map). */
  private def packedByBucket(df: DataFrame, buckets: Seq[Int], fpb: Int,
      keyColumns: Seq[String]): DataFrame = {
    val sorted = buckets.sorted
    val nParts = math.max(1, sorted.size * fpb)
    val inv = LakeTable.partitionPreimages(nParts)
    val dense: org.apache.spark.sql.Column =
      if (sorted == (0 until sorted.size)) col("_bucket")
      else element_at(
        map(sorted.zipWithIndex.flatMap { case (b, i) => Seq(lit(b), lit(i)) }: _*),
        col("_bucket"))
    val slot = (dense * fpb + saltCol(keyColumns, fpb)).cast("int")
    df.repartition(nParts, element_at(typedlit(inv.toSeq), slot + 1))
  }

  /** Read a snapshot (current by default). Missing columns in old files
    * surface as null through the declared schema. Buckets carrying delta
    * files are LWW-reconstructed; delta-free buckets are plain scans. */
  def read(version: Option[Int] = None): DataFrame = {
    val snap = version.map(snapshot).orElse(currentSnapshot)
      .getOrElse(sys.error(s"no table at $root"))
    snapBucketsRead(snap, None)
  }

  /** Column-pruned read: only `columns` (plus, internally, the key
    * columns and `operation`) flow through the merge-on-read LWW
    * aggregate, so the parquet scans read just those columns — `read()`
    * followed by `.select` cannot prune past the reconstruction
    * aggregate, whose buffer carries the full payload struct. At a
    * 100-column table scanned for 2 columns this is the difference
    * between reading 2% and 100% of the bytes. */
  def readColumns(columns: Seq[String], version: Option[Int] = None): DataFrame = {
    val snap = version.map(snapshot).orElse(currentSnapshot)
      .getOrElse(sys.error(s"no table at $root"))
    val bad = columns.filterNot(snap.schema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns: ${bad.mkString(", ")}")
    val deltaBuckets = snap.files.filter(_.delta).map(_.bucket).toSet
    if (deltaBuckets.isEmpty)
      return readFiles(snap, snap.files).select(columns.map(col): _*)
    val (morFiles, pureBase) = snap.files.partition(f => deltaBuckets.contains(f.bucket))
    val payload = columns.filterNot(snap.keyColumns.contains)
    readFiles(snap, pureBase).select(columns.map(col): _*)
      .unionByName(reconstructRows(snap, morFiles, Some(payload))
        .select(columns.map(col): _*))
  }

  /** Predicate-pruned read: equivalent to `read().filter(pred)` but
    * skips every data file whose manifest min/max stats prove it cannot
    * contain a matching row — at 10^10 rows with a selective predicate
    * on a stats column this reads a handful of files instead of the
    * table. Soundness split:
    *  - buckets WITHOUT deltas hold final rows → per-FILE pruning;
    *  - buckets WITH deltas are LWW/patch-fold reconstructed, where a
    *    final row can combine column values from several files → the
    *    bucket is pruned only when the predicate cannot match the UNION
    *    of all its files' ranges (drop-all-or-keep-all per bucket).
    * Unknown stats / unsupported predicate shapes never prune; the
    * surviving scan re-applies the full predicate. */
  def readWhere(pred: org.apache.spark.sql.Column,
      version: Option[Int] = None,
      columns: Option[Seq[String]] = None): DataFrame = {
    val snap = version.map(snapshot).orElse(currentSnapshot)
      .getOrElse(sys.error(s"no table at $root"))
    val e = org.apache.spark.sql.graftshim.toCatalyst(pred)
    val (keptBase, keptMor, total) = pruneForPredicate(snap, e)
    System.err.println(s"[lake-skip] kept=${keptBase.size + keptMor.size}/$total files")
    // column pruning must reach PAST the MoR reconstruction aggregate
    // (see readColumns): scan the requested columns plus whatever the
    // predicate itself reads, project the requested set at the end
    val outCols = columns.map { cs =>
      val bad = cs.filterNot(snap.schema.fieldNames.contains)
      require(bad.isEmpty, s"unknown columns: ${bad.mkString(", ")}")
      cs
    }
    // scan set = requested ∪ predicate-read ∪ key columns (keys keep the
    // two sides aligned and cost nothing extra in the MoR aggregate,
    // which groups by them anyway), in schema order
    val scanCols = outCols.map { cs =>
      val want = (cs ++ predAttrs(e) ++ snap.keyColumns).toSet
      snap.schema.fieldNames.toSeq.filter(want.contains)
    }
    val baseDf = {
      val df = readFiles(snap, keptBase)
      scanCols.map(cs => df.select(cs.map(col): _*)).getOrElse(df)
    }
    val morDf =
      if (keptMor.isEmpty) {
        val sch = StructType(scanCols
          .map(cs => snap.schema.fields.filter(f => cs.contains(f.name)))
          .getOrElse(snap.schema.fields))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
      } else reconstructRows(snap, keptMor,
        scanCols.map(_.filterNot(snap.keyColumns.contains))).filter(pred)
    val unioned = baseDf.filter(pred).unionByName(morDf)
    outCols.map(cs => unioned.select(cs.map(col): _*)).getOrElse(unioned)
  }

  /** Change-data-feed between two committed snapshots: one row per key
    * whose final state differs, stamped `_change_type` ∈
    * {insert, update, delete}. insert/update rows carry the `to`-side
    * image, delete rows the `from`-side image (so a consumer can key
    * its own downstream merge off either direction).
    *
    * Scale shape, three tiers (cheapest applicable wins):
    *  1. DELTA-KEY fast path — when every commit in the interval is a
    *     mergeDeltas/append (its changed keys live in its own new
    *     files) or a key-preserving maintenance op (compact/cluster/
    *     evolve/stats), the changed-key set is bounded by the keys IN
    *     the interval's new files. Both diff sides are then restricted
    *     to those keys (a semi join pushed BELOW the merge-on-read
    *     reconstruction aggregate), so the scan and the fold are
    *     O(interval batch), not O(touched buckets) — the hot streaming
    *     case where a commit writes a few thousand keys into buckets
    *     holding millions. A layout/meta-only interval short-circuits
    *     to an empty feed with no scan at all.
    *  2. TOUCHED-BUCKET diff — the manifest file-diff bounds the scan
    *     to buckets whose file set changed (COW merge rewrites whole
    *     buckets, so its keys are not attributable to new files); an
    *     untouched bucket is byte-identical in both snapshots and is
    *     never read. The diff reads those buckets in both versions and
    *     full-outer-joins them on the key.
    *  3. FULL diff — bucket routing changed in between (`rebucket`),
    *     where the file-diff is vacuously "everything".
    *
    * Schema evolution between the snapshots is aligned to the `to`
    * schema: columns missing on the `from` side read as null, so a row
    * differing only in a new column's non-null value reports as an
    * update. */
  def changes(fromVersion: Int, toVersion: Option[Int] = None): DataFrame = {
    val from =
      try snapshot(fromVersion)
      catch {
        case _: java.io.FileNotFoundException => sys.error(
          s"changes: version $fromVersion is expired or unknown at $root " +
            s"(retained: ${listVersions.mkString("[", ",", "]")}); a stale " +
            "consumer/stream must re-bootstrap, or raise expireSnapshots retention")
      }
    val to = toVersion.map(snapshot).orElse(currentSnapshot)
      .getOrElse(sys.error(s"no table at $root"))
    require(from.version <= to.version,
      s"changes: from v${from.version} is newer than to v${to.version}")
    require(from.keyColumns == to.keyColumns,
      s"changes: key columns differ (${from.keyColumns} vs ${to.keyColumns})")
    val keyCols = to.keyColumns
    val payloadCols = to.schema.fieldNames.filterNot(keyCols.contains).toSeq
    val fastFiles =
      if (from.nBuckets != to.nBuckets) None else intervalChangeFiles(from, to)
    if (fastFiles.exists(_.isEmpty)) {
      // layout/meta-only interval (compaction, clustering, evolution,
      // stats changes): no key can differ — empty feed, zero data read
      System.err.println(s"[lake-cdf] v${from.version}->v${to.version} " +
        "layout/meta-only; empty feed")
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(
          keyCols.map(n => to.schema(to.schema.fieldIndex(n))) ++
            payloadCols.map(n => to.schema(to.schema.fieldIndex(n))) :+
            StructField("_change_type", StringType, nullable = true)))
    }
    val (oldDf, newDf) =
      if (from.nBuckets != to.nBuckets) (snapBucketsRead(from, None), snapBucketsRead(to, None))
      else fastFiles match {
        case Some(candFiles) =>
          // delta-key fast path: only keys present in the interval's own
          // new files can have changed; restrict BOTH sides to them
          // (semi join pushed below MoR reconstruction), and only their
          // buckets. Keys are read from just the key columns of the new
          // files — O(interval batch) bytes.
          val buckets = candFiles.map(_.bucket).toSet
          val keySchema = StructType(
            keyCols.map(n => to.schema(to.schema.fieldIndex(n))))
          val keyDf = manifestParquetDf(keySchema, candFiles.map(_.path))
          System.err.println(s"[lake-cdf] delta-key fast path " +
            s"v${from.version}->v${to.version}: files=${candFiles.size} " +
            s"buckets=${buckets.size}/${to.nBuckets}")
          (snapBucketsRead(from, Some(buckets), Some(keyDf)),
            snapBucketsRead(to, Some(buckets), Some(keyDf)))
        case None =>
          val fromPaths = from.files.map(_.path).toSet
          val toPaths = to.files.map(_.path).toSet
          val touched = (to.files.filterNot(f => fromPaths(f.path)) ++
            from.files.filterNot(f => toPaths(f.path))).map(_.bucket).toSet
          System.err.println(s"[lake-cdf] buckets=${touched.size}/${to.nBuckets} " +
            s"v${from.version}->v${to.version}")
          (snapBucketsRead(from, Some(touched)), snapBucketsRead(to, Some(touched)))
      }
    // old side aligned to the to-schema (evolution: absent columns read
    // null; widened columns up-cast — lossless by evolveSchema's rule)
    val oldAligned = payloadCols.foldLeft(oldDf) { (d, c) =>
      val toType = to.schema(c).dataType
      if (!d.columns.contains(c)) d.withColumn(c, lit(null).cast(toType))
      else if (d.schema(c).dataType != toType) d.withColumn(c, col(c).cast(toType))
      else d
    }
    def sided(df: DataFrame, side: String) = df.select(
      struct(keyCols.map(col): _*).as("_k"),
      struct(payloadCols.map(col): _*).as(side))
    val j = sided(oldAligned, "_o").join(sided(newDf, "_n"), Seq("_k"), "full_outer")
    val img = when(col("_n").isNull, col("_o")).otherwise(col("_n"))
    j.withColumn("_change_type",
        when(col("_o").isNull, lit("insert"))
          .when(col("_n").isNull, lit("delete"))
          .when(!(col("_o") <=> col("_n")), lit("update")))
      .filter(col("_change_type").isNotNull)
      .withColumn("_img", img)
      .select(keyCols.map(c => col(s"_k.$c").as(c)) ++
        payloadCols.map(c => col(s"_img.$c").as(c)) :+ col("_change_type"): _*)
  }

  /** Durable change-feed consumer position: the newest table version
    * this consumer has acknowledged, None before the first ack. Stored
    * as one tiny JSON file per consumer under `metadata/consumers/` —
    * O(1) regardless of table size, invisible to snapshots. */
  def consumerPosition(consumerId: String): Option[Int] = {
    val p = consumerFile(consumerId)
    if (!fs.exists(p)) None
    else Some(mapper.readTree(readFully(p)).get("version").asInt())
  }

  /** Incremental change-feed consumption: everything that changed since
    * `consumerId`'s last acknowledged version, plus the version the feed
    * runs to. First call (no position) BOOTSTRAPS: the full current
    * state as `insert` rows — reading the snapshot directly instead of
    * diffing against the empty v0 (same result, no join, and v0 may
    * already be expired).
    *
    * At-least-once by construction: process the feed durably, then
    * [[ackChanges]](consumerId, toVersion). A crash before the ack
    * replays the identical interval (the feed is deterministic for a
    * fixed version pair); a downstream [[merge]] keyed on
    * (consumerId, toVersion) makes the replay exactly-once — see
    * LakeCdfSpec's lake-to-lake test. */
  def changesSince(consumerId: String): (DataFrame, Int) = {
    val to = currentVersion.getOrElse(sys.error(s"no table at $root"))
    consumerPosition(consumerId) match {
      case Some(from) =>
        require(listVersions.contains(from),
          s"consumer '$consumerId' position v$from is expired; " +
            "re-bootstrap (delete the consumer) or raise expireSnapshots retention")
        (changes(from, Some(to)), to)
      case None =>
        val snap = snapshot(to)
        val keyCols = snap.keyColumns
        val payloadCols = snap.schema.fieldNames.filterNot(keyCols.contains).toSeq
        (read(Some(to))
          .select((keyCols ++ payloadCols).map(col): _*)
          .withColumn("_change_type", lit("insert")), to)
    }
  }

  /** Advance a consumer's acknowledged position (monotone; regressions
    * rejected). Write is small-file replace — a crash mid-ack leaves
    * either the old or no position, both of which only cause replay. */
  def ackChanges(consumerId: String, version: Int): Unit = {
    val cur = currentVersion.getOrElse(sys.error(s"no table at $root"))
    require(version <= cur, s"ack v$version is ahead of the table (v$cur)")
    require(consumerPosition(consumerId).forall(_ <= version),
      s"ack regression for '$consumerId': ${consumerPosition(consumerId)} -> v$version")
    val dir = new Path(metaDir, "consumers")
    fs.mkdirs(dir)
    val p = consumerFile(consumerId)
    val tmp = new Path(dir, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val node = mapper.createObjectNode()
    node.put("version", version)
    val out = fs.create(tmp, false)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) { fs.delete(tmp, false); sys.error(s"ack publish failed: $p") }
  }

  private def consumerFile(consumerId: String): Path = {
    require(consumerId.matches("[A-Za-z0-9._-]+"), s"invalid consumer id '$consumerId'")
    new Path(new Path(metaDir, "consumers"), s"$consumerId.json")
  }

  // ------------------------------------------------------------ tags

  /** Pin `version` (default: current) under a NAME — Iceberg-style tag
    * refs: "the audit snapshot", "the corpus we trained run 7 on".
    * Tagged versions are exempt from [[expireSnapshots]] (and therefore
    * their files from [[vacuum]], which only collects what no retained
    * snapshot references) until [[dropTag]] releases them, so a tag is
    * a durable time-travel anchor rather than a race against the
    * retention policy. One tiny metadata file per tag, O(1) vs table
    * size; re-tagging an existing name moves it (small-file replace —
    * crash-safe the same way consumer acks are). */
  def tag(name: String, version: Option[Int] = None): Int = {
    val v = version.getOrElse(
      currentVersion.getOrElse(sys.error(s"no table at $root")))
    require(listVersions.contains(v),
      s"tag '$name': version $v is expired or unknown; retained: " +
        listVersions.mkString("[", ",", "]"))
    val p = tagFile(name)
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("createdAtMs", System.currentTimeMillis())
    val out = fs.create(tmp, false)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) { fs.delete(tmp, false); sys.error(s"tag publish failed: $p") }
    // close the check-then-publish window against a concurrent
    // expireSnapshots/vacuum: once the tag is visible it protects the
    // version, so if the version survived to THIS point the tag is
    // durable; if maintenance expired it in the window, retract the tag
    // rather than leave a ref pinning an already-collected snapshot.
    if (!listVersions.contains(v)) {
      fs.delete(p, false)
      sys.error(s"tag '$name': version $v was expired by concurrent " +
        "maintenance during tagging; re-run against a retained version")
    }
    v
  }

  /** All tags and the versions they pin. */
  def tags(): Map[String, Int] = {
    val dir = new Path(metaDir, "tags")
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.endsWith(".json"))
      .map { s =>
        val n = s.getPath.getName.stripSuffix(".json")
        n -> mapper.readTree(readFully(s.getPath)).get("version").asInt()
      }.toMap
  }

  /** The version a tag pins; raises with the tag list when unknown. */
  def resolveTag(name: String): Int =
    tags().getOrElse(name, sys.error(
      s"unknown tag '$name' at $root; tags: ${tags().keys.toSeq.sorted.mkString(", ")}"))

  /** Release a tag (its version becomes expirable again). */
  def dropTag(name: String): Unit = {
    val p = tagFile(name)
    require(fs.exists(p), s"unknown tag '$name' at $root")
    fs.delete(p, false)
  }

  private def tagFile(name: String): Path = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid tag name '$name'")
    new Path(new Path(metaDir, "tags"), s"$name.json")
  }

  /** Files that can contain keys changed in `(from, to]`, or None when
    * some commit in the interval changes state NOT attributable to its
    * own new files (COW `merge` rewrites whole buckets, `rebucket` /
    * `rollback` rewrite arbitrarily, legacy/unknown lineage), or an
    * intermediate version is already expired. `Some(Nil)` = the
    * interval is provably key-preserving (maintenance/meta commits
    * only). mergeDeltas commits contribute their delta files; appends
    * their base files — in both, every changed key is a row of the
    * commit's own files, so the union over the interval is a sound
    * (and tight) changed-key superset. */
  private[graft] def intervalChangeFiles(from: Snapshot, to: Snapshot): Option[Seq[DataFile]] = {
    val keyPreserving = Set(
      "compact", "cluster", "zorder", "setStatsColumns", "setBloomColumns",
      "evolveSchema")
    val buf = Seq.newBuilder[DataFile]
    var v = from.version + 1
    while (v <= to.version) {
      val s =
        try snapshot(v)
        catch { case scala.util.control.NonFatal(_) => return None }
      val op = s.lineage.flatMap(n => Option(n.get("operation")).map(_.asText()))
        .getOrElse("")
      if (op == "mergeDeltas" || op == "append") buf ++= s.files.filter(_.seq == v)
      else if (!keyPreserving(op)) return None
      v += 1
    }
    Some(buf.result())
  }

  /** read() restricted to a bucket subset of a given snapshot (None =
    * all buckets); MoR buckets reconstruct, pure-base buckets scan.
    * `keyFilter` (key-column frame) semi-join-restricts the rows — the
    * restriction is applied BELOW the MoR reconstruction aggregate
    * (sound: the fold groups by key, so dropping other keys' input
    * rows drops exactly their groups), which keeps the fold O(filter)
    * instead of O(bucket). */
  private def snapBucketsRead(snap: Snapshot, buckets: Option[Set[Int]],
      keyFilter: Option[DataFrame] = None): DataFrame = {
    val fs = buckets.map(b => snap.files.filter(f => b.contains(f.bucket)))
      .getOrElse(snap.files)
    def restrict(df: DataFrame): DataFrame =
      keyFilter.map(k => df.join(k, snap.keyColumns, "left_semi")).getOrElse(df)
    val deltaBuckets = fs.filter(_.delta).map(_.bucket).toSet
    if (deltaBuckets.isEmpty) return restrict(readFiles(snap, fs))
    val (morFiles, pureBase) = fs.partition(f => deltaBuckets.contains(f.bucket))
    restrict(readFiles(snap, pureBase))
      .unionByName(reconstructRows(snap, morFiles, keyFilter = keyFilter))
  }

  /** Bucket-pruned point lookup: read only the buckets that can hold
    * the given key tuples (the key hash is computed driver-side with
    * the SAME murmur3 expression the writers bucket by), then filter to
    * the exact keys. At 10^10 rows with 4096 buckets, a 100-key lookup
    * scans ≤100 buckets ≈ 2.4% of the table — composes with the
    * merge-on-read reconstruction, which then aggregates only those
    * buckets' files. `keys` are in declared key-column order. */
  def readKeys(keys: Seq[Seq[Any]], version: Option[Int] = None): DataFrame = {
    val snap = version.map(snapshot).orElse(currentSnapshot)
      .getOrElse(sys.error(s"no table at $root"))
    require(keys.nonEmpty, "readKeys: empty key set")
    require(keys.forall(_.length == snap.keyColumns.length),
      s"readKeys: each key must have ${snap.keyColumns.length} parts")
    import org.apache.spark.sql.Row
    // key schema in DECLARED key-column order (schema field order would
    // silently hash swapped parts for a multi-part key declared out of
    // schema order — wrong buckets, empty or wrong lookups)
    val keySchema = StructType(
      snap.keyColumns.map(n => snap.schema(snap.schema.fieldIndex(n))))
    // bucket ids evaluated DRIVER-side with the same catalyst expression
    // the writers bucket by (pmod(murmur3, n) over the key columns in
    // declared order) — no Spark job per point lookup
    val buckets = driverBuckets(keys, keySchema, snap.nBuckets)
    // LocalRelation (no RDD job) — only used as the broadcast semi-join side
    val keyDf = spark.createDataFrame(
      keys.map(Row.fromSeq).asJava, keySchema)
    val files = snap.files.filter(f => buckets.contains(f.bucket))
    System.err.println(s"[lake-lookup] buckets=${buckets.size}/${snap.nBuckets} files=${files.size}/${snap.files.size}")
    val deltaBuckets = files.filter(_.delta).map(_.bucket).toSet
    val (morFiles, pureBase) = files.partition(f => deltaBuckets.contains(f.bucket))
    val rows =
      if (morFiles.isEmpty) readFiles(snap, pureBase)
      else readFiles(snap, pureBase)
        .unionByName(reconstructRows(snap, morFiles))
    // Per-column IN filters push into the parquet scan: within the
    // chosen buckets the reader's row-group filter checks each file's
    // min/max, dictionary and bloom filter (bloomColumns) against the
    // requested values and SKIPS row groups that can't hold any key —
    // min/max alone never prunes hash-distributed keys, a bloom does.
    // For multi-part keys the per-column INs over-approximate (cross
    // product of parts); the broadcast semi join restores exactness.
    val pushed =
      if (keys.size > 1000) rows // bound the pushed filter tree; semi join alone
      else snap.keyColumns.zipWithIndex.foldLeft(rows) { case (d, (c, i)) =>
        d.filter(col(c).isin(keys.map(_(i)).distinct: _*))
      }
    pushed.join(broadcast(keyDf), snap.keyColumns, "left_semi")
  }

  /** Top-level column names a predicate reads. */
  private def predAttrs(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val buf = Seq.newBuilder[String]
    e.foreach {
      case a: AttributeReference => buf += a.name
      case u: UnresolvedAttribute => buf += u.name
      case _ =>
    }
    buf.result().distinct
  }

  /** Declared-type lookup for cast-safety in the pruner. */
  private def colTypeOf(snap: Snapshot)(c: String): Option[DataType] =
    snap.schema.fields.find(_.name == c).map(_.dataType)

  /** (kept final-row files, kept MoR files, total) for `pred`. */
  private[graft] def pruneForPredicate(snap: Snapshot,
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : (Seq[DataFile], Seq[DataFile], Int) = {
    val deltaBuckets = snap.files.filter(_.delta).map(_.bucket).toSet
    val (morFiles, pureBase) = snap.files.partition(f => deltaBuckets.contains(f.bucket))
    val keptBase = pureBase.filter { f =>
      StatsPruner.mayMatch(e, StatsPruner.FileStats(
        f.stats.get, f.nulls.get,
        if (f.rows >= 0) Some(f.rows) else None, colTypeOf(snap)))
    }
    val keptMor = morFiles.groupBy(_.bucket).values.filter { fs =>
      StatsPruner.mayMatch(e, mergedStats(fs, colTypeOf(snap)))
    }.flatten.toSeq
    (keptBase, keptMor, snap.files.size)
  }

  /** Union of the files' statistics for bucket-granularity MoR pruning; a
    * column's range is known only if EVERY file knows it (a file with
    * unknown bounds can hold anything). Null counts / row counts are only
    * sound for LWW reconstruction, where every final row is one input
    * file's row: no null in any file ⇒ no null in the output, all-null in
    * every file ⇒ all-null output. PATCH folds can COMBINE columns across
    * files (and a presence-violating first patch synthesizes nulls), so a
    * bucket containing any patch file keeps range stats only. */
  private def mergedStats(fs: Iterable[DataFile],
      colType: String => Option[DataType]): StatsPruner.FileStats = {
    def lt(a: Any, b: Any): Boolean = StatsPruner.cmp(a, b).exists(_ < 0)
    val cols = fs.map(_.stats.keySet).reduceOption(_ intersect _).getOrElse(Set.empty)
    val ranges = cols.map { c =>
      val vs = fs.map(_.stats(c))
      c -> vs.reduce[(Any, Any)] { case ((a1, b1), (a2, b2)) =>
        (if (lt(a2, a1)) a2 else a1, if (lt(b1, b2)) b2 else b1)
      }
    }.toMap
    val anyPatch = fs.exists(_.patch)
    val nullCols =
      if (anyPatch) Set.empty[String]
      else fs.map(_.nulls.keySet).reduceOption(_ intersect _).getOrElse(Set.empty)
    val nulls = nullCols.map(c => c -> fs.map(_.nulls(c)).sum).toMap
    val rowCount =
      if (anyPatch || fs.exists(_.rows < 0)) None else Some(fs.map(_.rows).sum)
    StatsPruner.FileStats(ranges.get, nulls.get, rowCount, colType)
  }

  /** DataFrame over an explicit parquet file list through a PRECOMPUTED
    * FileIndex: `spark.read.parquet(paths…)` re-lists every path and,
    * past spark.sql.sources.parallelPartitionDiscovery.threshold (32
    * paths), launches a whole Spark JOB just to list files the manifest
    * already names — measured 100-350 ms of scheduler overhead per read
    * on the commit/reconstruction paths (guide §6: manifest metadata
    * exists precisely to avoid listing). Same scan machinery after
    * resolution (vectorized parquet reader, pushdown, codegen). */
  private[lake] def manifestParquetDf(schema: StructType, relPaths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val fsys = fs
    val statuses = relPaths.map(p => fsys.getFileStatus(new Path(root, p))).toArray
    val index = new FileIndex {
      override def rootPaths: Seq[Path] = Seq(new Path(root))
      override def listFiles(
          partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
          dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
          : Seq[PartitionDirectory] =
        Seq(PartitionDirectory(InternalRow.empty, statuses))
      override def inputFiles: Array[String] = statuses.map(_.getPath.toString)
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = statuses.map(_.getLen).sum
      override def partitionSchema: StructType = StructType(Nil)
    }
    // asNullable mirrors DataSource.resolveRelation: a file may lack a
    // column (schema evolution) or hold nulls the declared schema
    // forbids — the scan must not codegen non-null assumptions
    val rel = HadoopFsRelation(index, StructType(Nil),
      StructType(schema.fields.map(_.copy(nullable = true))), None,
      new ParquetFileFormat, Map.empty)(spark)
    org.apache.spark.sql.graftshim.ofRows(spark, LogicalRelation(rel))
  }

  private def readFiles(snap: Snapshot, files: Seq[DataFile]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else
      manifestParquetDf(snap.schema, files.map(_.path))

  /** Merge-on-read reconstruction: base rows overlaid with delta rows.
    * When every delta row is a FULL row, the last writer (greatest
    * commit seq) wins per key and deletes drop out — one LastByOffset
    * ObjectHashAggregate. When any contributing file carries PARTIAL
    * (patch-masked) rows, reconstruction folds each key's contributions
    * in seq order instead (PatchFoldBySeq — LWW would drop the unmasked
    * fields of the last patch). One scan per contributing commit (files
    * of a commit share `seq`); partial aggregation keeps hot keys
    * combine-side; the per-key buffer is bounded by the compaction
    * threshold. */
  private def reconstructRows(snap: Snapshot, files: Seq[DataFile],
      payloadSubset: Option[Seq[String]] = None,
      keyFilter: Option[DataFrame] = None): DataFrame = {
    val keyCols = snap.keyColumns
    val payloadCols = payloadSubset.getOrElse(
      snap.schema.fieldNames.filterNot(keyCols.contains).toSeq)
    val anyPatch = files.exists(_.patch)
    val maskType = ArrayType(StringType, containsNull = false)
    val deltaSchema = StructType(
      snap.schema.fields :+ StructField("operation", StringType, nullable = true))
    val patchSchema = StructType(
      deltaSchema.fields :+ StructField("_patch_mask", maskType, nullable = true))
    val parts = files.groupBy(f => (f.seq, f.delta, f.patch)).toSeq.map {
      case ((seq, isDelta, isPatch), fs0) =>
        val paths = fs0.map(_.path)
        val base =
          if (isPatch)
            manifestParquetDf(patchSchema, paths)
          else if (isDelta)
            manifestParquetDf(deltaSchema, paths)
              .withColumn("_patch_mask", lit(null).cast(maskType))
          else
            manifestParquetDf(snap.schema, paths)
              .withColumn("operation", lit("r"))
              .withColumn("_patch_mask", lit(null).cast(maskType))
        base.withColumn("_seq", lit(seq.toLong))
    }
    val all0 = parts.reduce(_ unionByName _)
    // key restriction below the fold: sound because the fold groups by
    // key — dropping other keys' input rows drops exactly their groups
    val all = keyFilter.map(k => all0.join(k, keyCols, "left_semi")).getOrElse(all0)
    if (!anyPatch) {
      all.groupBy(keyCols.map(col): _*)
        .agg(graft.functions.LastByOffset.lastByOffset(
          struct((payloadCols :+ "operation").map(col): _*), col("_seq")).as("_w"))
        .filter(col("_w.operation") =!= "d")
        .select(keyCols.map(col) ++ payloadCols.map(c => col(s"_w.$c").as(c)): _*)
    } else {
      all.groupBy(keyCols.map(col): _*)
        .agg(graft.functions.PatchFoldBySeq.patchFoldBySeq(
          struct((payloadCols ++ Seq("operation", "_patch_mask")).map(col): _*),
          col("_seq")).as("_w"))
        .filter(col("_w").isNotNull)
        .select(keyCols.map(col) ++ payloadCols.map(c => col(s"_w.$c").as(c)): _*)
    }
  }

  // ------------------------------------------------------------ write

  /** List parquet files written under a commit dir, keyed by bucket;
    * harvests min/max footer stats for the table's statsColumns (one
    * footer read per NEW file — O(changed files), like the manifests). */
  private def listCommitFiles(commitDir: Path, seq: Int, delta: Boolean): Seq[DataFile] = {
    val statCols = currentSnapshot.map(_.statsColumns).getOrElse(Nil)
    // NOT fs.listFiles(dir, true): that fetches per-file block locations
    // and cost a measured ~150 ms of pure driver wall per 32-file commit
    // on a local FS. A listStatus walk (bucket dirs fanned out on a
    // bounded pool) lists the same files for ~an order of magnitude less.
    val fsys = fs
    val top = fsys.listStatus(commitDir)
    val (dirs, files0) = top.partition(_.isDirectory)
    def parquetsOf(sts: Array[org.apache.hadoop.fs.FileStatus]): Seq[Path] =
      sts.collect { case s if s.getPath.getName.endsWith(".parquet") => s.getPath }.toSeq
    val nested: Seq[Path] =
      if (dirs.isEmpty) Nil
      else if (dirs.length == 1) parquetsOf(fsys.listStatus(dirs.head.getPath))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, dirs.length))
        try {
          val tasks: Seq[java.util.concurrent.Callable[Seq[Path]]] =
            dirs.toSeq.map(d => new java.util.concurrent.Callable[Seq[Path]] {
              override def call(): Seq[Path] = parquetsOf(fsys.listStatus(d.getPath))
            })
          pool.invokeAll(tasks.asJava).asScala.flatMap(_.get()).toSeq
        } finally pool.shutdown()
      }
    val found = parquetsOf(files0) ++ nested
    def toDataFile(fp: Path): DataFile = {
      val p = fp.toString
      val rel = p.substring(p.indexOf(root) + root.length + 1)
      val bucket = "_bucket=(\\d+)".r.findFirstMatchIn(p)
        .map(_.group(1).toInt).getOrElse(0)
      val (ranges, nulls, rows) =
        if (statCols.isEmpty) (Map.empty[String, (Any, Any)], Map.empty[String, Long], -1L)
        else footerStats(fp, statCols)
      DataFile(rel, bucket, seq, delta, stats = ranges, nulls = nulls, rows = rows)
    }
    // footer-stat harvest is one parquet-footer read per NEW file on the
    // DRIVER; serialized it adds ~5-10 ms × files to every commit of a
    // stats table (guide §5: driver-side single-threaded work shows up as
    // "nothing running"). Read footers on a bounded pool instead.
    if (statCols.isEmpty || found.size <= 1) found.map(toDataFile)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, found.size))
      try {
        import scala.collection.JavaConverters._
        val tasks: Seq[java.util.concurrent.Callable[DataFile]] =
          found.map(fp => new java.util.concurrent.Callable[DataFile] {
            override def call(): DataFile = toDataFile(fp)
          })
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    }
  }

  /** Per-column (min, max) + null counts + row count from a parquet
    * footer, canonical form (Long / Double / String). A column's range is
    * OMITTED (unknown → never prunes) if any row group lacks usable
    * value statistics for it; its null count is OMITTED if any row group
    * has numNulls unset (null counts survive all-null chunks, where the
    * range cannot — an all-null file still prunes `IS NOT NULL`). */
  private def footerStats(p: Path, cols: Seq[String])
      : (Map[String, (Any, Any)], Map[String, Long], Long) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val want = cols.toSet
    val acc = scala.collection.mutable.Map[String, (Any, Any)]()
    val bad = scala.collection.mutable.Set[String]()
    val seen = scala.collection.mutable.Map[String, Int]()
    val nullAcc = scala.collection.mutable.Map[String, Long]()
    val nullSeen = scala.collection.mutable.Map[String, Int]()
    var rowCount = 0L
    def canon(v: Any): Option[Any] = v match {
      case i: java.lang.Integer => Some(i.longValue)
      case l: java.lang.Long => Some(l.longValue)
      case f: java.lang.Float => Some(f.doubleValue)
      case d: java.lang.Double => Some(d.doubleValue)
      case b: org.apache.parquet.io.api.Binary => Some(b.toStringUsingUTF8)
      case _ => None
    }
    def lt(a: Any, b: Any): Boolean = StatsPruner.cmp(a, b).exists(_ < 0)
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(p, spark.sparkContext.hadoopConfiguration))
    val nBlocks = try {
      val blocks = reader.getFooter.getBlocks.asScala
      for (blk <- blocks) {
        rowCount += blk.getRowCount
        for (c <- blk.getColumns.asScala) {
          val name = c.getPath.toDotString
          if (want.contains(name)) {
            val st = c.getStatistics
            if (st != null && !st.isEmpty && st.isNumNullsSet) {
              nullSeen(name) = nullSeen.getOrElse(name, 0) + 1
              nullAcc(name) = nullAcc.getOrElse(name, 0L) + st.getNumNulls
            }
            if (!bad.contains(name)) {
              val ok = st != null && !st.isEmpty && st.hasNonNullValue
              val mn = if (ok) canon(st.genericGetMin) else None
              val mx = if (ok) canon(st.genericGetMax) else None
              (mn, mx) match {
                case (Some(a), Some(b)) =>
                  seen(name) = seen.getOrElse(name, 0) + 1
                  acc.get(name) match {
                    case Some((pa, pb)) =>
                      acc(name) = (if (lt(a, pa)) a else pa, if (lt(pb, b)) b else pb)
                    case None => acc(name) = (a, b)
                  }
                case _ => bad += name; acc.remove(name)
              }
            }
          }
        }
      }
      blocks.size
    } finally reader.close()
    // a column missing from some row group (all-null chunk dropped by the
    // writer) has unknown bounds there: keep it only if every block saw it
    (acc.filter { case (n, _) => seen.getOrElse(n, 0) == nBlocks }.toMap,
      nullAcc.filter { case (n, _) => nullSeen.getOrElse(n, 0) == nBlocks }.toMap,
      rowCount)
  }

  /** Bucket-partitioned parquet write; when the snapshot declares
    * `bloomColumns`, each data file gets an adaptively-sized parquet
    * bloom filter per column (parquet-mr sizes it to the file's actual
    * NDV up to the 1 MB cap). The parquet reader's row-group filter
    * consults blooms for `=`/`IN` predicates — [[readKeys]] pushes
    * exactly those. */
  private def writeBucketed(df: DataFrame, dir: Path, bloomCols: Seq[String]): Unit = {
    val base = df.write
    val w =
      if (bloomCols.isEmpty) base
      else bloomCols.foldLeft(
        base.option("parquet.bloom.filter.adaptive.enabled", "true")) {
        (b, c) => b.option(s"parquet.bloom.filter.enabled#$c", "true")
      }
    // write timestamps as standard INT64 micros, not Spark's default
    // INT96: INT96 chunks carry no usable footer min/max, so a
    // timestamp statsColumn would never prune (and micros match the
    // canonical Long form StatsPruner compares TimestampType literals
    // in). Session-conf scoped to the write — parquet exposes no
    // per-write option for this.
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try w.partitionBy("_bucket").parquet(dir.toString)
    finally spark.conf.set(key, prev)
  }

  /** Bulk append (initial seed): bucket + write + commit. */
  def append(df: DataFrame, commitId: String = "append", batchId: Long = 0L): Snapshot = {
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    // no-op replay: strip the PRIOR commit's lineage so callers (metrics)
    // can tell a replay from a fresh commit
    if (cur.commits.get(commitId).exists(_ >= batchId)) return cur.copy(lineage = None)
    val commitDir = newCommitDir("commit", cur.version + 1)
    val fpb = filesPerBucket(cur.nBuckets)
    writeBucketed(
      packedByBucket(df.withColumn("_bucket", bucketCol(cur.keyColumns, cur.nBuckets)),
        0 until cur.nBuckets, fpb, cur.keyColumns),
      commitDir, cur.bloomColumns)
    val newFiles = listCommitFiles(commitDir, cur.version + 1, delta = false)
    publishOptimistic(cur, base => base.copy(version = base.version + 1,
      manifests = nextManifests(base, _ => false, newFiles.map(_.copy(seq = base.version + 1))),
      commits = base.commits + (commitId -> batchId),
      lineage = Some(lineageNode("append",
        Map("newFiles" -> newFiles.size.toString, "batchId" -> batchId.toString)))),
      None, Some((commitId, batchId)))
  }

  /** OVERWRITE: replace the table's ENTIRE contents with `df` in one
    * atomic commit — the full-refresh / backfill shape (Delta's
    * `mode("overwrite")`). Every current file is removed from the
    * manifests (by path; the bytes stay until [[vacuum]]) and the new
    * bucketed layout published in the same snapshot, so concurrent
    * readers keep snapshot isolation and time travel still reaches the
    * pre-refresh versions. `changes()` across an overwrite interval
    * falls back to the full-state diff (an overwrite can delete any
    * key, so the delta-key fast path correctly refuses it).
    *
    * Publish is SINGLE-WRITER (no OCC rebase): an overwrite that lost a
    * version race cannot silently rebase — it would discard the racing
    * writer's commit — so it fails with ConcurrentCommitException for
    * the caller to retry deliberately. Racing INGEST the other way
    * (append/mergeDeltas losing to this overwrite) rebases fine: its
    * rows land on the refreshed base, the same outcome as committing
    * after the refresh. Idempotent on (commitId, batchId). */
  def overwrite(df: DataFrame, commitId: String = "overwrite",
      batchId: Long = 0L): Snapshot = {
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    if (cur.commits.get(commitId).exists(_ >= batchId)) return cur.copy(lineage = None)
    val commitDir = newCommitDir("overwrite", cur.version + 1)
    val fpb = filesPerBucket(cur.nBuckets)
    writeBucketed(
      packedByBucket(df.withColumn("_bucket", bucketCol(cur.keyColumns, cur.nBuckets)),
        0 until cur.nBuckets, fpb, cur.keyColumns),
      commitDir, cur.bloomColumns)
    val newFiles = listCommitFiles(commitDir, cur.version + 1, delta = false)
    val next = cur.copy(version = cur.version + 1,
      manifests = nextManifests(cur, _ => true, newFiles),
      commits = cur.commits + (commitId -> batchId),
      lineage = Some(lineageNode("overwrite",
        Map("newFiles" -> newFiles.size.toString,
          "removed" -> cur.files.size.toString,
          "batchId" -> batchId.toString))))
    writeSnapshot(next)
    next
  }

  /** MERGE a reduced delta batch (output of EnvelopeDecoder.toDeltas:
    * key cols + payload cols + `operation` + `offset`, ≤1 row per key)
    * into the table. Copy-on-write limited to affected buckets.
    *
    * Idempotent on (checkpointId, batchId): replaying a batch that a
    * committed snapshot already records is a no-op — the exactly-once
    * contract used by the streaming `foreachBatch` sink.
    */
  def merge(deltas: DataFrame, checkpointId: String, batchId: Long,
      strictValidate: Boolean = false): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    // no-op replay: lineage stripped (it belongs to the PRIOR commit)
    if (cur.commits.get(checkpointId).exists(_ >= batchId)) return cur.copy(lineage = None)

    val keyCols = cur.keyColumns
    val nb = cur.nBuckets
    val payloadCols = cur.schema.fieldNames.filterNot(keyCols.contains).toSeq

    // deltas are consumed twice (stats pass + merge join): persist the
    // reduced batch rather than re-running decode+reduce upstream
    val withBucket = deltas.withColumn("_bucket", bucketCol(keyCols, nb))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // lineage aggregates + affected buckets in ONE pass over the deltas
    val eventsCol: org.apache.spark.sql.Column =
      if (deltas.columns.contains("n_events")) sum(col("n_events")).cast("long")
      else count(lit(1))
    val tStats0 = System.nanoTime()
    val stats = withBucket.groupBy(col("_bucket"))
      .agg(eventsCol.as("n"),
        sum(when(col("operation") === "d", 1).otherwise(0)).as("n_del"),
        sum(when(col("operation").isin("c", "r"), 1).otherwise(0)).as("n_ins"),
        sum(when(col("operation") === "u", 1).otherwise(0)).as("n_upd"),
        min(col("offset")).as("min_off"), max(col("offset")).as("max_off"),
        count(lit(1)).as("n_keys"))
      .collect()
    if (stats.isEmpty) { // empty batch: just record the commit
      withBucket.unpersist()
      val next = cur.copy(version = cur.version + 1,
        manifests = nextManifests(cur, _ => false, Nil),
        commits = cur.commits + (checkpointId -> batchId),
        lineage = Some(lineageNode("merge", Map(
          "batchId" -> batchId.toString, "checkpointId" -> checkpointId,
          "events" -> "0"))))
      writeSnapshot(next)
      return next
    }
    val statsMs = (System.nanoTime() - tStats0) / 1000000
    val affected = stats.map(_.getInt(0)).toSet
    val (affectedFiles, keptFiles) = cur.files.partition(f => affected.contains(f.bucket))

    val snapDf = snapshotRows(cur, affectedFiles)
    // pack both sides; delta wins, op='d' drops the key
    val s = snapDf.select(keyCols.map(col) :+ struct(payloadCols.map(col): _*).as("_snap"): _*)
    val deltaExtraCols = withBucket.columns
      .filter(c => c == "operation" || c == "_patch_mask" || c.startsWith("_first_")).toSeq
    val hasBefore = withBucket.columns.contains("_first_before")
    val hasMask = withBucket.columns.contains("_patch_mask")
    val d = withBucket.select(keyCols.map(col) :+
      struct((payloadCols ++ deltaExtraCols).map(col): _*).as("_delta"): _*)
    val joined = s.join(d, keyCols, "full_outer")

    // strict cross-batch validation: the batch's first-op precondition
    // against the snapshot row (reference validateEvents semantics,
    // distributed through the merge join — no state re-read). Deltas
    // without a before-image (Mongo: events carry none) check presence
    // only, which IS the reference's whole Mongo precondition (:500-524).
    val validated = if (strictValidate) {
      val cmp = payloadCols.filterNot(_ == "_offset")
      val sameBefore =
        if (hasBefore) {
          val beforeImg = struct(cmp.map(c => col(s"_delta._first_before.$c")): _*)
          val snapImg = struct(cmp.map(c => col(s"_snap.$c")): _*)
          // a PER-ROW null before-image means a Mongo delta in a mixed
          // commit: presence-only. Sound because relational strict decode
          // raises on u/d with a null before (EnvelopeDecoder) — only
          // Mongo rows can reach here imageless.
          when(col("_delta._first_before").isNull, lit(true))
            .otherwise(beforeImg <=> snapImg)
        } else lit(true)
      val ok = col("_delta").isNull ||
        when(col("_delta._first_op").isin("c", "r"), col("_snap").isNull)
          .otherwise(col("_snap").isNotNull && sameBefore)
      joined.filter(
        when(assert_true(ok, concat(lit("strict merge violation: key="),
          concat_ws("|", keyCols.map(c => col(c).cast("string")): _*),
          lit(" first_op="), col("_delta._first_op"))).isNull, lit(true)))
    } else joined

    // per-field merge: full delta rows replace the snapshot row; PATCH
    // deltas (non-null _patch_mask) take only masked fields from the
    // delta and the rest from the snapshot row
    val merged = validated
      .filter(col("_delta").isNull || col("_delta.operation") =!= "d")
      .select(keyCols.map(col) ++ payloadCols.map { c =>
        val fromDelta =
          if (hasMask)
            when(col("_delta._patch_mask").isNotNull &&
                 !array_contains(col("_delta._patch_mask"), c), col(s"_snap.$c"))
              .otherwise(col(s"_delta.$c"))
          else col(s"_delta.$c")
        when(col("_delta").isNotNull, fromDelta).otherwise(col(s"_snap.$c")).as(c)
      }: _*)

    val commitDir = newCommitDir("commit", cur.version + 1)
    // route rows to their bucket's writer task before the partitioned
    // write (otherwise every task splits into every bucket →
    // tasks×buckets small files); in-bucket salt lifts parallelism above
    // the affected-bucket count when the cluster has idle slots
    val fpb = filesPerBucket(affected.size)
    val tWrite0 = System.nanoTime()
    writeBucketed(
      packedByBucket(merged.withColumn("_bucket", bucketCol(keyCols, nb)),
        affected.toSeq, fpb, keyCols),
      commitDir, cur.bloomColumns)
    val writeMs = (System.nanoTime() - tWrite0) / 1000000
    val tList0 = System.nanoTime()
    val newFiles = listCommitFiles(commitDir, cur.version + 1, delta = false)
    val listMs = (System.nanoTime() - tList0) / 1000000
    withBucket.unpersist()
    System.err.println(s"[lake-merge] batch=$batchId statsMs=$statsMs writeMs=$writeMs listMs=$listMs affected=${affected.size}")

    val durMs = (System.nanoTime() - t0) / 1000000
    val events = stats.map(_.getLong(1)).sum
    val lineage = mapper.createObjectNode()
    lineage.put("operation", "merge")
    lineage.put("checkpointId", checkpointId)
    lineage.put("batchId", batchId)
    lineage.put("events", events)
    lineage.put("keys", stats.map(_.getLong(7)).sum)
    lineage.put("inserts", stats.map(_.getLong(3)).sum)
    lineage.put("updates", stats.map(_.getLong(4)).sum)
    lineage.put("deletes", stats.map(_.getLong(2)).sum)
    lineage.put("offsetMin", stats.map(_.getLong(5)).min)
    lineage.put("offsetMax", stats.map(_.getLong(6)).max)
    lineage.put("affectedBuckets", affected.size)
    lineage.put("rewrittenFiles", affectedFiles.size)
    lineage.put("keptFiles", keptFiles.size)
    lineage.put("durationMs", durMs)
    val perBucket = lineage.putArray("bucketLineage")
    stats.sortBy(_.getInt(0)).foreach { r =>
      val o = perBucket.addObject()
      o.put("bucket", r.getInt(0)); o.put("events", r.getLong(1))
      o.put("offsetMin", r.getLong(5)); o.put("offsetMax", r.getLong(6))
    }

    // OCC: a lost version race rebases (O(metadata)) when every interim
    // commit touched buckets disjoint from `affected`; an overlap is a
    // genuine lost-update conflict and aborts to the caller
    publishOptimistic(cur, base => base.copy(version = base.version + 1,
      manifests = nextManifests(base, f => affected.contains(f.bucket),
        newFiles.map(_.copy(seq = base.version + 1))),
      commits = base.commits + (checkpointId -> batchId),
      lineage = Some(lineage)), Some(affected), Some((checkpointId, batchId)))
  }

  /** Current rows of a file subset: plain scan if no delta files are
    * present, LWW reconstruction otherwise (lets copy-on-write `merge`
    * and strict validation run on a table with outstanding deltas). */
  private def snapshotRows(snap: Snapshot, files: Seq[DataFile]): DataFrame =
    if (files.exists(_.delta)) reconstructRows(snap, files)
    else readFiles(snap, files)

  /** MERGE-ON-READ commit: write the reduced delta batch as bucket-
    * partitioned delta files and append them to the snapshot — nothing is
    * read or rewritten, so commit cost is O(batch) in table size (the
    * copy-on-write `merge` is O(affected buckets' data)). Lineage
    * aggregates are collected by `Dataset.observe` DURING the write job:
    * the batch is consumed exactly once, no persist, no stats pre-pass.
    *
    * Same idempotence contract as `merge`. With `strictValidate`, the
    * batch's first-op preconditions are checked against the CURRENT state
    * of the affected buckets through a left join (read amplification but
    * still no rewrite).
    *
    * `autoCompact` > 0 folds a bucket's deltas into a base file once it
    * accumulates that many delta commits, bounding the read tax. */
  def mergeDeltas(deltas: DataFrame, checkpointId: String, batchId: Long,
      strictValidate: Boolean = false, autoCompact: Int = 0): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    // no-op replay: lineage stripped (it belongs to the PRIOR commit)
    if (cur.commits.get(checkpointId).exists(_ >= batchId)) return cur.copy(lineage = None)

    val hasPatch = deltas.columns.contains("_patch_mask")
    val keyCols = cur.keyColumns
    val nb = cur.nBuckets
    val payloadCols = cur.schema.fieldNames.filterNot(keyCols.contains).toSeq
    val eventsCol: org.apache.spark.sql.Column =
      if (deltas.columns.contains("n_events")) sum(col("n_events")).cast("long")
      else count(lit(1)).cast("long")

    val withBucket = deltas.withColumn("_bucket", bucketCol(keyCols, nb))

    val validated = if (strictValidate) {
      // affected buckets are needed up front to read only their state
      val persisted = withBucket.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val affected = persisted.select(col("_bucket")).distinct()
        .collect().map(_.getInt(0)).toSet
      val snapDf = snapshotRows(cur, cur.files.filter(f => affected.contains(f.bucket)))
      val s = snapDf.select(keyCols.map(col) :+
        struct(payloadCols.map(col): _*).as("_snap"): _*)
      val joined = persisted.join(s, keyCols, "left_outer")
      val cmp = payloadCols.filterNot(_ == "_offset")
      // deltas without a before-image (Mongo) check presence only —
      // that IS the reference's whole Mongo precondition (:500-524)
      val sameBefore =
        if (deltas.columns.contains("_first_before")) {
          val beforeImg = struct(cmp.map(c => col(s"_first_before.$c")): _*)
          val snapImg = struct(cmp.map(c => col(s"_snap.$c")): _*)
          // per-row null before-image = Mongo delta in a mixed commit:
          // presence-only (see `merge`; relational u/d can't arrive null)
          when(col("_first_before").isNull, lit(true))
            .otherwise(beforeImg <=> snapImg)
        } else lit(true)
      val ok = when(col("_first_op").isin("c", "r"), col("_snap").isNull)
        .otherwise(col("_snap").isNotNull && sameBefore)
      joined.filter(
        when(assert_true(ok, concat(lit("strict merge violation: key="),
          concat_ws("|", keyCols.map(c => col(c).cast("string")): _*),
          lit(" first_op="), col("_first_op"))).isNull, lit(true)))
    } else withBucket

    val obs = Observation()
    val aggs = Seq(
      eventsCol.as("events"), count(lit(1)).cast("long").as("keys"),
      sum(when(col("operation").isin("c", "r"), 1L).otherwise(0L)).as("inserts"),
      sum(when(col("operation") === "u", 1L).otherwise(0L)).as("updates"),
      sum(when(col("operation") === "d", 1L).otherwise(0L)).as("deletes"),
      min(col("offset")).as("offsetMin"), max(col("offset")).as("offsetMax")) ++
      // a _patch_mask COLUMN with no actual patch rows (mixed-topic
      // batches are mostly full rows) must not condemn every read of
      // this commit to the patch fold — count real masks in-flight
      (if (hasPatch)
        Seq(sum(when(col("_patch_mask").isNotNull, 1L).otherwise(0L)).as("patchRows"))
      else Nil)
    val observed = validated.observe(obs, aggs.head, aggs.tail: _*)

    val commitDir = newCommitDir("commit", cur.version + 1)
    val tWrite0 = System.nanoTime()
    val outCols = keyCols ++ payloadCols ++ Seq("operation") ++
      (if (hasPatch) Seq("_patch_mask") else Nil) ++ Seq("_bucket")
    val fpb = filesPerBucket(nb)
    writeBucketed(
      packedByBucket(observed.select(outCols.map(col): _*),
        0 until nb, fpb, keyCols),
      commitDir, cur.bloomColumns)
    val writeMs = (System.nanoTime() - tWrite0) / 1000000
    val m = obs.get
    val anyPatchRow = hasPatch &&
      Option(m.getOrElse("patchRows", null))
        .exists(_.asInstanceOf[Number].longValue > 0)
    val tList0 = System.nanoTime()
    val newFiles = listCommitFiles(commitDir, cur.version + 1, delta = true)
      .map(_.copy(patch = anyPatchRow))
    val listMs = (System.nanoTime() - tList0) / 1000000
    if (strictValidate) withBucket.unpersist()

    val durMs = (System.nanoTime() - t0) / 1000000
    // sums/min/max observe as null on an empty batch
    def longOf(k: String, default: Long = 0L): Long =
      Option(m.getOrElse(k, null)).map(_.asInstanceOf[Number].longValue).getOrElse(default)
    val lineage = mapper.createObjectNode()
    lineage.put("operation", "mergeDeltas")
    lineage.put("checkpointId", checkpointId)
    lineage.put("batchId", batchId)
    lineage.put("events", longOf("events"))
    lineage.put("keys", longOf("keys"))
    lineage.put("inserts", longOf("inserts"))
    lineage.put("updates", longOf("updates"))
    lineage.put("deletes", longOf("deletes"))
    lineage.put("offsetMin", longOf("offsetMin", -1L))
    lineage.put("offsetMax", longOf("offsetMax", -1L))
    lineage.put("affectedBuckets", newFiles.map(_.bucket).distinct.size)
    lineage.put("newDeltaFiles", newFiles.size)
    lineage.put("durationMs", durMs)
    val manifests = nextManifests(cur, _ => false, newFiles)
    // O(changed-files) metadata evidence: every prior manifest is reused
    lineage.put("reusedManifests", cur.manifests.count(_.path.nonEmpty))
    lineage.put("newManifests", manifests.size - cur.manifests.count(_.path.nonEmpty))
    System.err.println(s"[lake-mor] batch=$batchId writeMs=$writeMs listMs=$listMs newFiles=${newFiles.size}")

    // OCC: merge-on-read commits are append-only, so a lost version race
    // ALWAYS rebases (except layout changes) — the staged delta files are
    // re-stamped with the final commit seq, which serializes this batch
    // after the interim commits in the reconstruction order
    val next = publishOptimistic(cur, base => base.copy(version = base.version + 1,
      manifests =
        if (base eq cur) manifests
        else nextManifests(base, _ => false, newFiles.map(_.copy(seq = base.version + 1))),
      commits = base.commits + (checkpointId -> batchId),
      lineage = Some(lineage)), None, Some((checkpointId, batchId)))

    if (autoCompact > 0) {
      val hot = next.files.filter(_.delta).groupBy(_.bucket)
        .collect { case (b, fs0) if fs0.map(_.seq).distinct.size >= autoCompact => b }
        .toSet
      if (hot.nonEmpty) {
        val compacted = compact(Some(hot))
        // the RETURNED snapshot carries the MERGE lineage (the caller's
        // per-batch metrics need events/op counts — the compact commit's
        // on-disk lineage stays "compact"), annotated with the compaction
        lineage.put("autoCompactedBuckets", hot.size)
        return compacted.copy(lineage = Some(lineage))
      }
    }
    next
  }

  /** Fold delta files back into base files for the given buckets (all
    * delta-carrying buckets by default). A maintenance commit: logical
    * state is unchanged; the compacted buckets' base+delta files are
    * replaced by one reconstructed base file per bucket. */
  def compact(buckets: Option[Set[Int]] = None): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    val deltaBuckets = cur.files.filter(_.delta).map(_.bucket).toSet
    val target = buckets.map(_.intersect(deltaBuckets)).getOrElse(deltaBuckets)
    if (target.isEmpty) return cur
    val (targetFiles, keptFiles) = cur.files.partition(f => target.contains(f.bucket))

    val rows = reconstructRows(cur, targetFiles)
    val commitDir = newCommitDir("compact", cur.version + 1)
    val fpb = filesPerBucket(target.size)
    writeBucketed(
      packedByBucket(rows.withColumn("_bucket", bucketCol(cur.keyColumns, cur.nBuckets)),
        target.toSeq, fpb, cur.keyColumns),
      commitDir, cur.bloomColumns)
    // seq anchored at the BASE version: the folded rows are the state
    // as of `cur`, so any interim delta commit (seq > cur.version)
    // surviving an OCC rebase correctly overlays them on read
    val newFiles = listCommitFiles(commitDir, cur.version, delta = false)
    val durMs = (System.nanoTime() - t0) / 1000000
    System.err.println(s"[lake-compact] buckets=${target.size} removed=${targetFiles.size} durMs=$durMs")
    publishMaintenance(cur, targetFiles.map(_.path).toSet, newFiles,
      lineageNode("compact", Map(
        "buckets" -> target.size.toString,
        "removedFiles" -> targetFiles.size.toString,
        "newFiles" -> newFiles.size.toString,
        "durationMs" -> durMs.toString)))
  }

  /** CLUSTER maintenance commit: rewrite the targeted buckets (default
    * all) with rows RANGE-LAID-OUT on `columns` — outstanding deltas
    * fold in (it is also a compaction), then each bucket's rows are
    * range-partitioned and sorted by `columns`, so sibling files inside
    * a bucket carry narrow, near-disjoint min/max ranges on those
    * columns instead of each spanning the whole domain. Manifest stats
    * ([[readWhere]] / StatsPruner) then prune range predicates down to
    * the few files whose range overlaps — the difference between
    * "bucket pruning only" and "bucket × range pruning" at 10^10 rows
    * is the fraction of each bucket read by a time-windowed query.
    * Row-group stats inside each file tighten the same way (rows are
    * sorted), so even intra-file parquet skipping engages.
    *
    * Logical state is unchanged (a [[changes]] feed across a cluster
    * commit is empty); bucket routing is unchanged (key hash), so
    * point lookups and MERGE pruning are unaffected. */
  def cluster(columns: Seq[String], buckets: Option[Set[Int]] = None): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    require(columns.nonEmpty, "cluster: no columns")
    validateStatsColumns(cur.schema, columns)
    val target = buckets.getOrElse((0 until cur.nBuckets).toSet)
    val (targetFiles, _) = cur.files.partition(f => target.contains(f.bucket))
    if (targetFiles.isEmpty) return cur.copy(lineage = None)
    val rows = snapshotRows(cur, targetFiles)
    val commitDir = newCommitDir("cluster", cur.version + 1)
    val fpb = filesPerBucket(target.size)
    val layout = col("_bucket") +: columns.map(col)
    writeBucketed(
      rows.withColumn("_bucket", bucketCol(cur.keyColumns, cur.nBuckets))
        .repartitionByRange(target.size * fpb, layout: _*)
        .sortWithinPartitions(layout: _*),
      commitDir, cur.bloomColumns)
    // base-anchored seq: see compact()
    val newFiles = listCommitFiles(commitDir, cur.version, delta = false)
    val durMs = (System.nanoTime() - t0) / 1000000
    System.err.println(s"[lake-cluster] buckets=${target.size} cols=${columns.mkString(",")} " +
      s"removed=${targetFiles.size} new=${newFiles.size} durMs=$durMs")
    publishMaintenance(cur, targetFiles.map(_.path).toSet, newFiles,
      lineageNode("cluster", Map(
        "columns" -> columns.mkString(","),
        "buckets" -> target.size.toString,
        "removedFiles" -> targetFiles.size.toString,
        "newFiles" -> newFiles.size.toString,
        "durationMs" -> durMs.toString)))
  }

  /** Z-ORDER maintenance commit: like [[cluster]], but rows are laid
    * out along a MORTON CURVE over `columns` instead of
    * lexicographically — each dimension is quantile-bucketed (equal
    * frequency, one `approxQuantile` stat pass over the targeted rows)
    * and the bucket ids' bits are interleaved, so every file covers a
    * narrow range in EVERY clustered column. Lexicographic layout only
    * tightens the leading column's per-file min/max (a trailing-column
    * predicate still scans everything); z-order makes stats pruning
    * effective for predicates on ANY of the clustered columns — the
    * multi-dimensional version of the cluster() win at 10^10 rows.
    * Columns must be numeric / date / timestamp (quantiles need an
    * order-preserving double mapping). Logical state, bucket routing
    * and the change feed are unaffected (key-preserving commit).
    *
    * The quantile cuts are persisted as the `zorder.spec` table
    * property; `reuseCuts = true` skips the sketch pass and reuses the
    * stored cuts — the INCREMENTAL path for re-zordering hot buckets
    * after ingest (`zorder(cols, buckets = Some(hot), reuseCuts =
    * true)`): layout quality only needs cuts that roughly track the
    * distribution, and files z-ordered under the same cuts stay
    * mutually comparable across commits. Requires a stored spec with
    * the same columns and bits (anything else throws — silently
    * re-sketching would mix two curve geometries). */
  def zorder(columns: Seq[String], buckets: Option[Set[Int]] = None,
      bits: Int = 8, reuseCuts: Boolean = false): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    require(columns.size >= 2 && columns.size <= 6,
      "zorder: 2-6 columns (one column: use cluster())")
    validateStatsColumns(cur.schema, columns)
    def asDouble(c: String): org.apache.spark.sql.Column = {
      val dt = cur.schema(cur.schema.fieldIndex(c)).dataType
      require(dt != StringType,
        s"zorder column '$c': strings have no order-preserving double mapping; use cluster()")
      dt match {
        case DateType => col(c).cast(TimestampType).cast(DoubleType)
        case _ => col(c).cast(DoubleType)
      }
    }
    val target = buckets.getOrElse((0 until cur.nBuckets).toSet)
    val (targetFiles, _) = cur.files.partition(f => target.contains(f.bucket))
    if (targetFiles.isEmpty) return cur.copy(lineage = None)
    // the persist pays for the quantile-sketch + write double pass; under
    // reuseCuts there is only the write pass — persisting would only add
    // a materialization
    val rows0 = snapshotRows(cur, targetFiles)
    val rows =
      if (reuseCuts) rows0
      else rows0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val cuts: Array[Array[Double]] =
        if (reuseCuts) {
          val stored = cur.properties.get("zorder.spec").map(parseZorderSpec)
            .getOrElse(sys.error("zorder(reuseCuts=true): no stored zorder.spec " +
              "on this table — run a full zorder(columns) first"))
          require(stored._1 == columns && stored._2 == bits,
            s"zorder(reuseCuts=true): stored spec is over (${stored._1.mkString(",")}, " +
              s"bits=${stored._2}) but (${columns.mkString(",")}, bits=$bits) was requested")
          stored._3
        } else {
          // equal-frequency cuts, ALL dimensions in one GK-sketch pass
          val statDf = rows.select(columns.indices.map(i =>
            asDouble(columns(i)).as(s"_z$i")): _*)
          val nCuts = (1 << bits) - 1
          val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
          statDf.stat
            .approxQuantile(columns.indices.map(i => s"_z$i").toArray, probs, 0.005)
            .map(_.distinct.sorted)
        }
      val zc = graft.functions.ZValue.z(columns.map(asDouble), cuts, bits).as("_z")
      val commitDir = newCommitDir("zorder", cur.version + 1)
      val fpb = filesPerBucket(target.size)
      val withZ = rows
        .withColumn("_bucket", bucketCol(cur.keyColumns, cur.nBuckets))
        .withColumn("_z", zc)
      writeBucketed(
        withZ.repartitionByRange(target.size * fpb, col("_bucket"), col("_z"))
          .sortWithinPartitions(col("_bucket"), col("_z"))
          .drop("_z"),
        commitDir, cur.bloomColumns)
      // base-anchored seq: see compact()
      val newFiles = listCommitFiles(commitDir, cur.version, delta = false)
      val durMs = (System.nanoTime() - t0) / 1000000
      System.err.println(s"[lake-zorder] buckets=${target.size} cols=${columns.mkString(",")} " +
        s"removed=${targetFiles.size} new=${newFiles.size} durMs=$durMs")
      publishMaintenance(cur, targetFiles.map(_.path).toSet, newFiles,
        lineageNode("zorder", Map(
          "columns" -> columns.mkString(","),
          "bits" -> bits.toString,
          "cutsReused" -> reuseCuts.toString,
          "buckets" -> target.size.toString,
          "removedFiles" -> targetFiles.size.toString,
          "newFiles" -> newFiles.size.toString,
          "durationMs" -> durMs.toString)),
        propsUpdate =
          if (reuseCuts) Map.empty
          else Map("zorder.spec" -> zorderSpecJson(columns, bits, cuts)))
    } finally rows.unpersist()
  }

  /** `zorder.spec` table property: `{"columns":[…],"bits":n,"cuts":[[…],…]}`. */
  private def zorderSpecJson(columns: Seq[String], bits: Int,
      cuts: Array[Array[Double]]): String = {
    val node = mapper.createObjectNode()
    val cs = node.putArray("columns"); columns.foreach(cs.add)
    node.put("bits", bits)
    val ca = node.putArray("cuts")
    cuts.foreach { dim => val a = ca.addArray(); dim.foreach(a.add) }
    mapper.writeValueAsString(node)
  }

  private def parseZorderSpec(js: String): (Seq[String], Int, Array[Array[Double]]) = {
    val node = mapper.readTree(js)
    (node.get("columns").elements().asScala.map(_.asText()).toSeq,
      node.get("bits").asInt(),
      node.get("cuts").elements().asScala
        .map(_.elements().asScala.map(_.asDouble()).toArray).toArray)
  }

  /** `DELETE FROM ... WHERE pred` as a predicate-scoped copy-on-write
    * commit — the conversation-purge / retention shape. Manifest stats
    * bound the rewrite at FILE granularity where the layout allows:
    *  - delta-free buckets hold key-disjoint final-row files, so only
    *    the files whose min/max MAY match the predicate are rewritten;
    *    sibling files in the same bucket carry over untouched — on a
    *    [[cluster]]ed table a narrow predicate (one conversation, one
    *    time window) rewrites a handful of files out of 10^10 rows;
    *  - buckets with outstanding deltas reconstruct whole (a final row
    *    can combine several files), so the rewrite folds and replaces
    *    the full bucket — also compacting it.
    * SQL `DELETE` semantics: rows where the predicate evaluates NULL
    * are KEPT. [[changes]] across the commit reports the removed keys
    * as `delete` rows (touched-bucket diff tier — rewritten buckets
    * only). Concurrency: a lost version race rebases when interim
    * commits touched disjoint buckets (write-serializable isolation —
    * the predicate applies to the BASE version's state, concurrent
    * inserts elsewhere survive); an overlap aborts. */
  def deleteWhere(pred: org.apache.spark.sql.Column): Snapshot =
    rewriteWhere(pred, None)

  /** `UPDATE ... SET col = expr WHERE pred`: same stats-bounded
    * copy-on-write shape as [[deleteWhere]]. Assignments may not touch
    * key columns (a key change is a delete + insert — route it through
    * the CDC merge path, where bucket routing follows the key).
    * Assignment expressions are cast to the column's declared type;
    * they may reference any table column (the pre-update row's values). */
  def updateWhere(pred: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): Snapshot = {
    require(set.nonEmpty, "updateWhere: no assignments")
    rewriteWhere(pred, Some(set))
  }

  private def rewriteWhere(pred: org.apache.spark.sql.Column,
      set: Option[Map[String, org.apache.spark.sql.Column]]): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    set.foreach { assign =>
      val unknown = assign.keys.filterNot(cur.schema.fieldNames.contains)
      require(unknown.isEmpty, s"updateWhere: unknown columns ${unknown.mkString(", ")}")
      val keyed = assign.keys.filter(cur.keyColumns.contains)
      require(keyed.isEmpty, s"updateWhere: cannot assign key columns ${keyed.mkString(", ")}")
    }
    val e = org.apache.spark.sql.graftshim.toCatalyst(pred)
    val unknownAttrs = predAttrs(e).filterNot(cur.schema.fieldNames.contains)
    require(unknownAttrs.isEmpty,
      s"predicate references unknown columns: ${unknownAttrs.mkString(", ")}")
    val opName = if (set.isEmpty) "deleteWhere" else "updateWhere"
    val (keptBase, keptMor, total) = pruneForPredicate(cur, e)
    if (keptBase.isEmpty && keptMor.isEmpty) {
      // stats prove no row matches: a clean no-op, nothing committed
      System.err.println(s"[lake-$opName] stats-pruned to 0/$total files; no-op")
      return cur.copy(lineage = None)
    }
    // MoR candidate buckets rewrite whole (reconstruction needs the
    // bucket); delta-free candidates rewrite at file granularity —
    // base files within a bucket are key-disjoint, so siblings keep
    val morBuckets = keptMor.map(_.bucket).toSet
    val morFiles = cur.files.filter(f => morBuckets.contains(f.bucket))
    val basePaths = keptBase.map(_.path).toSet
    val removed: DataFile => Boolean =
      f => morBuckets.contains(f.bucket) || basePaths.contains(f.path)
    val rewriteBuckets = morBuckets ++ keptBase.map(_.bucket)
    val parts =
      (if (morFiles.isEmpty) Nil else Seq(reconstructRows(cur, morFiles))) ++
        (if (keptBase.isEmpty) Nil else Seq(readFiles(cur, keptBase)))
    val rows = parts.reduce(_ unionByName _)
    val obs = Observation()
    val observed = rows.observe(obs,
      sum(when(pred, 1L).otherwise(0L)).as("matched"),
      count(lit(1)).cast("long").as("scanned"))
    val out = (set match {
      case None =>
        // keep rows where pred is false OR null (SQL DELETE semantics)
        observed.filter(!coalesce(pred, lit(false)))
      case Some(assign) =>
        observed.select(cur.schema.fieldNames.toSeq.map { c =>
          assign.get(c) match {
            case Some(v) =>
              when(pred, v.cast(cur.schema(c).dataType)).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }: _*)
    }).select(cur.schema.fieldNames.toSeq.map(col): _*)
    val commitDir = newCommitDir(opName, cur.version + 1)
    val fpb = filesPerBucket(rewriteBuckets.size)
    writeBucketed(
      packedByBucket(out.withColumn("_bucket", bucketCol(cur.keyColumns, cur.nBuckets)),
        rewriteBuckets.toSeq, fpb, cur.keyColumns),
      commitDir, cur.bloomColumns)
    val newFiles = listCommitFiles(commitDir, cur.version + 1, delta = false)
    val m = obs.get
    def longOf(k: String): Long =
      Option(m.getOrElse(k, null)).map(_.asInstanceOf[Number].longValue).getOrElse(0L)
    val rewrittenCount = morFiles.size + keptBase.size
    val durMs = (System.nanoTime() - t0) / 1000000
    System.err.println(s"[lake-$opName] buckets=${rewriteBuckets.size}/${cur.nBuckets} " +
      s"files=$rewrittenCount/$total matched=${longOf("matched")} durMs=$durMs")
    val lineage = lineageNode(opName, Map(
      "predicate" -> pred.toString,
      "matchedRows" -> longOf("matched").toString,
      "scannedRows" -> longOf("scanned").toString,
      "candidateBuckets" -> rewriteBuckets.size.toString,
      "prunedFiles" -> (total - rewrittenCount).toString,
      "rewrittenFiles" -> rewrittenCount.toString,
      "newFiles" -> newFiles.size.toString,
      "durationMs" -> durMs.toString))
    // OCC: a lost version race rebases in O(metadata) when every interim
    // commit touched buckets DISJOINT from the rewrite set (an overlap
    // is the lost-update anomaly and aborts). Isolation is
    // write-serializable, the Delta-lake default for exactly this race:
    // the predicate applies to the table state as of this commit's BASE
    // version, so rows a racing writer inserted into untouched buckets
    // survive even if they match the predicate — the delete/update
    // serializes logically BEFORE the concurrent insert. The removal
    // predicate stays sound on the new head because the rebase check
    // guarantees no interim commit touched `rewriteBuckets`.
    publishOptimistic(cur, base => base.copy(version = base.version + 1,
      manifests = nextManifests(base, removed, newFiles.map(_.copy(seq = base.version + 1))),
      lineage = Some(lineage)),
      Some(rewriteBuckets), None)
  }

  /** Re-bucket the table under a new bucket count as ONE maintenance
    * commit: the current state is reconstructed (outstanding deltas fold
    * in) and rewritten hash-bucketed by `newBuckets`. The bucket count
    * chosen at create time must not be a forever constant — at 10^10 rows
    * a table created with 32 buckets makes every bucket huge and caps
    * compaction granularity; growing the table means growing its buckets.
    * Logical state, schema and checkpoint entries are unchanged; readers
    * atomically flip to the new layout; old files become vacuum-able once
    * prior snapshots expire. */
  def rebucket(newBuckets: Int): Snapshot = {
    val t0 = System.nanoTime()
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    require(newBuckets >= 1, s"invalid bucket count $newBuckets")
    if (newBuckets == cur.nBuckets) return cur.copy(lineage = None)
    val rows = read() // reconstructed current state (deltas folded in)
    val commitDir = newCommitDir("rebucket", cur.version + 1)
    val fpb = filesPerBucket(newBuckets)
    writeBucketed(
      packedByBucket(rows.withColumn("_bucket", bucketCol(cur.keyColumns, newBuckets)),
        0 until newBuckets, fpb, cur.keyColumns),
      commitDir, cur.bloomColumns)
    val newFiles = listCommitFiles(commitDir, cur.version + 1, delta = false)
    val durMs = (System.nanoTime() - t0) / 1000000
    System.err.println(s"[lake-rebucket] ${cur.nBuckets} -> $newBuckets files=${newFiles.size} durMs=$durMs")
    val next = cur.copy(version = cur.version + 1,
      nBuckets = newBuckets,
      manifests = writeManifest(newFiles).toSeq,
      lineage = Some(lineageNode("rebucket", Map(
        "fromBuckets" -> cur.nBuckets.toString,
        "toBuckets" -> newBuckets.toString,
        "newFiles" -> newFiles.size.toString,
        "durationMs" -> durMs.toString))))
    writeSnapshot(next)
    next
  }

  // ------------------------------------------------------------ maintenance

  /** Commit history of the retained snapshots: (version, lineage). */
  def history(): Seq[(Int, Option[JsonNode])] =
    listVersions.map(v => (v, snapshot(v).lineage))

  /** History with commit wall-clock and flattened lineage, for the SQL
    * `history` view: (version, committedAtMs (-1 unknown), operation,
    * lineage JSON). */
  def historyDetail(): Seq[(Int, Long, Option[String], Option[String])] =
    listVersions.map { v =>
      val s = snapshot(v)
      (v, s.committedAtMs,
        s.lineage.flatMap(n => Option(n.get("operation")).map(_.asText())),
        s.lineage.map(_.toString))
    }

  /** Roll the table back to a retained earlier version by publishing a
    * NEW snapshot carrying that version's file list and schema — history
    * stays immutable (the bad commits remain readable until expired),
    * readers atomically flip to the restored state, and the rolled-back
    * commits' checkpoint entries are removed so the source batches can
    * be replayed. The recovery path for a bad batch. */
  def rollback(toVersion: Int): Snapshot = {
    val cur = currentSnapshot.getOrElse(sys.error(s"no table at $root"))
    require(toVersion < cur.version, s"cannot roll back to $toVersion from ${cur.version}")
    require(listVersions.contains(toVersion),
      s"version $toVersion is expired or unknown; retained versions: " +
        listVersions.mkString("[", ",", "]"))
    val target = snapshot(toVersion)
    val next = target.copy(version = cur.version + 1,
      manifests = nextManifests(target, _ => false, Nil),
      lineage = Some(lineageNode("rollback",
        Map("toVersion" -> toVersion.toString, "fromVersion" -> cur.version.toString))))
    writeSnapshot(next)
    next
  }

  /** Drop snapshot metadata older than the newest `keepLast` versions.
    * Expired versions are no longer time-travel readable; their
    * exclusively-referenced data files become vacuum-able. Returns the
    * expired version numbers.
    *
    * Registered change-feed consumers ([[changesSince]]) pin retention:
    * a version at or after the SLOWEST consumer's acknowledged position
    * is never expired (the consumer's next increment diffs from that
    * version), so a lagging consumer can always resume instead of
    * re-bootstrapping the whole table — the operational difference
    * between a stalled downstream and a 10^10-row re-sync. Pass
    * `respectConsumers = false` to expire anyway (the lagging
    * consumer's next [[changesSince]] then fails with the re-bootstrap
    * remediation rather than silently losing changes). */
  def expireSnapshots(keepLast: Int, respectConsumers: Boolean = true,
      olderThanMs: Long = 0L): Seq[Int] = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val versions = listVersions
    val floor: Int =
      if (!respectConsumers) Int.MaxValue
      else consumerPositions().values.reduceOption(_ min _).getOrElse(Int.MaxValue)
    val now = System.currentTimeMillis()
    val tagged = tags().values.toSet // tag refs pin their version
    val expired = versions.dropRight(keepLast).filter(_ < floor)
      .filterNot(tagged.contains).filter { v =>
      olderThanMs <= 0L || {
        // age-based retention (time-travel SLA): keep snapshots younger
        // than the horizon; a pre-timestamp legacy snapshot (-1) is by
        // definition older than any horizon
        val ts = snapshot(v).committedAtMs
        ts < 0L || now - ts >= olderThanMs
      }
    }
    expired.foreach(v => fs.delete(versionFile(v), false))
    expired
  }

  /** All registered change-feed consumers and their acknowledged
    * versions. */
  def consumerPositions(): Map[String, Int] = {
    val dir = new Path(metaDir, "consumers")
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.endsWith(".json"))
      .map { s =>
        val id = s.getPath.getName.stripSuffix(".json")
        id -> mapper.readTree(readFully(s.getPath)).get("version").asInt()
      }.toMap
  }

  /** Delete data files not referenced by any RETAINED snapshot — orphans
    * from failed commits and files only expired snapshots referenced —
    * plus manifest files no retained snapshot lists. Returns the number
    * of files deleted (data + manifests).
    *
    * `minAgeMs` is the concurrency guard: an in-flight commit's staged
    * files are not yet referenced by any snapshot and would look like
    * orphans, so vacuum only deletes files older than this. With the
    * default 0 vacuum is SINGLE-WRITER maintenance (must not run beside
    * an in-flight commit); set it above the longest plausible
    * commit-staging duration (e.g. hours) to run it safely alongside
    * live writers — the Delta retention-threshold contract. */
  def vacuum(minAgeMs: Long = 0L): Int = {
    val retained = listVersions.map(snapshot)
    val referenced = retained.flatMap(_.files.map(_.path)).toSet
    val dataDir = new Path(root, "data")
    val now = System.currentTimeMillis()
    var deleted = 0
    if (fs.exists(dataDir)) {
      val it = fs.listFiles(dataDir, true)
      val toDelete = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        val p = f.getPath.toString
        val rel = p.substring(p.indexOf(root) + root.length + 1)
        if (!referenced.contains(rel) && !f.getPath.getName.startsWith("_") &&
            (minAgeMs <= 0L || now - f.getModificationTime >= minAgeMs))
          toDelete += f.getPath
      }
      // deletes are independent driver-side FS calls — run them on a
      // bounded pool (serial deletion of a large vacuum batch is pure
      // driver wall time, guide §5)
      val victims = toDelete.result()
      if (victims.size <= 1) victims.foreach { p => if (fs.delete(p, false)) deleted += 1 }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, victims.size))
        try {
          val tasks: Seq[java.util.concurrent.Callable[Boolean]] =
            victims.map(p => new java.util.concurrent.Callable[Boolean] {
              override def call(): Boolean = fs.delete(p, false)
            })
          deleted += pool.invokeAll(tasks.asJava).asScala.count(_.get())
        } finally pool.shutdown()
      }
      // prune now-empty commit directories
      fs.listStatus(dataDir).foreach { d =>
        if (d.isDirectory && !fs.listFiles(d.getPath, true).hasNext)
          fs.delete(d.getPath, true)
      }
    }
    // manifest GC: drop manifests only expired snapshots (or failed
    // commits) reference
    val referencedManifests =
      retained.flatMap(_.manifests.map(_.path)).filter(_.nonEmpty).toSet
    fs.listStatus(metaDir).foreach { f =>
      val name = f.getPath.getName
      val rel = s"metadata/$name"
      if (name.startsWith("manifest-") && !referencedManifests.contains(rel) &&
          (minAgeMs <= 0L || now - f.getModificationTime >= minAgeMs)) {
        if (fs.delete(f.getPath, false)) { deleted += 1; manifestCache.remove(manifestKey(rel)) }
      }
    }
    deleted
  }
}

object LakeTable {
  private[lake] val manifestCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[LakeTable#DataFile]]

  /** `partitionPreimages(n)(t)` = an Int whose murmur3 hash (seed 42 —
    * what `repartition` applies to a single int column) lands in shuffle
    * partition t of n. Routing a bucketed write by the preimage of its
    * (bucket, salt) slot packs each slot into its own task — see
    * `packedByBucket`. Deterministic; cached per partition count. */
  private val preimageCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Int]]
  private[graft] def partitionPreimages(n: Int): Array[Int] =
    preimageCache.getOrElseUpdate(n, {
      val inv = Array.fill(n)(-1)
      var found = 0
      var v = 0
      while (found < n) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
        val p = ((h % n) + n) % n
        if (inv(p) < 0) { inv(p) = v; found += 1 }
        v += 1
      }
      inv
    })
}
