package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-style snapshot semantics over the bucketed edge layout
 * ([[BucketedLayout]]): append-only versioned writes
 * (`snap=<N>/bucket=<K>/` parquet), a manifest sidecar per snapshot
 * with per-bucket file statistics (row count, min/max of the cluster
 * key), and readers that resolve the latest snapshot or any
 * historical one (time travel) and prune buckets from the manifest's
 * min/max ranges WITHOUT touching data files — the three Iceberg
 * behaviors a 10^12-edge table relies on (snapshot isolation for
 * concurrent readers, reproducible historical reads, scan pruning).
 * No Iceberg runtime jar ships in this sandbox (SURVEY.md §7.0); the
 * layout + manifest contract here is catalog-compatible, so a real
 * catalog slots in behind this object unchanged.
 *
 * Scale shape: one bucketed write (the data), one per-bucket
 * aggregate (the stats — `numBuckets` rows to the driver, never
 * data), one tiny JSON sidecar. Readers list directories, not files.
 */
object SnapshotTable {

  // per-bucket bloom over the NON-cluster column (dst): 960 bits as
  // 16 × 60-bit words (JSON-safe longs), 3 md5-derived probes — the
  // secondary point-lookup index the cluster key cannot serve
  private val bloomK = 3
  private val bloomBits = 960L
  private val bloomWordBits = 60L
  private val bloomWords = 16

  private def snapDir(table: String, snap: Int) = s"$table/snap=$snap"
  private def manifestPath(table: String, snap: Int) =
    s"${snapDir(table, snap)}/_manifest.json"

  /** Per-bucket dense bloom word arrays over `dst` for the files just
   * written under `path`. */
  private def bucketBlooms(spark: SparkSession, path: String): Map[Int, Seq[Long]] = {
    val h = expr("cast(conv(substring(md5(cast(dst as string)), 1, 15), 16, 10) as bigint)")
    val slices = (0 until bloomK).map(i =>
      pmod(shiftright(h, i * 12), lit(bloomBits)))
    val rows = spark.read.parquet(path)
      .select(col("bucket"), explode(array(slices: _*)).as("pos"))
      .select(col("bucket"),
        expr(s"pos div $bloomWordBits").as("w"),
        expr(s"shiftleft(cast(1 as bigint), cast(pos % $bloomWordBits as int))").as("m"))
      .groupBy(col("bucket"), col("w")).agg(expr("bit_or(m)").as("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1).toInt, r.getLong(2)))
    rows.groupBy(_._1).map { case (bkt, xs) =>
      val arr = Array.fill(bloomWords)(0L)
      xs.foreach { case (_, w, b) => arr(w) = b }
      bkt -> arr.toSeq
    }
  }

  private def bloomJson(words: Seq[Long]): String = words.mkString("[", ",", "]")

  /** Committed snapshot ids (manifest present), ascending. */
  private def committedSnaps(table: String): Seq[Int] = {
    val d = Paths.get(table)
    if (!Files.isDirectory(d)) return Seq.empty
    val listing = Files.list(d)
    val names =
      try listing.toArray.toSeq.map(_.toString)
      finally listing.close()
    names
      .filter(_.matches(".*/snap=\\d+$"))
      .map(p => p.substring(p.lastIndexOf('=') + 1).toInt)
      .filter(s => Files.exists(Paths.get(manifestPath(table, s))))
      .sorted
  }

  /** Latest committed snapshot id (manifest present), if any. */
  def latest(table: String): Option[Int] =
    committedSnaps(table).lastOption

  /**
   * Snapshot expiration (Iceberg `expire_snapshots`): drop the
   * manifests of all but the newest `retain` snapshots, then delete
   * every snapshot DATA directory that no retained manifest
   * references — and ONLY those. Because [[merge]] and [[compact]]
   * inherit untouched buckets by `loc` reference, an old snapshot's
   * directory can back newer manifests; reachability is therefore
   * computed from the retained manifests' loc sets (reference-
   * counting GC — naive delete-by-age would corrupt the table).
   *
   * After expiry: time travel to an expired snapshot fails (its
   * manifest is gone); every retained snapshot reads byte-identical.
   *
   * @return ids of the expired snapshots
   */
  def expireSnapshots(table: String, retain: Int = 2): Seq[Int] = {
    require(retain >= 1, "must retain at least the current snapshot")
    val all = committedSnaps(table)
    if (all.size <= retain) return Seq.empty
    val (drop, keep) = all.splitAt(all.size - retain)
    // normalize both sides of the reachability check: manifests may
    // record `loc` under a different spelling of the table path
    // (relative vs absolute, trailing slash, symlinked parent) than
    // this call's `table` — raw string comparison would then treat a
    // referenced snapshot dir as orphaned and DELETE live data
    def canon(p: String): String =
      try Paths.get(p).toRealPath().toString // resolves symlinks too
      catch { case _: java.io.IOException =>
        Paths.get(p).toAbsolutePath.normalize.toString }
    val referenced: Set[String] =
      (keep.flatMap(s => bucketLocs(table, s).map(_._2)) ++
        keep.map(snapDir(table, _))).map(canon).toSet
    drop.foreach(s => Files.deleteIfExists(Paths.get(manifestPath(table, s))))
    // orphan sweep over EVERY snapshot directory on disk (not just the
    // ones dropped now): a dir whose manifest expired earlier becomes
    // deletable the moment its last referencing manifest goes
    val listing = Files.list(Paths.get(table))
    val dirs =
      try listing.toArray.toSeq.map(_.toString).filter(_.matches(".*/snap=\\d+$"))
      finally listing.close()
    dirs.filterNot(d => referenced.contains(canon(d))).foreach { d =>
      val walk = Files.walk(Paths.get(d))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
    drop
  }

  /**
   * Commit a new snapshot of the edge table: bucketed + sorted data
   * files, then the stats manifest. The manifest is written LAST —
   * a reader never sees a half-written snapshot (the same commit
   * protocol as Iceberg's metadata swap).
   *
   * @param edges   (src, dst, weight)
   * @param buckets (id, bucket) from [[BucketedLayout.assignBuckets]]
   * @param key     cluster column ("src" or "dst")
   * @return the new snapshot id
   */
  /** @param maxRecordsPerFile when > 0, cap rows per data file (the
   *                            writer rolls to a new file at the cap)
   *                            — models the small-file fragmentation
   *                            a many-executor streaming ingest
   *                            leaves behind, which [[compact]]
   *                            exists to repair */
  def commit(
      edges: DataFrame,
      buckets: DataFrame,
      table: String,
      key: String = "src",
      maxRecordsPerFile: Int = 0): Int = {
    val snap = latest(table).map(_ + 1).getOrElse(0)
    val path = snapDir(table, snap)
    val other = if (key == "src") "dst" else "src"
    edges.join(buckets.withColumnRenamed("id", key), key)
      .repartition(col("bucket"))
      .sortWithinPartitions(key, other)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", if (maxRecordsPerFile > 0) maxRecordsPerFile else 0)
      .partitionBy("bucket").parquet(path)
    val spark = edges.sparkSession
    val stats = spark.read.parquet(path)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows"),
        min(col(key)).as("min_key"), max(col(key)).as("max_key"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val blooms = bucketBlooms(spark, path)
    val bucketJson = stats.map { case (b, n, lo, hi) =>
      s"""{"bucket":$b,"rows":$n,"min_key":$lo,"max_key":$hi,"loc":"$path","bloom":${bloomJson(blooms(b))}}"""
    }.mkString("[", ",", "]")
    val numRows = stats.map(_._2).sum
    val parent = snap - 1
    val json =
      s"""{"snapshot":$snap,"parent":$parent,"key":"$key","num_rows":$numRows,"buckets":$bucketJson}"""
    Files.writeString(Paths.get(manifestPath(table, snap)), json)
    snap
  }

  /** Manifest rows as a DataFrame. The `_`-prefixed sidecar is
   * invisible to Spark's file listing (by design — parquet readers of
   * the same directory must skip it), so the JSON text is read
   * directly and parsed from a literal dataset. */
  private def manifest(table: String, snap: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val text = Files.readString(Paths.get(manifestPath(table, snap)))
    spark.read.json(Seq(text).toDS())
  }

  /** Per-bucket data locations from the manifest: (bucket → snapshot
   * dir owning its files). Pre-merge manifests carry no "loc" — their
   * buckets live in the snapshot's own directory. */
  private def bucketLocs(table: String, snap: Int): Seq[(Int, String)] = {
    val m = manifest(table, snap).select(explode(col("buckets")).as("b"))
    val own = snapDir(table, snap)
    val hasLoc = m.schema("b").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains("loc")
    val rows =
      if (hasLoc) m.select(col("b.bucket"), coalesce(col("b.loc"), lit(own)).as("loc"))
      else m.select(col("b.bucket"), lit(own).as("loc"))
    rows.collect().map(r => (r.getLong(0).toInt, r.getString(1))).sortBy(_._1).toSeq
  }

  /** Assemble a DataFrame over a set of (bucket, loc) directories —
   * grouped by loc so Spark's partition-column inference keeps the
   * `bucket=` column per base path. */
  private def readBuckets(spark: SparkSession, locs: Seq[(Int, String)]): DataFrame =
    locs.groupBy(_._2).toSeq.sortBy(_._1).map { case (loc, bs) =>
      spark.read.option("basePath", loc)
        .parquet(bs.map { case (b, _) => s"$loc/bucket=$b" }: _*)
    }.reduce(_ unionByName _)

  /** Per-bucket bloom word arrays from the manifest (empty map when
   * the snapshot predates blooms). */
  private def bucketBloomMap(table: String, snap: Int): Map[Int, Seq[Long]] = {
    val m = manifest(table, snap).select(explode(col("buckets")).as("b"))
    val hasBloom = m.schema("b").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains("bloom")
    if (!hasBloom) return Map.empty
    m.select(col("b.bucket"), col("b.bloom"))
      .where(col("b.bloom").isNotNull)
      .collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Long](1).toSeq).toMap
  }

  /** Bloom-pruned candidate buckets for a point lookup on `dst` —
   * metadata only. A bucket without a bloom can never be pruned. */
  def pointBuckets(table: String, snap: Int, dst: Long): Seq[Int] = {
    val blooms = bucketBloomMap(table, snap)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(dst.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    bucketLocs(table, snap).map(_._1).filter { b =>
      blooms.get(b).forall { ws =>
        (0 until bloomK).forall { i =>
          val pos = (h >> (i * 12)) % bloomBits
          (ws((pos / bloomWordBits).toInt) & (1L << (pos % bloomWordBits).toInt)) != 0L
        }
      }
    }
  }

  /** Point lookup on the non-cluster column: bloom-select buckets,
   * open only those, exact filter on top (blooms never false-negate,
   * so the result is exact). */
  def readPoint(spark: SparkSession, table: String, dst: Long,
      snapshot: Option[Int] = None): DataFrame = {
    val snap = snapshot.orElse(latest(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val picked = pointBuckets(table, snap, dst).toSet
    val locs = bucketLocs(table, snap).filter { case (b, _) => picked.contains(b) }
    if (locs.isEmpty) return read(spark, table, Some(snap)).where(lit(false))
    readBuckets(spark, locs).where(col("dst") === dst)
  }

  /** Manifest-driven bucket selection for a key-range scan: buckets
   * whose [min_key, max_key] intersect [lo, hi] — metadata only, no
   * data file is opened. */
  def selectBuckets(table: String, snap: Int, lo: Long, hi: Long): Seq[Int] = {
    manifest(table, snap)
      .select(explode(col("buckets")).as("b"))
      .select(col("b.bucket"), col("b.min_key"), col("b.max_key"))
      .where(!(col("max_key") < lo || col("min_key") > hi))
      .collect().map(_.getLong(0).toInt).sorted.toSeq
  }

  /** Read a snapshot (default: latest) — time travel is just passing
   * an older id. */
  def read(spark: SparkSession, table: String, snapshot: Option[Int] = None): DataFrame = {
    val snap = snapshot.orElse(latest(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    readBuckets(spark, bucketLocs(table, snap))
  }

  /** Key-range scan with manifest pruning: only the selected buckets'
   * directories are listed/read. The residual filter stays on top
   * (bucket stats are a superset guarantee, exactly like Iceberg's). */
  def readRange(
      spark: SparkSession,
      table: String,
      lo: Long,
      hi: Long,
      snapshot: Option[Int] = None): DataFrame = {
    val snap = snapshot.orElse(latest(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val keyCol = manifest(table, snap).select(col("key")).first().getString(0)
    val picked = selectBuckets(table, snap, lo, hi)
    if (picked.isEmpty)
      return read(spark, table, Some(snap)).where(lit(false))
    val locs = bucketLocs(table, snap).filter { case (b, _) => picked.contains(b) }
    readBuckets(spark, locs)
      .where(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /**
   * MERGE (copy-on-write upsert), the lakehouse write path: upsert
   * `updates` keyed by (src, dst) — existing keys take the new
   * weight, new keys insert. Only the buckets an update touches are
   * rewritten under the new snapshot; every untouched bucket is
   * INHERITED by manifest reference (its `loc` keeps pointing at the
   * older snapshot's files), exactly Iceberg's COW file reuse. At
   * 10^12 rows a point-update batch rewrites a handful of buckets,
   * not the table.
   *
   * @return the new snapshot id
   */
  def merge(
      updates: DataFrame,
      buckets: DataFrame,
      table: String): Int = {
    val spark = updates.sparkSession
    val prev = latest(table).getOrElse(
      throw new IllegalStateException(s"merge into empty table $table"))
    val m = manifest(table, prev)
    val keyCol = m.select(col("key")).first().getString(0)
    val prevLocs = bucketLocs(table, prev)
    val up = updates.join(buckets.withColumnRenamed("id", keyCol), keyCol)
    val touched = up.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val snap = prev + 1
    val path = snapDir(table, snap)
    val touchedLocs = prevLocs.filter { case (b, _) => touched.contains(b) }
    // rewritten buckets: old rows minus updated keys, plus updates
    val old = readBuckets(spark, touchedLocs)
      .join(up.select(col("src").as("usrc"), col("dst").as("udst")),
        col("src") === col("usrc") && col("dst") === col("udst"), "left_anti")
    old.select(col("src"), col("dst"), col("weight"), col("bucket"))
      .unionByName(up.select(col("src"), col("dst"), col("weight"), col("bucket")))
      .repartition(col("bucket"))
      .sortWithinPartitions(keyCol, if (keyCol == "src") "dst" else "src")
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val stats = spark.read.parquet(path)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val newBlooms = bucketBlooms(spark, path)
    val rewritten = stats.map { case (b, n, lo2, hi2) =>
      b -> s"""{"bucket":$b,"rows":$n,"min_key":$lo2,"max_key":$hi2,"loc":"$path","bloom":${bloomJson(newBlooms(b))}}"""
    }.toMap
    // inherited buckets keep their previous stats + location + bloom
    val prevBlooms = bucketBloomMap(table, prev)
    val prevStats = m.select(explode(col("buckets")).as("b"))
      .select(col("b.bucket"), col("b.rows"), col("b.min_key"), col("b.max_key"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
    val prevLocMap = prevLocs.toMap
    val entries = prevStats.filterNot(e => touched.contains(e._1)).map {
      case (b, n, lo2, hi2) =>
        val bj = prevBlooms.get(b).map(ws => s""","bloom":${bloomJson(ws)}""").getOrElse("")
        b -> s"""{"bucket":$b,"rows":$n,"min_key":$lo2,"max_key":$hi2,"loc":"${prevLocMap(b)}"$bj}"""
    }.toMap ++ rewritten
    val ordered = entries.toSeq.sortBy(_._1).map(_._2)
    val bucketJson = ordered.mkString("[", ",", "]")
    val total = prevStats.filterNot(e => touched.contains(e._1)).map(_._2).sum +
      stats.map(_._2).sum
    val json =
      s"""{"snapshot":$snap,"parent":$prev,"key":"$keyCol","num_rows":$total,"buckets":$bucketJson}"""
    Files.writeString(Paths.get(manifestPath(table, snap)), json)
    snap
  }

  /**
   * Compaction (Iceberg `rewrite_data_files`): rewrite every bucket
   * whose directory holds more than one data file into a single
   * file, inherit the rest by manifest reference. A PURE maintenance
   * snapshot — no logical change, so the rewritten buckets' manifest
   * stats and blooms are INHERITED verbatim (the rows are identical;
   * only `loc` moves), and [[changes]] between the two snapshots is
   * empty even though [[changedBuckets]] lists every compacted
   * bucket. At 10^12 rows this is the small-file defragmentation an
   * append-heavy table needs; it reads and writes only the
   * fragmented buckets.
   *
   * @return the new snapshot id, or the CURRENT one when no bucket
   *         is fragmented (no empty snapshots)
   */
  def compact(spark: SparkSession, table: String): Int = {
    val prev = latest(table).getOrElse(
      throw new IllegalStateException(s"compact of empty table $table"))
    val m = manifest(table, prev)
    val keyCol = m.select(col("key")).first().getString(0)
    val locs = bucketLocs(table, prev)
    val multi = locs.filter { case (b, loc) =>
      val fs = new java.io.File(s"$loc/bucket=$b").listFiles()
      fs != null && fs.count(f => f.getName.endsWith(".parquet")) > 1
    }.map(_._1).toSet
    if (multi.isEmpty) return prev
    val snap = prev + 1
    val path = snapDir(table, snap)
    readBuckets(spark, locs.filter { case (b, _) => multi.contains(b) })
      .repartition(col("bucket"))
      .sortWithinPartitions(keyCol, if (keyCol == "src") "dst" else "src")
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    // manifest: identical stats + blooms, loc flipped for compacted buckets
    val prevBlooms = bucketBloomMap(table, prev)
    val prevLocMap = locs.toMap
    val prevStats = m.select(explode(col("buckets")).as("b"))
      .select(col("b.bucket"), col("b.rows"), col("b.min_key"), col("b.max_key"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val entries = prevStats.map { case (b, n, lo, hi) =>
      val loc = if (multi.contains(b)) path else prevLocMap(b)
      val bj = prevBlooms.get(b).map(ws => s""","bloom":${bloomJson(ws)}""").getOrElse("")
      s"""{"bucket":$b,"rows":$n,"min_key":$lo,"max_key":$hi,"loc":"$loc"$bj}"""
    }
    val total = prevStats.map(_._2).sum
    val json =
      s"""{"snapshot":$snap,"parent":$prev,"key":"$keyCol","num_rows":$total,"buckets":${entries.mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(manifestPath(table, snap)), json)
    snap
  }

  /** Buckets whose data files DIFFER between two snapshots — resolved
   * entirely from the two manifests (a bucket inherited by `loc`
   * reference is byte-identical, so it cannot hold a change): the
   * manifest-level pruning that makes incremental reads cheap. */
  def changedBuckets(table: String, fromSnap: Int, toSnap: Int): Set[Int] = {
    val f = bucketLocs(table, fromSnap).toMap
    val t = bucketLocs(table, toSnap).toMap
    (f.keySet ++ t.keySet).filter(b => f.get(b) != t.get(b))
  }

  /**
   * Incremental changelog (CDC) read between two snapshots — the
   * Iceberg `incremental scan`: every row-level difference as
   * (op ∈ insert|delete|update, src, dst, weight), where `weight` is
   * the NEW value for inserts/updates and the old one for deletes.
   *
   * Scale shape: only [[changedBuckets]] are read from EITHER
   * snapshot (manifest diff, no data I/O for inherited buckets), then
   * one co-bucketed full-outer join keyed (src, dst) within those
   * buckets. A merge that touched 3 of 10^5 buckets reads 3 buckets
   * twice — not the table twice.
   */
  def changes(
      spark: SparkSession,
      table: String,
      fromSnap: Int,
      toSnap: Int): DataFrame = {
    val changed = changedBuckets(table, fromSnap, toSnap)
    if (changed.isEmpty) // identical snapshots: nothing to read at all
      return spark.emptyDataFrame.select(
        lit("").as("op"), lit(0L).as("src"), lit(0L).as("dst"),
        lit(0.0).as("weight"))
    val fromLocs = bucketLocs(table, fromSnap).filter(kv => changed(kv._1))
    val toLocs = bucketLocs(table, toSnap).filter(kv => changed(kv._1))
    // a bucket may exist on only one side (created or dropped)
    def side(locs: Seq[(Int, String)], w: String): DataFrame =
      if (locs.isEmpty)
        spark.emptyDataFrame.select(
          lit(0L).as("src"), lit(0L).as("dst"), lit(0.0).as(w))
      else readBuckets(spark, locs)
        .select(col("src"), col("dst"), col("weight").as(w))
    val o = side(fromLocs, "ow")
    val n = side(toLocs, "nw")
    o.join(n, Seq("src", "dst"), "full_outer")
      .where(col("ow").isNull || col("nw").isNull || col("ow") =!= col("nw"))
      .select(
        when(col("ow").isNull, lit("insert"))
          .when(col("nw").isNull, lit("delete"))
          .otherwise(lit("update")).as("op"),
        col("src"), col("dst"),
        coalesce(col("nw"), col("ow")).as("weight"))
  }
}
