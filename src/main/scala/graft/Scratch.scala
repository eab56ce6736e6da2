package graft

/** Session-scoped scratch state for PHYSICAL artifacts (the shingle
  * index, the graph edge lists, the co-purchase basket table, format
  * round-trip sinks).
  *
  * Two concerns every artifact cache shares, centralized:
  *
  *   1. '''Disk lifetime.''' Artifact dirs used to be bare
  *      `createTempDirectory` calls — nothing ever deleted them, so a
  *      long-lived machine accumulated corpus-sized parquet per
  *      (session, corpus, dial) forever. Every dir allocated through
  *      [[tempDir]] is registered with ONE JVM shutdown hook that
  *      deletes it recursively on exit, and the owning cache's
  *      `clear*` escape hatch can call [[delete]] to reclaim the disk
  *      mid-session (not just forget the memo entry).
  *   2. '''Memo-key identity.''' Caches keyed on the 32-bit
  *      `analyzed.semanticHash()` carried a 2⁻³² silent-collision
  *      class: two different corpora colliding in one session would
  *      serve the wrong cached index/trained state — and unlike the
  *      table-NAME collision (fixed round 15 by md5 naming), a KEY
  *      collision is invisible because the first build's entry answers
  *      for both. [[planDigest]] is the collision-resistant
  *      replacement: the md5 of the full canonicalized analyzed plan
  *      (canonicalization normalizes expr ids / aliases exactly like
  *      semanticHash does, so plan-object reuse across queries still
  *      hits the cache).
  */
object Scratch {

  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // registered once, on first use; deleting on exit (not eagerly)
  // keeps artifacts alive for the whole session — the memo maps hold
  // live pointers into these dirs
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(d => deleteRecursively(new java.io.File(d)))
    }, "graft-scratch-cleanup"))
    true
  }

  /** A temp dir that dies with the JVM. */
  def tempDir(prefix: String): String = {
    require(hookInstalled)
    val d = java.nio.file.Files.createTempDirectory(prefix)
      .toFile.getAbsolutePath
    dirs.add(d)
    d
  }

  /** Reclaim a scratch dir NOW (clear* escape hatches). Safe on paths
    * not allocated here (no-op on the registry, best-effort delete).
    */
  def delete(path: String): Unit = {
    dirs.remove(path)
    deleteRecursively(new java.io.File(path))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Collision-resistant identity of a DataFrame's logical plan for
    * memo keys — md5 of the canonicalized analyzed plan (see class
    * doc). 128 bits: two corpora colliding is not a live failure class.
    *
    * The tree STRING alone is not an identity: a `LocalRelation`'s
    * simpleString prints only its schema, so two in-memory corpora
    * with identical schemas would print identically (caught live by
    * DedupSpec the first time this keyed the shingle cache). The
    * digest therefore also folds in every data-bearing leaf: the rows
    * of each LocalRelation and the RDD id of each LogicalRDD
    * (conservative — same data via different checkpoints keys apart,
    * which only costs a rebuild, never serves wrong state). File-based
    * corpora are NOT covered by the tree string — a canonicalized
    * parquet scan prints only `Relation [cols] parquet`, no path
    * (verified empirically: two same-schema corpora at different dirs
    * rendered identically, round-17 ADVICE) — so every file/table scan
    * leaf folds its physical identity in explicitly: the file index's
    * root paths for v1 relations, the table name + output for DSv2.
    *
    * Two more folds close residual aliasing classes:
    *   - the plan's `semanticHash()` — Catalyst's own 32-bit identity,
    *     which sees structure the rendered string may normalize away;
    *   - each node's FULL output attribute list — `toString` truncates
    *     attribute lists at `spark.sql.debug.maxToStringFields`
    *     (default 25), so plans differing only past a wide relation's
    *     25th field would otherwise collide.
    */
  def planDigest(df: org.apache.spark.sql.DataFrame): String = {
    val analyzed = df.queryExecution.analyzed
    val canon = analyzed.canonicalized
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(canon.toString.getBytes("UTF-8"))
    md.update(analyzed.semanticHash().toString.getBytes("UTF-8"))
    canon.foreach { node =>
      // untruncated schema of every node (canonicalized exprIds are
      // normalized, so plan-object reuse still digests identically)
      node.output.foreach(a =>
        md.update(s"${a.name}:${a.dataType.catalogString}|".getBytes("UTF-8")))
      node match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          lr.data.foreach(r => md.update(r.toString.getBytes("UTF-8")))
        case rdd: org.apache.spark.sql.execution.LogicalRDD =>
          md.update(rdd.rdd.id.toString.getBytes("UTF-8"))
        case rel: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          rel.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths
                .foreach(p => md.update(p.toString.getBytes("UTF-8")))
            case other =>
              md.update(other.toString.getBytes("UTF-8"))
          }
          rel.catalogTable.foreach(t =>
            md.update(t.identifier.unquotedString.getBytes("UTF-8")))
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          md.update(v2.table.name.getBytes("UTF-8"))
        case hive: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
          md.update(hive.tableMeta.identifier.unquotedString.getBytes("UTF-8"))
        case _ => ()
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
