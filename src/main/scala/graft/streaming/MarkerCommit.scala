package graft.streaming

/** The one seam in [[IdempotentSink]]'s commit protocol: how a marker
  * object named `name` comes into existence exactly once. Two
  * strategies exist because the atomicity primitive differs by store:
  *
  *  - **Real filesystems** (local disk, HDFS, NFS): write-temp-then-
  *    atomic-link — [[AtomicRenameCommit]], the default. `createLink`
  *    (POSIX link(2)) FAILS if the target exists, where rename would
  *    silently replace it — so the create-once contract holds even
  *    for two same-name racers, not just under the
  *    single-active-driver guarantee Structured Streaming already
  *    provides (one active query per checkpoint).
  *  - **Object stores** (S3/ABFS/GCS): rename is copy+delete, NOT
  *    atomic — the deployment there swaps in a conditional-put
  *    (HTTP `If-None-Match: *` / blob lease) strategy, which is
  *    STRICTLY stronger: it also survives the zombie-driver race
  *    (two drivers alive across a network partition both delivering
  *    the same epoch), because the store itself arbitrates who
  *    created the marker. [[ConditionalPutCommit]] over
  *    [[MockConditionalPutStore]] is the executable witness of that
  *    protocol — the same seam discipline `SnapshotDialect` uses for
  *    T-SQL that cannot run in this sandbox.
  *
  * Contract: `commit` returns true iff THIS call brought the marker
  * into existence; false means it already existed (duplicate delivery
  * or a lost creation race — either way the epoch is committed and
  * the caller must not treat the data as missing).
  */
trait MarkerCommit {
  def exists(commitsDir: java.io.File, name: String): Boolean
  def commit(commitsDir: java.io.File, name: String, content: String): Boolean
  /** Names of committed markers under the dir (digits-only filter is
    * the caller's concern). */
  def list(commitsDir: java.io.File): Seq[String]
}

/** Write-temp-then-atomic-link on a real filesystem (the default).
  * The temp is racer-unique (pid + thread id — a shared temp name lets
  * a second racer truncate the first's bytes mid-write), and the
  * publish step is `createLink`, whose fail-if-exists semantics make
  * `commit`'s "true iff THIS call created it" contract hold under a
  * same-name race — `ATOMIC_MOVE` would silently replace the winner's
  * marker and report both racers as creators. */
object AtomicRenameCommit extends MarkerCommit {
  def exists(commitsDir: java.io.File, name: String): Boolean =
    new java.io.File(commitsDir, name).exists()
  def commit(commitsDir: java.io.File, name: String, content: String): Boolean = {
    val marker = new java.io.File(commitsDir, name)
    if (marker.exists()) return false
    val tmp = new java.io.File(commitsDir,
      s".${name}_tmp${ProcessHandle.current().pid()}_${Thread.currentThread().getId}")
    java.nio.file.Files.writeString(tmp.toPath, content)
    try {
      java.nio.file.Files.createLink(marker.toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally java.nio.file.Files.deleteIfExists(tmp.toPath)
  }
  def list(commitsDir: java.io.File): Seq[String] =
    if (!commitsDir.isDirectory) Seq.empty
    else commitsDir.listFiles().filter(_.isFile).map(_.getName).toSeq
}

/** In-memory model of an object store's conditional put: `putIfAbsent`
  * is exactly the create-or-409 semantics of `PUT … If-None-Match: *`
  * (S3 conditional writes, Azure `If-None-Match`, GCS
  * `ifGenerationMatch=0`). Instrumented so a spec can assert the
  * request pattern (one successful create, N conflicts), not just the
  * end state. */
final class MockConditionalPutStore {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val creates = new java.util.concurrent.atomic.AtomicInteger(0)
  val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
  def putIfNoneMatch(key: String, content: String): Boolean = {
    val won = objects.putIfAbsent(key, content) == null
    if (won) creates.incrementAndGet() else conflicts.incrementAndGet()
    won
  }
  def get(key: String): Option[String] = Option(objects.get(key))
  def listPrefix(prefix: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    objects.forEach((k, _) => if (k.startsWith(prefix)) out += k)
    out.toSeq
  }
}

/** Marker commits through a conditional-put store. Keys are
  * `<commitsDir-path>/<name>` so one store can back many sink roots. */
final class ConditionalPutCommit(store: MockConditionalPutStore)
    extends MarkerCommit {
  private def key(dir: java.io.File, name: String) = s"${dir.getPath}/$name"
  def exists(commitsDir: java.io.File, name: String): Boolean =
    store.get(key(commitsDir, name)).isDefined
  def commit(commitsDir: java.io.File, name: String, content: String): Boolean =
    store.putIfNoneMatch(key(commitsDir, name), content)
  def list(commitsDir: java.io.File): Seq[String] = {
    val prefix = s"${commitsDir.getPath}/"
    store.listPrefix(prefix).map(_.stripPrefix(prefix))
  }
}
