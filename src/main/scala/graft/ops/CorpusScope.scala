package graft.ops

/** One registry for every per-corpus, per-JVM write-once artifact the
  * engine keeps (candidate graphs, IVF training frames, persisted-index
  * paths, scratch layouts, JDBC snapshots) — the r13 VERDICT #5 ask:
  * before this, ~8 static ConcurrentHashMaps each grew without bound as
  * the soak matrix widened (every regime re-keys every family).
  *
  * Semantics, matched to what the ad-hoc maps provided:
  *  - **Per-key build lock**: one builder per (family, key); concurrent
  *    callers of the same key wait, different keys build in parallel.
  *    The build runs OUTSIDE the map lock, so a build may itself call
  *    `cached` for a different key in the same family (the wedge-count
  *    build consumes the und/deg frames this way) without deadlock —
  *    the hazard that forced Dedup's old get/putIfAbsent spelling.
  *  - **LRU bound**: each family keeps at most [[MaxPerFamily]] entries
  *    (the old test-fixture-churn guard was a blunt clear() at the same
  *    threshold); eviction drops the map reference only — on-disk
  *    scratch under a processTempRoot is reclaimed at JVM exit as
  *    before, and an evicted key simply rebuilds.
  *  - **Peak logging**: [[statsString]] reports current/peak entries
  *    per family so a widening corpus matrix is visible in the round's
  *    SOAK notes instead of silent.
  */
object CorpusScope {

  val MaxPerFamily = 64

  private final class Family {
    // accessOrder=true → iteration order is least-recently-used first.
    val map = new java.util.LinkedHashMap[String, AnyRef](16, 0.75f, true)
    val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
    var peak = 0
  }

  private val families =
    new java.util.concurrent.ConcurrentHashMap[String, Family]()

  /** External size probes (caches with bespoke semantics that stay
    * outside the registry, e.g. the CC index's replay ledger) so
    * [[statsString]] still covers them. */
  private val external =
    new java.util.concurrent.ConcurrentHashMap[String, () => Int]()

  def registerExternal(name: String, size: () => Int): Unit =
    external.put(name, size)

  /** Get-or-build the artifact for (family, key). `build` runs at most
    * once per key per residency (an LRU-evicted key rebuilds). */
  def cached[T <: AnyRef](family: String, key: String)(build: => T): T = {
    val fam = families.computeIfAbsent(family, _ => new Family)
    while (true) {
      fam.map.synchronized {
        val v = fam.map.get(key)
        if (v != null) return v.asInstanceOf[T]
      }
      val lock = fam.locks.computeIfAbsent(key, _ => new Object)
      lock.synchronized {
        // Identity re-check (ADVICE r15 #2): if the lock we hold is no
        // longer the one registered for this key, a completed build
        // pruned it (and the value may ALREADY have been LRU-evicted
        // again) — building here could run concurrently with a
        // fresh-lock builder. Retry from the top instead: re-read the
        // map, then join whatever lock is current. This makes "at most
        // one build per residency" hold exactly, not just usually.
        if (fam.locks.get(key) eq lock) {
          fam.map.synchronized {
            val v = fam.map.get(key)
            if (v != null) return v.asInstanceOf[T]
          }
          val built = build
          fam.map.synchronized {
            fam.map.put(key, built)
            while (fam.map.size > MaxPerFamily) {
              val it = fam.map.entrySet().iterator()
              it.next(); it.remove()
            }
            // resident peak (post-trim): "how many corpora were live at once"
            fam.peak = math.max(fam.peak, fam.map.size)
          }
          // Prune the build lock once the value is published: without this,
          // every distinct content-stamped key retained a lock Object + key
          // string FOREVER (the registry bounded the values but not the
          // locks — a regenerating soak corpus rolls keys every run and the
          // lock map grew without bound). A racer that already holds this
          // lock object re-checks identity above and retries; a late
          // arrival creates a fresh lock, then finds the value.
          fam.locks.remove(key)
          return built
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Non-building lookup — spec hooks that ask "was this built yet?". */
  def peek[T <: AnyRef](family: String, key: String): Option[T] = {
    val fam = families.get(family)
    if (fam == null) None
    else fam.map.synchronized(Option(fam.map.get(key)).map(_.asInstanceOf[T]))
  }

  /** Drop every entry of one family (or all families with no argument) —
    * the explicit-release half of the contract for long-lived JVMs that
    * retire a corpus deliberately rather than waiting for LRU. */
  def drop(family: String): Unit = {
    val fam = families.get(family)
    if (fam != null) {
      fam.map.synchronized(fam.map.clear())
      fam.locks.clear()
    }
  }

  def dropAll(): Unit = {
    families.forEach { (_, fam) =>
      fam.map.synchronized(fam.map.clear())
      fam.locks.clear()
    }
  }

  /** `family=current/peak` per family, sorted — the SOAK receipt. */
  def statsString: String = {
    val own = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    families.forEach((name, fam) =>
      own += ((name, fam.map.synchronized(fam.map.size), fam.peak)))
    external.forEach((name, size) => own += ((name, size(), -1)))
    own.sortBy(_._1).map { case (n, cur, pk) =>
      if (pk >= 0) s"$n=$cur/$pk" else s"$n=$cur/-"
    }.mkString(" ")
  }
}
