package graft.sources

/** Session-lifetime FIXTURE pool for the driver gates (VERDICT r15
  * "gate-wall structural relief"): several gates exercise lifecycles
  * over the SAME expensive base artifact — d10 and d11 both start
  * from the dedup index over docs < 300, t24 and t29 both start from
  * the full-corpus text index — and each used to rebuild it from
  * scratch inside its own temp dir. Here `build` runs ONCE per key
  * into a pooled directory family, and every caller takes a fresh
  * COPY, so gates that mutate (append, delete, compact) keep their
  * full lifecycle assertions over bit-identical state while the
  * sweep pays each build exactly once.
  *
  * Copying a table family is sound because the snapshot protocol
  * stores only table-relative file paths and version-number pins —
  * a copied family is a valid family wherever it lands. A family is
  * the base dir plus every `<base>.<suffix>` sibling (`.sigs`,
  * `.stats`, `.centroids`, `.codebooks`, `.tombs`, …), the suffix
  * convention every persisted index pair here follows. Builds are
  * deterministic (seeded sketches/quantizers over fixed fixtures),
  * so a pooled copy produces byte-identical gate answers to a
  * per-gate rebuild — CORRECTNESS hashes cannot move. */
object FixturePool {

  // pooled dir plus its reclaim switch: the shutdown hook consults
  // the flag AT EXIT, so a later caller that needs the bytes to
  // outlive the JVM (an export gate whose file lists feed the
  // driver's DuckDB pass) can UPGRADE an already-pooled entry to
  // keep-at-exit — first-caller-wins lifetimes were a silent bug
  // when two gates shared a key but disagreed on the flag
  private final case class Entry(dir: String,
      reclaim: java.util.concurrent.atomic.AtomicBoolean)

  private val pool =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** A fresh private copy of the pooled artifact at `destBase`
    * (plus siblings beside it). `build` receives a directory path
    * and must create the family there; it runs at most once per
    * `key` per JVM. */
  def cloneTo(key: String, destBase: String,
      reclaimAtExit: Boolean = false)(
      build: String => Unit): Unit =
    copyFamily(readOnly(key, reclaimAtExit)(build), destBase)

  /** The pooled ORIGINAL for read-only use (probe-only gates — the
    * caller must not mutate it; mutating gates take [[cloneTo]]).
    * `reclaimAtExit = true` deletes the pooled family at JVM
    * shutdown — right for artifacts only this process probes; LEAVE
    * IT FALSE when the pooled bytes must outlive the JVM (the export
    * gates' file lists are read by the driver's DuckDB pass after
    * exit). Callers sharing a key may disagree on the flag: the
    * entry's lifetime resolves to the LONGER one — a later
    * `reclaimAtExit = false` call flips an already-registered hook
    * off (deleting bytes another caller declared must survive would
    * be the silent bug; keeping them is merely unreclaimed temp
    * space). */
  def readOnly(key: String, reclaimAtExit: Boolean = false)(
      build: String => Unit): String = {
    val e = pool.computeIfAbsent(key, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-fixture-pool")
      val flag = new java.util.concurrent.atomic
        .AtomicBoolean(reclaimAtExit)
      // the hook registers unconditionally and consults the flag at
      // exit, so conflict resolution is a flag write, not an
      // (impossible) hook deregistration race
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        if (flag.get)
          org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)))
      val dir = root.resolve("base").toString
      build(dir)
      Entry(dir, flag)
    })
    if (!reclaimAtExit) e.reclaim.set(false)
    e.dir
  }

  /** File-copy a RESOLVED family into a builder's directory — the
    * composition seam for pools that extend other pools. Resolve the
    * source with [[readOnly]] BEFORE entering the dependent builder
    * (computeIfAbsent must not re-enter the map), then copy here:
    * the dependent artifact pays a directory copy instead of
    * re-running the base's Spark build. */
  def copyInto(srcBase: String, destBase: String): Unit =
    copyFamily(srcBase, destBase)

  private def copyFamily(srcBase: String, destBase: String): Unit = {
    val srcFile = new java.io.File(srcBase)
    val name = srcFile.getName
    val entries = Option(srcFile.getParentFile.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(e => e.getName == name ||
        e.getName.startsWith(name + "."))
    require(entries.exists(_.getName == name),
      s"pooled fixture at $srcBase vanished")
    val destFile = new java.io.File(destBase)
    entries.foreach { e =>
      val suffix = e.getName.stripPrefix(name)
      org.apache.commons.io.FileUtils.copyDirectory(e,
        new java.io.File(destFile.getParentFile,
          destFile.getName + suffix))
    }
  }
}
