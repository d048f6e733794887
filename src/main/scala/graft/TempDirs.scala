package graft

import java.nio.file.{Files, Path}

/** Scratch dirs/files for query fixtures (ephemeral warehouses, pipe
  * scripts, stream staging): created under java.io.tmpdir and recursively
  * deleted on JVM exit, so repeated Bench/Verify runs don't accumulate
  * litter. */
object TempDirs {

  private def registerCleanup(p: Path): Path = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }

  def scratchDir(prefix: String): Path =
    registerCleanup(Files.createTempDirectory(prefix))

  def scratchFile(prefix: String, suffix: String): Path =
    registerCleanup(Files.createTempFile(prefix, suffix))
}
