package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM scratch space for queries that exercise DISK contracts
  * (q227 datasheet partials, q228 KMV shards): every run used to leak a
  * fresh `Files.createTempDirectory` per invocation — verify + bench +
  * the ScaleSpec universal plan sweep each triggered the writes just to
  * look at a plan. All scratch dirs now live under ONE per-JVM root
  * that a shutdown hook deletes recursively; the served DataFrames stay
  * readable for the whole session (they are lazy over the files) and
  * nothing outlives the JVM.
  */
object Scratch {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      if (Files.exists(r))
        Files.walk(r).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))))
    r
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
