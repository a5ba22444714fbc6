package graft.etl

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.slf4j.{Logger, LoggerFactory}

/** Timestamped per-run log-file sink (reference S7:
  * `notebooks/ETL_Entregas_Base.ipynb:9-40`): each run appends
  * `timestamp [LEVEL] message` lines to `etl_run_yyyyMMdd_HHmmss.log` under
  * the log directory AND mirrors them to the console logger — the same
  * two-handler shape as the reference's `FileHandler` + `StreamHandler`.
  *
  * Driver-side I/O only (a handful of lines per run) — nothing here touches
  * the executor hot path. The clock is injectable so specs can pin the file
  * name and line prefixes (same trick as `Pipeline.run(auditTs = ...)`).
  */
final class RunLog private (
    val path: Path,
    clock: () => LocalDateTime,
    console: Logger
) extends AutoCloseable {
  private val writer = new BufferedWriter(new FileWriter(path.toFile, true))
  private val lineFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def write(level: String, msg: String): Unit = synchronized {
    writer.write(s"${lineFmt.format(clock())} [$level] $msg")
    writer.newLine()
    // flush per line: the log must survive a driver crash mid-run — that is
    // when it is needed most
    writer.flush()
  }

  def info(msg: String): Unit = { console.info(msg); write("INFO", msg) }
  def error(msg: String): Unit = { console.error(msg); write("ERROR", msg) }
  def error(msg: String, e: Throwable): Unit = {
    console.error(msg, e)
    write("ERROR", s"$msg (${e.getClass.getSimpleName}: ${e.getMessage})")
  }

  override def close(): Unit = synchronized { writer.flush(); writer.close() }
}

object RunLog {
  private val nameFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** Open a per-run log file under `logDir` (created if absent), named from
    * the clock's run timestamp.
    *
    * Rejects scheme-prefixed non-local roots (`s3://…`, `hdfs://…`)
    * explicitly: this sink writes through java.io, and POSIX accepts the
    * colon as a filename character, so without the check `Paths.get` would
    * silently create a bogus local `s3:/bucket/...` directory instead of
    * letting the caller degrade to console-only.
    */
  def apply(
      logDir: String,
      clock: () => LocalDateTime = () => LocalDateTime.now(),
      console: Logger = LoggerFactory.getLogger(classOf[RunLog])
  ): RunLog = {
    val scheme = try new java.net.URI(logDir).getScheme catch { case _: Exception => null }
    if (scheme != null && scheme != "file")
      throw new IllegalArgumentException(
        s"RunLog writes through java.io — '$logDir' has non-local scheme '$scheme'")
    val dir = Paths.get(logDir)
    Files.createDirectories(dir)
    new RunLog(dir.resolve(s"etl_run_${nameFmt.format(clock())}.log"), clock, console)
  }
}
