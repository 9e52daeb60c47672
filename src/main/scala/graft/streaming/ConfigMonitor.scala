package graft.streaming

import graft.model.{MappingConfig, MappingConfigLoader}

import java.io.File
import java.util.concurrent.atomic.AtomicReference
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.util.control.NonFatal

/**
 * X5 — config hot-reload (reference `monitor/PhoenixConfigMonitor.java:35-51`
 * polls the conf dir every 3000 ms; `:61-163` handles create/change/delete
 * and rejects `outerAdapterKey` changes). Driver-side: a scheduled poller
 * diffs file mtimes and swaps the live routing table atomically — the
 * streaming job reads the `AtomicReference` at the top of every micro-batch
 * ([[CanalStream.start]]), so a swap takes effect on the next batch with no
 * restart.
 */
final class ConfigMonitor(confDir: File,
                          val configs: AtomicReference[Seq[MappingConfig]],
                          pollMs: Long = 3000) extends AutoCloseable {

  private var mtimes = Map.empty[String, Long]
  private var lastGood = Map.empty[String, MappingConfig] // per-file last parseable config
  private var scheduler: ScheduledExecutorService = _

  /** One poll cycle (exposed for tests — production uses [[start]]). */
  def poll(): Unit = {
    val files = Option(confDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".yml"))
    val now = files.map(f => f.getName -> f.lastModified()).toMap
    if (now != mtimes) {
      val loaded = files.toSeq.sortBy(_.getName).flatMap { f =>
        try {
          val parsed = MappingConfigLoader.parse(
            new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
          // reject outerAdapterKey changes for an existing destination/table
          // (reference PhoenixConfigMonitor.java:95-101)
          val prior = configs.get().find(_.routeKey(includeGroup = true) ==
            parsed.routeKey(includeGroup = true))
          val chosen = prior match {
            case Some(p) if p.outerAdapterKey != null &&
              p.outerAdapterKey != parsed.outerAdapterKey =>
              p // keep the old config; change rejected
            case _ => parsed
          }
          lastGood += f.getName -> chosen
          Some(chosen)
        } catch {
          // bad yml: retain the previously loaded config for this file (the
          // reference keeps the prior config on reload failure) — a transient
          // bad edit must not silently stop routing for that table
          case NonFatal(_) => lastGood.get(f.getName)
        }
      }
      lastGood = lastGood.filter { case (name, _) => now.contains(name) } // drop deleted files
      configs.set(loaded)
      mtimes = now
    }
  }

  def start(): Unit = {
    scheduler = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-config-monitor"); t.setDaemon(true); t
    })
    scheduler.scheduleWithFixedDelay(() => poll(), 0, pollMs, TimeUnit.MILLISECONDS)
  }

  override def close(): Unit = if (scheduler != null) scheduler.shutdownNow()
}

/**
 * X4 — change-notification webhook (reference
 * `PhoenixEtlService.java:174-215`): POST `{"database":…,"table":…}` to the
 * config's `notifyUrl` after any schema change, asynchronously, best-effort.
 */
object ChangeNotifier {
  def notifyAsync(config: MappingConfig,
                  send: (String, String) => Unit = httpPost): Unit = {
    if (config.notifyUrl != null) {
      val body =
        s"""{"database":"${config.dbMapping.database}","table":"${config.dbMapping.table}"}"""
      val t = new Thread(() =>
        try send(config.notifyUrl, body)
        catch { case NonFatal(_) => () }, "graft-notify") // best-effort (reference logs+ignores)
      t.setDaemon(true)
      t.start()
    }
  }

  private def httpPost(url: String, body: String): Unit = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setDoOutput(true)
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    conn.getResponseCode
    conn.disconnect()
  }
}
