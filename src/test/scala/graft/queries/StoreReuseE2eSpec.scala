package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * Cross-PROCESS write-once / read-many proof: a writer JVM builds and
 * publishes the store entries, then a brand-new reader JVM consumes them
 * with ZERO builds. MaterializedSpec's same-JVM `clearSessionCache()` only
 * simulates a restart; this spec performs one — separate processes, so no
 * in-memory state (handle caches, broadcast vars, Spark session) can leak
 * from writer to reader.
 */
class StoreReuseE2eSpec extends AnyFunSuite {

  /** The JDK17 module opens Spark needs (same list as tools/run.sh). */
  private def addOpens: Seq[String] = {
    val base = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic")
    val sun = Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar")
    (base ++ sun).map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
  }

  /** Run [[StoreReuseMain]] in a fresh JVM; returns its last stdout
    * line (`builds=<n> minhash=<rows> ivf=<rows> pq=<rows> opq=<rows>
    * hashes=<rows> bpe=<rows> lm=<rows>`). */
  private def runProcess(storeRoot: String, sfDir: String): String = {
    val javaBin = java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin, "-Xmx4g") ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.queries.StoreReuseMain", storeRoot, sfDir)).asJava
    val p = new ProcessBuilder(cmd).redirectErrorStream(false).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"StoreReuseMain exited $rc\nstdout:\n$out\nstderr tail:\n${err.takeRight(2000)}")
    out.linesIterator.toSeq.reverseIterator
      .find(_.startsWith("builds=")).getOrElse(fail(s"no builds= line in:\n$out"))
  }

  test("a fresh reader PROCESS serves every store artifact from storage with zero builds") {
    val root = Files.createTempDirectory("graft-store-e2e").toString
    val Line = """builds=(\d+) minhash=(\d+) ivf=(\d+) pq=(\d+) opq=(\d+) hashes=(\d+) bpe=(\d+) lm=(\d+) clf=(\d+) dsir=(\d+) uni=(\d+) wfp=(\d+) kn=(\d+) ham=(\d+)""".r
    val w = runProcess(root, graft.TestSpark.sf) match {
      case Line(b, m, i, p, o, h, t, l, c, ds, u, wf, kn, hm) =>
        (b.toInt, m.toLong, i.toLong, p.toLong, o.toLong, h.toLong, t.toLong,
          l.toLong, c.toLong, ds.toLong, u.toLong, wf.toLong, kn.toLong,
          hm.toLong)
    }
    assert(w._1 > 0, "writer must build on an empty store")

    val r = runProcess(root, graft.TestSpark.sf) match {
      case Line(b, m, i, p, o, h, t, l, c, ds, u, wf, kn, hm) =>
        (b.toInt, m.toLong, i.toLong, p.toLong, o.toLong, h.toLong, t.toLong,
          l.toLong, c.toLong, ds.toLong, u.toLong, wf.toLong, kn.toLong,
          hm.toLong)
    }
    assert(r._1 == 0, "a restarted process must reuse the published store, not rebuild")
    assert(r.productIterator.toSeq.drop(1) == w.productIterator.toSeq.drop(1),
      "reader must see the writer's tables")
  }
}
