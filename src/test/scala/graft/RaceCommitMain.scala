package graft

/**
 * Cross-process commit-protocol race driver (CatalogSpec's two-JVM test): a
 * tiny main — NO SparkSession, the commit protocol is pure filesystem — that
 * performs `n` metadata commits on a shared graft table via
 * `GraftManifest.publishNext`, each adding one unique `race:<id>:<i>` txn
 * marker. The parent test launches two of these as REAL separate JVMs (their
 * own `currentSwapLock`s, their own FS handles) while committing from its own
 * thread, then audits the manifest chain: the in-JVM CatalogSpec races share
 * a process-wide lock that the cross-process CAS path never sees, which is
 * exactly the residue this main exists to exercise.
 *
 * publishNext gives up after 20 straight CAS losses (the correct behavior for
 * a REAL writer under pathological contention); this driver retries that
 * exhaustion with a bounded backoff because the test wants total-commit
 * accounting, not liveness-under-starvation.
 */
object RaceCommitMain {
  def main(args: Array[String]): Unit = {
    val Array(dirStr, id, nStr) = args
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new org.apache.hadoop.fs.Path(dirStr)
    val n = nStr.toInt
    var i = 0
    var exhaustions = 0
    while (i < n) {
      try {
        graft.sources.GraftManifest.publishNext(dir, conf)(cur =>
          cur.copy(gen = cur.gen + 1, txns = cur.txns + s"race:$id:$i"))
        i += 1
      } catch {
        case e: IllegalStateException if e.getMessage.contains("CAS races") =>
          exhaustions += 1
          if (exhaustions > 50) throw e
          Thread.sleep(10L * exhaustions)
      }
    }
  }
}
