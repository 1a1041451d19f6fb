package graft.sources

import java.io.{FilterInputStream, InputStream}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Open/close accounting for archive input streams ([[TarSource]],
  * [[ZipSource]]) — the observable behind the task-completion-listener
  * leak fix: a downstream `limit`/take abandons the member iterator
  * mid-archive, and without the listener the FSDataInputStream stayed
  * open for the executor's lifetime. Two AtomicLong bumps per ARCHIVE
  * (not per row) are free next to the open itself, and in local-mode
  * specs `opened == closed` after a short-circuited job is the direct
  * proof the listener fired. Counters are process-global and
  * monotone; tests compare deltas. */
private[graft] object ArchiveStreamAudit {
  val opened = new AtomicLong(0L)
  val closed = new AtomicLong(0L)

  /** Wrap an archive stream so its FIRST close (EOF path or the
    * task-completion listener, whichever comes first — both may fire)
    * counts exactly once. */
  def wrap(in: InputStream): InputStream = new FilterInputStream(in) {
    ArchiveStreamAudit.opened.incrementAndGet()
    private val once = new AtomicBoolean(false)
    override def close(): Unit = {
      if (once.compareAndSet(false, true))
        ArchiveStreamAudit.closed.incrementAndGet()
      super.close()
    }
  }
}
