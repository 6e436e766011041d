package graft.sources

/** tqdm-parity progress surface (reference `tqdm.py:5-34`): a callback
  * interface whose default is a no-op — mirroring the reference's design,
  * where `tqdm` silently degrades to a dummy object when the real library
  * is unavailable. Progress here is DRIVER-side only, reported by the two
  * driver-side loops the reference instruments: the download cache's byte
  * loop (`cache.py:223-230`) and batched document iteration
  * (`dataset_fsreader.py:99`, desc="Loading ..."). Distributed work
  * reports through Spark's own listener bus / UI instead (SURVEY F5) —
  * a per-task console bar would serialize executor progress through the
  * driver, which is exactly the pattern a distributed engine must not
  * adopt.
  */
trait Progress {
  /** Called after each unit of work: `done` of `total` (both in the
    * loop's natural unit — bytes for downloads, rows for iteration).
    * `total` is -1 when unknown.
    */
  def update(desc: String, done: Long, total: Long): Unit
}

object Progress {

  /** The default: report nothing (the reference's fallback dummy). */
  object Noop extends Progress {
    def update(desc: String, done: Long, total: Long): Unit = ()
  }

  /** Collects every update in order — the spec instrument, and a base
    * for console renderers.
    */
  final class Recording extends Progress {
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def update(desc: String, done: Long, total: Long): Unit =
      events.synchronized { events += ((desc, done, total)) }
  }

  /** Simple console renderer: one line per ~`everyPct`% step. */
  final class Console(everyPct: Int = 10) extends Progress {
    private var lastPct = -1
    def update(desc: String, done: Long, total: Long): Unit = synchronized {
      if (total > 0) {
        val pct = (done * 100 / total).toInt
        if (pct >= lastPct + everyPct || pct == 100) {
          lastPct = pct
          // scalastyle:off println
          println(s"[progress] $desc: $pct% ($done/$total)")
          // scalastyle:on println
        }
      }
    }
  }
}
