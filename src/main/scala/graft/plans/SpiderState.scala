package graft.plans

import java.nio.file.{Files, Path, Paths}
import graft.operators.{Pickle, Unpickle}
import graft.operators.Py

/** SpiderState extension (`scrapy/extensions/spiderstate.py`): the
  * `spider.state` dict persists across runs of a JOBDIR'd crawl —
  * `pickle.dump(spider.state, f, protocol=4)` at spider_closed,
  * `pickle.load(f)` at spider_opened (empty dict when absent). The batch
  * analogue keys off the snapshot root (the JOBDIR): [[graft.operators.
  * CrawlDriver.run]] loads the state when the crawl opens, exposes it on
  * the result, and re-saves it (merged with caller-supplied entries) when
  * the run loop exits — so a killed-and-resumed crawl sees exactly the
  * state the previous run persisted, byte-compatible with CPython's
  * pickle on the supported value domain (None/bool/int/float/str/bytes/
  * list/tuple/dict; class instances like datetime are outside the
  * exporter scope, documented on [[graft.operators.Py]]).
  */
object SpiderState {

  /** `SpiderState.statefn` (`spiderstate.py:50-53`). */
  def stateFile(jobdir: String): Path = Paths.get(jobdir, "spider.state")

  /** spider_closed: protocol-4 pickle bytes, byte-for-byte CPython. */
  def save(jobdir: String, state: Py.PyDict): Unit = {
    Files.createDirectories(Paths.get(jobdir))
    Files.write(stateFile(jobdir), Pickle.dumps(state))
  }

  /** spider_opened: the persisted dict, or the empty dict when absent
    * (`spiderstate.py:41-46`). */
  def load(jobdir: String): Py.PyDict = {
    val f = stateFile(jobdir)
    if (!Files.exists(f)) Py.PyDict(Nil)
    else Unpickle.loads(Files.readAllBytes(f)) match {
      case d: Py.PyDict => d
      case other => throw new IllegalArgumentException(
        s"spider.state does not hold a dict: $other")
    }
  }
}
