package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Pickle, Unpickle, Py}
import graft.operators.Py._
import graft.plans.SpiderState

/** SpiderState extension (`extensions/spiderstate.py`) + the pickle READER
  * closing the round trip: spider.state persists as CPython-byte-identical
  * protocol-4 pickle and loads back structurally equal. Goldens generated
  * with CPython 3.11 `pickle.dumps(state, 4)` (same fixture pattern as
  * PySerialSpec). */
class SpiderStateSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  // {"one": 1, "counts": [1,2,3], "name": "graft", "blob": b"\x00\x01",
  //  "pi": 3.14159, "flag": True, "nested": {"k": ("a", 2)}, "none": None,
  //  "big": 12345678901234567890}
  private val stateGolden =
    "80049582000000000000007d94288c036f6e65944b018c06636f756e7473945d94284b0" +
    "14b024b03658c046e616d65948c056772616674948c04626c6f629443020001948c0270" +
    "699447400921f9f01b866e8c04666c616794888c066e6573746564947d948c016b948c0" +
    "161944b028694738c046e6f6e65944e8c03626967948a09d20a1feb8ca954ab00752e"

  private val state = PyDict(Seq(
    PyStr("one", interned = true) -> Py.int(1),
    PyStr("counts", interned = true) -> PyList(Seq(Py.int(1), Py.int(2), Py.int(3))),
    PyStr("name", interned = true) -> PyStr("graft"),
    PyStr("blob", interned = true) -> PyBytes(Array[Byte](0, 1)),
    PyStr("pi", interned = true) -> PyFloat(3.14159),
    PyStr("flag", interned = true) -> PyBool(true),
    PyStr("nested", interned = true) -> PyDict(Seq(
      PyStr("k", interned = true) -> PyTuple(Seq(PyStr("a"), Py.int(2))))),
    PyStr("none", interned = true) -> PyNone,
    PyStr("big", interned = true) -> PyInt(BigInt("12345678901234567890"))))

  test("spider.state pickles byte-for-byte like CPython") {
    assert(hex(Pickle.dumps(state)) === stateGolden)
  }

  test("Unpickle round-trips the writer's bytes structurally") {
    val back = Unpickle.loads(Pickle.dumps(state))
    // interned flags and byte-array identity don't survive; compare shape
    def norm(p: Py): Any = p match {
      case PyStr(s, _) => ("s", s)
      case PyBytes(b) => ("b", b.toSeq)
      case PyList(v) => ("l", v.map(norm))
      case PyTuple(v) => ("t", v.map(norm))
      case PyDict(v) => ("d", v.map { case (k, x) => (norm(k), norm(x)) })
      case other => other
    }
    assert(norm(back) === norm(state))
  }

  test("Unpickle reads CPython's own bytes (incl. memo BINGET sharing)") {
    // {"x": ["same", "same"], "y": "same"} — CPython memoizes "same" and
    // emits BINGET h for the later occurrences
    val cpython =
      "8004951c000000000000007d94288c0178945d94288c0473616d65946803658c017994" +
      "6803752e"
    val bytes = cpython.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val v = Unpickle.loads(bytes)
    assert(v === PyDict(Seq(
      PyStr("x") -> PyList(Seq(PyStr("same"), PyStr("same"))),
      PyStr("y") -> PyStr("same"))))
  }

  test("Unpickle rejects self-referential containers cleanly (ADVICE r5)") {
    // CPython: l = []; l.append(l) / d = {}; d["self"] = d — legal pickles
    // via the memo, but cycles are outside the acyclic Py domain: must be
    // the documented IllegalArgumentException, not a StackOverflowError
    def fromHex(h: String) =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val cyclicList = fromHex("80049506000000000000005d946800612e")
    val cyclicDict = fromHex("8004950d000000000000007d948c0473656c66946800732e")
    intercept[IllegalArgumentException](Unpickle.loads(cyclicList))
    intercept[IllegalArgumentException](Unpickle.loads(cyclicDict))
    // DAG sharing (the legal memo reuse) must still load:
    // inner = ["same"]; outer = [inner, inner] — same builder on two paths
    val shared = Unpickle.loads(fromHex(
      "80049511000000000000005d94285d948c0473616d6594616801652e"))
    val inner = PyList(Seq(PyStr("same")))
    assert(shared === PyList(Seq(inner, inner)))
  }

  test("Unpickle rejects negative/oversized lengths cleanly (ADVICE r5)") {
    def fromHex(h: String) =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // BINUNICODE ('X') with length -1, then BINBYTES ('B') with length -1
    intercept[IllegalArgumentException](
      Unpickle.loads(fromHex("800458ffffffff2e")))
    intercept[IllegalArgumentException](
      Unpickle.loads(fromHex("800442ffffffff2e")))
    // oversized (runs past the stream) is the same clean error
    intercept[IllegalArgumentException](
      Unpickle.loads(fromHex("800458ffffff7f612e")))
  }

  test("save/load lifecycle: absent file = empty dict; persisted file round-trips") {
    val dir = TestSpark.tempDir("spiderstate")
    assert(SpiderState.load(dir) === PyDict(Nil))
    SpiderState.save(dir, state)
    // the on-disk bytes are the CPython golden
    val onDisk = java.nio.file.Files.readAllBytes(SpiderState.stateFile(dir))
    assert(hex(onDisk) === stateGolden)
    val loaded = SpiderState.load(dir)
    assert(loaded.v.size === state.v.size)
    assert(loaded.v.map(_._1).collect { case PyStr(s, _) => s } ===
      state.v.map(_._1).collect { case PyStr(s, _) => s })
  }

  test("crawl lifecycle: state persists across a resume (spider_opened sees it)") {
    import graft.corpus.{Corpus, CorpusWriter}
    import graft.operators.CrawlDriver
    val spark = TestSpark.spark
    val corpusDir = TestSpark.tempDir("corpus-sstate")
    CorpusWriter.writeAll(spark, Corpus.Tiny, corpusDir, withImages = false)
    val root = TestSpark.tempDir("snap-sstate")
    // run 1: the embedding "spider" records state at close
    val r1 = CrawlDriver.run(spark, CrawlConfig(maxEpochs = 3), corpusDir, root,
      withMedia = false, updateSpiderState = st =>
        PyDict(st.v :+ (PyStr("rounds", interned = true) -> Py.int(1))))
    assert(r1.spiderState.v.nonEmpty)
    // run 2 (resume): spider_opened loads run 1's state; the hook sees it
    var seen: Py = null
    CrawlDriver.run(spark, CrawlConfig(maxEpochs = 3), corpusDir, root,
      withMedia = false, updateSpiderState = st => { seen = st; st })
    assert(seen === PyDict(Seq(PyStr("rounds") -> Py.int(1))))
  }
}
