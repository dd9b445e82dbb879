package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.plans.GraftExtensions
import graft.urlkit.UrlKit

/** Native Catalyst expressions: value parity with the library functions,
  * codegen-path execution, and SQL registration via SparkSessionExtensions. */
class ExpressionsSpec extends AnyFunSuite {

  // the shared test session carries GraftExtensions (a second builder's
  // withExtensions would be ignored by getOrCreate once a session exists)
  private lazy val spark: SparkSession = TestSpark.spark

  test("expressions match the library functions (codegen path)") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://H3.Test/p/4?b=2&a=1#frag",
      "http://example.org",
      "https://example.org?a=b&a")
    val df = urls.toDF("url")
      .selectExpr("url", "graft_canonicalize(url) AS canon", "graft_fp_hex(url) AS fp")
    val rows = df.collect()
    for (r <- rows) {
      val url = r.getString(0)
      assert(r.getString(1) === UrlKit.canonicalizeUrl(url))
      assert(r.getString(2) === UrlKit.toHex(UrlKit.fingerprint(url)))
    }
    // golden: scrapy hash #1 straight through the Catalyst expression
    assert(rows.find(_.getString(0) == "http://example.org").get.getString(2)
      === "7873d70c33756a15fed7649ba909e064bf9c5844")
    // non-foldable source → the projection must sit inside whole-stage codegen
    val gen = spark.range(100)
      .selectExpr("concat('http://h', id % 7, '.test/p/', id, '?b=2&a=1') AS url")
      .selectExpr("url", "graft_canonicalize(url) AS canon", "graft_fp_hex(url) AS fp")
    val plan = gen.queryExecution.executedPlan.toString
    // "*(1) Project [... graft_canonicalize ...]" — the '*' marks the
    // WholeStageCodegen span the expressions run inside
    assert(plan.contains("*(1) Project") && plan.contains("graft_canonicalize"),
      s"no codegen span:\n$plan")
    val g = gen.collect()
    assert(g.length === 100)
    for (r <- g) {
      assert(r.getString(1) === UrlKit.canonicalizeUrl(r.getString(0)))
      assert(r.getString(2) === UrlKit.toHex(UrlKit.fingerprint(r.getString(0))))
    }
  }

  test("SQL registration via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_canonicalize('HTTP://A.TEST/p?b=2&a=1') AS c, " +
      "graft_fp_hex('http://example.org') AS f, " +
      "graft_phash_hamming(255L, 240L) AS h").collect().head
    assert(r.getString(0) === "http://a.test/p?a=1&b=2")
    assert(r.getString(1) === "7873d70c33756a15fed7649ba909e064bf9c5844")
    assert(r.getLong(2) === 4L)
  }

  test("null propagation") {
    import spark.implicits._
    val rows = Seq(Some("http://h.test/a"), None).toDF("url")
      .selectExpr("graft_canonicalize(url) AS c")
      .collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == "http://h.test/a"))
  }

  test("graft_dot parity with the aggregate/zip_with HOF chain (r6)") {
    import spark.implicits._
    // deterministic pseudo-random vectors incl. the edge cases the HOF
    // chain defines: equal-length (the kernel), different lengths (null —
    // zip_with pads with null, the fold poisons), null element (null),
    // empty arrays (0.0)
    val vecs: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      (Seq[java.lang.Double](1.0, 2.5, -3.25), Seq[java.lang.Double](0.5, -1.0, 4.0)),
      ((1 to 64).map(i => java.lang.Double.valueOf(math.sin(i) * i)),
        (1 to 64).map(i => java.lang.Double.valueOf(math.cos(i) / (i + 1)))),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)), // length mismatch
      (Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)), // null elem
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]))
    val df = vecs.toDF("a", "b").selectExpr(
      "cast(a as array<double>) a", "cast(b as array<double>) b")
    val rows = df.selectExpr(
      "graft_dot(a, b) AS fast",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS hof")
      .collect()
    for (r <- rows) {
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        // bit-identical, not approximately equal — the similarity queries'
        // DuckDB-verified rankings depend on the exact doubles
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"FP mismatch: $r")
    }
    // codegen span: the expression must run inside whole-stage codegen
    val gen = spark.range(50)
      .selectExpr("array(cast(id as double), cast(id+1 as double)) AS a")
      .selectExpr("graft_dot(a, a) AS n")
    val plan = gen.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot") && plan.contains("*(1) Project"),
      s"no codegen span:\n$plan")
    val got = gen.as[Double].collect()
    assert(got.take(2) === Array(1.0, 1.0 + 4.0))
  }

  test("css_select / xpath_select expressions (codegen + SQL + explode)") {
    import spark.implicits._
    val html =
      "<div id='x'><a href='/a?q=1&amp;r=2'>One</a><a href='/b'>Two</a></div>"
    val sqlHtml = html.replace("'", "''") // SQL string-literal escaping
    val r = spark.sql(
      s"SELECT graft_css_select('$sqlHtml', 'a::attr(href)') AS hrefs, " +
      s"graft_xpath_select('$sqlHtml', '//div[@id=\"x\"]/a/text()') AS texts")
      .collect().head
    assert(r.getSeq[String](0) === Seq("/a?q=1&r=2", "/b"))
    assert(r.getSeq[String](1) === Seq("One", "Two"))
    // non-foldable html column through a codegen'd projection + explode
    val pages = (0 until 20).map(i =>
      s"<ul><li><a href='/p$i'>p$i</a></li><li><a href='/q$i'>q$i</a></li></ul>")
    val links = pages.toDF("body")
      .selectExpr("explode(graft_css_select(body, 'li a::attr(href)')) AS href")
      .as[String].collect()
    assert(links.length === 40)
    assert(links.take(2) === Array("/p0", "/q0"))
    // value parity with the library facade on every row
    val viaLib = pages.flatMap(p => graft.extract.Sel.cssSelectAll(p, "li a::attr(href)"))
    assert(links.toSeq === viaLib)
  }

  test("jmespath expression (codegen + SQL + explode + facade parity)") {
    import spark.implicits._
    val js = """{"user": [{"name": "A", "age": 18}, {"name": "B", "age": 32}], "total": 2}"""
    val r = spark.sql(
      s"""SELECT graft_jmespath('$js', 'user[*].name') AS names,
          graft_jmespath('$js', 'total') AS total,
          graft_jmespath('$js', 'missing') AS missing""").collect().head
    assert(r.getSeq[String](0) === Seq("A", "B"))
    assert(r.getSeq[String](1) === Seq("2")) // non-strings render json.dumps-style
    assert(r.getSeq[String](2) === Seq.empty)
    // non-foldable column through a codegen'd projection + explode
    val docs = (0 until 10).map(i => s"""{"tags": ["t$i", "u$i"], "id": $i}""")
    val tags = docs.toDF("js")
      .selectExpr("explode(graft_jmespath(js, 'tags[*]')) AS tag")
      .as[String].collect()
    assert(tags.length === 20)
    assert(tags.take(2) === Array("t0", "u0"))
    val viaLib = docs.flatMap(d => graft.extract.JmesPath.selectAll(d, "tags[*]"))
    assert(tags.toSeq === viaLib)
  }

  test("phash hamming expression on real corpus hashes") {
    import spark.implicits._
    val hashes = (0 until 8).map(i =>
      (i.toLong, graft.media.Phash.phash64(graft.corpus.Corpus.pixels(graft.corpus.Corpus.Tiny, i))))
    val df = hashes.toDF("id", "h")
    df.createOrReplaceTempView("hashes")
    val pairs = spark.sql(
      "SELECT graft_phash_hamming(x.h, y.h) AS d FROM hashes x CROSS JOIN hashes y")
      .as[Long].collect()
    assert(pairs.length === 64)
    assert(pairs.count(_ == 0L) >= 8) // diagonal
  }
}
