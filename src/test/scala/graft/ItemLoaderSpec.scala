package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{ItemLoader, Sel}
import graft.extract.ItemLoader.{Compose, Identity, Join, LoaderSpec, MapCompose, Proc, TakeFirst}

/** Golden battery for [[graft.extract.ItemLoader]], ported from the
  * reference's public `tests/test_loader.py` (scrapy.loader.ItemLoader over
  * the `itemloaders` package). Each test mirrors one reference test;
  * expected values are the reference's own assertions. */
class ItemLoaderSpec extends AnyFunSuite {

  /** CPython `str.title()` for the battery's `lambda v: v.title()`. */
  private def pyTitle(s: String): String = {
    val sb = new StringBuilder
    var prevAlpha = false
    s.foreach { c =>
      val isAlpha = c.isLetter
      sb += (if (isAlpha && !prevAlpha) c.toUpper
             else if (isAlpha) c.toLower else c)
      prevAlpha = isAlpha
    }
    sb.toString
  }

  private val summaryFields = Set("name", "url", "summary")

  /** `ProcessorItemLoader`: SummaryItem fields + `name_in = MapCompose(title)`. */
  private def processorSpec = LoaderSpec(
    declaredFields = Some(summaryFields),
    fieldIn = Map("name" -> MapCompose(v => pyTitle(v.toString))))

  // --------------------------------------------------- TestBasicItemLoader

  test("add_value on unknown field raises") {
    val il = ItemLoader(processorSpec)
    intercept[NoSuchElementException] {
      il.addValue("wrong_field", Seq("lala", "lolo"))
    }
  }

  test("load_item using default loader keeps initial item and appends") {
    val il = ItemLoader(LoaderSpec(declaredFields = Some(summaryFields)),
      item = Seq("summary" -> "lala"))
    il.addValue("name", "marta")
    val item = il.loadItem()
    assert(item eq il.item)
    assert(item("summary") == Seq("lala"))
    assert(item("name") == Seq("marta"))
  }

  test("load_item using custom loader applies input processor") {
    val il = ItemLoader(processorSpec)
    il.addValue("name", "marta")
    assert(il.loadItem()("name") == Seq("Marta"))
  }

  // ------------------------------------------- InitializationTestMixin (dict)

  test("init: keep single value") {
    val il = ItemLoader(item = Seq("name" -> "foo"))
    assert(il.loadItem().toMap == Map("name" -> Seq("foo")))
  }

  test("init: keep list") {
    val il = ItemLoader(item = Seq("name" -> Seq("foo", "bar")))
    assert(il.loadItem().toMap == Map("name" -> Seq("foo", "bar")))
  }

  test("init: add single to single appends") {
    val il = ItemLoader(item = Seq("name" -> "foo"))
    il.addValue("name", "bar")
    assert(il.loadItem().toMap == Map("name" -> Seq("foo", "bar")))
  }

  test("init: add list to single appends") {
    val il = ItemLoader(item = Seq("name" -> "foo"))
    il.addValue("name", Seq("item", "loader"))
    assert(il.loadItem().toMap == Map("name" -> Seq("foo", "item", "loader")))
  }

  test("init: add single to list appends") {
    val il = ItemLoader(item = Seq("name" -> Seq("foo", "bar")))
    il.addValue("name", "qwerty")
    assert(il.loadItem().toMap == Map("name" -> Seq("foo", "bar", "qwerty")))
  }

  test("init: add list to list appends") {
    val il = ItemLoader(item = Seq("name" -> Seq("foo", "bar")))
    il.addValue("name", Seq("item", "loader"))
    assert(il.loadItem().toMap ==
      Map("name" -> Seq("foo", "bar", "item", "loader")))
  }

  test("init: get_output_value does not consume") {
    val il = ItemLoader(item = Seq("name" -> "foo"))
    assert(il.getOutputValue("name") == Seq("foo"))
    assert(il.loadItem().toMap == Map("name" -> Seq("foo")))
  }

  test("init: initial values land in _values") {
    assert(ItemLoader(item = Seq("name" -> "foo")).values("name") == Seq("foo"))
    assert(ItemLoader(item = Seq("name" -> Seq("foo", "bar")))
      .values("name") == Seq("foo", "bar"))
  }

  // --------------------------------------------- TestNoInputReprocessing

  /** `title_in = MapCompose(str.upper)`, `title_out = TakeFirst()`. */
  private def noReprocSpec = LoaderSpec(
    declaredFields = Some(Set("title")),
    fieldIn = Map("title" -> MapCompose(v => v.toString.toUpperCase)),
    fieldOut = Map("title" -> TakeFirst))

  test("no reprocessing of initial values (single)") {
    val il = ItemLoader(noReprocSpec, item = Seq("title" -> "foo"))
    val loaded = il.loadItem()
    assert(loaded.toMap == Map("title" -> "foo"))
    assert(ItemLoader(noReprocSpec, item = loaded.toSeq)
      .loadItem().toMap == Map("title" -> "foo"))
  }

  test("no reprocessing of initial values (list)") {
    val il = ItemLoader(noReprocSpec, item = Seq("title" -> Seq("foo", "bar")))
    val loaded = il.loadItem()
    assert(loaded.toMap == Map("title" -> "foo"))
    assert(ItemLoader(noReprocSpec, item = loaded.toSeq)
      .loadItem().toMap == Map("title" -> "foo"))
  }

  test("no reprocessing: added values processed once (single)") {
    val il = ItemLoader(noReprocSpec)
    il.addValue("title", "FOO")
    val loaded = il.loadItem()
    assert(loaded.toMap == Map("title" -> "FOO"))
    assert(ItemLoader(noReprocSpec, item = loaded.toSeq)
      .loadItem().toMap == Map("title" -> "FOO"))
  }

  test("no reprocessing: added values processed once (list)") {
    val il = ItemLoader(noReprocSpec)
    il.addValue("title", Seq("foo", "bar"))
    assert(il.loadItem().toMap == Map("title" -> "FOO"))
  }

  // ------------------------------------------------ TestOutputProcessorItem

  test("falsy-but-not-None output is assigned (temp=0.3 default)") {
    val spec = LoaderSpec(
      defaultIn = Identity,
      defaultOut = Compose(v => TakeFirst(v, Map.empty)))
    val il = ItemLoader(spec, item = Seq("temp" -> 0.3))
    assert(il.loadItem().toMap == Map("temp" -> 0.3))
  }

  // ------------------------------------------------- TestSelectortemLoader

  val body: String =
    """
    <html>
    <body>
    <div id="id">marta</div>
    <p>paragraph</p>
    <a href="http://www.scrapy.org">homepage</a>
    <img src="/images/logo.png" width="244" height="65" alt="Scrapy">
    </body>
    </html>
    """

  test("loader without selector raises on query methods") {
    val l = ItemLoader(processorSpec)
    assert(l.selector.isEmpty)
    intercept[IllegalStateException](l.addXPath("url", "//a/@href"))
    intercept[IllegalStateException](l.replaceXPath("url", "//a/@href"))
    intercept[IllegalStateException](l.getXPath("//a/@href"))
    intercept[IllegalStateException](l.addCss("name", "#name::text"))
    intercept[IllegalStateException](l.replaceCss("name", "#name::text"))
    intercept[IllegalStateException](l.getCss("#name::text"))
  }

  test("init with selector: xpath") {
    val sel = Sel("<html><body><div>marta</div></body></html>")
    val l = ItemLoader(processorSpec, selector = Some(sel))
    l.addXPath("name", "//div/text()")
    assert(l.getOutputValue("name") == Seq("Marta"))
  }

  test("init with selector: css") {
    val sel = Sel("<html><body><div>marta</div></body></html>")
    val l = ItemLoader(processorSpec, selector = Some(sel))
    l.addCss("name", "div::text")
    assert(l.getOutputValue("name") == Seq("Marta"))
  }

  test("init with response: accumulate css + xpath across fields") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addCss("name", "div::text")
    assert(l.getOutputValue("name") == Seq("Marta"))
    l.addCss("url", "a::attr(href)")
    assert(l.getOutputValue("url") == Seq("http://www.scrapy.org"))
    l.addXPath("name", "//div/text()")
    assert(l.getOutputValue("name") == Seq("Marta", "Marta"))
    l.addXPath("url", "//img/@src")
    assert(l.getOutputValue("url") ==
      Seq("http://www.scrapy.org", "/images/logo.png"))
  }

  test("add_xpath with re") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addXPath("name", "//div/text()", re = "ma")
    assert(l.getOutputValue("name") == Seq("Ma"))
  }

  test("replace_xpath") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addXPath("name", "//div/text()")
    assert(l.getOutputValue("name") == Seq("Marta"))
    l.replaceXPath("name", "//p/text()")
    assert(l.getOutputValue("name") == Seq("Paragraph"))
    l.replaceXPathAll("name", Seq("//p/text()", "//div/text()"))
    assert(l.getOutputValue("name") == Seq("Paragraph", "Marta"))
  }

  test("get_xpath with processors and re") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    assert(l.getXPath("//p/text()") == Seq("paragraph"))
    assert(l.getXPath("//p/text()", Seq(TakeFirst)) == "paragraph")
    assert(l.getXPath("//p/text()", Seq(TakeFirst), re = "pa") == "pa")
    assert(l.getXPathAll(Seq("//p/text()", "//div/text()")) ==
      Seq("paragraph", "marta"))
  }

  test("field=None xpath routes through a map-valued processor") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    val toName: Proc = (v, _) => Map("name" -> v)
    l.addXPathMulti("//div/text()", Seq(TakeFirst, toName))
    assert(l.getOutputValue("name") == Seq("Marta"))
    l.replaceXPathMulti("//p/text()", Seq(TakeFirst, toName))
    assert(l.getOutputValue("name") == Seq("Paragraph"))
  }

  test("replace_xpath with re") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addXPath("name", "//div/text()")
    assert(l.getOutputValue("name") == Seq("Marta"))
    l.replaceXPath("name", "//div/text()", re = "ma")
    assert(l.getOutputValue("name") == Seq("Ma"))
  }

  test("add_css with re") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addCss("name", "div::text", re = "ma")
    assert(l.getOutputValue("name") == Seq("Ma"))
    l.addCss("url", "a::attr(href)", re = "http://(.+)")
    assert(l.getOutputValue("url") == Seq("www.scrapy.org"))
  }

  test("replace_css") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addCss("name", "div::text")
    assert(l.getOutputValue("name") == Seq("Marta"))
    l.replaceCss("name", "p::text")
    assert(l.getOutputValue("name") == Seq("Paragraph"))
    l.replaceCssAll("name", Seq("p::text", "div::text"))
    assert(l.getOutputValue("name") == Seq("Paragraph", "Marta"))
    l.addCss("url", "a::attr(href)", re = "http://(.+)")
    assert(l.getOutputValue("url") == Seq("www.scrapy.org"))
    l.replaceCss("url", "img::attr(src)")
    assert(l.getOutputValue("url") == Seq("/images/logo.png"))
  }

  test("get_css with processors and re") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    assert(l.getCss("p::text") == Seq("paragraph"))
    assert(l.getCss("p::text", Seq(TakeFirst)) == "paragraph")
    assert(l.getCss("p::text", Seq(TakeFirst), re = "pa") == "pa")
    assert(l.getCssAll(Seq("p::text", "div::text")) == Seq("paragraph", "marta"))
    assert(l.getCssAll(Seq("a::attr(href)", "img::attr(src)")) ==
      Seq("http://www.scrapy.org", "/images/logo.png"))
  }

  test("field=None css routes through a map-valued processor") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    val toName: Proc = (v, _) => Map("name" -> v)
    val toUrl: Proc = (v, _) => Map("url" -> v)
    l.addCssMulti("div::text", Seq(TakeFirst, toName))
    assert(l.getOutputValue("name") == Seq("Marta"))
    l.replaceCssMulti("p::text", Seq(TakeFirst, toName))
    assert(l.getOutputValue("name") == Seq("Paragraph"))
    l.addCssMulti("a::attr(href)", Seq(TakeFirst, toUrl))
    assert(l.getOutputValue("url") == Seq("http://www.scrapy.org"))
    l.replaceCssMulti("img::attr(src)", Seq(TakeFirst, toUrl))
    assert(l.getOutputValue("url") == Seq("/images/logo.png"))
  }

  test("replace_css with re") {
    val l = ItemLoader.fromHtml(body, processorSpec)
    l.addCss("url", "a::attr(href)")
    assert(l.getOutputValue("url") == Seq("http://www.scrapy.org"))
    l.replaceCss("url", "a::attr(href)", re = """http://www\.(.+)""")
    assert(l.getOutputValue("url") == Seq("scrapy.org"))
  }

  // ------------------------------------------------- TestSubselectorLoader

  val nestedBody: String =
    """
    <html>
    <body>
    <header>
      <div id="id">marta</div>
      <p>paragraph</p>
    </header>
    <footer class="footer">
      <a href="http://www.scrapy.org">homepage</a>
      <img src="/images/logo.png" width="244" height="65" alt="Scrapy">
    </footer>
    </body>
    </html>
    """

  private def nestedSpec = LoaderSpec(declaredFields =
    Some(Set("name", "name_div", "name_value", "url", "image")))

  test("nested_xpath") {
    val l = ItemLoader.fromHtml(nestedBody, nestedSpec)
    val nl = l.nestedXPath("//header")
    nl.addXPath("name", "div/text()")
    nl.addCss("name_div", "#id")
    nl.addValue("name_value",
      nl.selector.get.xpath("""div[@id = "id"]/text()""").getall)

    assert(l.getOutputValue("name") == Seq("marta"))
    assert(l.getOutputValue("name_div") == Seq("""<div id="id">marta</div>"""))
    assert(l.getOutputValue("name_value") == Seq("marta"))

    assert(l.getOutputValue("name") == nl.getOutputValue("name"))
    assert(l.getOutputValue("name_div") == nl.getOutputValue("name_div"))
    assert(l.getOutputValue("name_value") == nl.getOutputValue("name_value"))
  }

  test("nested_css") {
    val l = ItemLoader.fromHtml(nestedBody, nestedSpec)
    val nl = l.nestedCss("header")
    nl.addXPath("name", "div/text()")
    nl.addCss("name_div", "#id")
    nl.addValue("name_value",
      nl.selector.get.xpath("""div[@id = "id"]/text()""").getall)

    assert(l.getOutputValue("name") == Seq("marta"))
    assert(l.getOutputValue("name_div") == Seq("""<div id="id">marta</div>"""))
    assert(l.getOutputValue("name_value") == Seq("marta"))
  }

  test("nested replace") {
    val l = ItemLoader.fromHtml(nestedBody, nestedSpec)
    val nl1 = l.nestedXPath("//footer")
    val nl2 = nl1.nestedXPath("a")

    l.addXPath("url", "//footer/a/@href")
    assert(l.getOutputValue("url") == Seq("http://www.scrapy.org"))
    nl1.replaceXPath("url", "img/@src")
    assert(l.getOutputValue("url") == Seq("/images/logo.png"))
    nl2.replaceXPath("url", "@href")
    assert(l.getOutputValue("url") == Seq("http://www.scrapy.org"))
  }

  test("nested ordering: values append in call order across loaders") {
    val l = ItemLoader.fromHtml(nestedBody, nestedSpec)
    val nl1 = l.nestedXPath("//footer")
    val nl2 = nl1.nestedXPath("a")

    nl1.addXPath("url", "img/@src")
    l.addXPath("url", "//footer/a/@href")
    nl2.addXPath("url", "text()")
    l.addXPath("url", "//footer/a/@href")

    assert(l.getOutputValue("url") == Seq(
      "/images/logo.png",
      "http://www.scrapy.org",
      "homepage",
      "http://www.scrapy.org"))
  }

  test("nested load_item shares one item object") {
    val l = ItemLoader.fromHtml(nestedBody, nestedSpec)
    val nl1 = l.nestedXPath("//footer")
    val nl2 = nl1.nestedXPath("img")

    l.addXPath("name", "//header/div/text()")
    nl1.addXPath("url", "a/@href")
    nl2.addXPath("image", "@src")

    val item = l.loadItem()
    assert(item eq l.item)
    assert(item eq nl1.item)
    assert(item eq nl2.item)
    assert(item("name") == Seq("marta"))
    assert(item("url") == Seq("http://www.scrapy.org"))
    assert(item("image") == Seq("/images/logo.png"))
  }

  // --------------------------------------------------- TestFunctionProcessor

  test("plain functions as field processors (Field metadata form)") {
    val spec = LoaderSpec(
      declaredFields = Some(Set("foo")),
      fieldIn = Map("foo" -> Proc.fn(_.map(_.toString.trim))),
      fieldOut = Map("foo" -> Proc.fn(_.map(_.toString.toUpperCase))))
    val lo = ItemLoader(spec)
    lo.addValue("foo", "  bar  ")
    lo.addValue("foo", Seq("  asdf  ", "  qwerty  "))
    assert(lo.loadItem().toMap == Map("foo" -> Seq("BAR", "ASDF", "QWERTY")))
  }

  // ------------------------------------------- processor unit pins (extras)

  test("default input processor applies to every field (DefaultedItemLoader)") {
    val spec = LoaderSpec(
      declaredFields = Some(summaryFields),
      defaultIn = MapCompose(v => v.toString.dropRight(1)))
    val il = ItemLoader(spec)
    il.addValue("name", "marta")
    assert(il.getOutputValue("name") == Seq("mart"))
  }

  test("MapCompose drops None results and flattens lists") {
    val mc = MapCompose(
      v => if (v.toString.startsWith("x")) null else v,
      v => Seq(v, v.toString + "!"))
    assert(mc(Seq("a", "xb", "c"), Map.empty) ==
      Seq("a", "a!", "c", "c!"))
  }

  test("Compose stops on None") {
    val c = Compose(_ => null, _ => throw new RuntimeException("not reached"))
    assert(c(Seq("a"), Map.empty) == null)
  }

  test("TakeFirst skips None and empty string") {
    assert(TakeFirst(Seq(null, "", "x", "y"), Map.empty) == "x")
    assert(TakeFirst(Seq(null, ""), Map.empty) == null)
  }

  test("Join") {
    assert(Join()(Seq("a", "b", "c"), Map.empty) == "a b c")
    assert(Join(", ")(Seq("a", "b"), Map.empty) == "a, b")
  }

  test("empty processed input is not appended (CPython truthiness)") {
    val il = ItemLoader(LoaderSpec(
      fieldIn = Map("name" -> MapCompose(_ => null))))
    il.addValue("name", "whatever")
    assert(il.values("name") == Nil)
    assert(il.loadItem().toMap == Map.empty)
  }
}
