package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

class CurationSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("contamination flags docs sharing enough shingles with the benchmark") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),   // benchmark member
      (1L, "alpha beta gamma delta epsilon eta"),    // shares 3 trigrams
      (2L, "alpha beta gamma nothing else here"),    // shares 1 trigram
      (3L, "totally unrelated content goes right here")
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 0)
    val hits = Curation.contamination(docs, bench, minShared = 3,
        excludeSameId = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((1L, 0L, 3L)))
    // separate-namespace benchmark (the default): an id collision with the
    // corpus must NOT suppress the match
    val extBench = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val extHits = Curation.contamination(docs, extBench, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(extHits.contains((1L, 1L)), "id-equal cross-namespace pair dropped")
  }

  test("contaminatedDocs aggregates the pair sweep to one verdict row per doc") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),   // benchmark member
      (5L, "alpha beta gamma delta epsilon zeta"),   // benchmark member (dup)
      (1L, "alpha beta gamma delta epsilon eta"),    // shares 3 with BOTH
      (2L, "alpha beta gamma nothing else here"),    // under minShared
      (3L, "totally unrelated content goes right here")
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 5 === 0)
    val out = Curation.contaminatedDocs(docs, bench, minShared = 3,
        excludeSameId = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 leaks both benchmark docs (3 shared trigrams each); docs 0 and 5
    // leak each other (identical text → 4 shared); 2 and 3 are clean
    assert(out(1L) === ((2L, 3L)))
    assert(out(0L) === ((1L, 4L)) && out(5L) === ((1L, 4L)))
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("decontaminated drops exactly the flagged docs and keeps the schema") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),   // benchmark member
      (1L, "alpha beta gamma delta epsilon eta"),    // contaminated (3 shared)
      (2L, "alpha beta gamma nothing else here"),    // 1 shared — survives
      (3L, "totally unrelated content goes right here")
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 0)
    val out = Curation.decontaminated(docs, bench, minShared = 3,
      excludeSameId = true)
    assert(out.columns.toSeq === docs.columns.toSeq,
      "removal must pass every input column through")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(0L, 2L, 3L))
  }

  test("repetitionStats measures duplicated n-gram share") {
    val docs = Seq(
      (0L, "spam spam spam spam spam"),      // every 2-gram identical: 3/4 dup
      (1L, "one two three four five"),       // no repeats
      (2L, "x")                              // shorter than any n-gram
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(0L) === ((0.75, 0.6667)))   // round(2/3, 4)
    assert(out(1L) === ((0.0, 0.0)))
    assert(out(2L) === ((0.0, 0.0)))
  }

  test("redactPii masks emails, IPs and phones in order, with counts") {
    val docs = Seq(
      (0L, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
      (1L, "server at 192.168.0.1 responded"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(0L)._1 === 1L)                          // one email
    assert(out(0L)._3 === 1L)                          // one phone
    assert(out(0L)._4 === "contact <EMAIL> or call <PHONE> now")
    assert(out(1L)._2 === 1L)                          // one IP
    assert(out(1L)._4 === "server at <IP> responded")
    assert(out(2L) === ((0L, 0L, 0L, "no pii here at all")))
  }

  test("redactPii phone pattern is digit-bounded: years, tables and prices survive") {
    // The false-positive shapes the PhoneRe bound exists for: a digit-run
    // pattern with unanchored spaces would mask all of these in training
    // text (the round-5 PhoneRe did).
    val docs = Seq(
      (0L, "years 2024 2025 2026 2027 follow"),
      (1L, "table 12 34 56 78 90 12 34 ends"),
      (2L, "price 19.99 and 29.99 only"),
      (3L, "released 2024, revised 2026-08-12"),
      (4L, "dial 555-123-4567 or 0912345678"),       // true positives still hit
      (5L, "call +84 28 3823 4999 or (028) 3823-4999 now"),
      (6L, "macOS 10.15.73 then 11.2.38 shipped"),   // dotted versions survive
      (7L, "due 12.04.2026 or 31.12.2026 latest"),   // dotted dates survive
      (8L, "dial 555.123.4567 today")                // strict NANP dotted hits
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(out(0L) === ((0L, "years 2024 2025 2026 2027 follow")))
    assert(out(1L) === ((0L, "table 12 34 56 78 90 12 34 ends")))
    assert(out(2L) === ((0L, "price 19.99 and 29.99 only")))
    assert(out(3L) === ((0L, "released 2024, revised 2026-08-12")))
    assert(out(4L) === ((2L, "dial <PHONE> or <PHONE>")))
    assert(out(5L) === ((2L, "call <PHONE> or <PHONE> now")))
    assert(out(6L) === ((0L, "macOS 10.15.73 then 11.2.38 shipped")))
    assert(out(7L) === ((0L, "due 12.04.2026 or 31.12.2026 latest")))
    assert(out(8L) === ((1L, "dial <PHONE> today")))
  }

  test("stripMarkup drops blocks with bodies, strips tags, decodes entities") {
    val pages = Seq(
      (1L, "<div><p><b>bold <i>nested</i></b> tail</p></div>"),
      (2L, "<p>keep</p><SCRIPT type=\"text/javascript\">if (a < b) { alert(1); }</SCRIPT><p>also</p>"),
      (3L, "<style>.x { display: none; }</style>visible"),
      (4L, "before<!-- <p>hidden</p> secret -->after"),
      (5L, "Fish &amp; Chips say &quot;hi&quot; &lt;b&gt;x&lt;/b&gt; caf&#39;e&nbsp;end"),
      (6L, "&amp;lt;p&amp;gt; stays literal"),
      (7L, "<script>var danger = 1; <p>unclosed survives as text"),
      (8L, "<p>\n  line one\n</p>\n<p>line&nbsp;&nbsp;two</p>")
    ).toDF("doc_id", "html")
    val out = Curation.stripMarkup(pages)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "bold nested tail")
    assert(out(2L) === "keep also", "script BODY must go with the tags")
    assert(out(3L) === "visible", "style body dropped")
    assert(out(4L) === "before after", "comments hide markup trees")
    assert(out(5L) === "Fish & Chips say \"hi\" <b>x</b> caf'e end")
    assert(out(6L) === "&lt;p&gt; stays literal",
      "double-encoded entities decode ONE level (&amp; last)")
    assert(out(7L) === "var danger = 1; unclosed survives as text",
      "unclosed script falls back to tag-strip, never eats the document")
    assert(out(8L) === "line one line two")
  }

  test("stripMarkup density gate: markup shells flagged, content pages kept") {
    val text = ("real content word " * 40).trim
    val pages = Seq(
      (1L, s"<html><body><p>$text</p></body></html>"),
      (2L, "<html><head><script>x = 1;</script></head><body class=\"nav\"><div><div><span>ok</span></div></div></body></html>")
    ).toDF("doc_id", "html")
    val out = Curation.stripMarkup(pages)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(out(1L)._1 === text)
    assert(out(1L)._2 === 1L, "a text-dense page is content")
    assert(out(2L)._1 === "ok")
    assert(out(2L)._2 === 0L, "a markup shell fails the density gate")
  }

  test("canonicalUrl collapses crawl variants and preserves the negatives") {
    def canon(urls: String*): Seq[String] = {
      val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url")
      df.select(col("doc_id"), Curation.canonicalUrl(col("url")).as("c"))
        .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    }
    // variants of ONE page all land on the same key
    assert(canon(
      "https://WWW.Example.com/A/B/",
      "http://example.com/A/B",
      "example.com/A/B///",
      "https://example.com/A/B#frag",
      "https://example.com/A/B?utm_source=x&utm_campaign=y",
      "https://example.com/A/B?fbclid=123").distinct === Seq("example.com/A/B"))
    // tracking params drop wherever they sit; real params survive in order
    assert(canon("https://a.com/p?utm_a=1&id=2&ref=x&q=3") === Seq("a.com/p?id=2&q=3"))
    assert(canon("https://a.com/p?ref=home") === Seq("a.com/p"))
    // preserved by design: ports, punycode hosts, path/query case
    assert(canon("https://example.com:8080/a/") === Seq("example.com:8080/a"))
    assert(canon("http://xn--bcher-kva.example/b") === Seq("xn--bcher-kva.example/b"))
    assert(canon("https://example.com/Path").head !== canon("https://example.com/path").head)
    // host case folds, www strips, bare-host forms normalize cleanly
    assert(canon("HTTP://WWW.EXAMPLE.COM") === Seq("example.com"))
    assert(canon("https://example.com/") === Seq("example.com"))
  }

  test("redactPii counts reconcile with the mask tokens in the output") {
    // the digit run inside the email must not be double-counted as a phone
    // once the email pass has already masked it
    val docs = Seq((0L, "mail 12345678@example.com arrived")).toDF("doc_id", "text")
    val r = Curation.redactPii(docs).collect().head
    assert(r.getLong(1) === 1L)                       // n_emails
    assert(r.getLong(2) === 0L)                       // n_ips
    assert(r.getLong(3) === 0L)                       // n_phones: masked already
    assert(r.getString(4) === "mail <EMAIL> arrived")
  }

  test("curation pipeline composition: gates, then dedup, then packing") {
    import graft.ops.{Dedup, Packing, TextStats}
    // doc 0/1: identical 45-word passing docs (dedup keeps 0); doc 2: fails
    // the gates (too short) so it must never reach packing even though it
    // would pack fine; doc 3: distinct passing doc.
    val good = "the a " + Seq.fill(43)("data").mkString(" ")
    val docs = Seq(
      (0L, good), (1L, good), (2L, "the a data"),
      (3L, "the a " + Seq.fill(43)("word").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = docs.join(
      TextStats.gopherRules(docs, Seq("the", "a"), minWords = 40)
        .filter(col("is_keep") === 1L).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val surv = kept.join(
      Dedup.exact(kept).select(col("canonical_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val packed = Packing.packSequences(surv, budget = 60L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_offset"))).toMap
    // only docs 0 and 3 survive; both 45 tokens; the exclusive cumsum runs
    // over the 2-doc SURVIVOR stream (offsets 0 and 45) — a leaked dup or
    // gate-failing doc would shift the second offset
    assert(packed.keySet === Set(0L, 3L))
    assert(packed.values.map(_._1).toSet === Set(45L))
    assert(packed.values.map(_._2).toSet === Set(0L, 45L))
  }
}
