package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page (BASELINE.json input_hint schema). */
final case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/**
 * Deterministic synthetic webtext generator (FIXTURES.md §3): a pure function of the
 * row id, so any two runs (and resumed runs) see identical data with no external
 * input. Properties exercised on purpose:
 *  - Zipf-skewed host distribution inside `url` (exercises salting / skew handling)
 *  - ~10 languages heavily skewed to en/zh/de (skewed-group rollups)
 *  - `warc_ts` monotone-ish per host (delta/FoR-friendly timestamps)
 *  - `text` derived from `html` by the pure [[Webtext.extractText]] — the per-url
 *    byte-identical invariant is then checkable end-to-end after decode.
 */
object Webtext {

  private val langs = Array("en", "zh", "de", "es", "fr", "ru", "ja", "pt", "it", "nl")
  // heavy skew: en 55%, zh 15%, de 10%, rest share 20%
  private val langCdf = Array(0.55, 0.70, 0.80, 0.83, 0.86, 0.89, 0.92, 0.95, 0.98, 1.0)

  private val vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog web page content data engine spark column " +
     "compression golomb stream value block codec fast large scale crawl text html body " +
     "title link news article index search query result host path").split(' ')

  private val NumHosts = 4096

  /** splitmix64 — public-domain PRNG step (Steele et al., JDK SplittableRandom). */
  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Zipf(s≈1.1) host rank via inverse-CDF approximation on a mixed id. */
  private def hostRank(r: Long): Int = {
    val u = ((r >>> 11).toDouble / (1L << 53).toDouble)
    val rank = math.pow(NumHosts.toDouble, u) - 1.0 // log-uniform ≈ zipf tail
    math.min(rank.toInt, NumHosts - 1)
  }

  /** Generate one page deterministically from its id. */
  def page(id: Long): WebPage = {
    val r0 = mix64(id)
    val r1 = mix64(r0)
    val r2 = mix64(r1)
    val host = hostRank(r0)
    val url = s"https://host-$host.example.com/p/${java.lang.Long.toHexString(r1 & 0xffffffffL)}/$id"
    // lang skew
    val lu = ((r2 >>> 11).toDouble / (1L << 53).toDouble)
    var li = 0
    while (lu > langCdf(li)) li += 1
    val lang = langs(li)
    // warc_ts: per-host monotone base + small per-page jitter (micros)
    val baseMicros = 1735689600000000L // 2025-01-01T00:00Z
    val ts = baseMicros + host.toLong * 3600000000L + (id % 100000) * 1000000L + (r2 & 0x3ffL)
    // html: title + paragraphs of vocab words, length Pareto-ish
    val nWords = 20 + (mix64(r2) & 0x7fL).toInt * (1 + (r0 & 3L).toInt)
    val sb = new java.lang.StringBuilder(nWords * 8 + 128)
    sb.append("<html><head><title>Page ").append(id).append("</title></head><body><p>")
    var i = 0
    var w = r1
    while (i < nWords) {
      w = mix64(w)
      sb.append(vocab(((w >>> 7) % vocab.length).toInt.abs))
      if (i % 17 == 16) sb.append("</p><p>") else sb.append(' ')
      i += 1
    }
    sb.append("</p></body></html>")
    val html = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ms = ts / 1000L
    val tsObj = new Timestamp(ms)
    tsObj.setNanos(((ts % 1000000L) * 1000L).toInt)
    WebPage(url, tsObj, html, extractText(html), lang)
  }

  /** Pure text extraction: strip tags, collapse runs of whitespace. */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(s.length)
    var inTag = false
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') { inTag = false; pendingSpace = true }
      else if (!inTag) {
        if (c == ' ' || c == '\n' || c == '\t') pendingSpace = true
        else {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.append(c)
        }
      }
      i += 1
    }
    sb.toString
  }

  /** Distributed deterministic generation: ids 0..n-1 over `partitions` tasks. */
  def generate(spark: SparkSession, n: Long, partitions: Int): Dataset[WebPage] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map(id => page(id))
  }
}
