package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines (the
  * BASELINE.json north-star extensions beyond the reference's surface).
  * Everything is a codegen'd Column expression — no UDFs — so filters
  * compose, whole-stage codegen spans stay wide, and the same logic scales
  * from sf0.001 to 100 TB without driver involvement.
  */
object TextFunctions {

  /** whitespace tokenization (the shared definition across all ops) */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** characters excluding whitespace — with tokenCount gives avg word len */
  def nonSpaceCount(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("long")

  /** count of tokens from a stopword list (quality-score component) */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(x => x: Any): _*))).cast("long")

  /** punctuation character count (quality-score component) */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"()-]", ""))).cast("long")

  /** Language-ID: marker-token n-gram heuristic. Scores each candidate
    * language by marker-token hits; argmax with alphabetical tie-break.
    * Marker sets are caller-supplied: langId(text, Map("en" -> Seq("the", ...))).
    */
  def langId(text: Column, markers: Map[String, Seq[String]]): Column = {
    val ordered = markers.toSeq.sortBy(_._1)
    // let-bind the token array AND the per-language score vector: the
    // argmax when-chain references every score several times (directly
    // and inside the max), which would re-run the tokenize+filter tree
    // per reference in the interpreted HOF path
    let(tokens(text)) { toks =>
      let(array(ordered.map { case (_, words) =>
        size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
      }: _*)) { arr =>
        ordered.zipWithIndex.foldRight(lit(ordered.head._1)) {
          case (((lang, _), i), other) =>
            when(element_at(arr, i + 1) === array_max(arr), lit(lang))
              .otherwise(other)
        }
      }
    }
  }

  /** BPE-pretokenizer-style segment count: the GPT-2-ish pre-tokenization
    * shape (optional leading space + letter run | digit run | symbol run)
    * restricted to an ASCII character-class regex that evaluates
    * identically under Java regex (Spark) and RE2 (DuckDB). Counts the
    * subword-merge INPUT segments — the standard cheap proxy for token
    * budget before a real BPE vocab is applied.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"), lit(0)))
      .cast("long")

  /** PII patterns shared with the DuckDB oracle — kept to the dialect
    * intersection of Java regex and RE2 (no backrefs, no lookaround).
    */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE_RE = "\\b\\d{3}-\\d{4}\\b"
  val IPV4_RE  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** count of matches of a PII pattern (counts run on the raw text,
    * independently per type)
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact emails, then IPv4s, then phone fragments (fixed order so
    * engines agree when patterns could overlap) — the pre-training PII
    * scrub. Pure codegen'd string expressions; at 100 TB this is one
    * narrow scan pass, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        IPV4_RE, "<IP>"),
      PHONE_RE, "<PHONE>")

  /** canonical document fingerprint: md5 of whitespace-normalized lowercase */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** HTML → visible text (the WARC→WET conversion step every crawl
    * pipeline runs before any text filter): drop comments and
    * script/style SUBTREES (their character data is code, not prose),
    * strip remaining tags, decode the common character entities
    * (`&amp;` LAST so freshly-decoded `&lt;` stays literal text — the
    * order every HTML serializer escapes in, reversed), collapse
    * whitespace. Pure codegen'd `regexp_replace`/`replace` chain — the
    * regex subset used (inline `(?is)` flags, lazy `.*?`, char classes)
    * is shared by Java regex and RE2, so the DuckDB oracle replays the
    * SAME patterns (with its explicit `'g'` flag — DuckDB replaces only
    * the first match by default, Spark replaces all).
    */
  def htmlToText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript  = regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle   = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags    = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded =
      replace(replace(replace(replace(replace(replace(
        noTags,
        lit("&lt;"), lit("<")),
        lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
        lit("&nbsp;"), lit(" ")),
        lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** first <title> element's decoded text ('' when absent) */
  def htmlTitle(html: Column): Column =
    htmlToText(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** Rabin-Karp-style polynomial rolling hash over characters,
    * acc = (acc*31 + code) mod (2^31-1) — cheap locality-sensitive doc id.
    *
    * Backed by the native codegen'd [[graft.plans.PolyHash]] expression
    * (registered by GraftExtensions): one fused loop per string instead
    * of the interpreted `aggregate(transform(split(...)))` HOF pipeline —
    * the char-array allocation + per-element lambda machinery made the
    * fold the cost of the whole query (1.75 s -> 0.4 s for txt_rollhash
    * at bench scale). Identical values: code-point fold, empty string 0,
    * null in -> null out.
    */
  def rollingHash(text: Column): Column = call_function("poly_hash", text)

  /** let-binding for Column expressions: evaluate `value` ONCE and use it
    * many times in `body` via the lambda variable. HOF pipelines are
    * interpreted (no codegen CSE), so a fold that references its input
    * array j times re-evaluates the input's whole expression tree j times
    * — nested folds multiply. Wrapping in a 1-element transform makes the
    * binding explicit: measured 34 s -> 2 s on winnowing at bench scale.
    */
  private[graft] def let(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003, the
    * MOSS scheme): polynomial hash per k-token gram, minimum over every
    * window of w consecutive gram hashes, distinct selected values = the
    * document's fingerprint set (sorted). Guarantee: two documents sharing
    * a token run of length >= w+k-1 share at least one fingerprint — the
    * sparse, position-robust alternative to hashing every gram.
    *
    * Window minima fold over shifted slices with `least` (the
    * [[shinglesFromTokens]] zip_with idiom — O(grams·w) streaming, no
    * per-index element_at). Short docs (0 < grams < w) keep their single
    * overall minimum.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 2, s"need k >= 1, w >= 2; got k=$k w=$w")
    // chars hash ONCE per token (native poly_hash); gram hashes combine
    // the k token hashes with the same multiply-add-mod fold —
    // O(chars + grams·k) instead of re-walking every gram's characters
    val tokHashes = transform(tokens(text), t => call_function("poly_hash", t))
    let(tokHashes) { th =>
      val gramLen = greatest(size(th) - (k - 1), lit(0))
      val grams = (2 to k).foldLeft(slice(th, lit(1), gramLen)) { (acc, j) =>
        zip_with(acc, slice(th, lit(j), gramLen),
          (a, b) => (a * 31 + b) % 2147483647L)
      }
      let(grams) { hs =>
        val outLen = greatest(size(hs) - (w - 1), lit(0))
        val winMins = (2 to w).foldLeft(slice(hs, lit(1), outLen)) { (acc, j) =>
          zip_with(acc, slice(hs, lit(j), outLen), (a, b) => least(a, b))
        }
        val mins = when(size(hs) > 0 && size(hs) < w,
          array(array_min(hs))).otherwise(winMins)
        array_sort(array_distinct(mins))
      }
    }
  }

  /** word n-gram shingles (default bigrams) — shared by MinHash/Jaccard.
    *
    * Built by zipping the token array with its own shifted slices rather
    * than `element_at` inside a `transform` lambda: a lambda-body
    * `element_at(toks, i)` re-evaluates the token-split per element
    * (O(tokens²) per row — measured 80 s on 5000 docs), while `zip_with`
    * over slices evaluates the array once and streams it (O(tokens·n)).
    */
  def shingles(text: Column, n: Int = 2): Column =
    shinglesFromTokens(tokens(text), n)

  /** n-gram shingles from an already-materialized token-array column.
    * The token array is let-bound so the fold's n slice references don't
    * re-evaluate the tokenizing split n times.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    let(toks) { tk =>
      val outLen = greatest(size(tk) - (n - 1), lit(0))
      (2 to n).foldLeft(slice(tk, lit(1), outLen)) { (acc, k) =>
        zip_with(acc, slice(tk, lit(k), outLen), (a, b) => concat(a, lit(" "), b))
      }
    }
  }
}
