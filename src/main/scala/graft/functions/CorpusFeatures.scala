package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.commons.codec.digest.DigestUtils

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The q46/q50 per-document analysis bundle in ONE string pass: content
  * digest plus the eight quality-battery counters, bit-for-bit equal to
  * the SQL chain
  *
  * {{{
  *   nt = lower(trim(regexp_replace(text, '\s+', ' ')))
  *   w  = split(nt, ' ')
  *   bg = adjacent-pair bigrams of w
  *   fp=md5(nt), n_tokens=size(w),
  *   total_chars=aggregate(w, 0, (a,x) -> a+length(x)),
  *   n_stop=size(filter(w, x -> x IN allStop)), n_chars=length(nt),
  *   n_sym=#[^a-z0-9 ], n_digit=#[0-9],
  *   n_bigrams=size(bg), n_uniq_bigrams=size(array_distinct(bg)),
  *   n_uniq_tokens=size(array_distinct(w)),
  *   n_top_word=array_max(transform(array_distinct(w),
  *     x -> size(filter(w, y -> y = x))))
  * }}}
  *
  * (equivalence pinned per-document against the literal SQL chain by
  * CorpusFeaturesSpec, including empty / whitespace-only / control-char /
  * non-ASCII edge rows).
  *
  * WHY: the SQL spelling evaluates five lambda-bearing higher-order
  * functions plus two regex extractions per row, all outside whole-stage
  * codegen and therefore outside common-subexpression elimination — the
  * interpreted chain re-walks the text ~10× and measured ~1 ms/doc, the
  * single dominant stage of the q50 capstone at 64× data (10.6 s of an
  * 11.6 s total). One JVM pass over the normalized string computes all
  * nine values together; each field is then a free `GetStructField`.
  * Catalyst keeps the struct single-evaluation because CollapseProject
  * refuses to duplicate a non-cheap expression into its ~9 consumers.
  *
  * Scale: row-wise, no state — linear in corpus bytes at any cluster
  * size, and the 100 TB plan shape of q46/q50 (text scanned exactly
  * once, only metadata past the scan) is unchanged; this just removes a
  * constant factor from the one pass that must read the text.
  */
case class CorpusFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("fp", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_uniq_bigrams", LongType, nullable = false),
    StructField("n_uniq_tokens", LongType, nullable = false),
    StructField("n_top_word", LongType, nullable = false)))

  override def prettyName: String = "corpus_features"

  // the t08 IN-list, as a JVM set (same source constant, cannot drift)
  private final val Stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.ops.TextOps.allStopWords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    // regexp_replace(text, '\s+', ' '): Java regex, exactly as Spark runs it
    val collapsed =
      input.asInstanceOf[UTF8String].toString.replaceAll("\\s+", " ")
    // SQL trim() strips U+0020 only (Java String.trim would also eat
    // control chars < 0x20 that \s did not match)
    var st = 0
    var en = collapsed.length
    while (st < en && collapsed.charAt(st) == ' ') st += 1
    while (en > st && collapsed.charAt(en - 1) == ' ') en -= 1
    // lower() via Spark's own UTF8String path — bit-exact with the SQL chain
    val norm = UTF8String.fromString(collapsed.substring(st, en))
      .toLowerCase.toString

    // one scan: length / symbol / digit counters over code POINTS
    // (SQL length() and the single-char regex classes both count them)
    var nChars = 0L
    var nSym = 0L
    var nDigit = 0L
    var i = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      nChars += 1
      if (cp >= '0' && cp <= '9') nDigit += 1
      else if (!((cp >= 'a' && cp <= 'z') || cp == ' ')) nSym += 1
      i += Character.charCount(cp)
    }

    // split(nt, ' ') with Spark's limit -1 semantics; token frequencies in
    // the same pass give distinct-token and top-word counts (the SQL
    // spelling of top_word_cnt — a filter per distinct token — is
    // O(n·distinct) per document)
    val words = norm.split(" ", -1)
    var totalChars = 0L
    var nStop = 0L
    var nTopWord = 0L
    val freq = new java.util.HashMap[String, Long](words.length * 2)
    var w = 0
    while (w < words.length) {
      val t = words(w)
      totalChars += t.codePointCount(0, t.length)
      if (Stop.contains(t)) nStop += 1
      val c = freq.merge(t, 1L, (a, b) => a + b)
      if (c > nTopWord) nTopWord = c
      w += 1
    }
    val nUniqTokens = freq.size().toLong

    // adjacent-pair bigrams; tokens contain no spaces, so "a b" is an
    // injective encoding of the pair and HashSet size = array_distinct size
    val nBigrams = if (words.length >= 2) (words.length - 1).toLong else 0L
    var nUniqBigrams = 0L
    if (words.length >= 2) {
      val uniq = new java.util.HashSet[String](words.length * 2)
      var b = 0
      while (b < words.length - 1) {
        uniq.add(words(b) + " " + words(b + 1))
        b += 1
      }
      nUniqBigrams = uniq.size().toLong
    }

    val fp = DigestUtils.md5Hex(norm.getBytes(StandardCharsets.UTF_8))
    InternalRow(UTF8String.fromString(fp), words.length.toLong, totalChars,
      nStop, nChars, nSym, nDigit, nBigrams, nUniqBigrams, nUniqTokens,
      nTopWord)
  }

  override protected def withNewChildInternal(newChild: Expression): CorpusFeatures =
    copy(child = newChild)
}
