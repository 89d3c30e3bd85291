package graft.ops

import Q._

/** Text-analysis operators over the `documents` table: token statistics,
  * heuristic language ID, quality scoring, and fingerprinting — the
  * per-document stages of a training-data pipeline. All are pure row-wise
  * projections (no shuffle; fully parallel at any scale) except d01's
  * group-by-fingerprint, which shuffles only the 16-byte digest + id.
  */
object TextOps {

  // Stopword sets for the n-gram/stopword language heuristic. The guess is
  // a deterministic function of the text (not expected to equal the `lang`
  // column); ties break by the fixed en > es > de > fr priority.
  private val en = "('the','a','of','and','to','in','is')"
  private val es = "('el','la','de','y','que','en')"
  private val de = "('der','die','und','das','ist')"
  private val fr = "('le','les','et','des','un')"

  /** Token statistics: counts are exact integers; ratios are single IEEE
    * divisions of exact operands (bit-identical across engines). */
  val t01 = QueryDef(
    "t01_token_stats",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, text, corpus_features(text) AS cf FROM documents)
      SELECT doc_id,
             cf.n_tokens AS n_tokens,
             cf.n_uniq_tokens AS n_uniq,
             cf.total_chars AS total_chars,
             CAST(cf.total_chars AS DOUBLE)
               / CAST(cf.n_tokens AS DOUBLE) AS avg_token_len,
             CAST(cf.n_uniq_tokens AS DOUBLE) / CAST(cf.n_tokens AS DOUBLE) AS ttr,
             CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]') AS BIGINT)
               AS n_subtokens
      FROM t"""),
    Some(s"""
      WITH t AS (SELECT doc_id, text, string_split($oNorm, ' ') AS w FROM documents)
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(w, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) AS total_chars,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(w, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS avg_token_len,
             CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS ttr,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS BIGINT)
               AS n_subtokens
      FROM t"""))

  /** Heuristic language ID: stopword-hit counts per language, fixed
    * priority on ties. */
  val t02 = QueryDef(
    "t02_lang_id",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, lang, split($sNorm, ' ') AS w FROM documents),
      sc AS (SELECT doc_id, lang,
               CAST(size(filter(w, x -> x IN $en)) AS BIGINT) AS s_en,
               CAST(size(filter(w, x -> x IN $es)) AS BIGINT) AS s_es,
               CAST(size(filter(w, x -> x IN $de)) AS BIGINT) AS s_de,
               CAST(size(filter(w, x -> x IN $fr)) AS BIGINT) AS s_fr
             FROM t)
      SELECT doc_id, lang AS labeled_lang, s_en, s_es, s_de, s_fr,
             CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS guessed_lang
      FROM sc"""),
    Some(s"""
      WITH t AS (SELECT doc_id, lang, string_split($oNorm, ' ') AS w FROM documents),
      sc AS (SELECT doc_id, lang,
               CAST(len(list_filter(w, x -> x IN $en)) AS BIGINT) AS s_en,
               CAST(len(list_filter(w, x -> x IN $es)) AS BIGINT) AS s_es,
               CAST(len(list_filter(w, x -> x IN $de)) AS BIGINT) AS s_de,
               CAST(len(list_filter(w, x -> x IN $fr)) AS BIGINT) AS s_fr
             FROM t)
      SELECT doc_id, lang AS labeled_lang, s_en, s_es, s_de, s_fr,
             CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS guessed_lang
      FROM sc"""))

  /** Quality scoring: length band, stopword ratio, type-token ratio →
    * integer score plus the underlying exact features. */
  val t03 = QueryDef(
    "t03_quality_score",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, text_features(text) AS tf FROM documents),
      f AS (SELECT doc_id,
              tf.n_chars_norm AS n_chars_norm,
              tf.n_tokens AS n_tokens,
              tf.n_stop AS n_stop,
              tf.n_uniq AS n_uniq
            FROM t)
      SELECT doc_id, n_chars_norm, n_tokens, n_stop,
             CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
             (CASE WHEN n_tokens >= 5 AND n_tokens <= 1000 THEN 1 ELSE 0 END +
              CASE WHEN n_stop * 20 >= n_tokens THEN 1 ELSE 0 END +
              CASE WHEN n_uniq * 2 >= n_tokens THEN 1 ELSE 0 END) AS quality
      FROM f"""),
    Some(s"""
      WITH t AS (SELECT doc_id, $oNorm AS nt, string_split($oNorm, ' ') AS w FROM documents),
      f AS (SELECT doc_id,
              CAST(length(nt) AS BIGINT) AS n_chars_norm,
              CAST(len(w) AS BIGINT) AS n_tokens,
              CAST(len(list_filter(w, x -> x IN $en)) AS BIGINT) AS n_stop,
              CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
            FROM t)
      SELECT doc_id, n_chars_norm, n_tokens, n_stop,
             CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
             CAST((CASE WHEN n_tokens >= 5 AND n_tokens <= 1000 THEN 1 ELSE 0 END +
              CASE WHEN n_stop * 20 >= n_tokens THEN 1 ELSE 0 END +
              CASE WHEN n_uniq * 2 >= n_tokens THEN 1 ELSE 0 END) AS INT) AS quality
      FROM f"""))

  /** Document fingerprinting: 32-bit rolling hash (native codegen'd
    * Catalyst expression, SQL-replicated in the oracle) + md5 digest. */
  val t04 = QueryDef(
    "t04_fingerprint",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, $sNorm AS nt FROM documents)
      SELECT doc_id, char_fold(nt, 7) AS fp32, md5(nt) AS fp_md5 FROM t"""),
    Some(s"""
      WITH t AS (SELECT doc_id, $oNorm AS nt FROM documents)
      SELECT doc_id, ${oCharFold("nt", 7)} AS fp32, md5(nt) AS fp_md5 FROM t"""))

  /** Exact deduplication: group by content digest, keep the smallest
    * doc_id per group. Shuffles only (digest, id) — at 100 TB the text
    * never moves. */
  val d01 = QueryDef(
    "d01_exact_dedup",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, md5($sNorm) AS fp FROM documents)
      SELECT doc_id, fp,
             min(doc_id) OVER (PARTITION BY fp) AS keep_id,
             doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
      FROM t"""),
    Some(s"""
      WITH t AS (SELECT doc_id, md5($oNorm) AS fp FROM documents)
      SELECT doc_id, fp,
             min(doc_id) OVER (PARTITION BY fp) AS keep_id,
             doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
      FROM t"""))

  /** Text cleaning/redaction stage: scrub digit runs and collapse
    * repeated punctuation; report how much was redacted (the audit
    * signal a cleaning stage must emit). Pure row-wise transform. */
  val t05 = QueryDef(
    "t05_clean_redact",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, $sNorm AS nt FROM documents),
      c AS (SELECT doc_id, nt,
              regexp_replace(nt, '[0-9]+', '<num>') AS cleaned
            FROM t)
      SELECT doc_id, cleaned,
             CAST(length(nt) AS BIGINT) AS len_before,
             CAST(length(cleaned) AS BIGINT) AS len_after,
             CAST(size(regexp_extract_all(nt, '[0-9]+', 0)) AS BIGINT) AS n_redacted
      FROM c"""),
    Some(s"""
      WITH t AS (SELECT doc_id, $oNorm AS nt FROM documents),
      c AS (SELECT doc_id, nt,
              regexp_replace(nt, '[0-9]+', '<num>', 'g') AS cleaned
            FROM t)
      SELECT doc_id, cleaned,
             CAST(length(nt) AS BIGINT) AS len_before,
             CAST(length(cleaned) AS BIGINT) AS len_after,
             CAST(len(regexp_extract_all(nt, '[0-9]+', 0)) AS BIGINT) AS n_redacted
      FROM c"""))

  // Union of the four stopword sets — the language-agnostic "contains
  // common function words" signal for the quality-filter battery. Single
  // source of truth: the SQL IN-list literal (t08/q46 oracle spelling) and
  // the native [[graft.functions.CorpusFeatures]] expression both derive
  // from this sequence, so the sets cannot drift apart.
  private[graft] val allStopWords: Array[String] = Array(
    "the", "a", "of", "and", "to", "in", "is", "el", "la", "de", "y",
    "que", "en", "der", "die", "und", "das", "ist", "le", "les", "et",
    "des", "un")
  private[graft] val allStop =
    allStopWords.map(w => s"'$w'").mkString("(", ",", ")")

  /** Repetition / boilerplate detection (the Gopher-style repeated-n-gram
    * rules): per document, the duplicate-bigram fraction and the most
    * frequent word's share of all tokens. Pure row-wise (the bigram list
    * and word-frequency scan stay inside one row — no explode, no
    * shuffle); ratios are single IEEE divisions of exact integers, and the
    * repetitive flag uses integer cross-multiplication so no float
    * threshold can diverge across engines. */
  val t07 = QueryDef(
    "t07_repetition_stats",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, corpus_features(text) AS cf FROM documents),
      f AS (SELECT doc_id,
              cf.n_tokens AS n_tokens,
              cf.n_uniq_tokens AS n_uniq,
              cf.n_bigrams AS n_bigrams,
              cf.n_uniq_bigrams AS n_uniq_bigrams,
              cf.n_top_word AS top_word_cnt
            FROM t)
      SELECT doc_id, n_tokens, n_uniq, n_bigrams, n_uniq_bigrams, top_word_cnt,
             CASE WHEN n_bigrams > 0
                  THEN CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)
                         / CAST(n_bigrams AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END AS dup_bigram_frac,
             CAST(top_word_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_word_frac,
             ((n_bigrams - n_uniq_bigrams) * 5 > n_bigrams)
               OR (top_word_cnt * 5 > n_tokens) AS is_repetitive
      FROM f"""),
    Some(s"""
      WITH t AS (SELECT doc_id, string_split($oNorm, ' ') AS w FROM documents),
      b AS (SELECT doc_id, w,
              CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i + 1])
                   ELSE CAST([] AS VARCHAR[]) END AS bg
            FROM t),
      f AS (SELECT doc_id,
              CAST(len(w) AS BIGINT) AS n_tokens,
              CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
              CAST(len(bg) AS BIGINT) AS n_bigrams,
              CAST(len(list_distinct(bg)) AS BIGINT) AS n_uniq_bigrams,
              CAST(list_max(list_transform(list_distinct(w),
                x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_word_cnt
            FROM b)
      SELECT doc_id, n_tokens, n_uniq, n_bigrams, n_uniq_bigrams, top_word_cnt,
             CASE WHEN n_bigrams > 0
                  THEN CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)
                         / CAST(n_bigrams AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END AS dup_bigram_frac,
             CAST(top_word_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_word_frac,
             ((n_bigrams - n_uniq_bigrams) * 5 > n_bigrams)
               OR (top_word_cnt * 5 > n_tokens) AS is_repetitive
      FROM f"""))

  /** C4/Gopher-style quality-filter battery: six orthogonal keep/drop
    * rules (length band, mean word length, stopword presence, symbol
    * ratio, digit ratio, duplicate-bigram boilerplate), each emitted as
    * its own flag so a curation run can report WHY documents were dropped,
    * plus the conjunctive keep decision. Row-wise; every threshold is an
    * integer cross-multiplication — nothing to diverge across engines. */
  val t08 = QueryDef(
    "t08_quality_filter",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH c AS (SELECT doc_id, lang, corpus_features(text) AS cf
                 FROM documents),
      f AS (SELECT doc_id, lang, cf.n_tokens AS n_tokens,
              cf.total_chars AS total_chars, cf.n_stop AS n_stop,
              cf.n_chars AS n_chars, cf.n_sym AS n_sym,
              cf.n_digit AS n_digit, cf.n_bigrams AS n_bigrams,
              cf.n_uniq_bigrams AS n_uniq_bigrams
            FROM c),
      r AS (SELECT doc_id, lang,
              n_tokens BETWEEN 5 AND 1000 AS r_len,
              3 * n_tokens <= total_chars AND total_chars <= 10 * n_tokens AS r_wordlen,
              n_stop >= 2 AS r_stop,
              n_sym * 10 < n_chars AS r_sym,
              n_digit * 5 < n_chars AS r_digit,
              (n_bigrams - n_uniq_bigrams) * 5 <= n_bigrams AS r_boiler
            FROM f)
      SELECT doc_id, lang, r_len, r_wordlen, r_stop, r_sym, r_digit, r_boiler,
             r_len AND r_wordlen AND r_stop AND r_sym AND r_digit AND r_boiler AS keep
      FROM r"""),
    Some(s"""
      WITH t AS (SELECT doc_id, lang, $oNorm AS nt,
                   string_split($oNorm, ' ') AS w FROM documents),
      b AS (SELECT doc_id, lang, nt, w,
              CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i + 1])
                   ELSE CAST([] AS VARCHAR[]) END AS bg
            FROM t),
      f AS (SELECT doc_id, lang,
              CAST(len(w) AS BIGINT) AS n_tokens,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(w, x -> CAST(length(x) AS BIGINT))),
                (a, x) -> a + x) AS total_chars,
              CAST(len(list_filter(w, x -> x IN $allStop)) AS BIGINT) AS n_stop,
              CAST(length(nt) AS BIGINT) AS n_chars,
              CAST(len(regexp_extract_all(nt, '[^a-z0-9 ]', 0)) AS BIGINT) AS n_sym,
              CAST(len(regexp_extract_all(nt, '[0-9]', 0)) AS BIGINT) AS n_digit,
              CAST(len(bg) AS BIGINT) AS n_bigrams,
              CAST(len(list_distinct(bg)) AS BIGINT) AS n_uniq_bigrams
            FROM b),
      r AS (SELECT doc_id, lang,
              n_tokens BETWEEN 5 AND 1000 AS r_len,
              3 * n_tokens <= total_chars AND total_chars <= 10 * n_tokens AS r_wordlen,
              n_stop >= 2 AS r_stop,
              n_sym * 10 < n_chars AS r_sym,
              n_digit * 5 < n_chars AS r_digit,
              (n_bigrams - n_uniq_bigrams) * 5 <= n_bigrams AS r_boiler
            FROM f)
      SELECT doc_id, lang, r_len, r_wordlen, r_stop, r_sym, r_digit, r_boiler,
             r_len AND r_wordlen AND r_stop AND r_sym AND r_digit AND r_boiler AS keep
      FROM r"""))

  // ---- PII detection + redaction --------------------------------------

  /** Deterministic PII augmentation for the scrub gate: the synthetic
    * corpus contains no emails/phones/IPs/card numbers, so — exactly as
    * t13 augments for the byte-level tokenizer — a pure function of
    * (doc_id, source) plants every PII class on a known subset of docs:
    * an email on doc_id%5=0, a NANP-style phone on %7=0, an IPv4 on
    * %11=0, a Luhn-VALID card (rotating through three standard test
    * numbers) on %13=0, and a Luhn-INVALID 16-digit run on %13=1 (the
    * negative control the validity check must leave untouched). ONE
    * definition, two dialect spellings. */
  private def piiAug(strTy: String): String = s"""concat(text,
      CASE WHEN doc_id % 5 = 0 THEN concat(' reach u', CAST(doc_id AS $strTy), '@mail-', source, '.com') ELSE '' END,
      CASE WHEN doc_id % 7 = 0 THEN concat(' call 555-', CAST(doc_id % 900 + 100 AS $strTy), '-', CAST(doc_id % 9000 + 1000 AS $strTy)) ELSE '' END,
      CASE WHEN doc_id % 11 = 0 THEN concat(' ip 10.', CAST(doc_id % 256 AS $strTy), '.', CAST(doc_id * 3 % 256 AS $strTy), '.', CAST(doc_id * 7 % 256 AS $strTy)) ELSE '' END,
      CASE WHEN doc_id % 13 = 0 THEN concat(' card ', CASE doc_id % 3 WHEN 0 THEN '4539578763621486' WHEN 1 THEN '4716108999716531' ELSE '5425233430109903' END) ELSE '' END,
      CASE WHEN doc_id % 13 = 1 THEN ' card 4539578763621480' ELSE '' END)"""
  private def sPiiAug: String = piiAug("STRING")
  private def oPiiAug: String = piiAug("VARCHAR")

  /** PII scrub — the redaction stage every public-web training corpus
    * runs before release (emails, phone numbers, IP addresses, payment
    * card numbers): per document, detect each class by pattern, validate
    * card CANDIDATES with the Luhn checksum (a 13–16-digit run is only
    * PII when the check digit matches — the %13=1 negative control stays
    * in the clear), redact in a fixed order (email → phone → IP → each
    * valid card by exact literal), and report the audit counts a
    * compliance pipeline must emit. The ENGINE validates with Spark's
    * built-in `luhn_check`; the ORACLE spells the doubled-digit fold
    * explicitly in DuckDB — two independent derivations of the checksum
    * that the gate hash forces to agree on every candidate.
    *
    * Scale shape: pure row-wise projection — regex + bounded per-row
    * list lambdas, no explode, no shuffle; the 100 TB ideal map pass
    * (d14's economics). */
  val t16 = QueryDef(
    "t16_pii_scrub",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, $sPiiAug AS nt FROM documents),
      c AS (SELECT doc_id, nt,
              regexp_extract_all(nt, '\\\\b[0-9]{13,16}\\\\b', 0) AS cards
            FROM t),
      l AS (SELECT doc_id, nt, cards,
              filter(cards, x -> luhn_check(x)) AS valid_cards
            FROM c),
      r AS (SELECT doc_id, nt, cards, valid_cards,
              aggregate(valid_cards,
                regexp_replace(regexp_replace(regexp_replace(nt,
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z][a-z]+', '<email>'),
                  '\\\\b555-[0-9]{3}-[0-9]{4}\\\\b', '<phone>'),
                  '\\\\b[0-9]{1,3}(\\\\.[0-9]{1,3}){3}\\\\b', '<ip>'),
                (a, x) -> replace(a, x, '<card>')) AS cleaned
            FROM l)
      SELECT doc_id,
             CAST(regexp_count(nt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z][a-z]+') AS BIGINT) AS n_email,
             CAST(regexp_count(nt, '\\\\b555-[0-9]{3}-[0-9]{4}\\\\b') AS BIGINT) AS n_phone,
             CAST(regexp_count(nt, '\\\\b[0-9]{1,3}(\\\\.[0-9]{1,3}){3}\\\\b') AS BIGINT) AS n_ip,
             CAST(size(cards) AS BIGINT) AS n_card_cand,
             CAST(size(valid_cards) AS BIGINT) AS n_card_valid,
             CAST(length(nt) AS BIGINT) AS len_before,
             CAST(length(cleaned) AS BIGINT) AS len_after,
             cleaned
      FROM r"""),
    Some(s"""
      WITH t AS (SELECT doc_id, $oPiiAug AS nt FROM documents),
      c AS (SELECT doc_id, nt,
              regexp_extract_all(nt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+') AS emails,
              regexp_extract_all(nt, '\\b555-[0-9]{3}-[0-9]{4}\\b') AS phones,
              regexp_extract_all(nt, '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', 0) AS ips,
              regexp_extract_all(nt, '\\b[0-9]{13,16}\\b') AS cards
            FROM t),
      l AS (SELECT doc_id, nt, emails, phones, ips, cards,
              list_filter(cards, c -> list_sum(list_transform(range(length(c)), i ->
                CASE WHEN i % 2 = 1
                  THEN (CAST(substr(c, length(c) - i, 1) AS INT) * 2) // 10
                     + (CAST(substr(c, length(c) - i, 1) AS INT) * 2) % 10
                  ELSE CAST(substr(c, length(c) - i, 1) AS INT) END)) % 10 = 0)
                AS valid_cards
            FROM c),
      r AS (SELECT doc_id, nt, emails, phones, ips, cards, valid_cards,
              list_reduce(list_prepend(
                regexp_replace(regexp_replace(regexp_replace(nt,
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<email>', 'g'),
                  '\\b555-[0-9]{3}-[0-9]{4}\\b', '<phone>', 'g'),
                  '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', '<ip>', 'g'),
                valid_cards), (a, x) -> replace(a, x, '<card>')) AS cleaned
            FROM l)
      SELECT doc_id,
             CAST(len(emails) AS BIGINT) AS n_email,
             CAST(len(phones) AS BIGINT) AS n_phone,
             CAST(len(ips) AS BIGINT) AS n_ip,
             CAST(len(cards) AS BIGINT) AS n_card_cand,
             CAST(len(valid_cards) AS BIGINT) AS n_card_valid,
             CAST(length(nt) AS BIGINT) AS len_before,
             CAST(length(cleaned) AS BIGINT) AS len_after,
             cleaned
      FROM r"""),
    headline = true)

  // ---- script-aware language identification ----------------------------

  /** Deterministic script planting for the t17 gate (t13's augmentation
    * pattern): the corpus is lowercase-ASCII, so Han / Cyrillic / Greek
    * runs are appended as pure functions of doc_id — the gate hash then
    * proves the non-Latin counting paths on every engine. */
  private def scriptAug(strTy: String): String = s"""concat(text,
      CASE WHEN doc_id % 4 = 0 THEN ' 数据处理' ELSE '' END,
      CASE WHEN doc_id % 6 = 0 THEN ' обработка данных' ELSE '' END,
      CASE WHEN doc_id % 9 = 0 THEN ' Ωμέγα' ELSE '' END,
      CASE WHEN doc_id % 8 = 0 THEN concat(' v', CAST(doc_id % 100 AS $strTy)) ELSE '' END)"""
  private def sScriptAug: String = scriptAug("STRING")
  private def oScriptAug: String = scriptAug("VARCHAR")

  /** Script-aware language ID — the half of language identification that
    * t02's stopword heuristic cannot see: per document, exact codepoint
    * counts per Unicode script block (Latin, Han, Cyrillic, Greek, digits)
    * via `\\x{...}`-range character classes (identical semantics in Java
    * regex and RE2 — probed on both engines), the dominant script by
    * fixed-priority argmax, and a multiscript flag (≥2 letter scripts
    * present — the mixed-language doc a router must treat specially).
    * Real-world shape: script ID is the cheap O(chars) prefilter that
    * routes documents to per-script language models; for CJK it IS the
    * language family decision.
    *
    * Scale: pure row-wise regex counting — no explode, no shuffle. */
  val t17 = QueryDef(
    "t17_script_id",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH t AS (SELECT doc_id, lang, $sScriptAug AS nt FROM documents),
      c AS (SELECT doc_id, lang,
              CAST(regexp_count(nt, '[a-zA-Z]') AS BIGINT) AS n_latin,
              CAST(regexp_count(nt, '[0-9]') AS BIGINT) AS n_digit,
              CAST(regexp_count(nt, '[\\\\x{4e00}-\\\\x{9fff}]') AS BIGINT) AS n_han,
              CAST(regexp_count(nt, '[\\\\x{0400}-\\\\x{04ff}]') AS BIGINT) AS n_cyr,
              CAST(regexp_count(nt, '[\\\\x{0370}-\\\\x{03ff}]') AS BIGINT) AS n_greek
            FROM t)
      SELECT doc_id, lang AS labeled_lang, n_latin, n_digit, n_han, n_cyr, n_greek,
             CASE WHEN n_latin >= n_han AND n_latin >= n_cyr AND n_latin >= n_greek THEN 'latin'
                  WHEN n_han >= n_cyr AND n_han >= n_greek THEN 'han'
                  WHEN n_cyr >= n_greek THEN 'cyrillic'
                  ELSE 'greek' END AS script,
             (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END +
              CASE WHEN n_han > 0 THEN 1 ELSE 0 END +
              CASE WHEN n_cyr > 0 THEN 1 ELSE 0 END +
              CASE WHEN n_greek > 0 THEN 1 ELSE 0 END) >= 2 AS multiscript
      FROM c"""),
    Some(s"""
      WITH t AS (SELECT doc_id, lang, $oScriptAug AS nt FROM documents),
      c AS (SELECT doc_id, lang,
              CAST(len(regexp_extract_all(nt, '[a-zA-Z]')) AS BIGINT) AS n_latin,
              CAST(len(regexp_extract_all(nt, '[0-9]')) AS BIGINT) AS n_digit,
              CAST(len(regexp_extract_all(nt, '[\\x{4e00}-\\x{9fff}]')) AS BIGINT) AS n_han,
              CAST(len(regexp_extract_all(nt, '[\\x{0400}-\\x{04ff}]')) AS BIGINT) AS n_cyr,
              CAST(len(regexp_extract_all(nt, '[\\x{0370}-\\x{03ff}]')) AS BIGINT) AS n_greek
            FROM t)
      SELECT doc_id, lang AS labeled_lang, n_latin, n_digit, n_han, n_cyr, n_greek,
             CASE WHEN n_latin >= n_han AND n_latin >= n_cyr AND n_latin >= n_greek THEN 'latin'
                  WHEN n_han >= n_cyr AND n_han >= n_greek THEN 'han'
                  WHEN n_cyr >= n_greek THEN 'cyrillic'
                  ELSE 'greek' END AS script,
             (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END +
              CASE WHEN n_han > 0 THEN 1 ELSE 0 END +
              CASE WHEN n_cyr > 0 THEN 1 ELSE 0 END +
              CASE WHEN n_greek > 0 THEN 1 ELSE 0 END) >= 2 AS multiscript
      FROM c"""),
    headline = true)

  val all: Seq[QueryDef] = Seq(t01, t02, t03, t04, t05, t07, t08, t16, t17, d01)
}
