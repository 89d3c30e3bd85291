package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document BPE encode statistics: fold one document's token
  * histogram (`map<string,bigint>` from [[TokenHistogram]]) against a
  * trained merge table and return
  * `struct<n_words, n_subwords, n_len: bigint>` — the count-weighted
  * sums the t12/t14 encode queries report per document (`n_len` is the
  * summed UTF-8 byte length; for the char alphabet the ASCII contract
  * makes bytes == chars, enforced below exactly as [[BpeApply]] does).
  *
  * WHY a native expression: the encode tail was
  * `explode(histogram) JOIN broadcast(distinct-word lengths) GROUP BY
  * doc_id` — correct and broadcast-shaped, but it materializes one row
  * per (doc, distinct word) (7.4 M at 64×), probes a hash relation per
  * row, and re-aggregates rows that started out grouped by document.
  * This expression does the whole tail as a ZERO-SHUFFLE row-wise
  * projection over the staged per-doc map frame: no explode, no join,
  * no aggregate — a document's stats never leave its row.
  *
  * The merge fold is [[BpeApply.fold]] — the SAME boundary-array greedy
  * loop the symbol-materializing expression runs (shared code, so the
  * two spellings cannot drift) — but only the symbol COUNT is taken; no
  * symbol strings are ever built. Distinct words repeat heavily across
  * documents, so fold results memoize in a per-task map (the expression
  * instance is task-confined) keyed by a COPIED word — map values read
  * off UnsafeRow-backed buffers are not stable beyond the row, and a
  * retained buffer-backed key would alias later rows' bytes.
  *
  * `merges` must be a foldable string in [[BpeApply]]'s flat format; the
  * parsed table is shared through [[BpeApply.tableFor]]'s JVM-wide LRU.
  */
case class BpeDocStats(left: Expression, right: Expression, hexMode: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("n_len", LongType, nullable = false)))

  override def prettyName: String =
    if (hexMode) "bpe_doc_stats_bytes" else "bpe_doc_stats_chars"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    left.dataType match {
      // valueContainsNull must be false: nullSafeEval reads counts with
      // vals.getLong(i), which would silently decode a null slot as 0.
      // Both producing histograms (ascii_word_histogram /
      // space_token_histogram) declare valueContainsNull = false, so a
      // nullable-valued map here means a foreign producer — reject it.
      case MapType(StringType, LongType, true) =>
        TypeCheckFailure(
          s"$prettyName requires non-nullable map values " +
            "(map<string,bigint> with valueContainsNull=false)")
      case MapType(StringType, LongType, false) =>
        if (right.dataType != StringType)
          TypeCheckFailure(s"$prettyName merge table must be a string")
        else if (!right.foldable)
          TypeCheckFailure(s"$prettyName merge table must be a literal")
        else TypeCheckSuccess
      case _ =>
        TypeCheckFailure(s"$prettyName expects map<string,bigint>")
    }
  }

  @transient private lazy val mergeTable: Array[Array[Byte]] =
    BpeApply.tableFor(right.eval(null), hexMode, prettyName)

  /** Task-confined word → symbol-count memo (instances deserialize per
    * task; rows within a task reuse it). For byte-mode histograms the
    * token space is arbitrary strings — not a bounded vocabulary — so a
    * high-cardinality partition could otherwise grow this to its full
    * distinct-word set. Bounded as an access-order LRU capped at
    * [[BpeDocStats.MaxMemoWords]] (the [[BpeApply.MaxCachedTables]]
    * precedent): eviction only re-folds a cold word, never changes a
    * result. */
  @transient private lazy val memo =
    new java.util.LinkedHashMap[UTF8String, java.lang.Integer](
      1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[UTF8String, java.lang.Integer]): Boolean =
        size() > BpeDocStats.MaxMemoWords
    }

  override protected def nullSafeEval(hAny: Any, mergesAny: Any): Any = {
    val h = hAny.asInstanceOf[MapData]
    val keys = h.keyArray()
    val vals = h.valueArray()
    val n = h.numElements()
    var nWords = 0L
    var nSub = 0L
    var nLen = 0L
    var i = 0
    while (i < n) {
      val w = keys.getUTF8String(i)
      val cnt = vals.getLong(i)
      var ns = memo.get(w) // content-based equality; lookup key not retained
      if (ns == null) {
        val bytes = w.getBytes
        if (!hexMode) {
          var j = 0
          while (j < bytes.length) {
            require(bytes(j) >= 0,
              "bpe_doc_stats_chars input must be ASCII (use bpe_doc_stats_bytes)")
            j += 1
          }
        }
        ns = Integer.valueOf(BpeApply.fold(bytes, mergeTable)._2)
        memo.put(UTF8String.fromString(w.toString), ns) // stable copy
      }
      nWords += cnt
      nSub += cnt * ns.longValue()
      nLen += cnt * w.numBytes()
      i += 1
    }
    InternalRow(nWords, nSub, nLen)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeDocStats =
    copy(left = newLeft, right = newRight)
}

object BpeDocStats {
  /** Per-task memo capacity. 64k words × (string + boxed int) is a few
    * MB per task at worst — bounded regardless of partition cardinality. */
  private[functions] val MaxMemoWords = 65536
  private[graft] def maxMemoWordsForTest: Int = MaxMemoWords
}
