package graft.ops

import graft.core.Corpus
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all
  * expressed with built-in (codegen'd) functions so they run inside
  * whole-stage codegen with no object boundary — these are the per-document
  * scoring passes that run BEFORE expensive extraction/dedup at 100 TB, so
  * scan-locality and pushdown matter more than anything: every operator
  * here is a narrow projection over one column.
  *
  * All arithmetic is integer (or fixed-point integer) so results are
  * bit-identical across engines — the DuckDB oracle replicates each
  * formula exactly.
  */
object TextAnalysis {

  /** Normalized whitespace token count (subword counts in
    * [[tokenCountWordPunct]] / [[tokenCountBpe]]). */
  def tokenCount(text: Column): Column = Corpus.tokenCountCol(text)

  /** Word-or-punct unit count — `regexp_count` of `[A-Za-z0-9]+` words and
    * single punctuation characters. Honest name: this is a pre-tokenizer
    * unit count, NOT a subword count (that is [[tokenCountBpe]]). */
  def tokenCountWordPunct(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** TRUE subword token count under a BPE merge table
    * ([[graft.functions.BpeTokenCount]]) — the number a 100 TB training-mix
    * budget actually tracks. Defaults to the engine's frozen table; pass a
    * loaded production vocabulary ([[graft.functions.BpeTokenCount.loadMerges]])
    * for real budgets. Input is lowercased here so the (lowercase) merge
    * vocabulary applies uniformly; the DuckDB oracle replays the
    * pre-tokenizer, the code-point split, and every merge rule in SQL. */
  def tokenCountBpe(text: Column): Column =
    graft.functions.ColumnFns.bpeTokenCount(lower(text))

  /** [[tokenCountBpe]] under an explicit ordered merge table. */
  def tokenCountBpe(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.ColumnFns.bpeTokenCount(lower(text), merges)

  // ---- language ID ----------------------------------------------------

  /** Stopword-marker n-gram counts per language. Deterministic heuristic
    * lang-ID: argmax of marker hits with fixed priority tie-break
    * (en > de > es > fr > zh), 'und' when all zero. */
  private def hits(text: Column, words: Seq[String]): Column =
    words.map(w => regexp_count(text, lit(s"\\b$w\\b"))).reduce(_ + _)

  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "los", "que", "es"),
    "fr" -> Seq("le", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "zai", "he"))

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, ws) => lang -> hits(lower(text), ws) }

  /** Predicted language: first language (in priority order) whose score
    * equals the max and the max is > 0. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, s), elseCol) =>
      when(maxScore > 0 && s === maxScore, lit(lang)).otherwise(elseCol)
    }
  }

  // ---- quality scoring ------------------------------------------------

  /** Integer quality components (per-mille ratios), jusText/C4-style:
    * length, tokens, mean word length, stopword ratio, punctuation
    * density, alpha density. Composite `quality_score` in [0, 1000]. */
  def qualityComponents(df: DataFrame, text: Column): DataFrame = {
    val norm = trim(regexp_replace(text, "\\s+", " "))
    df.withColumn("n_chars_norm", length(norm))
      .withColumn("n_tokens", tokenCount(text))
      .withColumn("n_stopwords", regexp_count(lower(text), lit("\\b(the|a|an|and|or|of|to|in|is)\\b")))
      .withColumn("n_punct", regexp_count(text, lit("[.,;:!?]")))
      .withColumn("n_alpha", regexp_count(text, lit("[A-Za-z]")))
      .withColumn("mean_word_len_milli",
        when(col("n_tokens") > 0,
          ((col("n_chars_norm") - (col("n_tokens") - 1)) * 1000L) / col("n_tokens"))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("stopword_milli",
        when(col("n_tokens") > 0, (col("n_stopwords") * 1000L) / col("n_tokens"))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("alpha_milli",
        when(col("n_chars_norm") > 0, (col("n_alpha") * 1000L) / col("n_chars_norm"))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("quality_score",
        // C4-ish gates, integerized: enough tokens, sane word length,
        // some stopwords, mostly alphabetic
        (when(col("n_tokens") >= 10, 250L).otherwise(lit(0L)) +
         when(col("mean_word_len_milli").between(3000L, 12000L), 250L).otherwise(lit(0L)) +
         when(col("stopword_milli") >= 10L, 250L).otherwise(lit(0L)) +
         when(col("alpha_milli") >= 600L, 250L).otherwise(lit(0L))).cast("long"))
  }

  /** Deterministic content fingerprint: first 16 hex chars of md5 over the
    * whitespace-normalized, lowercased text — the exact-dedup key that is
    * stable under formatting noise. */
  def fingerprint(text: Column): Column =
    substring(md5(trim(regexp_replace(lower(text), "\\s+", " "))), 1, 16)

  // ---- repetition filters (Gopher/C4-style) ----------------------------

  /** Per-mille fraction of duplicate lines: 1000·(n_lines − n_distinct) /
    * n_lines — the Gopher "duplicate line fraction" filter. Pure built-in
    * expressions; `split` always yields ≥ 1 element, so no zero division. */
  def dupLineFracMilli(text: Column): Column = {
    val lines = split(text, "\n")
    floor((size(lines) - size(array_distinct(lines))) * lit(1000L) / size(lines))
      .cast("long")
  }

  /** Per-mille share of the most frequent n-gram (single-pass custom
    * expression — see [[graft.functions.TopNgramFrac]]). Gopher's cuts
    * (Rae et al. 2021, Table A1, as CHARACTER fractions) are 0.20 for
    * 2-grams, 0.18 for 3-grams, 0.16 for 4-grams; this operator applies
    * them as occurrence fractions. */
  def topNgramFracMilli(tokens: Column, n: Int): Column =
    graft.functions.ColumnFns.topNgramFracMilli(tokens, n)

  // ---- PII-style redaction ---------------------------------------------

  /** Training-corpus scrub pass: emails → `<EMAIL>`, URLs → `<URL>`,
    * long digit runs (7+, phone/account-shaped) → `<NUM>`. Chained
    * `regexp_replace` — codegen'd, scan-local, no object boundary. The
    * patterns deliberately stay inside the regex subset Java and RE2
    * share, so the DuckDB oracle replays them verbatim. URL first:
    * the email pattern would otherwise eat `user:pw@host` authority
    * sections of URLs. */
  def redact(text: Column): Column = {
    val url = regexp_replace(text, "https?://[^\\s]+", "<URL>")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")
    regexp_replace(email, "[0-9]{7,}", "<NUM>")
  }

  /** Redaction hit counts (observability for the scrub pass); each pattern
    * is counted on the same intermediate text [[redact]] applies it to, so
    * counts equal the number of placeholders actually inserted. */
  def redactionCounts(text: Column): (Column, Column, Column) = {
    val afterUrl = regexp_replace(text, "https?://[^\\s]+", "<URL>")
    val afterEmail = regexp_replace(afterUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")
    (regexp_count(text, lit("https?://[^\\s]+")),
     regexp_count(afterUrl, lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+")),
     regexp_count(afterEmail, lit("[0-9]{7,}")))
  }
}
