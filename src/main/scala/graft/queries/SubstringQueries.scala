package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.SubstringDedup

/** Character-span exact-substring dedup (Lee et al. arXiv:2107.06499
  * "ExactSubstr") over the `documents` table — see
  * [[graft.operators.SubstringDedup]] for the distributed design. The
  * DuckDB oracles replicate the exact algorithm (same md5 windows, same
  * encoded keeper min, same gaps-and-islands merge), so all three
  * entries are full hash-verified oracles, not rows-only.
  */
object SubstringQueries {

  private val L = SubstringDedup.DefaultL // 40-char windows

  /** The kernel's positional-sum hash, verbatim: Σ c_{i+j}·B^{L-1-j}
    * mod p for two (B, p) pairs, packed h1·2^31 + h2. Powers are
    * inlined literals (double `pow` would lose exactness). */
  private def polyHash: String = {
    import SubstringDedup.{B1, P1, B2, P2, modpow}
    def powList(b: Long, p: Long): String =
      (0 until L).map(j => modpow(b, L - 1 - j, p)).mkString("[", ", ", "]")
    def leg(b: Long, p: Long): String =
      s"""(CAST(list_sum(list_transform(range(0, $L),
         |    j -> CAST(unicode(substr(text, CAST(u.i + j AS INT), 1)) AS BIGINT)
         |         * (${powList(b, p)})[j + 1])) AS BIGINT) % $p)""".stripMargin
    s"${leg(B1, P1)} * 2147483648 + ${leg(B2, P2)}"
  }

  /** Shared oracle prefix: windows → duplicated windows → non-keeper
    * occurrences → maximal spans. [[spanChainFor]] emits the CTE chain
    * WITHOUT the WITH keyword over an arbitrary (doc_id, text)
    * relation so composed-pipeline oracles (text_prep_pipeline2) can
    * run the same span algebra over an intermediate stage; the
    * standalone entries prepend WITH over `documents`. */
  private def spanCte: String = "WITH " + spanChainFor("documents")

  private[queries] def spanChainFor(rel: String): String =
    s"""docs AS MATERIALIZED (
       |  SELECT doc_id, text FROM $rel WHERE length(text) >= $L),
       |w AS MATERIALIZED (
       |  SELECT doc_id, CAST(u.i AS INT) AS pos,
       |         $polyHash AS g
       |  FROM docs, unnest(range(1, length(text) - ${L - 2})) AS u(i)),
       |dup AS (
       |  SELECT g, min(doc_id * 268435456 + pos) AS keeper_key
       |  FROM w GROUP BY g HAVING count(*) >= 2),
       |removed AS (
       |  SELECT w.doc_id, w.pos
       |  FROM w JOIN dup USING (g)
       |  WHERE w.doc_id * 268435456 + w.pos <> dup.keeper_key),
       |brk AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) + $L
       |              THEN 1 ELSE 0 END AS b
       |  FROM removed),
       |isl AS (
       |  SELECT doc_id, pos,
       |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM brk),
       |spans AS MATERIALIZED (
       |  SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |         CAST(max(pos) - min(pos) + $L AS INT) AS span_len,
       |         CAST(count(*) AS BIGINT) AS n_windows
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  /** Gap-complement rebuild of scrubbed text (references the `docs` +
    * `spans` CTEs of [[spanChainFor]]); shared with the composed
    * pipeline oracle. */
  private[queries] val rebuiltChain: String =
    """gaps AS (
      |  SELECT doc_id,
      |         coalesce(lag(span_start + span_len)
      |                    OVER (PARTITION BY doc_id ORDER BY span_start),
      |                  1) AS gap_start,
      |         span_start AS gap_end
      |  FROM spans
      |  UNION ALL
      |  SELECT s.doc_id, max(s.span_start + s.span_len),
      |         max(length(d.text)) + 1
      |  FROM spans s JOIN docs d USING (doc_id)
      |  GROUP BY s.doc_id),
      |rebuilt AS (
      |  SELECT g.doc_id,
      |         string_agg(substr(d.text, CAST(g.gap_start AS INT),
      |                           CAST(g.gap_end - g.gap_start AS INT)),
      |                    '' ORDER BY g.gap_start) AS new_text
      |  FROM gaps g JOIN docs d USING (doc_id)
      |  GROUP BY g.doc_id)""".stripMargin

  val entries: Seq[Q] = Seq(
    Q.sql("text_substring_dedup",
      env => SubstringDedup.removalSpans(env.spread(env.documents), "doc_id",
          "text", L) // single-row-group input: see Env.spread
        .orderBy($"doc_id", $"span_start"),
      s"""$spanCte
         |SELECT doc_id, span_start, span_len, n_windows
         |FROM spans ORDER BY doc_id, span_start""".stripMargin),

    Q.sql("text_substring_scrub",
      env => SubstringDedup.scrub(env.spread(env.documents), "doc_id", "text", L)
        .orderBy($"doc_id"),
      s"""$spanCte,
         |$rebuiltChain
         |SELECT r.doc_id, CAST(length(d.text) AS INT) AS orig_len,
         |       CAST(length(r.new_text) AS INT) AS kept_len, r.new_text
         |FROM rebuilt r JOIN docs d USING (doc_id)
         |ORDER BY r.doc_id""".stripMargin),

    Q.sql("text_substring_stats",
      env => SubstringDedup.sourceStats(env.spread(env.documents), "doc_id", "text",
          "source", L)
        .orderBy($"source"),
      s"""$spanCte,
         |per_doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |         CAST(sum(span_len) AS BIGINT) AS dup_chars
         |  FROM spans GROUP BY doc_id)
         |SELECT d.source,
         |       CAST(count(p.n_spans) AS BIGINT) AS docs_affected,
         |       CAST(coalesce(sum(p.n_spans), 0) AS BIGINT) AS n_spans,
         |       CAST(coalesce(sum(p.dup_chars), 0) AS BIGINT) AS dup_chars,
         |       CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
         |       round(CAST(coalesce(sum(p.dup_chars), 0) AS DOUBLE)
         |             / sum(length(d.text)), 6) AS dup_frac
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |GROUP BY d.source
         |ORDER BY d.source""".stripMargin)
  )
}
