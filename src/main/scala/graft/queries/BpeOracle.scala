package graft.queries

/** DuckDB oracle for the BPE tokenizer (llm.Bpe): the training loop and
  * the encode pass are UNROLLED as a chained-CTE pipeline (the
  * g16-peel / llm_substring_dedup technique — one CTE group per merge
  * rank, each free to use windows and aggregates, which a recursive CTE
  * would forbid).
  *
  * Per rank r the group mirrors one Bpe training step exactly:
  *   s/p — weighted adjacent-pair counts (every position, overlaps
  *         included, matching trainLocal's counting loop);
  *   b   — argmax with the (cnt DESC, lft, rgt) tie-break;
  *   e/m/g — per-position symbols with lead() pair matching;
  *   h/k — gaps-and-islands parity so a run of equal symbols merges
  *         left-to-right non-overlapping, exactly Bpe.mergePass
  *         ("aaa" + (a,a) → [aa, a]: only even offsets within a
  *         consecutive-match island start a merge);
  *   o/v — drop consumed positions, rebuild the symbol list in order.
  * A LEFT JOIN ON true against the 1-row argmax keeps the chain total
  * when a stage runs out of pairs (lft IS NULL → no hits → words pass
  * through unchanged), matching trainLocal's early-exhaustion.
  *
  * Because each training stage already rewrites EVERY distinct word with
  * the new merge, the final v{N} IS the encoded form of the whole vocab
  * under rank-ascending application — the encode oracle just joins it
  * back to word occurrences.
  */
object BpeOracle {

  /** Merge count for the oracled queries — small enough to keep the
    * unrolled SQL readable, large enough that merges chain into
    * multi-char tokens on the test corpus.
    */
  val NumMerges = 20

  private def stage(r: Int): String = {
    val prev = s"v${r - 1}"
    // v/b are MATERIALIZED: each is referenced twice (pair-count + symbol
    // explode; merge-match + final union), and an inlining engine would
    // otherwise double the expression tree per rank — 2^NumMerges blowup
    s"""s$r AS (
       |  SELECT syms[i] AS lft, syms[i + 1] AS rgt, freq
       |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM $prev)),
       |p$r AS (SELECT lft, rgt, sum(freq) AS cnt FROM s$r GROUP BY 1, 2),
       |b$r AS MATERIALIZED (
       |  SELECT lft, rgt FROM p$r ORDER BY cnt DESC, lft, rgt LIMIT 1),
       |e$r AS (
       |  SELECT word, freq, unnest(range(1, len(syms) + 1)) AS i,
       |         unnest(syms) AS sym
       |  FROM $prev),
       |m$r AS (
       |  SELECT e.word, e.freq, e.i, e.sym,
       |         lead(e.sym) OVER (PARTITION BY e.word ORDER BY e.i) AS nxt,
       |         b.lft, b.rgt
       |  FROM e$r e LEFT JOIN b$r b ON true),
       |g$r AS (
       |  SELECT *, coalesce(sym = lft AND nxt = rgt, false) AS hit FROM m$r),
       |h$r AS (
       |  SELECT *, CASE WHEN hit THEN i - row_number()
       |    OVER (PARTITION BY word, hit ORDER BY i) END AS isl
       |  FROM g$r),
       |k$r AS (
       |  SELECT *, hit AND (i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0
       |    AS mstart
       |  FROM h$r),
       |o$r AS (
       |  SELECT *, coalesce(lag(mstart) OVER (PARTITION BY word ORDER BY i),
       |    false) AS prevstart
       |  FROM k$r),
       |v$r AS MATERIALIZED (
       |  SELECT word, freq,
       |         list(CASE WHEN mstart THEN lft || rgt ELSE sym END ORDER BY i)
       |           AS syms
       |  FROM o$r WHERE NOT prevstart GROUP BY word, freq)""".stripMargin
  }

  /** Base + N unrolled training stages; ends at v$NumMerges. */
  private def chain(n: Int): String = {
    val base =
      s"""bw AS MATERIALIZED (
         |  SELECT doc_id, unnest(range(0, len(ws))) AS pos, unnest(ws) AS word
         |  FROM (SELECT doc_id,
         |          regexp_extract_all(lower(text), '[a-z]+') AS ws
         |        FROM documents)),
         |w0 AS (SELECT word, count(*) AS freq FROM bw GROUP BY 1),
         |v0 AS MATERIALIZED (
         |  SELECT word, freq, regexp_extract_all(word, '.') AS syms
         |  FROM w0)""".stripMargin
    (base +: (1 to n).map(stage)).mkString(",\n")
  }

  /** Oracle for llm_bpe_train: the merge table (merge_rank, lft, rgt). */
  def trainSql: String = {
    val rows = (1 to NumMerges)
      .map(r => s"SELECT CAST($r AS INT) AS merge_rank, lft, rgt FROM b$r")
      .mkString("\nUNION ALL ")
    s"WITH ${chain(NumMerges)}\n$rows"
  }

  /** Oracle for llm_bpe_encode: per-doc token count + encoded text. */
  def encodeSql: String =
    s"""WITH ${chain(NumMerges)},
       |enc AS (
       |  SELECT o.doc_id, o.pos, len(v.syms) AS n,
       |         array_to_string(v.syms, ' ') AS wtxt
       |  FROM bw o JOIN v$NumMerges v USING (word)),
       |agg AS (
       |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bpe_tokens,
       |         string_agg(wtxt, ' ' ORDER BY pos) AS bpe_text
       |  FROM enc GROUP BY 1)
       |SELECT d.doc_id,
       |       coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
       |       coalesce(a.bpe_text, '') AS bpe_text
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
}
