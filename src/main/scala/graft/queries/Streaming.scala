package graft.queries

import org.apache.spark.sql.functions._
import graft.GQ
import graft.core.Tables
import graft.streaming.EventStreams

/** Streaming surface exposed through the driver contract. Two layers:
  *  - `q24_session_window`: session windows in BATCH mode (Spark's
  *    unified API — same operator the stream runs), oracled in DuckDB
  *    with a gaps-and-islands rewrite;
  *  - `stream_hourly_counts`: a REAL Structured Streaming run (file
  *    source → watermark → tumbling window → memory sink, complete mode),
  *    oracled with the same SQL as the equivalent batch query — streaming
  *    and batch must converge on finite input.
  */
object Streaming {

  /** Run a streaming query body with a bounded state-partition count.
    * Streaming state cost scales with the shuffle-partition count bound
    * into the query at start (one state store per partition per stateful
    * operator), and unlike batch shuffles AQE never coalesces it — at
    * test scale 32 near-empty state stores are pure overhead, and on a
    * real cluster the partition count should be sized to state volume,
    * not inherited from the batch default. Restores the session setting
    * afterwards so batch plans are unaffected.
    */
  private def withStreamPartitions[A](s: org.apache.spark.sql.SparkSession,
      n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Run a streaming DataFrame to completion into a named memory sink
    * and return the sink table — the shared protocol of every streaming
    * driver query (8 state partitions, processAllAvailable, stop).
    */
  private[queries] def runToMemory(s: org.apache.spark.sql.SparkSession,
      name: String, mode: String)(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    withStreamPartitions(s, 8) {
      // memory-sink checkpoints are ephemeral scratch (dead once the
      // query stops) — put them on the pooled tmpfs root instead of
      // paying per-micro-batch WAL/state fsyncs to disk; the durable
      // stream_file_sink query keeps its checkpoint on real disk
      graft.core.Scratch.withStreamCheckpoint(s"graft-ckpt-$name-") { ck =>
        val q = df.writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ck)
          .outputMode(mode).start()
        try { q.processAllAvailable() } finally { q.stop() }
        s.table(name)
      }
    }

  /** q72's exact-integer MAD fence in DuckDB — shared by the batch
    * query's streaming twin and its update-mode changelog twin (both
    * legs must land on the SAME rows, so one SQL source pins
    * changelog-fold ≡ complete ≡ batch ≡ SQL in one hash).
    */
  private val madOracle: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS val_cents
      |  FROM events GROUP BY 1),
      |m AS (SELECT CAST(quantile_cont(2 * val_cents, 0.5)
      |  AS BIGINT) AS med2x FROM daily),
      |d AS (SELECT day, val_cents,
      |    abs(2 * val_cents - med2x) AS dev2x
      |  FROM daily, m),
      |md AS (SELECT CAST(quantile_cont(2 * dev2x, 0.5) AS BIGINT)
      |  AS mad2x2 FROM d)
      |SELECT day, val_cents,
      |  CAST((2000000 * dev2x) // mad2x2 AS BIGINT) AS score_micro,
      |  CAST(CASE WHEN (2000000 * dev2x) // mad2x2 >= 3500000
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      |FROM d, md""".stripMargin

  val queries: Seq[GQ] = Seq(

    GQ("q24_session_window",
      (s, dir) => {
        val ev = Tables(s, dir).events
        ev.groupBy(session_window(col("ts"), "30 minutes").as("w"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 4).as("total_value"))
          .select(col("user_id"), col("w.start").as("session_start"),
            col("w.end").as("session_end"), col("n_events"),
            col("total_value"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
             |    THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |  ROWS UNBOUNDED PRECEDING) AS sid FROM o)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL '30 minutes' AS session_end,
             |  count(*) AS n_events, round(sum(value), 4) AS total_value
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    GQ("stream_hourly_counts",
      (s, dir) => runToMemory(s, "graft_stream_hourly", "complete")(
        EventStreams.hourlyCounts(
          EventStreams.readEvents(s, s"$dir/events.parquet"))),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
             |count(*) AS n_events, round(sum(value), 4) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // REAL streaming dedup (dropDuplicatesWithinWatermark). The events
    // table has unique event_ids, so the contract here is exactness:
    // dedup of an already-unique stream must return the input verbatim
    // (the dup-dropping half is pinned by StreamingSpec's planted-dup
    // MemoryStream test — a file source can't plant dups without
    // synthesizing input data)
    GQ("stream_dedup",
      (s, dir) => runToMemory(s, "graft_stream_dedup", "append")(
        EventStreams.dedupEvents(
            EventStreams.readEvents(s, s"$dir/events.parquet"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            round(col("value"), 4).as("value"))),
      Some("""SELECT event_id, user_id, event_type, round(value, 4) AS value
             |FROM events""".stripMargin)),

    // REAL stream-static enrichment join: the stream joined against the
    // static customer dimension (planned per micro-batch, zero streaming
    // state for the join itself) feeding a complete-mode aggregation
    GQ("stream_static_enrich",
      (s, dir) => runToMemory(s, "graft_stream_enrich", "complete")(
        EventStreams.enrichedSegmentTotals(
          EventStreams.readEvents(s, s"$dir/events.parquet"),
          Tables(s, dir).customer)),
      Some("""SELECT c.c_mktsegment, e.event_type,
             |count(*) AS n_events, round(sum(e.value), 4) AS total_value
             |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2""".stripMargin)),

    // REAL stream-stream interval join (watermark-bounded state), oracled
    // with the equivalent batch inequality join
    GQ("stream_interval_join",
      (s, dir) => runToMemory(s, "graft_stream_ssjoin", "append")(
        EventStreams.purchaseClickJoin(
          EventStreams.readEvents(s, s"$dir/events.parquet"))),
      Some("""SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
             |  c.event_id AS c_id, c.ts AS c_ts
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 10 MINUTE
             |  AND c.ts <= p.ts""".stripMargin)),

    // REAL streaming corpus curation: the batch annotate stage (language
    // ID + quality scoring) running incrementally over a document file
    // stream, rolled up per predicted language — oracled with the same
    // SQL as the batch formulation (finite replay must converge)
    GQ("stream_corpus_stats",
      (s, dir) => runToMemory(s, "graft_stream_corpus", "complete")(
        EventStreams.corpusStats(
          EventStreams.readDocuments(s, s"$dir/documents.parquet"))),
      Some(s"""WITH sctok AS (
             |  SELECT doc_id, text,
             |    regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
             |  FROM documents),
             |scsc AS (
             |  SELECT doc_id, text,
             |${Llm.TextOracle.scoreCols}
             |  FROM sctok),
             |scann AS (
             |  SELECT ${Llm.TextOracle.langCase} AS lang_pred,
             |    ${Llm.TextOracle.qualityExpr("text")} AS quality
             |  FROM scsc)
             |SELECT lang_pred, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_high_quality
             |FROM scann GROUP BY 1""".stripMargin)),

    // REAL streaming count-min sketch: the q53 sketch built
    // INCREMENTALLY over the document file stream — a complete-mode
    // aggregation whose state is bounded BY CONSTRUCTION at
    // depth×width = 4096 integer cells whatever the corpus size (the
    // sketch cells are plain sums, so micro-batch increments merge
    // into exactly the batch sketch — CMS's mergeability is the whole
    // reason it exists at ingest). The probe leg then reads the
    // STREAMED sketch; the oracle is q53's verbatim, so streamed ≡
    // batch ≡ SQL pins in one hash.
    GQ("stream_heavy_hitters",
      (s, dir) => {
        import graft.operators.CountMin
        val sk = runToMemory(s, "graft_stream_cms", "complete")(
          CountMin.sketch(CountMin.tokens(
            EventStreams.readDocuments(s, s"$dir/documents.parquet"))))
        val top = CountMin.tokens(Tables(s, dir).documents)
          .groupBy("tok").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("tok").asc).limit(20)
        CountMin.estimates(top, sk)
      },
      Some(Relational.CmsOracle.sql)),

    // REAL streaming HyperLogLog: q57's 256-register distinct sketch
    // built INCREMENTALLY over the event file stream — a complete-mode
    // max aggregation whose state is bounded BY CONSTRUCTION at 256
    // rows whatever the stream length (register maxima are MERGEABLE,
    // so micro-batch increments converge on exactly the batch sketch —
    // cardinality monitoring at ingest for the cost of 256 longs).
    // The estimate leg reads the STREAMED registers; the oracle is
    // q57's single-leg replay, so streamed ≡ batch ≡ SQL pins in one
    // hash — including the approximate estimate itself.
    GQ("stream_hll_distinct",
      (s, dir) => {
        import graft.operators.HyperLogLog
        val regs = runToMemory(s, "graft_stream_hll", "complete")(
          HyperLogLog.sketch(
            EventStreams.readEvents(s, s"$dir/events.parquet")
              .select(col("event_id").cast("string").as("k")),
            col("k")))
        Tables(s, dir).events.agg(countDistinct(col("event_id")).as("n_exact"))
          .crossJoin(HyperLogLog.estimate(regs))
          .select(lit("event_id").as("key_name"), col("n_exact"),
            col("n_est"))
      },
      Some(Relational.HllOracle.leg("event_id", "events", "event_id"))),

    // stream_hll_distinct's UPDATE-MODE twin — the 100 TB emission
    // story: complete mode re-feeds all 256 registers to the sink every
    // trigger; update mode emits ONLY the registers a micro-batch
    // actually raised (a changelog), and because register maxima are
    // MONOTONE the downstream fold that reconstructs current state is
    // simply max-per-bucket over the changelog. The single-file events
    // table is staged as 4 chunk files throttled to one per trigger so
    // several triggers genuinely fire in the driver run (one big batch
    // would make update ≡ complete vacuously; round 17 — before
    // chunkedStage existed, the single file meant one trigger and the
    // multi-trigger contract lived only in StreamingSpec); the
    // estimate leg then reads the FOLDED changelog, and the oracle is
    // the same single-leg replay as the complete-mode twin — so
    // changelog-fold ≡ complete ≡ batch ≡ SQL pins in one hash.
    // StreamingSpec additionally pins the emission-volume contract
    // (later triggers emit strictly fewer rows than the full register
    // set) on a controlled MemoryStream.
    GQ("stream_hll_update",
      (s, dir) => {
        import graft.operators.HyperLogLog
        val changelog = runToMemory(s, "graft_stream_hllu", "update")(
          HyperLogLog.sketch(
            EventStreams.readEvents(s, s"$dir/events.parquet",
              maxFilesPerTrigger = Some(1), chunks = 4),
            col("event_id").cast("string")))
        val regs = changelog.groupBy("bucket").agg(max(col("r")).as("r"))
        Tables(s, dir).events.agg(countDistinct(col("event_id")).as("n_exact"))
          .crossJoin(HyperLogLog.estimate(regs))
          .select(lit("event_id").as("key_name"), col("n_exact"),
            col("n_est"))
      },
      Some(Relational.HllOracle.leg("event_id", "events", "event_id"))),

    // stream_heavy_hitters' UPDATE-MODE twin (the second member of the
    // changelog-emission family, after stream_hll_update): CMS cells are
    // plain sums, MONOTONE NONDECREASING under accumulation, and update
    // mode emits each touched cell's new TOTAL — so the downstream fold
    // that reconstructs current state is max-per-cell over the changelog,
    // exactly the HLL register discipline. Unlike the HLL twin (whose
    // multi-trigger volume contract is spec-pinned on a MemoryStream),
    // this one multi-triggers IN THE DRIVER RUN ITSELF: the single-file
    // documents table is staged as 4 chunk files and throttled to one
    // file per trigger, so 4 genuine update-mode emissions fold back into
    // the batch sketch. The probe leg and oracle are q53's verbatim —
    // changelog-fold ≡ complete ≡ batch ≡ SQL pins in one hash.
    GQ("stream_cms_update",
      (s, dir) => {
        import graft.operators.CountMin
        val changelog = runToMemory(s, "graft_stream_cmsu", "update")(
          CountMin.sketch(CountMin.tokens(
            EventStreams.readDocuments(s, s"$dir/documents.parquet",
              maxFilesPerTrigger = Some(1), chunks = 4))))
        val sk = changelog.groupBy("j", "bucket")
          .agg(max(col("cnt")).as("cnt"))
        val top = CountMin.tokens(Tables(s, dir).documents)
          .groupBy("tok").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("tok").asc).limit(20)
        CountMin.estimates(top, sk)
      },
      Some(Relational.CmsOracle.sql)),

    // REAL streaming quantile sketch: a fixed-grid histogram (512 unit
    // bins over the value domain) maintained as a complete-mode count
    // aggregation — state bounded BY CONSTRUCTION at 512 integer cells,
    // and bin counts are plain sums, so micro-batch increments merge
    // into exactly the batch histogram. Quantiles then read off the
    // cumulative bin counts with a pure-integer threshold
    // ceil(pct·n/100) — the window below runs over ≤512 register rows
    // (bounded by construction, never the stream), so no corpus-scale
    // single-partition window forms. The oracle recomputes the same
    // bins from the raw table: streamed ≡ batch ≡ SQL in one hash —
    // p50/p90/p99 monitoring at ingest for the cost of 512 longs.
    GQ("stream_quantile_sketch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val regs = runToMemory(s, "graft_stream_qsk", "complete")(
          EventStreams.readEvents(s, s"$dir/events.parquet")
            .select(least(greatest(floor(col("value")), lit(0)), lit(511))
              .cast("int").as("bin"))
            .groupBy("bin").agg(count(lit(1)).as("cnt")))
        val cum = regs.withColumn("cum",
          sum(col("cnt")).over(Window.orderBy(col("bin"))))
        val n = regs.agg(sum(col("cnt")).as("n_total"))
        val qs = s.range(0).sparkSession.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(50), org.apache.spark.sql.Row(90),
            org.apache.spark.sql.Row(99)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("pct",
              org.apache.spark.sql.types.IntegerType))))
        qs.crossJoin(broadcast(n))
          .join(cum, col("cum") >= expr("(pct * n_total + 99) div 100"))
          .groupBy(col("pct"), col("n_total"))
          .agg(min(col("bin")).as("bin_est"))
          .select(col("pct"), col("n_total"), col("bin_est"))
      },
      Some("""WITH qb AS (
             |  SELECT CAST(least(greatest(floor(value), 0), 511) AS INT)
             |    AS bin
             |  FROM events),
             |qr AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt
             |  FROM qb GROUP BY 1),
             |qc AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum
             |  FROM qr),
             |qn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qb),
             |qq(pct) AS (SELECT * FROM (VALUES (50), (90), (99)) v(pct))
             |SELECT CAST(q.pct AS INT) AS pct, qn.n AS n_total,
             |  CAST(min(c.bin) AS INT) AS bin_est
             |FROM qq q CROSS JOIN qn
             |JOIN qc c ON c.cum >= (q.pct * qn.n + 99) // 100
             |GROUP BY 1, 2""".stripMargin)),

    // Streaming twin of q72_anomaly_mad: the per-day value totals are
    // maintained as complete-mode streaming state (bounded BY the time
    // range — one row per day, the canonical monitoring state), then
    // the median/MAD fences read off the finished day table exactly as
    // the batch query does. Same exact integer ×2-domain arithmetic,
    // so streamed ≡ batch ≡ SQL in one hash — "is today anomalous?"
    // at ingest for the cost of one long per day.
    GQ("stream_anomaly_mad",
      (s, dir) => {
        val daily = runToMemory(s, "graft_stream_mad", "complete")(
          EventStreams.readEvents(s, s"$dir/events.parquet")
            .select(date_format(to_date(col("ts")), "yyyy-MM-dd")
                .as("day"),
              round(col("value") * 100).cast("long").as("vc"))
            .groupBy("day").agg(sum(col("vc")).as("val_cents")))
        EventStreams.madScores(daily)
      },
      Some(madOracle)),

    // stream_anomaly_mad's UPDATE-MODE twin — 4th member of the
    // changelog-emission family, and the first with RETRACTIONS: the
    // MAD fence is a global percentile, so a new day can LOWER existing
    // days' scores — per-key state is NON-MONOTONE and no max-style
    // fold over raw emissions reconstructs it. The changelog therefore
    // carries a trigger sequence (`seq` = micro-batch id) and emits a
    // day iff its (val_cents, score_micro, is_outlier) tuple changed —
    // downward revisions included — and the fold is argmax-by-seq per
    // day (latest write wins: the GENERAL changelog fold that subsumes
    // the monotone families' max folds). Events staged as 4 chunk
    // files, one per trigger, so the driver run itself fires several
    // genuine revisions; q72's oracle verbatim — changelog-fold ≡
    // complete ≡ batch ≡ SQL in one hash. StreamingSpec pins the
    // retraction (a planted median-moving batch revises a day's score
    // DOWN) and the volume contract (untouched-tuple days stay silent).
    GQ("stream_mad_update",
      (s, dir) => {
        val changelog = withStreamPartitions(s, 8) {
          EventStreams.anomalyScoreChangelog(s,
            EventStreams.readEvents(s, s"$dir/events.parquet",
              maxFilesPerTrigger = Some(1), chunks = 4))
        }
        changelog.groupBy("day")
          .agg(max(struct(col("seq"), col("val_cents"),
            col("score_micro"), col("is_outlier"))).as("m"))
          .select(col("day"), col("m.val_cents").as("val_cents"),
            col("m.score_micro").as("score_micro"),
            col("m.is_outlier").as("is_outlier"))
      },
      Some(madOracle)),

    // REAL durable streaming sink: file source → stateful dedup →
    // PARQUET sink with a checkpoint (exactly-once via the sink's commit
    // log + source offset tracking — the shape every production pipeline
    // lands on, where memory sinks are test-only). Fresh output/
    // checkpoint dirs per invocation keep replays deterministic; the
    // exactly-once-across-restarts contract itself is pinned by
    // StreamingSpec's add-files-and-restart test, which a single driver
    // run can't exercise.
    GQ("stream_file_sink",
      (s, dir) => withStreamPartitions(s, 8) {
        val out = java.nio.file.Files
          .createTempDirectory("graft-file-sink-").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-file-sink-ckpt-").toString
        val q = EventStreams.dedupEvents(
            EventStreams.readEvents(s, s"$dir/events.parquet"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            round(col("value"), 4).as("value"))
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        try { q.processAllAvailable() } finally { q.stop() }
        s.read.parquet(out)
      },
      Some("""SELECT event_id, user_id, event_type, round(value, 4) AS value
             |FROM events""".stripMargin)),

    // Spark 4 transformWithState as a REAL stream, hash-oracled: the
    // custom sessionizer emits CLOSED sessions only (a 30-min silence
    // gap closes one; each user's final session stays open in state), so
    // the oracle is the gaps-and-islands rewrite MINUS each user's last
    // island. total_value stays out of the contract: the fold sums
    // doubles in ts order, DuckDB in scan order — integer fields only.
    // TWS requires the RocksDB state store; the conf is scoped to this
    // query and restored.
    GQ("stream_sessions_tws",
      (s, dir) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
        try {
          import s.implicits._
          runToMemory(s, "graft_stream_tws", "append")(
            EventStreams.sessionizeTws(
              EventStreams.readEvents(s, s"$dir/events.parquet")
                .select(col("ts"), col("user_id"), col("value"))
                .as[EventStreams.Ev]).toDF()
              .select(col("user_id"), col("session_start"),
                col("session_end"), col("n_events")))
        } finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
             |    THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |si AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |  ROWS UNBOUNDED PRECEDING) AS sid FROM o),
             |g AS (SELECT user_id, sid, min(ts) AS session_start,
             |  max(ts) AS session_end, count(*) AS n_events
             |  FROM si GROUP BY user_id, sid)
             |SELECT user_id, session_start, session_end, n_events
             |FROM g QUALIFY sid < max(sid) OVER (PARTITION BY user_id)""".stripMargin)),

    // REAL stream-stream LEFT OUTER interval join: unmatched purchases
    // emit sentinel-extended (c_id −1, c_ts epoch — NULLs never
    // hash-compare) once the global watermark proves no click can still
    // match. The oracle encodes the exact finite-replay flush boundary:
    // unmatched rows appear iff p_ts < min(max p_ts, max c_ts) − 1 h
    // (the terminal no-data batch's watermark); StreamingSpec pins the
    // same boundary against the batch join.
    GQ("stream_outer_interval_join",
      (s, dir) => runToMemory(s, "graft_stream_ssouter", "append")(
        EventStreams.purchaseClickOuterJoin(
          EventStreams.readEvents(s, s"$dir/events.parquet"))),
      Some("""WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
             |          FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
             |      FROM events WHERE event_type = 'click'),
             |wm AS (SELECT least((SELECT max(p_ts) FROM p),
             |                    (SELECT max(c_ts) FROM c))
             |              - INTERVAL 1 HOUR AS w),
             |pj AS (
             |  SELECT p.p_id, p.user_id, p.p_ts, c.c_id, c.c_ts
             |  FROM p LEFT JOIN c
             |    ON c.c_user = p.user_id
             |    AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
             |    AND c.c_ts <= p.p_ts)
             |SELECT p_id, user_id, p_ts,
             |  coalesce(c_id, -1) AS c_id,
             |  coalesce(c_ts, TIMESTAMP '1970-01-01') AS c_ts
             |FROM pj
             |WHERE c_id IS NOT NULL OR p_ts < (SELECT w FROM wm)""".stripMargin)),

    // REAL streaming near-dup at ingest: MinHash+LSH with per-band bucket
    // state (transformWithState ListState), verifying exact Jaccard
    // in-state as documents arrive. Oracled with the SAME shared CTE
    // chain as the batch llm_minhash_neardup (finite replay ≡ batch —
    // same signatures, buckets, and verification arithmetic), at the
    // same 0.3 driver threshold. RocksDB provider scoped like the TWS
    // sessionizer.
    GQ("stream_minhash_neardup",
      (s, dir) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
        try {
          runToMemory(s, "graft_stream_neardup", "append")(
            graft.streaming.StreamingDedup.nearDupPairs(
              EventStreams.readDocuments(s, s"$dir/documents.parquet"),
              w = 3, k = 32, bands = 8, minJaccard = 0.3))
        } finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
      },
      Some(s"""WITH RECURSIVE ${Llm.minhashCtes("documents")}
             |SELECT id_a, id_b, jaccard FROM mver
             |WHERE jaccard >= 0.3""".stripMargin)),

    // Streaming graph maintenance: the reference's growing-slice feed
    // (standalone.txt:1-11) as a live file-source stream, one CSV per
    // micro-batch, MERGEd into the running graph via foreachBatch +
    // EdgeListIngest.appendRaw. The oracle is the SAME from-scratch
    // rebuild SQL as g27_append_graph, so streamed maintenance ≡ batch
    // append ≡ full re-import is checked end to end by one hash.
    GQ("stream_graph_append",
      (s, _) => withStreamPartitions(s, 8) {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-graph-stream")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(Graph.DefaultEdgeList),
          dir.resolve("0001.csv"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(Graph.Slice2EdgeList),
          dir.resolve("0002.csv"))
        Graph.appendSummary(
          graft.streaming.GraphStreams.maintainFromFiles(s, dir.toString))
      },
      Some(Graph.AppendOracleSql)),

    // Streaming vector-index ingest: the IVF coarse quantizer is
    // trained on the batch bootstrap (seeds16 → assign → one k-means
    // refine — the llm_ann_ivf recipe) and FROZEN; the embedding stream
    // then assigns each arriving vector to its bucket map-side (the
    // same native argmax expression, stateless — no shuffle, no state
    // store). Static quantizer + incremental postings is how IVF
    // services stay fresh without rebuild storms; the oracle replays
    // quantizer training AND every stream assignment in SQL, and
    // StreamingSpec pins stream ≡ batch assignment exactly.
    GQ("stream_ann_ingest",
      (s, dir) => {
        import graft.llm.Similarity
        val emb = Tables(s, dir).embeddings
        val refined = Similarity.kmeansRefine(s,
          Similarity.assignToCentroids(emb,
            Similarity.seedCentroids(emb, 16)))
        val cents = refined.select(col("c_id"), col("c_vec")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
        runToMemory(s, "graft_stream_ann", "append")(
          graft.streaming.VectorStreams.assignAtIngest(
            graft.streaming.VectorStreams.readEmbeddings(
              s, s"$dir/embeddings.parquet"), cents))
      },
      Some(s"""WITH ${Llm.KmOracle.seeds(16)},
             |${Llm.KmOracle.assign("seeds", "st_asg0")},
             |${Llm.KmOracle.refine("st_asg0", "st_ref1")},
             |${Llm.KmOracle.assign("st_ref1", "st_asgF")}
             |SELECT vec_id, centroid_id FROM st_asgF""".stripMargin)),

    // Streaming model serving: the Rocchio quality filter is trained on
    // the batch corpus (the llm_quality_classifier contract, weights +
    // threshold frozen) and arriving documents are scored map-side by
    // folding their tokens against the broadcast weight table — no
    // explode, no shuffle, no state store. The oracle is the SAME
    // chained-CTE replay as llm_quality_classifier: token fold ≡
    // feature join by commutativity of Long addition, so one SQL pins
    // training AND ingest-time scoring together.
    GQ("stream_quality_score",
      (s, dir) => {
        import graft.llm.{QualityClassifier, TextAnalysis}
        val labelExpr = when(
          TextAnalysis.qualityScore(col("text")) >= 0.6, 1L).otherwise(0L)
        val model = QualityClassifier.trainModel(
          Tables(s, dir).documents.select(col("doc_id"),
            labelExpr.as("label"), col("text")),
          buckets = Llm.ClassifierOracle.NumBuckets,
          epochs = Llm.ClassifierOracle.NumEpochs)
        runToMemory(s, "graft_stream_qscore", "append")(
          graft.streaming.ModelServing.scoreDocuments(
            EventStreams.readDocuments(s, s"$dir/documents.parquet"),
            model, labelExpr))
      },
      Some(Llm.ClassifierOracle.sql))
  )
}
