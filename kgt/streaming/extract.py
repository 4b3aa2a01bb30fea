"""Streaming triple extraction.

The north rule requires batch with checkpoint/resume (kgt.spark.lineage)
— these operators are the streaming-native complement for transcript
feeds that arrive continuously:

  * ``foreach_batch_extract`` — micro-batch reuse of the exact batch
    pipeline via foreachBatch: every micro-batch is reassembled, parsed
    and appended. Correct when a conversation's turns land in one
    micro-batch (bulk backfills, availableNow runs over complete files).

  * ``stateful_extract`` — a custom stateful operator
    (applyInPandasWithState): turns buffer in per-conversation state
    until the conversation goes quiet for ``gap_seconds`` (processing-
    time timeout), then the buffered document parses and its triples
    emit. Correct for out-of-order, multi-batch conversations; state is
    bounded by active conversations only.

Both write the same T/E row shape as kgt.spark.parse.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgt.spark.parse import TRIPLES_SCHEMA, parse_documents
from kgt.turtle.batch import parse_batch

STATE_SCHEMA = "turn_idx array<int>, text array<string>"


def foreach_batch_extract(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    parse_options: dict | None = None,
    trigger_available_now: bool = True,
):
    """readStream transcripts → per-micro-batch extraction → parquet
    sink. Returns the started StreamingQuery.

    Idempotent under foreachBatch's at-least-once contract: each epoch
    OVERWRITES its own epoch-keyed partition directory, so a micro-
    batch replayed after a crash between sink write and checkpoint
    commit rewrites the same files instead of appending duplicates
    (round-6 review find — plain append duplicated the epoch).
    Readers scan ``{out_dir}/stream_triples`` recursively; the
    ``epoch=N`` level is partition metadata only."""
    opts = dict(parse_options or {})

    def process(batch_df: DataFrame, epoch_id: int):
        from kgt.spark.parse import extract_triples

        extract_triples(batch_df, **opts).write.mode("overwrite").parquet(
            f"{out_dir}/stream_triples/epoch={epoch_id}"
        )

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_session_counts(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Watermarked session-window aggregation over an event stream —
    the built-in-operator counterpart of the batch sessionize query
    (late rows beyond the watermark drop; sessions close after `gap`).
    Returns the started query (availableNow drains existing files).

    DRAIN HORIZON caveat (append mode semantics, not a bug in this
    wrapper): a session only EMITS once the watermark passes its end,
    so an availableNow drain over a finite backlog withholds every
    session within ``watermark`` (+gap) of the max event time — they
    stay in state for the next run. A one-shot backfill that must
    flush everything appends a far-future sentinel event per key (the
    agreement test does exactly this) or runs a final batch pass over
    the tail."""
    agg = (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
    )


def _stateful_fn(parse_options: dict, gap_seconds: int):
    def fn(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idx, texts = state.get
            state.remove()
            ordered = [t for _, t in sorted(zip(turn_idx, texts))]
            cols = parse_batch([conv_id], ["\n".join(ordered)], **parse_options)
            yield pd.DataFrame(cols)
            return
        new_idx: list = []
        new_txt: list = []
        for pdf in pdf_iter:
            new_idx.extend(int(i) for i in pdf["turn_idx"])
            new_txt.extend("" if t is None else t for t in pdf["text"])
        if state.exists:
            old_idx, old_txt = state.get
            new_idx = list(old_idx) + new_idx
            new_txt = list(old_txt) + new_txt
        state.update((new_idx, new_txt))
        state.setTimeoutDuration(gap_seconds * 1000)
        return
        yield  # pragma: no cover — make fn a generator on all paths

    return fn


def stateful_extract(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 60,
    parse_options: dict | None = None,
):
    """Custom stateful operator: conversations buffer until quiet for
    ``gap_seconds``, then parse+emit (applyInPandasWithState, processing-
    time timeout). Returns the started StreamingQuery."""
    opts = dict(parse_options or {})
    out = (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            _stateful_fn(opts, gap_seconds),
            outputStructType=TRIPLES_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    return (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", f"{out_dir}/stream_triples")
        .start()
    )


DEDUP_STATE_SCHEMA = "first_doc_id long, n_seen long"
DEDUP_SCHEMA = (
    "doc_id long, fingerprint string, is_duplicate boolean, "
    "dup_of long, n_seen long"
)


def _dedup_fn(ttl_seconds: int):
    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # fingerprint idle past the TTL: retire its state. Memory
            # stays bounded by ACTIVE fingerprints; a duplicate arriving
            # after the TTL re-registers as an original (the documented
            # at-most-TTL dedup horizon every streaming dedup has).
            state.remove()
            return
        rows = []
        if state.exists:
            first_id, n_seen = state.get
        else:
            first_id, n_seen = None, 0
        (fp,) = key
        # Drain ALL pandas chunks for this key before sorting: Arrow may
        # split one fingerprint group across chunks, and a per-chunk sort
        # would make first_id depend on batch boundaries (non-determinism
        # flagged in round-4 ADVICE). One sort over the union restores
        # "ties break by doc_id" regardless of chunking.
        batch_ids = sorted(
            int(d) for pdf in pdf_iter for d in pdf["doc_id"]
        )
        for doc_id in batch_ids:
            n_seen += 1
            if first_id is None:
                first_id = doc_id
                rows.append((doc_id, fp, False, None, n_seen))
            else:
                rows.append((doc_id, fp, True, first_id, n_seen))
        state.update((first_id, n_seen))
        state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "fingerprint", "is_duplicate", "dup_of", "n_seen",
            ],
        )

    return fn


def streaming_dedup(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ttl_seconds: int = 3600,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Streaming EXACT dedup — the continuous-ingest twin of
    kgt.textops.dedup.exact_duplicates for a training-data feed.

    The content fingerprint (md5 of whitespace-normalized lowercased
    text — the same normalization as the batch operator, computed
    JVM-side) keys an applyInPandasWithState operator: the first
    arrival of a fingerprint emits ``is_duplicate=false``, every later
    arrival emits ``is_duplicate=true, dup_of=<first doc_id>``.
    Per-fingerprint state is two longs and retires after
    ``ttl_seconds`` of inactivity (processing-time timeout), so state
    is bounded by fingerprints ACTIVE within the TTL window, not by
    corpus size — the property that lets this run forever at ingest
    scale. Within a micro-batch, arrival order ties break by doc_id so
    reruns are deterministic.

    Returns the started StreamingQuery (parquet sink, append mode).
    """
    from kgt.textops.dedup import normalize_text

    # the SHARED normalization (not a copy): any future change to the
    # batch operator's normalize_text keeps streaming fingerprints in
    # lockstep with exact_duplicates'
    fp = F.md5(normalize_text(F.col(text_col)))
    out = (
        stream_df.select(F.col("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn(ttl_seconds),
            outputStructType=DEDUP_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    writer = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", f"{out_dir}/stream_dedup")
    )
    # rows emit on ARRIVAL (the TTL timeout only retires state), so an
    # availableNow run drains the backlog and terminates — unlike
    # stateful_extract, whose emissions require the timeout to fire
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


NEARDUP_STATE_SCHEMA = "doc_ids array<long>, saturated boolean"
NEARDUP_SCHEMA = "band int, minhash string, doc_a long, doc_b long"


def _near_dup_fn(ttl_seconds: int, bucket_cap: int):
    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # bucket idle past the TTL: retire it. A near-dup arriving
            # after the TTL pairs only with bucket-mates seen since —
            # the at-most-TTL dedup horizon, same as streaming_dedup.
            state.remove()
            return
        band, mh = key
        if state.exists:
            ids_raw, saturated = state.get
            ids = list(ids_raw)
        else:
            ids, saturated = [], False
        known = set(ids)
        # drain ALL chunks before sorting (Arrow may split one bucket
        # across chunks) so emission order/pairing is chunk-invariant
        new_ids = sorted(
            {int(d) for pdf in pdf_iter for d in pdf["doc_id"]} - known
        )
        rows = []
        for nid in new_ids:
            if saturated or len(ids) >= bucket_cap:
                # degenerate bucket (boilerplate band-key): stop
                # pairing AND stop growing state — the O(cap²) bound
                # that keeps one hot bucket from going quadratic,
                # mirroring simhash_near_pairs' bucket quarantine
                saturated = True
                break
            for p in ids:
                rows.append(
                    (int(band), mh, min(p, nid), max(p, nid))
                )
            ids.append(nid)
        state.update((ids, saturated))
        state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            rows, columns=["band", "minhash", "doc_a", "doc_b"]
        )

    return fn


def streaming_near_dup(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ttl_seconds: int = 3600,
    text_col: str = "text",
    n_hashes: int = 32,
    rows_per_band: int = 4,
    bucket_cap: int = 10000,
    trigger_available_now: bool = True,
    fanout: int | None = None,
):
    """Streaming NEAR-dup — banded-MinHash LSH for a continuous
    training-data feed, the stateful twin of the batch
    ``minhash_signatures → lsh_candidate_pairs`` pipeline.

    Stage 1 (stateless projection): banded signatures computed row-
    wise (kgt.textops.dedup.banded_signatures_rowwise — bit-identical
    to the batch signatures, agreement-tested), one (band, band-key)
    row per band per doc.  Stage 2 (applyInPandasWithState keyed by
    the bucket): state is the sorted doc_id list of bucket members; a
    new member emits one candidate pair per existing member
    (doc_a < doc_b), so the union of emissions over time equals the
    batch self-join's pairs on the same corpus (pinned by test).

    Bounds, because a stream runs forever: per-bucket state retires
    after ``ttl_seconds`` idle (processing-time timeout — the dedup
    horizon), and a bucket reaching ``bucket_cap`` members saturates:
    it stops emitting and stops growing, turning the worst-case
    boilerplate bucket from O(n²) emissions into O(cap²).

    The same pair can emit from several agreeing bands (the batch path
    dedupes with one global distinct, which a stream cannot do without
    a second unbounded stateful stage) — downstream exact-verify is
    idempotent, and consumers wanting unique pairs take
    DISTINCT(doc_a, doc_b) over the sink.

    Returns the started StreamingQuery (parquet sink, append mode).
    """
    from kgt.textops.dedup import banded_signatures_rowwise

    # Fan the micro-batch out BEFORE the signature projection: a file
    # source batch has as many partitions as files in the trigger
    # (often ONE), and the md5-heavy shingle/minhash expressions are
    # the batch's dominant CPU cost — measured 11.7 s single-core vs
    # sub-second wide for a ~3k-doc batch at sf0.1. The added exchange
    # moves only (doc_id, text) rows; the stateful groupBy downstream
    # shuffles again anyway. Scale-adaptive: defaults to the cluster's
    # core count.
    if fanout is None:
        fanout = stream_df.sparkSession.sparkContext.defaultParallelism
    if fanout and fanout > 1:
        stream_df = stream_df.repartition(fanout)
    sigs = banded_signatures_rowwise(
        stream_df,
        text_col=text_col,
        n_hashes=n_hashes,
        rows_per_band=rows_per_band,
    )
    out = sigs.groupBy("band", "minhash").applyInPandasWithState(
        _near_dup_fn(ttl_seconds, bucket_cap),
        outputStructType=NEARDUP_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    writer = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", f"{out_dir}/stream_near_dup")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_streaming_query(
    query,
    timeout_seconds: int = 600,
    expected_data_batches: int | None = None,
) -> bool:
    """Stop a stateful streaming query once its source is exhausted.

    With ProcessingTimeTimeout state, the micro-batch engine keeps
    scheduling EMPTY batches to evaluate pending timeouts — even under
    trigger(availableNow=True) — so such a query never terminates on
    its own while any state holds a live TTL (observed: batch id
    climbing forever at numInputRows=0). Every emission happens in the
    batch that processes the data (timeouts only retire state), so the
    sink is complete once a data batch has been followed by empty
    batches: this waits for ≥1 progress report with input rows and
    then 2 consecutive zero-input reports, stops the query, and awaits
    termination. Returns True if drained, False on timeout (query is
    stopped either way).

    When the caller KNOWS how many data micro-batches the source must
    produce (e.g. an availableNow replay of N files under
    maxFilesPerTrigger=1 → exactly N), pass
    ``expected_data_batches=N``: a batch's progress report is emitted
    after its sink commit, so once the N-th data batch reports, the
    sink is complete and the query can stop immediately — the engine's
    trailing empty timeout-evaluation batches (each a full pass over
    every state-store partition) are never run. Emissions only happen
    in data batches (timeouts merely retire state), so the sink
    contents are identical; this only removes dead-weight batches."""
    import time

    t0 = time.time()
    seen: set[int] = set()
    n_data = 0
    zero_streak = 0
    drained = False
    while time.time() - t0 < timeout_seconds and query.isActive:
        p = query.lastProgress
        if p is not None and p["batchId"] not in seen:
            seen.add(p["batchId"])
            if p["numInputRows"] > 0:
                n_data += 1
                zero_streak = 0
                if (
                    expected_data_batches is not None
                    and n_data >= expected_data_batches
                ):
                    drained = True
                    break
            else:
                zero_streak += 1
                # after data: 2 empty batches = drained. With NO data
                # at all (already-drained checkpoint / empty source):
                # 3 empty batches = trivially drained — spinning the
                # whole timeout was the old behavior (review find)
                if zero_streak >= (2 if n_data else 3):
                    drained = True
                    break
        time.sleep(0.05)
    query.stop()
    query.awaitTermination(60)
    return drained
