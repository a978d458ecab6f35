"""Structured Streaming ingestion smoke: session windows + stateful dedup."""
import pytest
from pyspark.sql import functions as F

from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.streaming.ingest import (
    sessionized_conversations,
    stream_transcripts_from_files,
)


def test_sessionized_stream(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    out_table = "stream_out_test"

    pdf = synth.transcripts_pdf(4)
    # replay one turn to exercise dropDuplicatesWithinWatermark
    dup = pdf.iloc[[0]]
    spark.createDataFrame(
        __import__("pandas").concat([pdf, dup]), synth.TRANSCRIPTS_SCHEMA
    ).write.mode("overwrite").parquet(src)

    stream = stream_transcripts_from_files(
        spark, src, synth.TRANSCRIPTS_SCHEMA
    )
    assert stream.isStreaming
    sessions = sessionized_conversations(stream, gap="30 minutes")

    query = (
        sessions.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.sql(f"select * from {out_table}").collect()
    assert len(got) == 4
    by_conv = {r["conv_id"]: r for r in got}
    for cid, row in by_conv.items():
        assert row["text"] == "\n".join(synth.document_lines(cid))
        assert row["n_turns"] == len(synth.conversation_turns(cid))


def test_chunked_conversations_stateful(spark, tmp_path):
    """applyInPandasWithState count-chunker: full chunks emit in turn
    order; the partial remainder stays buffered (flushes on timeout in
    continuous operation)."""
    from information_extraction_t5_spark.streaming.ingest import (
        chunked_conversations,
    )

    src = str(tmp_path / "chunk_src")
    pdf = synth.transcripts_pdf(2)  # conv_00000/00001, 10+ turns each
    spark.createDataFrame(pdf, synth.TRANSCRIPTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)

    stream = stream_transcripts_from_files(
        spark, src, synth.TRANSCRIPTS_SCHEMA
    )
    chunks = chunked_conversations(stream, chunk_turns=4)

    query = (
        chunks.writeStream.format("memory")
        .queryName("chunk_out_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.sql(
        "select * from chunk_out_test order by conv_id, chunk_id"
    ).collect()
    assert len(got) > 0
    for cid in {r["conv_id"] for r in got}:
        turns = sorted(
            synth.conversation_turns(cid), key=lambda t: t["turn_idx"]
        )
        texts = [t["text"] for t in turns]
        rows = [r for r in got if r["conv_id"] == cid]
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        n_full = len(texts) // 4
        # full chunks emit from data alone, in stable turn order
        for i, r in enumerate(rows[:n_full]):
            assert r["n_turns"] == 4
            assert r["text"] == "\n".join(texts[i * 4:(i + 1) * 4])
        # the trailing partial chunk may flush if the processing-time
        # timeout fires before the query drains — when it does, it must
        # carry exactly the remaining turns
        assert len(rows) in (n_full, n_full + (1 if len(texts) % 4 else 0))
        for r in rows[n_full:]:
            assert r["n_turns"] == len(texts) % 4
            assert r["text"] == "\n".join(texts[n_full * 4:])


def test_chunked_conversations_state_crosses_batches(spark, tmp_path):
    """State must survive micro-batch boundaries: the first file carries
    turns 0..2, the second 3..7 — the 4-turn chunk can only emit once
    both batches have been folded into the same GroupState."""
    import pandas as pd

    from information_extraction_t5_spark.streaming.ingest import (
        chunked_conversations,
    )

    src = str(tmp_path / "xbatch_src")
    pdf = synth.transcripts_pdf(1)
    cid = pdf["conv_id"].iloc[0]
    first, second = pdf[pdf.turn_idx < 3], pdf[pdf.turn_idx >= 3]
    spark.createDataFrame(first, synth.TRANSCRIPTS_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(second, synth.TRANSCRIPTS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(synth.TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    chunks = chunked_conversations(stream, chunk_turns=4)
    query = (
        chunks.writeStream.format("memory")
        .queryName("xbatch_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.sql(
        "select * from xbatch_out order by chunk_id"
    ).collect()
    turns = sorted(synth.conversation_turns(cid),
                   key=lambda t: t["turn_idx"])
    texts = [t["text"] for t in turns]
    n_full = len(texts) // 4
    assert len(got) >= n_full > 0
    for i, r in enumerate(got[:n_full]):
        assert r["conv_id"] == cid
        assert r["n_turns"] == 4
        assert r["text"] == "\n".join(texts[i * 4:(i + 1) * 4])


class _FakeState:
    """Minimal GroupState stand-in for driving the chunker state machine."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v
        self.removed = False

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        pass


def _drive(fn, conv, state, turns):
    import pandas as pd

    pdf = pd.DataFrame(
        {"turn_idx": [t for t, _ in turns], "text": [x for _, x in turns]}
    )
    frames = list(fn((conv,), iter([pdf]), state))
    return pd.concat(frames, ignore_index=True)


def test_chunk_flush_keeps_counters_and_splits_gaps():
    """Timeout flush must (a) emit gap-separated pending runs as SEPARATE
    chunks, (b) persist next_chunk so post-flush turns never reuse a
    chunk_id (ADVICE r2)."""
    import pandas as pd

    from information_extraction_t5_spark.streaming.ingest import (
        _make_chunker,
    )

    fn = _make_chunker(chunk_turns=4, timeout_ms=1000)

    # batch 1: turns 0..3 complete chunk 0; 5,6 and 9 stay pending
    # (4 missing blocks window 1; 8 missing blocks window 2)
    st = _FakeState()
    out = _drive(fn, "c", st,
                 [(i, f"t{i}") for i in [0, 1, 2, 3, 5, 6, 9]])
    assert list(out["chunk_id"]) == [0]
    assert out["text"][0] == "t0\nt1\nt2\nt3"

    # timeout fires: two separate runs flush as chunks 1 and 2 — never one
    # merged blob, and never chunk_id 0 again
    st.hasTimedOut = True
    out = _drive(fn, "c", st, [])
    assert list(out["chunk_id"]) == [1, 2]
    assert list(out["text"]) == ["t5\nt6", "t9"]
    assert not st.removed  # counters kept for late arrivals
    _idxs, _texts, next_window, next_chunk = st.get
    assert (next_window, next_chunk) == (3, 3)

    # late turns 12..15 (window 3) continue the sequence at chunk 3
    st.hasTimedOut = False
    out = _drive(fn, "c", st, [(i, f"t{i}") for i in [12, 13, 14, 15]])
    assert list(out["chunk_id"]) == [3]
    assert out["text"][0] == "t12\nt13\nt14\nt15"

    # a second idle timeout with nothing pending drops the record
    st.hasTimedOut = True
    out = _drive(fn, "c", st, [])
    assert len(out) == 0
    assert st.removed


def test_chunk_flush_splits_at_window_boundary():
    """A contiguous pending run spanning an aligned window boundary
    flushes as one chunk per window (deterministic membership)."""
    from information_extraction_t5_spark.streaming.ingest import (
        _flush_runs,
    )

    pending = {j: f"t{j}" for j in [5, 6, 7, 8, 9]}  # crosses 8 (4-turn)
    assert _flush_runs(pending, 4) == [[5, 6, 7], [8, 9]]
    assert _flush_runs({1: "a", 3: "b"}, 4) == [[1], [3]]


def test_chunk_restart_after_drop_is_observable(caplog):
    """After the state record is dropped (second idle timeout), a late turn
    restarts numbering at 0 — and the chunker logs the restart so it is
    observable in production (VERDICT r3 nit 3)."""
    import logging

    from information_extraction_t5_spark.streaming.ingest import (
        _make_chunker,
    )

    fn = _make_chunker(chunk_turns=4, timeout_ms=1000)

    # full lifecycle: chunk 0 completes, idle flush, second idle drop
    st = _FakeState()
    _drive(fn, "c", st, [(i, f"t{i}") for i in range(4)])
    st.hasTimedOut = True
    _drive(fn, "c", st, [])  # flush (nothing pending, record dropped)
    assert st.removed

    # late turn 17 arrives after the drop: numbering restarts AND warns
    st.hasTimedOut = False
    with caplog.at_level(
        logging.WARNING, logger="information_extraction_t5_spark.streaming.ingest"
    ):
        _drive(fn, "c", st, [(17, "t17")])
    assert any("restarts" in r.message for r in caplog.records)

    # a genuinely-new conversation starting at turn 0 does NOT warn
    caplog.clear()
    st2 = _FakeState()
    with caplog.at_level(
        logging.WARNING, logger="information_extraction_t5_spark.streaming.ingest"
    ):
        _drive(fn, "d", st2, [(0, "a"), (1, "b")])
    assert not caplog.records
