"""Streaming curation: stateless rules + stateful first-wins dedup on a
document stream; batch parity on a single ordered drain, state-backed
dedup across drains."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xltsearch_spark.operators.curation import curate
from xltsearch_spark.streaming.curate import stream_curate

GOOD_EN = ("the cat and the dog is in the house with a friend "
           "it is fine for all of them that day")
GOOD_EN2 = ("the bird and the fish is of the sea with a wave "
            "it is calm for all of them that night")
# shares NO word 5-gram with GOOD_EN (so it can be the benchmark without
# contaminating it) but still reads as quality English
BENCH_TXT = ("a quick brown fox jumps over the lazy dog while the sun "
             "is warm and the wind is low today for everyone here")
GERMAN = "der hund und die katze ist nicht ein tier mit namen auf zu"


def _pdf(rows, ts="2024-01-01 00:00:00"):
    pdf = pd.DataFrame(
        [{"doc_id": i, "text": t, "lang": "en", "source": "s",
          "n_chars": len(t)} for i, t in rows])
    # micros, not pandas-default nanos: Spark's TimestampType is µs
    pdf["ingest_ts"] = pd.Series([pd.Timestamp(ts)] * len(pdf),
                                 dtype="datetime64[us]")
    return pdf


def _write(pdf, path):
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), str(path))


def test_stream_matches_batch_on_single_drain(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # 0 kept, 1 too_short, 2 wrong_lang, 3 exact_dup of 0,
    # 4 contaminated (BENCH_TXT is the benchmark; shares no 5-gram with
    # GOOD_EN so doc 0 stays clean)
    rows = [(0, GOOD_EN), (1, "one two three"), (2, GERMAN),
            (3, GOOD_EN), (4, BENCH_TXT)]
    _write(_pdf(rows), src / "b1.parquet")
    bench = spark.createDataFrame(_pdf([(100, BENCH_TXT)]))

    out = str(tmp_path / "out")
    stream_curate(spark, str(src), str(tmp_path / "ck"), out,
                  benchmark=bench)
    got = {r.doc_id: (r.keep, r.reason, r.split)
           for r in spark.read.parquet(out).collect()}

    docs = spark.createDataFrame(_pdf(rows))
    want = {r.doc_id: (r.keep, r.reason, r.split)
            for r in curate(docs, bench).collect()}
    assert got == want
    # scenario coverage: every rule class fired at least once
    assert {v[1] for v in got.values()} == \
        {"kept", "too_short", "wrong_lang", "exact_dup", "contaminated"}


def test_dedup_state_survives_across_drains(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _write(_pdf([(0, GOOD_EN)]), src / "b1.parquet")
    stream_curate(spark, str(src), ck, out)
    first = spark.read.parquet(out).collect()
    assert len(first) == 1 and first[0].reason == "kept"

    # a later micro-batch delivers the same content under a new doc_id
    # (later ingest_ts): the state store remembers the hash -> exact_dup,
    # plus a fresh doc that is kept
    _write(_pdf([(7, GOOD_EN), (8, GOOD_EN2)], ts="2024-01-01 00:10:00"),
           src / "b2.parquet")
    stream_curate(spark, str(src), ck, out)
    got = {r.doc_id: r.reason for r in spark.read.parquet(out).collect()}
    assert got == {0: "kept", 7: "exact_dup", 8: "kept"}


def test_late_group_past_watermark_expires_instead_of_crashing(spark, tmp_path):
    """ADVICE r4: setTimeoutTimestamp throws (killing the whole drain) when
    the requested timeout is not strictly later than the current watermark
    — reachable when a group's rows sit at/behind the eviction watermark
    (backfilled files, sub-ms truncation, ttl=0 configs). The clamp to
    watermark+1 must (a) never request a timeout at/behind the watermark
    and (b) leave the normal case untouched."""
    from xltsearch_spark.streaming.curate import _make_dedup_fn

    class FakeState:
        hasTimedOut = False
        exists = False

        def __init__(self, wm_ms):
            self._wm = wm_ms
            self.timeout_set = None

        def update(self, v):
            pass

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ts_ms):
            # reproduce Spark's contract: timeout must beat the watermark
            if ts_ms <= self._wm:
                raise ValueError("timeout not later than watermark")
            self.timeout_set = ts_ms

    pdf = _pdf([(9, GOOD_EN2)], ts="2024-01-01 00:00:00")
    pdf["pre_reason"] = ["kept"]
    pdf["_split"] = ["train"]
    last_ms = int(pdf["ingest_ts"].astype("datetime64[ns]")
                  .astype("int64").max() // 1_000_000)

    # watermark months AHEAD of the group's event time: pre-fix this raised
    fn = _make_dedup_fn(ttl_minutes=1)
    st = FakeState(wm_ms=last_ms + 10 ** 9)
    out = list(fn(("sha",), iter([pdf]), st))
    assert st.timeout_set == st._wm + 1          # clamped, not crashed
    assert out and out[0]["reason"].tolist() == ["kept"]

    # normal case: watermark behind event time -> event-time TTL wins
    st2 = FakeState(wm_ms=0)
    list(fn(("sha",), iter([pdf]), st2))
    assert st2.timeout_set == last_ms + 60 * 1000
