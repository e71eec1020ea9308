"""Sequence packing / sharding / mixture resampling (training-pipeline
last-mile operators)."""
import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators import packing
from xltsearch_spark.operators.sampling import _MOD, bucket_hash


@pytest.fixture(scope="module")
def docs(spark):
    # token counts spread across [0, 120] incl. zeros and > budget sizes
    rows = [(i, (i * 37) % 121, f"src{i % 5}") for i in range(400)]
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens long, source string").persist()


def _knuth(i, salt=0):
    return (((i + salt) % _MOD) * 2654435761) % _MOD


# ---- pack_chunked -----------------------------------------------------

def test_pack_chunked_matches_manual_cumsum(spark, docs):
    out = packing.pack_chunked(docs, budget=256).collect()
    rows = sorted(((r["doc_id"], r["n_tokens"], r["start_offset"],
                    r["pack_id"], r["pack_offset"], r["n_packs_spanned"])
                   for r in out))
    # manual reference: sort by (hash, id), exclusive cumsum
    data = sorted(((_knuth(i), i, (i * 37) % 121) for i in range(400)))
    offset, expect = 0, {}
    for _, i, t in data:
        last = offset + max(t, 1) - 1
        expect[i] = (offset, offset // 256, offset % 256,
                     last // 256 - offset // 256 + 1)
        offset += t
    for doc_id, t, start, pack, poff, span in rows:
        assert (start, pack, poff, span) == expect[doc_id]


def test_pack_chunked_partitioning_invariant(spark, docs):
    a = {r["doc_id"]: r["start_offset"]
         for r in packing.pack_chunked(docs, 256).collect()}
    b = {r["doc_id"]: r["start_offset"]
         for r in packing.pack_chunked(docs.repartition(17), 256).collect()}
    assert a == b


def test_pack_chunked_bucket_and_batch_invariant(spark, docs):
    """start_offset is independent of n_buckets AND of the pandas batch
    size (the carry that threads an open bucket across mapInPandas
    batches): 7-row batches over 400 rows force ~60 batch boundaries,
    and n_buckets in {1, 3} forces many buckets per task plus a single
    bucket spanning every batch."""
    base = {r["doc_id"]: r["start_offset"]
            for r in packing.pack_chunked(docs, 256).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        for nb in (1, 3):
            got = {r["doc_id"]: r["start_offset"]
                   for r in packing.pack_chunked(docs, 256,
                                                 n_buckets=nb).collect()}
            assert got == base
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_packing_rejects_internal_column_collision(spark, docs):
    clashing = docs.withColumn("_pk_bucket", F.lit(0))
    with pytest.raises(ValueError, match="_pk_bucket"):
        packing.pack_chunked(clashing, 256)
    clashing_h = docs.withColumn("_pk_hash", F.lit(0))
    with pytest.raises(ValueError, match="_pk_hash"):
        packing.assign_shards(clashing_h, 4)


def test_pack_chunked_rejects_bad_budget(docs):
    with pytest.raises(ValueError):
        packing.pack_chunked(docs, 0)


def test_pack_manifest_reassembles_packs(spark, docs):
    """The manifest's slices tile every pack exactly: per pack, in-pack
    offsets are contiguous from 0, slice lengths sum to the pack's fill,
    and per doc the slices cover [0, n_tokens) in order."""
    out = packing.pack_manifest(docs, budget=256).collect()
    toks = {i: (i * 37) % 121 for i in range(400)}
    by_pack, by_doc = {}, {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(
            (r["in_pack_offset"], r["tok_end"] - r["tok_start"]))
        by_doc.setdefault(r["doc_id"], []).append(
            (r["tok_start"], r["tok_end"]))
    packs = sorted(by_pack)
    assert packs == list(range(len(packs)))
    for pid, slices in by_pack.items():
        slices.sort()
        pos = 0
        for off, ln in slices:
            assert off == pos
            pos += ln
        fill = sum(ln for _, ln in slices)
        # every pack except the last is exactly full
        if pid != packs[-1]:
            assert fill == 256
    for doc_id, slices in by_doc.items():
        slices.sort()
        n = toks[doc_id]
        if n == 0:
            assert slices == [(0, 0)]
        else:
            assert slices[0][0] == 0 and slices[-1][1] == n
            for (a0, a1), (b0, b1) in zip(slices, slices[1:]):
                assert a1 == b0


def test_batch_cumsum_kernel_property():
    """_batch_cumsum is bit-identical to the sequential rule (exclusive
    cumsum restarting at each bucket's global offset) for ANY batch
    split, bucket layout, and carried-in state."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 5),       # bucket id
                              st.integers(0, 100)),    # value
                    min_size=0, max_size=60),
           st.lists(st.integers(1, 10), min_size=0, max_size=20),
           st.data())
    def run(rows, cuts, data):
        rows.sort(key=lambda r: r[0])                  # bucket-sorted
        bs = np.array([b for b, _ in rows], dtype=np.int64)
        vals = np.array([v for _, v in rows], dtype=np.int64)
        # global per-bucket offsets over the full frame
        offsets, acc = {}, 0
        for b in sorted(set(bs.tolist())):
            offsets[b] = acc
            acc += int(vals[bs == b].sum())
        # sequential reference: running fill per bucket, rows in order
        fill = dict.fromkeys(offsets, 0)
        expect = []
        for b, v in rows:
            expect.append(offsets[b] + fill[b])
            fill[b] += v
        # random batch boundaries
        bounds = sorted(data.draw(st.sets(st.integers(0, len(rows)),
                                          max_size=8)))
        got, carry_b, carry = [], None, 0
        prev = 0
        for cut in bounds + [len(rows)]:
            start, carry_b, carry = packing._batch_cumsum(
                vals[prev:cut], bs[prev:cut], offsets, carry_b, carry)
            got.extend(start.tolist())
            prev = cut
        assert got == expect

    run()


# ---- pack_greedy ------------------------------------------------------

def test_pack_greedy_respects_budget_and_covers_every_doc(spark, docs):
    out = packing.pack_greedy(docs, budget=256).collect()
    assert len(out) == 400
    assert len({r["doc_id"] for r in out}) == 400
    fills = {}
    for r in out:
        fills.setdefault(r["pack_id"], []).append(
            (r["pack_offset"], r["n_tokens"]))
    for pack, members in fills.items():
        members.sort()
        total = sum(t for _, t in members)
        # a pack only exceeds the budget when a single oversize doc owns it
        if total > 256:
            assert len(members) == 1
        # offsets are the running fill
        fill = 0
        for off, t in members:
            assert off == fill
            fill += t


def test_greedy_kernel_matches_sequential_rule():
    """The searchsorted batch kernel is bit-identical to the sequential
    greedy rule (new pack on overflow, close on exact fill, oversize doc
    alone) across randomized token mixes, budgets and carried-in state."""
    import random

    import numpy as np

    def ref(tokens, budget, pack, fill):
        packs, offs = [], []
        for t in tokens:
            t = int(t)
            if fill > 0 and fill + t > budget:
                pack, fill = pack + 1, 0
            packs.append(pack)
            offs.append(fill)
            fill += t
            if fill >= budget:
                pack, fill = pack + 1, 0
        return packs, offs, pack, fill

    random.seed(1)
    for _ in range(2000):
        n = random.randrange(0, 30)
        budget = random.randrange(1, 20)
        toks = [random.choice([0, 0, 1, 2, 3, 5, 8, 13, 25])
                for _ in range(n)]
        pack, fill = random.randrange(0, 3), random.randrange(0, budget)
        a = packing._greedy_fill(np.array(toks, dtype=np.int64),
                                 budget, pack, fill)
        b = ref(toks, budget, pack, fill)
        assert list(a[0]) == b[0] and list(a[1]) == b[1]
        assert (a[2], a[3]) == (b[2], b[3])


def test_pack_greedy_pack_ids_globally_dense(spark, docs):
    packs = sorted({r["pack_id"]
                    for r in packing.pack_greedy(docs, 256).collect()})
    assert packs == list(range(len(packs)))


# ---- shards -----------------------------------------------------------

def test_assign_shards_hash_and_dense_positions(spark, docs):
    out = packing.assign_shards(docs, n_shards=8).collect()
    by_shard = {}
    for r in out:
        assert r["shard"] == _knuth(r["doc_id"]) % 8
        by_shard.setdefault(r["shard"], []).append(
            (r["pos_in_shard"], r["doc_id"]))
    for shard, members in by_shard.items():
        members.sort()
        assert [p for p, _ in members] == list(range(len(members)))
        # order inside the shard is (hash, id) order
        hashes = [_knuth(d) for _, d in members]
        assert hashes == sorted(hashes)


def test_write_shards_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    packing.write_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert back.select("shard").distinct().count() == 4
    # shard sizes balanced within a loose band (hash-uniform)
    sizes = [r["n"] for r in back.groupBy("shard")
             .agg(F.count("*").alias("n")).collect()]
    assert min(sizes) > 60 and max(sizes) < 140


# ---- mixture ----------------------------------------------------------

def test_mixture_resample_copy_counts(spark, docs):
    out = packing.mixture_resample(
        docs, "source", {"src0": 2.5, "src1": 0.0, "src2": 0.5},
        default_factor=1.0).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault((r["doc_id"], r["source"]), []).append(
            r["copy_idx"])
    for (doc_id, src), copies in per_doc.items():
        assert sorted(copies) == list(range(len(copies)))
        if src == "src0":
            assert len(copies) in (2, 3)
        elif src == "src2":
            assert len(copies) == 1
        else:
            assert src not in ("src1",)  # src1 fully dropped
    srcs = {s for _, s in per_doc}
    assert "src1" not in srcs
    # fractional halves hit ~half the docs (80 per source in the fixture)
    n3 = sum(1 for (d, s), c in per_doc.items()
             if s == "src0" and len(c) == 3)
    n_src2 = sum(1 for (d, s) in per_doc if s == "src2")
    assert 20 < n3 < 60 and 20 < n_src2 < 60


def test_mixture_resample_deterministic(spark, docs):
    f = {"src0": 1.25, "src3": 0.75}
    a = sorted((r["doc_id"], r["copy_idx"]) for r in
               packing.mixture_resample(docs, "source", f).collect())
    b = sorted((r["doc_id"], r["copy_idx"]) for r in
               packing.mixture_resample(docs.repartition(11), "source",
                                        f).collect())
    assert a == b


def test_mixture_rejects_negative_factor(docs):
    with pytest.raises(ValueError):
        packing.mixture_resample(docs, "source", {"src0": -1.0})


def test_mixture_rejects_negative_default_factor(docs):
    with pytest.raises(ValueError, match="default"):
        packing.mixture_resample(docs, "source", {"src0": 1.0},
                                 default_factor=-1.0)


def test_temperature_factors_hand_computed(spark):
    """3:1 domain split at tau=0.5: q ∝ sqrt(p) -> q = (sqrt3 : 1)/Z;
    factors = q/p preserve the expected total."""
    import math
    df = spark.createDataFrame(
        [(i, "big" if i < 30 else "small") for i in range(40)],
        "doc_id long, source string")
    f = packing.temperature_mixture_factors(df, "source", tau=0.5)
    p_big, p_small = 0.75, 0.25
    z = math.sqrt(p_big) + math.sqrt(p_small)
    assert f["big"] == pytest.approx(math.sqrt(p_big) / z / p_big)
    assert f["small"] == pytest.approx(math.sqrt(p_small) / z / p_small)
    # expected corpus size preserved: sum(n_i * factor_i) == N
    assert 30 * f["big"] + 10 * f["small"] == pytest.approx(40)
    # tau=1 is the natural mix; tau=0 is uniform over domains
    f1 = packing.temperature_mixture_factors(df, "source", tau=1.0)
    assert f1["big"] == pytest.approx(1.0) and f1["small"] == pytest.approx(1.0)
    f0 = packing.temperature_mixture_factors(df, "source", tau=0.0)
    assert 30 * f0["big"] == pytest.approx(10 * f0["small"])  # equal mass


def test_temperature_resample_realizes_mix(spark):
    """After tau=0 resampling of a skewed corpus, per-domain expected
    counts are equal (hash-coin realization within ±small): the resample
    composes mixture_resample's deterministic copy logic."""
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string")
    out = packing.temperature_resample(df, "source", tau=0.0)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["big"] - counts["small"]) / 500 < 0.1
    # deterministic: same input -> identical realization
    again = packing.temperature_resample(df, "source", tau=0.0)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_temperature_rejects_negative_tau(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="tau"):
        packing.temperature_mixture_factors(df, "source", tau=-0.5)
