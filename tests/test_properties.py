"""Property-based tests (hypothesis) for operator laws.

The reference has no property testing (SURVEY.md §5); these cover the
invariants the oracle can't: laws that must hold for EVERY input, not
just the fixture. Example counts are kept small — each example pays a
Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streams_spark import client

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = dt.datetime(2024, 1, 1)

# small event logs: up to 3 spaces x 2 segments, sequences 1..n
log_strategy = st.lists(
    st.tuples(
        st.sampled_from(["sp0", "sp1", "sp2"]),
        st.sampled_from(["g0", "g1"]),
        st.integers(min_value=0, max_value=500),  # ts offset seconds
    ),
    min_size=1,
    max_size=30,
)


def _mk_log(spark, rows):
    # sequences assigned per (space, segment) in ts order — gapless by
    # construction, mirroring event_log's mapping
    from collections import defaultdict

    counters: dict = defaultdict(int)
    data = []
    for sp, seg, off in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        counters[(sp, seg)] += 1
        data.append(
            (sp, seg, counters[(sp, seg)], BASE + dt.timedelta(seconds=off), b"x")
        )
    return spark.createDataFrame(
        data,
        "space string, segment string, sequence long, timestamp timestamp, "
        "payload binary",
    )


@_SETTINGS
@given(rows=log_strategy, lo=st.integers(0, 30), hi=st.integers(0, 30))
def test_consume_segment_bounds_are_exclusive_inclusive(spark, rows, lo, hi):
    """(min, max] on sequence bounds: count == #{seq : lo < seq <= hi}."""
    log = _mk_log(spark, rows)
    sp, seg = "sp0", "g0"
    got = client.consume_segment(
        log, sp, seg, min_sequence=lo, max_sequence=hi
    ).count()
    want = log.where(
        (F.col("space") == sp)
        & (F.col("segment") == seg)
        & (F.col("sequence") > lo)
        & (F.col("sequence") <= hi)
    ).count()
    assert got == want


@_SETTINGS
@given(rows=log_strategy)
def test_consume_interleave_is_union_of_spaces(spark, rows):
    """Multi-space consume == sum of per-space consumes (same bounds),
    and its output is globally time-ordered."""
    log = _mk_log(spark, rows)
    spaces = [r.space for r in log.select("space").distinct().collect()]
    inter = client.consume(log, offsets={s: None for s in spaces})
    per_space = sum(
        client.consume_space(log, s).count() for s in spaces
    )
    assert inter.count() == per_space
    ts = [r.timestamp for r in inter.collect()]
    assert ts == sorted(ts)


@_SETTINGS
@given(rows=log_strategy)
def test_offset_resume_partitions_the_stream(spark, rows):
    """For any offset taken from the stream itself: rows before it plus
    rows after it == all rows, with no overlap (exclusive resume —
    /root/reference/server/messages.go:119-123)."""
    log = _mk_log(spark, rows)
    space = "sp0"
    all_rows = client.consume_space(log, space).collect()
    if not all_rows:
        return
    mid = all_rows[len(all_rows) // 2]
    offset = (mid.timestamp, mid.segment, mid.sequence)
    after = client.consume_space(log, space, offset=offset).collect()
    # rows strictly after the offset in (ts, segment, seq) order
    key = lambda r: (r.timestamp, r.segment, r.sequence)
    want = [r for r in all_rows if key(r) > key(mid)]
    assert [key(r) for r in after] == [key(r) for r in want]


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(2, 8),
)
def test_salted_agg_equals_plain_agg(spark, rows, n_salts):
    """salted_agg is result-identical to groupBy().agg() for decomposable
    aggregates, for any salt count (sums compared at 6dp — float
    reassociation only)."""
    from streams_spark.functions.skew import salted_agg

    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        r.k: (round(r.s, 6), r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (round(r.s, 6), r.c, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            [
                ("v", "sum", "s"),
                (None, "count", "c"),
                ("v", "min", "mn"),
                ("v", "max", "mx"),
            ],
            n_salts=n_salts,
        ).collect()
    }
    assert plain == salted


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),
            min_size=1,
            max_size=40,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_jaccard_operator_matches_python_bruteforce(spark, texts):
    """d_ngram_jaccard's join formulation == a literal python computation
    of 3-gram Jaccard on any corpus (empty/short docs included)."""
    from streams_spark.operators.dedup import JACCARD_T, hashed_shingle_sets

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # python truth — short docs (< 3 tokens) yield ONE truncated shingle,
    # matching word_shingles / hashed_shingle_sets / the DuckDB oracles
    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    truth = set()
    ss = [shingles(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(ss[i] & ss[j])
            union = len(ss[i] | ss[j])
            if union and inter / union >= JACCARD_T:
                truth.add((i, j))

    sh = hashed_shingle_sets(docs).withColumn("n", F.size("hs"))
    ex = sh.select("doc_id", "n", F.explode("hs").alias("h"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    jac = F.col("nc").cast("double") / (F.col("na") + F.col("nb") - F.col("nc"))
    got = {
        (r.da, r.db) for r in pairs.where(jac >= JACCARD_T).collect()
    }
    assert got == truth


@_SETTINGS
@given(
    n=st.integers(min_value=2, max_value=24),
    cuts=st.sets(st.integers(min_value=1, max_value=23), max_size=3),
    gap_at=st.one_of(st.none(), st.integers(min_value=1, max_value=23)),
)
def test_chunked_produce_associative_and_gap_atomic(spark, n, cuts, gap_at):
    """Produce is chunk-associative: appending a gapless sequence range
    in ANY ordered chunking yields the same committed log as one bulk
    produce — and a chunk containing a gap is rejected ATOMICALLY (the
    log keeps exactly the chunks committed before it, nothing partial).
    These are the reference's transaction-chunk guarantees
    (service.go:296-335): ChunkByCount must not change the result, and
    ERR_SEQUENCE_MISMATCH aborts a whole chunk."""
    import shutil
    import tempfile

    from streams_spark.streaming.produce import SequenceError

    seqs = list(range(1, n + 1))
    if gap_at is not None and gap_at < n:
        seqs = seqs[:gap_at] + [s + 1 for s in seqs[gap_at:]]  # gap at cut
    bounds = sorted({c for c in cuts if c < n} | {n})
    chunks, lo = [], 0
    for b in bounds:
        chunks.append(seqs[lo:b])
        lo = b

    log_dir = tempfile.mkdtemp(prefix="chunkprod-")
    shutil.rmtree(log_dir)
    try:
        committed = 0
        rejected = False
        for chunk in chunks:
            if not chunk:
                continue
            recs = spark.createDataFrame(
                [("s0", "g0", s, b"x") for s in chunk],
                "space string, segment string, sequence long, payload binary",
            )
            tails = spark.createDataFrame(
                [("s0", "g0", committed)],
                "space string, segment string, last_sequence long",
            )
            try:
                client.produce(recs, log_dir, last_sequences=tails)
                committed = chunk[-1]
            except SequenceError:
                rejected = True
                break
        if gap_at is not None and gap_at < n:
            assert rejected, "gap must reject some chunk"
        else:
            assert not rejected
            assert committed == n
        import os

        if os.path.isdir(log_dir):
            got = sorted(
                r.sequence
                for r in spark.read.parquet(log_dir).collect()
            )
        else:
            got = []
        # the log holds exactly the gapless prefix that was committed
        assert got == list(range(1, committed + 1))
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Algebraic identities behind the distributed rewrites (no Spark needed):
# each one is what lets a sequential recursion run as window frames.
# ---------------------------------------------------------------------------


@given(st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=60))
def test_cusum_closed_form_equals_recursion(xs):
    """w_cusum's rewrite: max(0, S+x) recursion == P_i - min(0, min P_j)."""
    s = 0.0
    expect = []
    for x in xs:
        s = max(0.0, s + x)
        expect.append(s)
    p, min_p, got = 0.0, 0.0, []
    for x in xs:
        p += x
        min_p = min(min_p, p)
        got.append(p - min(min_p, 0.0))
    for e, g in zip(expect, got):
        assert abs(e - g) < 1e-9 * max(1.0, abs(e))


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_prefix_min_equals_dominance_scan(pts):
    """q_skyline's rewrite: strict 2-D dominance filter == per-price
    best-size spine + prefix-min over strictly lower prices."""
    brute = {
        (x, y)
        for x, y in pts
        if not any(qx < x and qy < y for qx, qy in pts)
    }
    best = {}
    for x, y in pts:
        best[x] = min(best.get(x, y), y)
    lower_min = {}
    run = None
    for x in sorted(best):
        lower_min[x] = run
        run = best[x] if run is None else min(run, best[x])
    got = {
        (x, y)
        for x, y in pts
        if lower_min[x] is None or lower_min[x] >= y
    }
    assert got == brute


@given(
    st.lists(
        st.lists(st.integers(0, 25), min_size=1, max_size=12),
        min_size=2,
        max_size=25,
    ),
    st.floats(0.3, 0.95),
)
def test_allpairs_prefix_filter_finds_every_qualifying_pair(doc_feats, t):
    """d_tfidf_cosine's candidate bound: for ANY weighting, every pair
    with cosine >= t shares a feature inside both docs' suffix-norm
    prefixes (features in a fixed global order)."""
    import math
    from collections import Counter

    docs = [sorted(set(fs)) for fs in doc_feats]
    dfc = Counter(f for fs in docs for f in fs)
    n = float(len(docs))
    w = {f: math.log(n / c) + 0.1 for f, c in dfc.items()}  # +0.1: keep >0
    vecs = []
    for fs in docs:
        nrm = math.sqrt(sum(w[f] ** 2 for f in fs))
        vecs.append({f: w[f] / nrm for f in fs})
    order = sorted(dfc, key=lambda f: (dfc[f], f))  # df asc, tie feature

    def prefix(v):
        feats = sorted(v, key=lambda f: order.index(f))
        out, suffix_sq = set(), sum(u * u for u in v.values())
        for f in feats:
            if math.sqrt(max(suffix_sq, 0.0)) >= t:
                out.add(f)
            suffix_sq -= v[f] * v[f]
        return out

    pres = [prefix(v) for v in vecs]
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            shared = set(vecs[i]) & set(vecs[j])
            cos = sum(vecs[i][f] * vecs[j][f] for f in shared)
            if cos >= t + 1e-9:
                assert pres[i] & pres[j], (
                    f"qualifying pair ({i},{j}) cos={cos} shares no "
                    "indexed feature"
                )


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=5,
    )
)
@_SETTINGS
def test_cdc_chunks_match_independent_python_chunker(spark, texts):
    """The declarative CDC chunker (explode + codegen md5 + conv) must
    produce exactly the chunks of an independent pure-Python
    implementation of the boundary rule, for ANY ascii payload —
    including empty strings (no chunks) and payloads shorter than the
    probe window (one whole-payload chunk)."""
    import hashlib

    from streams_spark.operators.multimodal import (
        CDC_DIVISOR,
        CDC_WINDOW,
        cdc_chunks_of,
    )

    def py_chunks(s: str) -> list[tuple[int, int, str]]:
        bs = [
            i
            for i in range(CDC_WINDOW, len(s) + 1)
            if int(
                hashlib.md5(
                    s[i - CDC_WINDOW : i].encode()
                ).hexdigest()[:4],
                16,
            )
            % CDC_DIVISOR
            == 0
        ]
        cuts = [0] + bs + [len(s)]
        return [
            (a, b, hashlib.md5(s[a:b].encode()).hexdigest())
            for a, b in zip(cuts, cuts[1:])
            if b > a
        ]

    base = spark.createDataFrame(
        [(i, "t", s) for i, s in enumerate(texts)],
        "doc_id long, media_type string, s string",
    )
    got = {
        (r.doc_id, r.start, r.end, r.chunk_md5)
        for r in cdc_chunks_of(base).collect()
    }
    want = {
        (i, a, b, h)
        for i, s in enumerate(texts)
        for (a, b, h) in py_chunks(s)
    }
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_floor_rounding_rule_agrees_across_engines(spark, pairs):
    """The repo-wide cross-engine rounding convention — floor(x * 10^k
    + 0.5) / 10^k on BOTH engines — must agree between Spark and DuckDB
    for ANY ratio of integers at 4dp and 6dp, including the dyadic
    midpoints (e.g. a/128) where round()'s HALF_UP (Spark) vs HALF_EVEN
    (DuckDB) genuinely diverge. This pins the convention every
    oracle-paired ratio output relies on."""
    import duckdb

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.a, r.b): (r.r4, r.r6)
        for r in df.select(
            "a",
            "b",
            (
                F.floor(F.col("a") / F.col("b") * 10000 + F.lit(0.5)) / 10000
            ).alias("r4"),
            (
                F.floor(F.col("a") / F.col("b") * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("r6"),
        ).collect()
    }
    con = duckdb.connect()
    for a, b in set(pairs):
        r4, r6 = con.sql(
            f"SELECT floor({a} / {b}::DOUBLE * 10000 + 0.5) / 10000,"
            f"       floor({a} / {b}::DOUBLE * 1000000 + 0.5) / 1000000"
        ).fetchone()
        assert got[(a, b)] == (r4, r6), (a, b, got[(a, b)], (r4, r6))


@given(
    frames=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),   # h
            st.integers(min_value=1, max_value=9),   # w
            st.booleans(),                           # rgb?
            st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
        ),
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_frames_container_roundtrips_arbitrary_sequences(frames):
    """PSMF container round-trips ANY sequence of valid frames (mixed
    shapes/channel counts, any length incl. empty), bit-exact."""
    import numpy as np

    from streams_spark.functions.codecs import frames_decode, frames_encode

    arrays = []
    for h, w, rgb, seed in frames:
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        arrays.append(rng.integers(0, 256, size=shape, dtype=np.uint8))
    out = frames_decode(frames_encode(arrays))
    assert len(out) == len(arrays)
    for got, want in zip(out, arrays):
        assert got.shape == want.shape and (got == want).all()


@given(
    values=st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=200,
    ),
    num=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=60, deadline=None)
def test_grid_quantile_rank_rule_equals_sorted_index(values, num):
    """The integer cross-multiplied rank rule (smallest cell with
    cum * 10 >= num * n) must pick exactly sorted[ceil(num/10 * n) - 1]
    for every value multiset and decile — the property both engines'
    SQL relies on."""
    n = len(values)
    cells = sorted(values)
    # rule as implemented: first cell where cumulative count crosses
    from collections import Counter

    cum = 0
    picked = None
    for cell, c in sorted(Counter(values).items()):
        cum += c
        if cum * 10 >= num * n:
            picked = cell
            break
    want = cells[-(-num * n // 10) - 1]  # ceil(num*n/10), 1-indexed
    assert picked == want


# token alphabet WITHOUT the split separator; includes "" so texts get
# consecutive spaces (empty tokens) — the edge the hash-tuple/concat_ws
# bijection argument must survive
_tok = st.text(
    alphabet=st.sampled_from("ab1.'"), min_size=0, max_size=3
)


@given(
    docs=st.lists(
        st.lists(_tok, min_size=1, max_size=18), min_size=1, max_size=6
    ),
    n=st.sampled_from([3, 13]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hashed_gram_rows_matches_string_gram_classes(spark, docs, n):
    """hashed_gram_rows must induce EXACTLY the equality classes of
    gram_rows' concat_ws strings — per-doc distinct counts and cross-doc
    overlaps both (t_contamination's correctness rests on this): token
    tuples are bijective with the joined strings (tokens cannot contain
    the separator) and multi-column xxhash64 skips NULL leads exactly as
    concat_ws skips them, truncated short-doc grams included."""
    from streams_spark.functions.text_funcs import gram_rows, hashed_gram_rows

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    s_str = gram_rows(df, n).distinct()
    s_hash = hashed_gram_rows(df, n).distinct()

    # per-doc distinct gram counts agree
    c_str = {
        r.doc_id: r.c
        for r in s_str.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    c_hash = {
        r.doc_id: r.c
        for r in s_hash.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    assert c_str == c_hash

    # cross-doc overlap classes agree: |shared distinct grams| per doc
    # pair is identical under string identity and hash identity
    def overlaps(s, key):
        a, b = s.alias("a"), s.alias("b")
        rows = (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        return {(r.da, r.db): r.c for r in rows}

    assert overlaps(s_str, "gram") == overlaps(s_hash, "gram_hash")
