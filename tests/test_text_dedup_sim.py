"""Text analysis, dedup, and similarity operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from riemann_spark.functions import dedup, similarity, text


def docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_features(spark):
    df = docs(spark, "the quick fox", "a b!")
    rows = (
        df.select(
            "doc_id",
            text.token_count("text").alias("n"),
            text.mean_token_len("text").alias("mlen"),
            text.punct_count("text").alias("punct"),
            text.stopword_count("text").alias("stop"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert (rows[0].n, rows[0].mlen, rows[0].punct, rows[0].stop) == (3, 11 / 3, 0, 1)
    assert (rows[1].n, rows[1].punct, rows[1].stop) == (2, 1, 1)


def test_lang_id_votes(spark):
    df = docs(spark, "the cat and the dog", "der hund ist nicht da", "xyzzy qwerty")
    got = [r[0] for r in df.select(text.lang_id("text")).collect()]
    assert got == ["en", "de", "und"]


def test_fingerprint_normalizes_whitespace_case(spark):
    df = docs(spark, "Hello   World", "hello world", "different")
    fps = [r[0] for r in df.select(text.fingerprint("text")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_exact_duplicates(spark):
    df = docs(spark, "a b c", "A  b C", "unique doc")
    out = dedup.exact_duplicates(df).orderBy("canonical_id").collect()
    assert [(r.n_docs, r.canonical_id) for r in out] == [(2, 0), (1, 2)]


def test_shingles(spark):
    df = docs(spark, "a b c d", "x y")
    got = [r[0] for r in df.select(dedup.shingles("text", 3)).orderBy("doc_id").collect()]
    assert got == [["a b c", "b c d"], []]


@pytest.mark.slow
def test_ngram_jaccard_pairs(spark):
    df = docs(
        spark,
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different text with no overlap at all",
    )
    out = dedup.ngram_jaccard_pairs(df, 0.3).collect()
    assert [(r.doc1, r.doc2) for r in out] == [(0, 1)]
    assert 0.4 < out[0].jaccard < 0.9


@pytest.mark.slow
def test_jaccard_stop_shingle_guard(spark):
    # one hot shingle shared by every doc; with max_shingle_df=2 it is
    # pruned, so otherwise-disjoint docs form no candidate pair at all
    base = "common hot shingle"
    df = docs(spark, f"{base} a1 a2", f"{base} b1 b2", f"{base} c1 c2")
    ungated = dedup.ngram_jaccard_pairs(df, 0.01, max_shingle_df=None).collect()
    assert len(ungated) == 3  # every pair shares the hot shingle
    gated = dedup.ngram_jaccard_pairs(df, 0.01, max_shingle_df=2).collect()
    assert gated == []


def test_minhash_lsh_candidates(spark):
    near_a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    near_b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zzz"
    other = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"
    df = docs(spark, near_a, near_b, other)
    pairs = {(r.doc1, r.doc2) for r in dedup.lsh_candidate_pairs(df).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_lsh_max_band_df_caps_degenerate_buckets(spark):
    """A degenerate corpus (N byte-identical docs) collapses into ONE
    band bucket per band; without the cap that bucket alone yields
    N*(N-1)/2 pairs — quadratic. max_band_df drops runaway buckets
    before pair generation (those are exact-duplicate clusters, the
    fingerprint lane's job), while distinct near-dup buckets under
    the cap are untouched."""
    same = ["dup dup dup w1 w2 w3 w4 w5 w6 w7 w8 w9"] * 6
    near_a = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11 n12"
    near_b = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11 zzz"
    df = docs(spark, *same, near_a, near_b)
    ungated = {
        (r.doc1, r.doc2)
        for r in dedup.lsh_candidate_pairs(df, max_band_df=None).collect()
    }
    assert sum(1 for a, b in ungated if a < 6 and b < 6) == 15  # 6C2
    gated = {
        (r.doc1, r.doc2)
        for r in dedup.lsh_candidate_pairs(df, max_band_df=5).collect()
    }
    assert not any(a < 6 and b < 6 for a, b in gated)  # hot bucket dropped
    assert (6, 7) in gated  # small near-dup bucket survives the cap


def test_incremental_lsh_pairs_equals_full_banding(spark):
    """Probing a STORED band index with only the arrival batch must
    produce EXACTLY the arrival-touching pairs of full-corpus banding
    — under the same max_band_df semantics (cap on the FULL bucket
    size: stored + arrival postings). Checked on the sf0.001 corpus
    (arrivals = doc_id % 5 == 0, the warm-start queries' split) both
    uncapped and with a cap low enough to drop buckets."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    arr = F.col("doc_id") % 5 == 0
    lake_bands = dedup.minhash_bands(d.filter(~arr))
    for cap in (None, 3):
        full = {
            (r.doc1, r.doc2)
            for r in dedup.lsh_candidate_pairs(d, max_band_df=cap).collect()
            if r.doc1 % 5 == 0 or r.doc2 % 5 == 0
        }
        inc = {
            (r.doc1, r.doc2)
            for r in dedup.incremental_lsh_pairs(
                d.filter(arr), lake_bands, max_band_df=cap
            ).collect()
        }
        assert inc == full, f"cap={cap}: {inc ^ full}"
    assert full, "probe corpus produced no arrival-touching pairs"


def test_incremental_lsh_pairs_recrawl_emits_no_self_pairs(spark):
    """A RE-CRAWLED doc — same id in the arrival batch AND the stored
    lake index — lands in its own band buckets on both sides;
    least/greatest of equal ids would fabricate a (x, x) self-pair
    that full-corpus banding never emits. The probe must drop equal-id
    pairs while keeping the doc's genuine neighbors."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # lake = everything; arrivals = a slice of the SAME docs (re-crawl)
    lake_bands = dedup.minhash_bands(d)
    arrivals = d.filter(F.col("doc_id") % 7 == 0)
    pairs = [
        (r.doc1, r.doc2)
        for r in dedup.incremental_lsh_pairs(arrivals, lake_bands).collect()
    ]
    assert all(a != b for a, b in pairs), "self-pair leaked"
    # genuine arrival-touching neighbors survive the self-pair filter
    full = {
        (r.doc1, r.doc2)
        for r in dedup.lsh_candidate_pairs(d).collect()
        if r.doc1 % 7 == 0 or r.doc2 % 7 == 0
    }
    assert set(pairs) == full


def test_warmstart_state_rebuilds_on_corpus_change(spark, tmp_path):
    """_warmstart_state is mtime-stamped: the same corpus reuses the
    stored tables (no second build), and a regenerated corpus MUST
    rebuild — silently serving stale cluster state would corrupt
    every downstream recrawl. Exercised on a private copy of the
    sf0.001 corpus so /root/testdata stays untouched."""
    import os
    import shutil

    from riemann_spark.plans.catalog_ml import _warmstart_state

    sf = str(tmp_path)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        f"{sf}/documents.parquet",
    )
    star1, bands1, abands1 = _warmstart_state(spark, sf)
    n1 = star1.count()
    assert n1 > 0 and bands1.count() > 0 and abands1.count() > 0
    # same corpus -> cache hit: the stamp-suffixed dir set is stable
    import hashlib as _h
    import tempfile as _t

    key = _h.md5(os.path.abspath(sf).encode()).hexdigest()[:12]
    root = os.path.join(_t.gettempdir(), f"riemann_spark_state_{key}")
    dirs1 = sorted(os.listdir(root))
    _warmstart_state(spark, sf)
    assert sorted(os.listdir(root)) == dirs1
    # regenerated corpus (new mtime) -> a NEW stamp dir is created
    # (never replaced under a reader) and stale dirs are swept
    df = spark.read.parquet(f"{sf}/documents.parquet").limit(100)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/stage")
    part = [p for p in os.listdir(f"{sf}/stage") if p.endswith(".parquet")][0]
    os.remove(f"{sf}/documents.parquet")
    shutil.move(f"{sf}/stage/{part}", f"{sf}/documents.parquet")
    star2, _bands2, _abands2 = _warmstart_state(spark, sf)
    dirs2 = sorted(d for d in os.listdir(root) if d.startswith(("prior_star", "lake_bands")))
    assert dirs2 != [d for d in dirs1 if d.startswith(("prior_star", "lake_bands"))]
    assert star2.count() < n1  # state reflects the smaller corpus
    shutil.rmtree(root)


def test_cluster_label_state_serves_and_rebuilds(spark, tmp_path):
    """_stored_state_tables (via _cluster_label_state): the stored
    labels must equal a from-scratch build, the same corpus must
    reuse the stored dirs, and a regenerated corpus must rebuild —
    the generic protocol every r11 state table rides."""
    import hashlib as _h
    import os
    import shutil
    import tempfile as _t

    from riemann_spark.plans.catalog_ml import (
        _BAND,
        _N_HASHES,
        _cluster_label_state,
    )

    sf = str(tmp_path)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        f"{sf}/documents.parquet",
    )
    raw, ver = _cluster_label_state(spark, sf)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    fresh = dedup.connected_components(
        dedup.lsh_candidate_pairs(d, _N_HASHES, _BAND)
    )
    got = {(r.node, r.cluster) for r in raw.collect()}
    want = {(r.node, r.cluster) for r in fresh.collect()}
    assert got == want and ver.count() > 0  # stored == from-scratch
    key = _h.md5(os.path.abspath(sf).encode()).hexdigest()[:12]
    root = os.path.join(_t.gettempdir(), f"riemann_spark_state_{key}")
    dirs1 = sorted(p for p in os.listdir(root) if p.startswith("cc_labels"))
    _cluster_label_state(spark, sf)  # same corpus -> no new dirs
    assert sorted(
        p for p in os.listdir(root) if p.startswith("cc_labels")
    ) == dirs1
    # regenerated corpus (new mtime) -> new stamp dirs, stale swept
    os.utime(f"{sf}/documents.parquet")
    _cluster_label_state(spark, sf)
    dirs2 = sorted(p for p in os.listdir(root) if p.startswith("cc_labels"))
    assert dirs2 != dirs1
    shutil.rmtree(root)


def test_simhash_close_for_near_dups(spark):
    df = docs(
        spark,
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "one two three four five six seven eight",
    )
    rows = dedup.simhash_buckets(df).orderBy("doc").collect()
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(rows[0].simhash, rows[1].simhash) <= ham(rows[0].simhash, rows[2].simhash)
    assert all(0 <= r.simhash < 65536 for r in rows)


def vecs(spark, *vs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<float>",
    )


def test_bruteforce_topk_grouped_bit_equals_per_group(spark):
    """brute_force_topk_grouped must be bit-equal to running
    brute_force_topk once per tier on the sliced vectors — same
    cosine expression tree, one corpus pass for all tiers."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q8 = e.filter(F.col("vec_id") < 4)
    dims = [8, 16]
    tiers = F.explode(F.array(*[F.lit(d) for d in dims])).alias("dim")

    def tiered(df):
        return df.select("vec_id", tiers, "embedding").select(
            "vec_id", "dim",
            F.expr("slice(embedding, 1, dim)").alias("embedding"),
        )

    got = {
        (r.dim, r.q_id, r.rank): (r.n_id, r.cos)
        for r in similarity.brute_force_topk_grouped(
            tiered(q8), tiered(e), 3, "dim"
        ).collect()
    }
    for d in dims:
        sl = F.slice(F.col("embedding"), 1, d).alias("embedding")
        solo = similarity.brute_force_topk(
            q8.select("vec_id", sl), e.select("vec_id", sl), 3
        ).collect()
        for r in solo:
            assert got[(d, r.q_id, r.rank)] == (r.n_id, r.cos)  # bit-equal
    assert len(got) == len(dims) * 4 * 3


def test_cosine_and_bruteforce_topk(spark):
    df = vecs(spark, [1, 0, 0], [0.9, 0.1, 0], [0, 1, 0], [-1, 0, 0])
    out = similarity.brute_force_topk(df.filter(F.col("vec_id") == 0), df, 2).collect()
    assert [(r.n_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [(1, 1), (2, 2)]
    cos = df.filter(F.col("vec_id") == 0).crossJoin(
        df.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("e2"))
    ).select(similarity.cosine(F.col("embedding"), F.col("e2")).alias("c")).collect()[0].c
    assert cos == pytest.approx(-1.0)


def test_lsh_topk_finds_same_bucket_neighbor(spark):
    # near-identical vectors share all hyperplane signs → same bucket
    base = [1.0] * 16
    near = [1.0] * 15 + [0.9]
    anti = [-1.0] * 16
    df = vecs(spark, base, near, anti)
    out = similarity.lsh_topk(df.filter(F.col("vec_id") == 0), df, 2, n_planes=4, dim=16)
    got = [(r.n_id, r.rank) for r in out.collect()]
    assert (1, 1) in got
    # anti-parallel flips ALL plane signs (Hamming 4) — out of reach
    # even for the flip-1 multiprobe default
    assert all(n != 2 for n, _ in got)


def test_lsh_topk_multiprobe_reaches_one_flip_neighbor(spark):
    """Multi-probe recovers the dominant LSH miss: a true neighbor
    that lands ONE hyperplane flip away. Build a neighbor whose
    bucket differs from the query's in exactly one bit — single-
    bucket probing must miss it, the flip-1 default must rank it."""
    import hashlib

    def plane(p):
        return [
            1.0 if hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0] >= "8" else -1.0
            for i in range(16)
        ]

    def bucket(v):
        return sum(
            2 ** p
            for p in range(4)
            if sum(x * s for x, s in zip(v, plane(p))) > 0
        )

    base = [1.0] * 16
    # walk along one plane's normal until exactly that sign flips —
    # moving along a normal can graze OTHER planes' zero crossings
    # (and a balanced plane dotted with all-ones is exactly 0), so
    # search the 4 candidates for the one that lands Hamming-1 away
    near = next(
        cand
        for p in range(4)
        for d in [sum(b * s for b, s in zip(base, plane(p)))]
        if abs(d) >= 2.0
        for cand in [[b - 1.1 * d * s / 16.0 for b, s in zip(base, plane(p))]]
        if bin(bucket(base) ^ bucket(cand)).count("1") == 1
    )
    df = vecs(spark, base, near)
    q_ = df.filter(F.col("vec_id") == 0)
    single = similarity.lsh_topk(q_, df, 2, 4, 16, multiprobe=False).collect()
    multi = similarity.lsh_topk(q_, df, 2, 4, 16).collect()
    assert all(r.n_id != 1 for r in single)  # one flip away: missed
    assert any(r.n_id == 1 for r in multi)  # ...and recovered


def test_ivf_topk(spark):
    df = vecs(spark, [1, 0], [0, 1], [0.95, 0.05], [0.1, 0.98])
    out = similarity.ivf_topk(df.filter(F.col("vec_id") < 2), df, 1, n_cells=2)
    got = {r.q_id: r.n_id for r in out.collect()}
    assert got[0] == 2 and got[1] == 3


def test_bpe_token_count_matches_python_re(spark):
    import re

    samples = ["It's a test-case, 123 foo's  bar!!", "hello", "", "  x  "]
    df = docs(spark, *samples)
    got = [
        r[0]
        for r in df.select(text.bpe_token_count("text")).orderBy("doc_id").collect()
    ]
    want = [len(re.findall(text.BPE_SPLIT_PATTERN, s)) for s in samples]
    assert got == want


def test_rolling_fingerprint_matches_python_fold(spark):
    import hashlib

    def py_fp(s):
        h = 0
        for tok in s.strip().split():
            v = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            h = (h * text.ROLLING_BASE + v) % text.ROLLING_MOD
        return h

    samples = ["the quick brown fox", "fox brown quick the", "the quick brown fox"]
    df = docs(spark, *samples)
    got = [
        r[0]
        for r in df.select(text.rolling_fingerprint("text")).orderBy("doc_id").collect()
    ]
    assert got == [py_fp(s) for s in samples]
    assert got[0] == got[2] != got[1]  # order-sensitive, deterministic


def test_embedding_near_dups_finds_planted_pair(spark):
    import random

    rnd = random.Random(7)
    base = [rnd.gauss(0, 1) for _ in range(64)]
    near = [x + rnd.gauss(0, 0.01) for x in base]
    vecs = [(0, base), (1, near)] + [
        (i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(2, 30)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.embedding_near_dups(df, 0.9).collect()
    assert [(r.id1, r.id2) for r in out] == [(0, 1)]
    assert out[0].cos > 0.99


@pytest.mark.slow
def test_connected_components_matches_union_find(spark):
    import random

    def uf(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        return {n: find(n) for n in nodes}

    rnd = random.Random(13)
    cases = [
        [(i, i + 1) for i in range(30)],          # path: worst case for star rounds
        [(0, i) for i in range(1, 15)],           # star
        [(7, 7), (1, 2), (4, 3)],                 # self-loop dropped, two pairs
        [(rnd.randrange(40), rnd.randrange(40)) for _ in range(35)],
    ]
    for edges in cases:
        real = [e for e in edges if e[0] != e[1]]
        nodes = sorted({x for e in real for x in e})
        df = spark.createDataFrame(edges, "doc1 long, doc2 long")
        got = {
            r["node"]: r["cluster"]
            for r in dedup.connected_components(df).collect()
        }
        assert got == uf(real, nodes)


@pytest.mark.slow
def test_delta_components_matches_generic_cc(spark):
    """delta_components(prior, pairs) must be row-for-row equal to
    connected_components(star_edges UNION pairs) — node set AND
    min-id labels — on the fast path, on the fallback path (merge
    chain deeper than hops), and around prior singletons (a rep's
    self-row alone is not an edge; it joins the output only when a
    delta pair touches it)."""
    import random

    rnd = random.Random(29)
    for trial in range(3):
        nodes = list(range(0, 200, 2))
        rnd.shuffle(nodes)
        prior_rows, i = [], 0
        while i < len(nodes):
            comp = nodes[i:i + rnd.randint(1, 5)]
            i += len(comp)
            rep = min(comp)
            prior_rows += [(d, rep) for d in comp]
        pr = [
            (rnd.choice(range(1, 200, 2)), rnd.choice(nodes))
            for _ in range(20)
        ]
        if trial == 2:
            # chain many cluster reps through arrivals: a merge
            # component deeper than the hop bound -> fallback
            reps = sorted({r for _, r in prior_rows})[:10]
            arr = [r + 1 for r in reps]
            pr += list(zip(arr, reps)) + list(zip(arr[:-1], arr[1:]))
        pairs = spark.createDataFrame(
            [(a, b) for a, b in pr if a != b], "doc1 long, doc2 long"
        )
        prior = spark.createDataFrame(prior_rows, "doc long, cluster long")
        star = prior.select(
            F.col("doc").alias("doc1"), F.col("cluster").alias("doc2")
        )
        full = {
            (r["node"], r["cluster"])
            for r in dedup.connected_components(
                star.unionByName(pairs)
            ).collect()
        }
        mine = {
            (r["node"], r["cluster"])
            for r in dedup.delta_components(prior, pairs).collect()
        }
        assert mine == full
        if trial == 2:
            assert not dedup.last_delta_fast_path  # probe caught the chain


def test_delta_components_empty_delta(spark):
    prior = spark.createDataFrame(
        [(1, 1), (3, 1), (8, 8), (9, 8)], "doc long, cluster long"
    )
    pairs = spark.createDataFrame([], "doc1 long, doc2 long")
    got = {
        (r["node"], r["cluster"])
        for r in dedup.delta_components(prior, pairs).collect()
    }
    assert got == {(1, 1), (3, 1), (8, 8), (9, 8)}
    assert dedup.last_delta_fast_path


def test_delta_components_self_pair_not_a_node(spark):
    """A (a, a) self-pair on a previously-unclustered doc must NOT
    emit a singleton row (ADVICE r13 #4): connected_components(star
    UNION pairs) drops u == v edges, so node 42 is absent from the
    generic result and must be absent here too — while a self-pair on
    a PRIOR doc changes nothing (the doc is already in the star)."""
    prior = spark.createDataFrame(
        [(1, 1), (3, 1)], "doc long, cluster long"
    )
    pairs = spark.createDataFrame(
        [(42, 42), (3, 3), (5, 1)], "doc1 long, doc2 long"
    )
    star = prior.select(
        F.col("doc").alias("doc1"), F.col("cluster").alias("doc2")
    )
    full = {
        (r["node"], r["cluster"])
        for r in dedup.connected_components(star.unionByName(pairs)).collect()
    }
    mine = {
        (r["node"], r["cluster"])
        for r in dedup.delta_components(prior, pairs).collect()
    }
    assert mine == full
    assert 42 not in {n for n, _ in mine}


def test_incremental_lsh_pairs_stored_fingerprints_equiv(spark):
    """incremental_lsh_pairs(arrival_bands=precomputed) must equal
    the inline-hashing path row-for-row (VERDICT r13 #5): the stored
    arrival fingerprint table is exactly minhash_bands(arrivals), so
    injecting it can only skip work, never change pairs."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} alpha beta gamma delta tok{i % 3} end{i % 11}")
         for i in range(60)],
        "doc_id long, text string",
    )
    lake = docs.filter(F.col("doc_id") % 5 != 0)
    arr = docs.filter(F.col("doc_id") % 5 == 0)
    lake_bands = dedup.minhash_bands(lake, 8, 2)
    a_bands = dedup.minhash_bands(arr, 8, 2)
    inline = {
        (r["doc1"], r["doc2"])
        for r in dedup.incremental_lsh_pairs(arr, lake_bands, 8, 2).collect()
    }
    stored = {
        (r["doc1"], r["doc2"])
        for r in dedup.incremental_lsh_pairs(
            None, lake_bands, 8, 2, arrival_bands=a_bands
        ).collect()
    }
    assert stored == inline and inline


def test_ivfpq_scored_multi_empty_tiers_raises(spark):
    from riemann_spark.functions import similarity

    e = spark.createDataFrame([(0, [0.0] * 64)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least one"):
        similarity.ivfpq_scored_multi(e, e, [])


def test_connected_components_string_ids(spark):
    df = spark.createDataFrame(
        [("d3", "d1"), ("d1", "d2"), ("x9", "x8")], "doc1 string, doc2 string"
    )
    got = {r["node"]: r["cluster"] for r in dedup.connected_components(df).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x8": "x8", "x9": "x8"}


def test_repetition_metrics_known_doc(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "w x y z"), (2, "solo")],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in text.repetition_metrics(df).collect()}
    # doc 0: 6 tokens, 2 distinct; "a b" occurs 3x (3*3=9 chars of 11)
    assert abs(rows[0]["dup_word_frac"] - (1 - 2 / 6)) < 1e-12
    assert abs(rows[0]["top2_char_frac"] - 9 / 11) < 1e-12
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[2]["top2_char_frac"] == 0.0  # no 2-grams


def test_repetition_run_length_fold_matches_bruteforce(spark):
    # r14: top2_char_frac moved from explode+groupBy to a run-length
    # fold over the sorted gram array — check the fold against a
    # brute-force per-doc 2-gram count on docs with ties, interleaved
    # repeats, and degenerate lengths.
    import random

    rng = random.Random(14)
    vocab = ["aa", "b", "ccc", "aa b", "d"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(40)]
    # (empty text divides by n_chars=0 — ANSI error in old and new
    # implementations alike, so not pinned here)
    docs += [(101, "x"), (102, "x x x x x x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc"]: r["top2_char_frac"] for r in text.repetition_metrics(df).collect()}
    for doc_id, txt in docs:
        toks = txt.split()
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        best = max((grams.count(g) * len(g) for g in set(grams)), default=0)
        want = best / len(txt) if txt else None
        if want is None:
            assert got[doc_id] is None or got[doc_id] == 0.0
        else:
            assert abs(got[doc_id] - want) < 1e-12, (doc_id, txt)


def test_pii_scrub_golden(spark):
    df = spark.createDataFrame(
        [(0, "mail bob.smith+x@corp.example.org or 10.1.2.3 call 555-867-5309 ok")],
        "doc_id long, text string",
    )
    out = df.select(text.pii_scrub("text").alias("s")).collect()[0]["s"]
    assert out == "mail <EMAIL> or <IP> call <PHONE> ok"


def test_hash_split_deterministic_and_proportioned(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    out = df.select("doc_id", text.hash_split("doc_id").alias("s"))
    counts = {r["s"]: r["cnt"] for r in out.groupBy("s").agg(F.count("*").alias("cnt")).collect()}
    assert abs(counts["train"] / 5000 - 230 / 256) < 0.02
    assert counts["train"] + counts.get("valid", 0) + counts.get("test", 0) == 5000
    # stable across shuffles
    again = {r["doc_id"]: r["s"] for r in out.repartition(13).collect()}
    first = {r["doc_id"]: r["s"] for r in out.collect()}
    assert again == first


def test_ngram_contamination_planted_overlap(spark):
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over lazy dogs"),
         (1, "completely unrelated words in this doc"),
         (2, "quick brown fox jumps again and again")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "benchmark says quick brown fox jumps high"),
         (101, "another benchmark entry entirely")],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in dedup.ngram_contamination(train, ev, 4).collect()}
    # docs 0 and 2 share "quick brown fox jumps" with eval doc 100
    assert set(rows) == {0, 2}
    assert rows[0]["n_shared_grams"] == 1 and rows[0]["n_eval_docs"] == 1


def test_kmv_estimate_accuracy_and_exact_path(spark):
    from riemann_spark.functions import sketches

    # estimation regime: 20k distinct values, k=1024 → ~3% stderr
    big = spark.range(20000).select(F.concat(F.lit("v"), "id").alias("v"))
    est = sketches.kmv_estimate(big, F.col("v"), 1024).collect()[0]
    assert abs(est["est_distinct"] - 20000) / 20000 < 0.10
    # exact regime: fewer distincts than k → sketch degenerates to count
    small = spark.range(300).select(F.concat(F.lit("v"), (F.col("id") % 57)).alias("v"))
    est2 = sketches.kmv_estimate(small, F.col("v"), 1024).collect()[0]
    assert est2["est_distinct"] == 57.0


def test_hll_estimate_accuracy_and_merge(spark):
    from riemann_spark.functions import sketches

    # estimation regime: 20k distinct, m=1024 → ~3.25% stderr
    big = spark.range(20000).select(F.concat(F.lit("v"), "id").alias("v"))
    est = sketches.hll_estimate(big, F.col("v")).collect()[0]
    assert abs(est["est_distinct"] - 20000) / 20000 < 0.10
    # duplicates are absorbed: 10x-replicated input, same sketch
    dup = spark.range(200000).select(
        F.concat(F.lit("v"), F.col("id") % 20000).alias("v")
    )
    est_dup = sketches.hll_estimate(dup, F.col("v")).collect()[0]
    assert est_dup["est_distinct"] == est["est_distinct"]
    assert est_dup["sum_scaled"] == est["sum_scaled"]
    # small-range regime: few distincts → ln-corrected, near-exact
    small = spark.range(300).select(F.concat(F.lit("v"), (F.col("id") % 57)).alias("v"))
    est3 = sketches.hll_estimate(small, F.col("v")).collect()[0]
    assert abs(est3["est_distinct"] - 57) / 57 < 0.10
    # mergeability: register tables of two halves max-merge to the whole
    h1 = spark.range(0, 10000).select(F.concat(F.lit("v"), "id").alias("v"))
    h2 = spark.range(5000, 20000).select(F.concat(F.lit("v"), "id").alias("v"))
    merged = (
        sketches.hll_registers(h1, F.col("v"))
        .unionByName(sketches.hll_registers(h2, F.col("v")))
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )
    whole = sketches.hll_registers(big, F.col("v"))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_kmeans_centroids_matches_reference_lloyd(spark):
    import random

    import numpy as np

    rnd = random.Random(5)
    # 3 well-separated blobs in 8-d
    data = []
    i = 0
    for c in (0.0, 5.0, 10.0):
        for _ in range(40):
            data.append((i, [rnd.gauss(c, 0.3) for _ in range(8)]))
            i += 1
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    got = similarity.kmeans_centroids(df, 3, n_iter=4)
    got_c = {r["cell"]: np.array(r["c_vec"]) for r in got.collect()}

    # reference single-node Lloyd, same init (first 3 by id), 4 iters
    X = np.array([v for _, v in data])
    C = X[:3].copy()
    for _ in range(4):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(3):
            if (a == j).any():
                C[j] = X[a == j].mean(axis=0)
    for j in range(3):
        assert np.allclose(got_c[j], C[j], atol=1e-9), j


@pytest.mark.slow
def test_ivf_with_kmeans_centroids_improves_recall(spark):
    import random

    rnd = random.Random(11)
    data = []
    i = 0
    # four directionally-distinct blobs (cells assign by cosine, so
    # blob centers must differ in direction, not just magnitude)
    for b in range(4):
        mean = [6.0 if d // 2 == b else 0.0 for d in range(8)]
        for _ in range(30):
            data.append((i, [rnd.gauss(m, 0.4) for m in mean]))
            i += 1
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    qs = df.filter(F.col("vec_id") % 30 == 7)
    cents = similarity.kmeans_centroids(df, 4, n_iter=3)
    exact = similarity.brute_force_topk(qs, df, 5)
    approx = similarity.ivf_topk(qs, df, 5, centroids=cents)
    ex = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    # trained cells align with the true blobs: near-total recall
    assert len(ex & ap) / len(ex) >= 0.9


def test_tfidf_and_unigram_lm_toy(spark):
    from riemann_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date date date")],
        ["doc_id", "text"],
    )
    top = {
        (r["doc"], r["rank"]): (r["term"], r["tfidf"])
        for r in tx.tf_idf_top_terms(docs, 2).collect()
    }
    # doc 1: apple tf=2/3 df=1 idf=ln(4/2)+1; banana tf=1/3 df=2 idf=ln(4/3)+1
    import math
    exp_apple = round((2 / 3) * (math.log(4 / 2) + 1), 6)
    assert top[(1, 1)] == ("apple", exp_apple)
    assert top[(1, 2)][0] == "banana"
    # unigram LM: 9 corpus tokens; doc 2 = (ln(2/9) + ln(2/9)) / 2
    lm = {r["doc"]: r for r in tx.unigram_lm_scores(docs).collect()}
    assert lm[2]["mean_logprob"] == round(math.log(2 / 9), 6)
    assert lm[3]["len"] == 4


def test_bloom_filter_membership_and_fp_rate(spark):
    from riemann_spark.functions import sketches

    vals = spark.range(5000).select(F.concat(F.lit("in"), "id").alias("v"))
    bloom = sketches.bloom_words(vals, F.col("v"))
    # every inserted value must hit (no false negatives, ever)
    hits = sketches.bloom_might_contain(vals, F.col("v"), bloom, ["v"])
    assert hits.count() == 5000
    # absent values: false-positive rate stays near the design point
    absent = spark.range(5000).select(F.concat(F.lit("out"), "id").alias("v"))
    fp = sketches.bloom_might_contain(absent, F.col("v"), bloom, ["v"]).count()
    assert fp < 50  # design fpr ~2e-5 at this fill; 1% is the alarm line
    # merging filters = bit_or over the union of word tables
    more = spark.range(5000, 10000).select(F.concat(F.lit("in"), "id").alias("v"))
    merged = (
        bloom.unionByName(sketches.bloom_words(more, F.col("v")))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    both = vals.unionByName(more)
    assert sketches.bloom_might_contain(both, F.col("v"), merged, ["v"]).count() == 10000


def test_hash_sample_deterministic_rate(spark):
    from riemann_spark.functions import text as tx

    ids = spark.range(20000).select(F.col("id").alias("doc_id"))
    kept = ids.filter(tx.hash_sample(0.25, "doc_id"))
    n = kept.count()
    assert abs(n - 5000) < 300  # binomial 3σ ≈ 184
    # stable under repartitioning
    n2 = ids.repartition(13).filter(tx.hash_sample(0.25, "doc_id")).count()
    assert n2 == n


def test_mix_upsample_and_sequence_packing(spark):
    from riemann_spark.functions import text as tx

    d = spark.createDataFrame(
        [(i, "s") for i in range(1000)], "doc_id long, source string"
    )
    up = tx.mix_upsample(d, F.lit(2.3))
    n = up.count()
    assert 2150 < n < 2450  # 2.3x in expectation, deterministic
    assert up.count() == n  # same every run
    assert up.filter(F.col("copy_idx") >= 3).count() == 0
    # zero weight drops everything; integral weight is exact
    assert tx.mix_upsample(d, F.lit(0.0)).count() == 0
    assert tx.mix_upsample(d, F.lit(2.0)).count() == 2000

    docs = spark.createDataFrame(
        [(1, "a", "w " * 10), (2, "a", "w " * 10), (3, "a", "w " * 10), (4, "b", "w")],
        "doc_id long, source string, text string",
    )
    packed = {r.doc_id: r for r in tx.sequence_packing(docs, 16, "source").collect()}
    # doc1 at offset 0 bin 0; doc2 at 10; doc3 at 20 -> bin 1 offset 4
    assert (packed[1].bin, packed[1].bin_offset) == (0, 0)
    assert (packed[2].bin, packed[2].bin_offset) == (0, 10)
    assert (packed[3].bin, packed[3].bin_offset) == (1, 4)
    assert (packed[4].bin, packed[4].bin_offset) == (0, 0)  # source b independent


def test_mix_upsample_accepts_column_id(spark):
    from riemann_spark.functions import text as tx

    d = spark.range(100).select(F.col("id").alias("doc_id"))
    by_str = tx.mix_upsample(d, F.lit(2.3), "doc_id")
    by_col = tx.mix_upsample(d, F.lit(2.3), F.col("doc_id"))
    assert by_str.count() == by_col.count()
    assert 200 <= by_str.count() <= 300  # 2.3x in expectation, deterministic


def test_segment_dedup_removes_corpus_duplicated_chunks(spark):
    from riemann_spark.functions import text as tx

    dup = "a b c d e f g h i j"          # one exact 10-token chunk
    docs = spark.createDataFrame(
        [
            (1, dup + " " + "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
            (2, dup + " " + "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),
            (4, dup),                     # every segment duplicated
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in tx.segment_dedup(docs, 10, 1).collect()}
    assert len(out) == 4                  # all-dropped doc still present
    assert out[1].clean_text == "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    assert out[2].clean_text == "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    assert out[3].clean_text == "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"
    assert out[4].clean_text == "" and out[4].n_dropped == 1
    assert (out[1].n_segs, out[1].n_dropped) == (2, 1)


def test_segment_dedup_carry_cols(spark):
    from riemann_spark.functions import text as tx

    dup = " ".join(f"d{i}" for i in range(1, 11))
    docs = spark.createDataFrame(
        [(1, dup + " a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", 0.25), (2, dup, -1.5)],
        "doc_id long, text string, score double",
    )
    out = {
        r.doc_id: r
        for r in tx.segment_dedup(docs, 10, 1, carry_cols=("score",)).collect()
    }
    # carried column survives the explode/reassembly unchanged, and
    # the dedup result matches the carry-free call
    assert out[1].score == 0.25 and out[2].score == -1.5
    assert out[1].clean_text == "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    assert out[2].clean_text == "" and out[2].n_dropped == 1


def test_segment_dedup_short_tail_segment_kept(spark):
    from riemann_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 tail")],
        "doc_id long, text string",
    )
    row = tx.segment_dedup(docs, 10, 1).collect()[0]
    # 11 tokens -> two segments (10 + 1); nothing duplicated
    assert row.n_segs == 2 and row.n_dropped == 0
    assert row.clean_text == "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 tail"


def test_minhash_verified_pairs_subset_of_candidates_and_exact_jaccard(spark):
    from riemann_spark.functions import dedup as dd

    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, " ".join(f"q{i}" for i in range(30))),  # unrelated
        ],
        "doc_id long, text string",
    )
    cand = {
        (r.doc1, r.doc2)
        for r in dd.lsh_candidate_pairs(docs, 8, 2).collect()
    }
    ver = dd.minhash_verified_pairs(docs, 0.5, 8, 2).collect()
    assert {(r.doc1, r.doc2) for r in ver} <= cand
    assert {(r.doc1, r.doc2) for r in ver} == {(1, 2)}
    (pair,) = ver
    # doc1 has 28 shingles, doc2 has 29, 28 shared
    assert pair.n_inter == 28
    assert abs(pair.jaccard - 28 / 29) < 1e-12
    # a threshold above the true jaccard kills the pair
    assert dd.minhash_verified_pairs(docs, 0.99, 8, 2).count() == 0


def test_hashed_linear_score_deterministic_and_bounded(spark):
    from riemann_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.score for r in docs.select(
        "doc_id", tx.hashed_linear_score("text").alias("score")).collect()}
    assert rows[1] == rows[2]             # deterministic
    assert all(-1.0 <= s <= 1.0 for s in rows.values())
    # different dim -> different buckets -> different score
    other = docs.select(
        "doc_id", tx.hashed_linear_score("text", dim=64).alias("score")
    ).collect()[0].score
    assert other != rows[1]


def test_cms_overestimates_only_and_exact_at_wide_width(spark):
    from riemann_spark.functions import sketches as sk

    vals = [("a",)] * 100 + [("b",)] * 10 + [(f"x{i}",) for i in range(50)]
    df = spark.createDataFrame(vals, "v string")
    keys = df.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("exact"))

    sketch = sk.cms_table(df, F.col("v"), 4, 256)
    est = sk.cms_estimate(keys, F.col("v"), sketch, 4, 256).collect()
    assert all(r.est >= r.exact for r in est)      # CMS never undercounts
    # sketch state is bounded by parameters, not input
    assert sketch.count() <= 4 * 256
    # heavy hitter ranks first by estimate too
    top = max(est, key=lambda r: r.est)
    assert top.v == "a" and top.est >= 100

    # width >> distinct values: no collisions possible to matter ->
    # estimates collapse to exact counts
    wide = sk.cms_estimate(
        keys, F.col("v"), sk.cms_table(df, F.col("v"), 4, 65536), 4, 65536
    ).collect()
    assert all(r.est == r.exact for r in wide)


def test_hist_quantiles_bounded_state_and_grid_error(spark):
    from riemann_spark.functions import sketches as sk

    # 1000 uniform values 0..500 on one key
    df = spark.range(1000).selectExpr("'k' AS service", "CAST(id % 500 AS DOUBLE) AS v")
    hist = sk.hist_table(df, F.col("v"), ["service"], 256, 0.0, 512.0)
    assert hist.count() <= 256                       # state bound
    est = {r.q: r.est for r in sk.hist_quantiles(
        hist, ["service"], [0.5, 0.95], 256, 0.0, 512.0).collect()}
    # grid step is 2.0: estimate within one step of the true quantile
    assert abs(est[0.5] - 250.0) <= 2.0
    assert abs(est[0.95] - 475.0) <= 2.0
    # out-of-range values clamp instead of crashing/dropping
    wild = spark.range(10).selectExpr("'k' AS service", "CAST(id * 1e6 AS DOUBLE) AS v")
    h2 = sk.hist_table(wild, F.col("v"), ["service"], 256, 0.0, 512.0)
    assert h2.agg(F.sum("cnt")).collect()[0][0] == 10
    assert h2.agg(F.max("bucket")).collect()[0][0] == 255


# properties: one generated dataset per example, few examples (each is
# a real Spark job) — the slow-lane pattern for distributed properties

@pytest.mark.slow
def test_cms_never_undercounts_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from riemann_spark.functions import sketches as sk

    words = st.lists(
        st.tuples(st.text("abcdefg", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=30)),
        min_size=1, max_size=25,
    )

    @settings(max_examples=5, deadline=None)
    @given(ws=words)
    def prop(ws):
        rows = [(w,) for w, n in ws for _ in range(n)]
        df = spark.createDataFrame(rows, "v string")
        keys = df.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("exact"))
        est = sk.cms_estimate(keys, F.col("v"), sk.cms_table(df, F.col("v"), 4, 64), 4, 64)
        assert all(r.est >= r.exact for r in est.collect())

    prop()


@pytest.mark.slow
def test_incremental_lsh_equivalence_property(spark):
    """Property form of the stored-index equivalence: on RANDOM small
    corpora (shared word pool so near-dup cliques actually form, any
    lake/arrival split), probing the lake's stored band index with the
    arrival batch must equal full-corpus banding restricted to
    arrival-touching pairs — for several max_band_df caps including
    ones low enough to drop buckets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]),
        min_size=4, max_size=10,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        texts=st.lists(doc, min_size=3, max_size=12),
        split=st.integers(min_value=2, max_value=7),
        cap=st.sampled_from([None, 2, 4]),
    )
    def prop(texts, split, cap):
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        arr = F.col("doc_id") % split == 0
        lake_bands = dedup.minhash_bands(df.filter(~arr))
        full = {
            (r.doc1, r.doc2)
            for r in dedup.lsh_candidate_pairs(df, max_band_df=cap).collect()
            if r.doc1 % split == 0 or r.doc2 % split == 0
        }
        inc = {
            (r.doc1, r.doc2)
            for r in dedup.incremental_lsh_pairs(
                df.filter(arr), lake_bands, max_band_df=cap
            ).collect()
        }
        assert inc == full

    prop()


@pytest.mark.slow
def test_segment_dedup_identity_on_unique_corpus_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from riemann_spark.functions import text as tx

    @settings(max_examples=5, deadline=None)
    @given(
        lens=st.lists(st.integers(min_value=1, max_value=35), min_size=1, max_size=8),
        w=st.integers(min_value=2, max_value=12),
    )
    def prop(lens, w):
        # globally unique tokens -> no duplicated segment -> identity
        docs, tok = [], 0
        for d, n in enumerate(lens):
            toks = [f"t{tok + i}" for i in range(n)]
            tok += n
            docs.append((d, " ".join(toks)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r.doc_id: r for r in tx.segment_dedup(df, w, 1).collect()}
        for d, txt in docs:
            assert out[d].clean_text == txt
            assert out[d].n_dropped == 0

    prop()


@pytest.mark.slow
def test_hist_quantile_within_one_grid_step_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from riemann_spark.functions import sketches as sk

    @settings(max_examples=5, deadline=None)
    @given(
        vals=st.lists(
            st.floats(min_value=0.0, max_value=511.0, allow_nan=False,
                      allow_infinity=False),
            min_size=1, max_size=60,
        ),
        q=st.sampled_from([0.1, 0.5, 0.9, 0.99]),
    )
    def prop(vals, q):
        import math

        df = spark.createDataFrame([("k", float(v)) for v in vals], "service string, v double")
        hist = sk.hist_table(df, F.col("v"), ["service"], 256, 0.0, 512.0)
        (row,) = sk.hist_quantiles(hist, ["service"], [q], 256, 0.0, 512.0).collect()
        # the ceil(q*n)-th smallest value (1-based), the sketch's target
        target = sorted(vals)[max(1, math.ceil(q * len(vals))) - 1]
        step = 512.0 / 256
        assert row.est >= target  # upper-edge estimate never undershoots
        assert row.est - target <= step * (1 + 1e-9)

    prop()


def test_ivf_nprobe_improves_boundary_recall(spark):
    from riemann_spark.functions import similarity

    # two tight clusters; one query sits between them so its true
    # nearest neighbors straddle the cell boundary
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + 0.1 * i] + [0.0] * 7))           # cluster A
    for i in range(8, 16):
        rows.append((i, [0.0] * 7 + [10.0 + 0.1 * (i - 8)]))     # cluster B
    rows.append((100, [5.0] * 1 + [0.0] * 6 + [5.0]))            # boundary query
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    q = df.filter(F.col("vec_id") == 100)
    p1 = similarity.ivf_topk(q, df, 6, n_cells=2, nprobe=1).collect()
    p2 = similarity.ivf_topk(q, df, 6, n_cells=2, nprobe=2).collect()
    exact = similarity.brute_force_topk(q, df, 6).collect()

    # nprobe=1 can only see one cluster; nprobe=2 must equal exact
    assert {r.n_id for r in p1} < {r.n_id for r in p2}
    assert [(r.n_id, r.rank) for r in p2] == [(r.n_id, r.rank) for r in exact]


def test_pq_compresses_and_keeps_recall(spark):
    from riemann_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)

    codes = similarity.pq_encode(e)
    n_vecs = e.count()
    assert codes.count() == n_vecs * 8            # 8 codes per vector
    assert codes.agg(F.max("code")).collect()[0][0] < 16

    # exact L2 top-5 (ADC approximates L2 — cosine would be a
    # metric mismatch, not a fair recall baseline)
    qa = F.broadcast(q.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")))
    ca = e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv").cast("array<double>"), F.col("nv").cast("array<double>"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("q_id").orderBy("d2", "n_id")
    exact = (ca.crossJoin(qa).filter(F.col("q_id") != F.col("n_id"))
             .withColumn("d2", d2).withColumn("r", F.row_number().over(w))
             .filter(F.col("r") <= 5).collect())
    ex_sets = {}
    for r in exact:
        ex_sets.setdefault(r.q_id, set()).add(r.n_id)

    # production shape: ADC shortlist (10% of corpus) + exact re-rank —
    # recall@5 is the shortlist hit rate (measured 85% on this fixture
    # with the untrained 4-bit codebook; assert with margin)
    rr = similarity.pq_topk_rerank(q, e, 5, shortlist=50).collect()
    rr_sets = {}
    for r in rr:
        rr_sets.setdefault(r.q_id, set()).add(r.n_id)
    hits = sum(len(rr_sets.get(k, set()) & v) for k, v in ex_sets.items())
    assert hits >= 0.7 * sum(len(v) for v in ex_sets.values())


def test_ivfpq_codes_carry_information(spark):
    """Regression for the degenerate residual codebook (ADVICE r10):
    seeding the IVF-PQ codebook from ids < n_codes picked the coarse
    centroids themselves (n_codes=16 <= n_cells=16), whose residuals
    are identically zero — every codeword collapsed to the zero
    vector, the ADC score was constant per (query, cell), and
    recall@5 degenerated to the 0.15 coarse-pruning-only floor. The
    fix seeds from ids n_cells..n_cells+n_codes-1. Two assertions pin
    it: (a) the ADC scores within a query's top-5 vary more than the
    nprobe=2 constant-per-cell degenerate ceiling allows, and (b)
    recall@5 vs exact brute-force cosine is >= 0.2 (measured exactly
    0.20 on this fixture; the degenerate index measured 0.15)."""
    from riemann_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    top = similarity.ivfpq_topk(q, e, 5).collect()
    per_q = {}
    for r in top:
        per_q.setdefault(r.q_id, set()).add(r.adc_d2)
    # degenerate codebook => adc_d2 constant per (query, probed cell)
    # => at most nprobe=2 distinct scores per query
    assert max(len(v) for v in per_q.values()) > 2, per_q

    bf = similarity.brute_force_topk(q, e, 5).select("q_id", "n_id")
    bf_pairs = [(r.q_id, r.n_id) for r in bf.collect()]
    got = {(r.q_id, r.n_id) for r in top}
    hits = sum(1 for pr in bf_pairs if pr in got)
    assert hits / 40.0 >= 0.2, hits

    # the serving tier: exact re-rank of the 50-candidate ADC
    # shortlist must recover the nprobe=2 cell-coverage ceiling
    # (measured exactly 0.925 on this fixture; assert with margin)
    rr = similarity.ivfpq_topk(q, e, 5, rerank=50).collect()
    got_rr = {(r.q_id, r.n_id) for r in rr}
    hits_rr = sum(1 for pr in bf_pairs if pr in got_rr)
    assert hits_rr / 40.0 >= 0.8, hits_rr


def test_ivfpq_trained_codebook_improves_recall_on_fixture(spark):
    """The trained residual codebook (keyed Lloyd over residuals,
    seeded where the static codebook is) must (a) produce a genuinely
    different codebook than the seed after 5 iterations and (b) beat
    the seeded tier's recall on THIS fixture (measured 0.375 vs 0.20
    at sf0.001 — note the honest caveat in knn_ivfpq_trained's
    docstring: at sf0.01 the ordering flips, lower quantization MSE
    does not imply better top-k)."""
    from riemann_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    cb = similarity.ivfpq_train_codebook(e, n_iter=5)
    assert cb.count() == 8 * 16
    bf = {(r.q_id, r.n_id) for r in
          similarity.brute_force_topk(q, e, 5).collect()}
    seeded = {(r.q_id, r.n_id) for r in
              similarity.ivfpq_topk(q, e, 5).collect()}
    trained = {(r.q_id, r.n_id) for r in
               similarity.ivfpq_topk(q, e, 5, codebook=cb).collect()}
    assert trained != seeded  # training moved the index
    assert len(trained & bf) > len(seeded & bf), (
        len(trained & bf), len(seeded & bf))


@pytest.mark.slow
def test_pq_trained_codebook_reduces_quantization_error(spark):
    from riemann_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def mse(cb):
        sl = similarity._pq_slices(e, 8, 64, "vec_id", "embedding")
        d2 = F.aggregate(
            F.zip_with(F.col("s"), F.col("cw"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        w = Window.partitionBy("id", "m").orderBy("d2", "code")
        best = (sl.join(F.broadcast(cb), "m").withColumn("d2", d2)
                .withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1))
        return best.agg(F.avg("d2")).collect()[0][0]

    untrained = similarity.pq_codebook(e)
    trained = similarity.pq_kmeans_codebook(e, n_iter=5)
    assert trained.count() == untrained.count() == 8 * 16   # model-sized
    u, t = mse(untrained), mse(trained)
    # Lloyd minimizes exactly this objective (measured 27% lower on the
    # fixture). NOTE: lower reconstruction error does NOT imply better
    # top-k recall at 4-bit codebooks on tightly clustered data —
    # trained codewords sit on cluster centroids, so within-cluster
    # members quantize identically and ADC cannot rank them; recall is
    # the shortlist+re-rank's job (test_pq_compresses_and_keeps_recall)
    assert t < u * 0.9
    # training must be deterministic (quantized means): re-run equal
    t2 = similarity.pq_kmeans_codebook(e, n_iter=5)
    a = sorted((r.m, r.code, tuple(r.cw)) for r in trained.collect())
    b = sorted((r.m, r.code, tuple(r.cw)) for r in t2.collect())
    assert a == b


def test_segment_dedup_keep_first_retains_canonical_copy(spark):
    from riemann_spark.functions import text as tx

    dup = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, dup + " " + "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
            (2, dup + " " + "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),
            (3, dup),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in tx.segment_dedup_keep_first(docs, 10).collect()}
    # doc 1 holds the canonical (min doc_id, pos) copy — it KEEPS it
    assert out[1].clean_text == dup + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    assert out[1].n_dropped == 0
    # later holders lose the repeat
    assert out[2].clean_text == "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    assert out[2].n_dropped == 1
    assert out[3].clean_text == "" and out[3].n_dropped == 1


def test_shuffle_shards_deterministic_partition_of_all_docs(spark):
    from riemann_spark.functions import text as tx

    docs = spark.createDataFrame([(i, "t") for i in range(200)], "doc_id long, text string")
    a = {r.doc_id: (r.shard, r.pos) for r in tx.shuffle_shards(docs, 4).collect()}
    b = {r.doc_id: (r.shard, r.pos)
         for r in tx.shuffle_shards(docs.repartition(7), 4).collect()}
    assert a == b  # stable under repartitioning
    assert set(s for s, _ in a.values()) == {0, 1, 2, 3}
    # positions are 1..n within each shard, no gaps or ties
    for s in range(4):
        ps = sorted(p for sh, p in a.values() if sh == s)
        assert ps == list(range(1, len(ps) + 1))


def test_mix_temperature_flattens_and_sums_to_one(spark):
    from riemann_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(i + 100, "small") for i in range(10)],
        "doc_id long, source string",
    )
    out = {r.source: r for r in tx.mix_temperature(docs, 0.5).collect()}
    assert abs(out["big"].p_temp + out["small"].p_temp - 1.0) < 1e-6
    # temperature boosts the minority source, shrinks the majority
    assert out["small"].boost > 1.0 > out["big"].boost
    assert out["small"].p_temp > out["small"].p_raw


def test_sign_quantize_and_hamming_topk(spark):
    from riemann_spark.functions import similarity as sim

    # v0/v1 identical signs; v2 differs in exactly 3 components
    base = [1.0] * 32 + [-1.0] * 32
    v1 = list(base)
    v2 = list(base)
    v2[0], v2[40], v2[63] = -1.0, 1.0, 1.0
    df = spark.createDataFrame(
        [(0, base), (1, v1), (2, v2)], "vec_id long, embedding array<float>"
    )
    q = sim.sign_quantize(df)
    rows = {r.vec_id: (r.b_lo, r.b_hi) for r in q.collect()}
    assert rows[0] == rows[1]
    got = sim.hamming_topk(df.filter("vec_id = 0"), df, 2).collect()
    assert [(r.n_id, r.hamming) for r in got] == [(1, 0), (2, 3)]


def test_bpe_train_learns_expected_merges(spark):
    """Sennrich toy corpus: merges must follow pair frequency with
    lexicographic tie-breaks, and segmentation counts must match a
    hand derivation."""
    from riemann_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = tx.bpe_train(docs, 4)
    assert merges == [("l", "o"), ("lo", "w"), ("e", "w"), ("n", "ew")]
    out = {r.doc_id: r.n for r in docs.select(
        "doc_id", tx.bpe_trained_token_count("text", merges).alias("n")
    ).collect()}
    # low=1, low=1, low+e+r=3, low+e+s+t=4 -> 9 ; new=1, new+e+r=3,
    # new+e+s+t=4, low=1 -> 9
    assert out == {1: 9, 2: 9}


def test_bpe_train_on_sample_tokenizes_full_corpus(spark):
    """sample_fraction trains on a deterministic md5-hash subcorpus
    (the 100 TB posture — Sennrich alg. 1 is one full aggregation job
    per merge, so vocabularies train on a sample in practice); the
    learned merges then tokenize the FULL corpus. The sample must be
    reproducible (same fraction -> same merges) and a fraction of 1.0
    must equal unsampled training."""
    from riemann_spark.functions import text as tx

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m_full = tx.bpe_train(docs, 3)
    m_one = tx.bpe_train(docs, 3, sample_fraction=1.0)
    assert m_one == m_full
    m_half_a = tx.bpe_train(docs, 3, sample_fraction=0.5)
    m_half_b = tx.bpe_train(docs, 3, sample_fraction=0.5)
    assert m_half_a == m_half_b  # deterministic hash sample
    assert len(m_half_a) == 3
    # sampled-trained merges segment the FULL corpus: every doc gets a
    # positive BPE token count no larger than its character count
    out = docs.select(
        tx.bpe_trained_token_count("text", m_half_a).alias("n"),
        F.length("text").alias("c"),
    ).agg(
        F.min("n").alias("lo"), F.max(F.col("n") > F.col("c")).alias("bad")
    ).collect()[0]
    assert out.lo > 0 and out.bad is False


def test_bpe_segmentation_sentinel_blocks_cross_token_merge(spark):
    """The pair (a,b) must never merge inside 'xa b' (symbol 'xa' ends
    in 'a' but is not 'a') — the sentinel-delimited replace guarantee."""
    from pyspark.sql import functions as F

    from riemann_spark.functions import text as tx

    df = spark.createDataFrame([(" x a b ",), (" xa b ",)], "s string")
    merged = df.select(
        F.replace("s", F.lit(" a b "), F.lit(" ab ")).alias("m")
    ).collect()
    assert [r.m for r in merged] == [" x ab ", " xa b "]


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR: a doc sharing the target domain's bigrams must out-score
    one made of raw-pool-only bigrams."""
    from pyspark.sql import functions as F

    from riemann_spark.functions import text as tx

    rows = (
        [(i, "tgt", "alpha beta alpha beta alpha beta") for i in range(5)]
        + [(100, "pool", "alpha beta alpha beta")]        # target-like
        + [(101, "pool", "gamma delta gamma delta")]      # pool-only
        + [(i + 200, "pool", "misc filler words here") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = {r.doc: r.weight for r in tx.dsir_weights(
        df, F.col("source") == "tgt", n_buckets=64
    ).collect()}
    assert w[100] > w[101]
    assert w[100] > 0 > w[101]


def test_shuffle_shards_wide_shard_space(spark):
    """ADVICE r4: shard ids come from a 32-bit md5 prefix — with
    n_shards=512 (> 256) the high shards must be populated and the
    layout stays deterministic across invocations."""
    from riemann_spark.functions.text import shuffle_shards

    d = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(d, 512)
    shards = [r.shard for r in out.select("shard").distinct().collect()]
    assert max(shards) >= 256  # old 8-bit hash left these empty forever
    assert min(shards) >= 0 and max(shards) < 512
    a = {(r.doc_id, r.shard, r.pos) for r in out.collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(d, 512).collect()}
    assert a == b


def test_sample_fixed_k_exact_and_stable(spark):
    """Exactly-k-per-key sample: k rows per key when the key has >= k
    members, all rows when it has fewer; identical sample under a
    different partitioning (no rand(), md5 order)."""
    from riemann_spark.functions.text import sample_fixed_k

    rows = [(i, "big" if i < 400 else "tiny") for i in range(405)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    s = sample_fixed_k(d, 10, "source")
    got = {r.source: set() for r in s.collect()}
    for r in s.collect():
        got[r.source].add(r.doc_id)
    assert len(got["big"]) == 10
    assert got["tiny"] == set(range(400, 405))  # n < k: keep all
    again = sample_fixed_k(d.repartition(13), 10, "source")
    assert {(r.source, r.doc_id) for r in again.collect()} == {
        (s_, i) for s_, ids in got.items() for i in ids
    }


def test_chunk_sliding_covers_and_overlaps(spark):
    """Window-32/stride-24 chunking: every token covered, consecutive
    chunks overlap by 8, tail chunk short, single chunk for short
    docs; fingerprints stable under repartitioning."""
    long_doc = " ".join(f"t{i}" for i in range(80))  # starts 0,24,48,72
    d = docs(spark, long_doc, "just five little words here")
    c = text.chunk_sliding(d, 32, 24)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.start, r.n_chunk_tokens) for r in c.collect())
    )
    assert rows == [
        (0, 0, 0, 32),
        (0, 1, 24, 32),
        (0, 2, 48, 32),
        (0, 3, 72, 8),  # tail: 80 - 72
        (1, 0, 0, 5),  # short doc: one whole-doc chunk
    ]
    again = text.chunk_sliding(d.repartition(7), 32, 24)
    assert {r.chunk_fp for r in again.collect()} == {
        r.chunk_fp for r in c.collect()
    }


def test_chunk_sliding_fingerprint_is_chunk_content(spark):
    """The fp is md5 of the space-joined chunk slice, so identical
    windows in different docs collide (the dedup-over-chunks use)."""
    d = docs(spark, "a b c", "a b c")
    fps = [r.chunk_fp for r in text.chunk_sliding(d, 32, 24).collect()]
    assert len(fps) == 2 and fps[0] == fps[1]


def test_boilerplate_report_flags_per_source_templates(spark):
    """A segment repeated across >= 2 docs of the SAME source is
    boilerplate; the same segment split across two sources is not."""
    tpl = " ".join(f"nav{i}" for i in range(10))  # exactly one segment
    uniq = [" ".join(f"u{d}_{i}" for i in range(10)) for d in range(4)]
    rows = [
        (0, f"{tpl} {uniq[0]}", "siteA"),
        (1, f"{tpl} {uniq[1]}", "siteA"),
        (2, f"{tpl} {uniq[2]}", "siteB"),  # only copy within siteB
        (3, uniq[3], "siteB"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.n_segs, r.n_boiler_segs, r.tokens_kept)
        for r in text.boilerplate_report(d, 10, 2).collect()
    }
    assert got[0] == (2, 1, 10) and got[1] == (2, 1, 10)
    assert got[2] == (2, 0, 20)  # cross-source repeat: legitimate
    assert got[3] == (1, 0, 10)


def test_boilerplate_report_within_doc_repeat_not_df(spark):
    """Document frequency counts DISTINCT docs — a segment repeated
    twice inside ONE doc does not reach min_df_docs=2."""
    seg = " ".join(f"x{i}" for i in range(10))
    d = spark.createDataFrame(
        [(0, f"{seg} {seg}", "s")], "doc_id long, text string, source string"
    )
    r = text.boilerplate_report(d, 10, 2).collect()[0]
    assert (r.n_segs, r.n_boiler_segs, r.tokens_kept) == (2, 0, 20)


def test_cluster_aware_split_keeps_clusters_together(spark):
    """Every member of a near-dup cluster gets the SAME split — the
    leakage guarantee a per-doc hash split lacks."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["cluster_aware_split"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    # moved is exactly "naive split differs": recompute naively
    naive = {
        r.doc_id: r.split
        for r in out.select(
            "doc_id", text.hash_split("doc_id").alias("split")
        ).collect()
    }
    for r in rows:
        assert r.moved == (naive[r.doc_id] != r.split)


def test_length_bucket_batches_homogeneous_and_bounded(spark):
    """Batches never mix buckets or shards, hold <= batch_size docs,
    and the layout is identical under a different partitioning."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["length_bucket_batches"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    sizes = {}
    for r in rows:
        sizes.setdefault((r.bucket, r.shard, r.batch_id), []).append(r.pos)
    for (_, _, _), poss in sizes.items():
        assert len(poss) <= 4
        assert len(set(poss)) == len(poss)


def test_verified_clusters_refine_raw_clusters(spark):
    """Jaccard-verified CC can only REMOVE edges, so every verified
    cluster must sit inside exactly one raw band-candidate cluster
    (refinement), and never grow beyond it."""
    from riemann_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    raw = {
        r.doc: r.cluster for r in QUERIES["dedup_clusters"](spark, sf).collect()
    }
    ver = QUERIES["dedup_clusters_verified"](spark, sf).collect()
    assert ver  # fixture has true near-dups
    by_vcluster = {}
    for r in ver:
        assert r.doc in raw  # verified docs are a subset of candidates
        by_vcluster.setdefault(r.cluster, set()).add(raw[r.doc])
    assert all(len(s) == 1 for s in by_vcluster.values())


def test_fim_transform_splits_partition_tokens(spark):
    """FIM split sizes always sum to the doc's token count; the fim
    subset is the deterministic hash-fraction < rate slice; pass-through
    rows fingerprint the original text (arXiv:2207.14255 PSM shape)."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["fim_transform"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "fixture docs expected"
    n_by_id = {
        r.doc_id: r.n
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", F.size(text.tokens("text")).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_prefix + r.n_middle + r.n_suffix == n_by_id[r.doc_id]
        if not r.apply_fim:
            assert r.n_middle == 0 and r.n_suffix == 0
    frac = sum(r.apply_fim for r in rows) / len(rows)
    assert 0.35 < frac < 0.65  # rate=0.5, deterministic not exact
    # determinism: same output under a different partitioning
    again = QUERIES["fim_transform"](spark, "/root/testdata/sf0.001")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_fim_transform_passthrough_fp_is_text_md5(spark):
    """Non-fim rows carry md5(text) untouched — the corpus mixer can
    interleave fim and plain docs by fingerprint without re-reading."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["fim_transform"](spark, "/root/testdata/sf0.001")
    plain = {r.doc_id: r.out_fp for r in out.collect() if not r.apply_fim}
    src = {
        r.doc_id: r.fp
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", F.md5("text").alias("fp"))
        .collect()
    }
    assert plain and all(src[i] == fp for i, fp in plain.items())


def test_blocklist_gate_flags_only_salted_docs(spark):
    """Every 7th doc gets two salted blocklist tokens and is flagged;
    the fixture corpus has no organic hits, so everything else passes."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["blocklist_gate"](spark, "/root/testdata/sf0.001")
    for r in out.collect():
        if r.doc_id % 7 == 0:
            assert r.blocked and r.n_blocked_tokens >= 2
        else:
            assert not r.blocked and r.n_blocked_tokens == 0


def test_winnowing_guarantee_and_density(spark):
    """Schleimer et al. 2003 theorem 1: every w consecutive gram
    hashes contribute >= 1 selected fingerprint, so any shared run of
    >= k+w-1 tokens yields a shared fingerprint; density stays well
    under 1 selection per gram."""
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(40)}" for _ in range(120)]
    shared = ["common"] * 7  # k+w-1 = 7 tokens -> must share a fp
    t1 = " ".join(words[:50] + shared + words[50:70])
    t2 = " ".join(words[70:] + shared)
    d = docs(spark, t1, t2)
    out = text.winnowing(d, k=4, w=4)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "shared k+w-1 run must share a fp"
    # coverage: every window of w grams holds a selection (doc 0)
    n_grams = len(t1.split()) - 4 + 1
    pos = sorted(r.pos for r in rows if r.doc_id == 0)
    assert pos[0] < 4 and n_grams - 1 - pos[-1] < 4
    # consecutive selections are at most w grams apart (window j and
    # j+1 share w-1 grams; a fresh min can sit w past the old one)
    assert all(b - a <= 4 for a, b in zip(pos, pos[1:]))
    # density ~2/(w+1): selections are a strict subset of grams
    assert len(pos) < 0.7 * n_grams
    # short doc: single whole-doc gram selected at pos 0
    short = text.winnowing(docs(spark, "just two"), k=4, w=4).collect()
    assert [(r.pos, r.doc_id) for r in short] == [(0, 0)]


def test_winnowing_shift_robust_chunk_hashing_is_not(spark):
    """Prepending one token shifts every fixed chunk boundary but
    preserves most winnowing fingerprints — the property that makes
    winnowing the overlap-detection fingerprint."""
    base = " ".join(f"t{i}" for i in range(60))  # aperiodic tokens
    d = docs(spark, base, "pre " + base)
    rows = text.winnowing(d, k=4, w=4).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    inter = len(fps[0] & fps[1])
    assert inter >= 0.8 * len(fps[0])
    chunks = {i: set() for i in (0, 1)}
    for r in text.chunk_sliding(d, 8, 8).collect():
        chunks[r.doc_id].add(r.chunk_fp)
    assert len(chunks[0] & chunks[1]) == 0  # every boundary shifted


def test_char_entropy_known_values(spark):
    """Uniform 2-char text -> exactly 1 bit/char; single-char text ->
    0; and entropy never exceeds log2(n_distinct)."""
    import math

    d = docs(spark, "abab", "aaaa", "the quick brown fox jumps")
    rows = {r.doc_id: r for r in text.char_entropy(d).collect()}
    assert rows[0].entropy_bits == 1.0 and rows[0].ideal_bytes == 1
    assert rows[1].entropy_bits == 0.0 and rows[1].ideal_bytes == 0
    r2 = rows[2]
    assert 0 < r2.entropy_bits <= math.log2(r2.n_distinct_chars) + 1e-9
    assert r2.n_chars == 25


def test_ann_truncation_recall_monotone_inputs(spark):
    """More prefix dims -> recall vs the full-dim top-5 can only be
    measured, not assumed monotone pointwise — but the mean over
    queries should not degrade as dims grow, and dim=64 would be 1.0
    by construction. Also: every (dim, q) pair present exactly once."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["ann_truncation_report"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 3 * 8 == len({(r.dim, r.q_id) for r in rows})
    mean = {}
    for r in rows:
        assert 0.0 <= r.recall_at5 <= 1.0 and r.n_overlap == r.recall_at5 * 5
        mean.setdefault(r.dim, []).append(r.recall_at5)
    m = {d: sum(v) / len(v) for d, v in mean.items()}
    assert m[32] >= m[8] - 1e-9


def test_winnowing_overlap_pairs_finds_moved_passage(spark):
    """A 12-token passage pasted into a different position of an
    otherwise-unrelated doc is detected; disjoint docs are not; a
    fingerprint present in every doc is guarded out by max_fp_df."""
    passage = " ".join(f"p{i}" for i in range(12))
    a = " ".join(f"a{i}" for i in range(40)) + " " + passage
    b = passage + " " + " ".join(f"b{i}" for i in range(40))
    c = " ".join(f"c{i}" for i in range(40))
    d = docs(spark, a, b, c)
    out = dedup.winnowing_overlap_pairs(d).collect()
    assert [(r.doc1, r.doc2) for r in out] == [(0, 1)]
    assert out[0].n_shared >= 2 and 0 < out[0].containment <= 1.0
    # max_fp_df=1 guards the shared passage's fps -> no pairs at all
    none = dedup.winnowing_overlap_pairs(d, max_fp_df=1).collect()
    assert none == []


def test_vocab_growth_and_zipf_known_corpora(spark):
    """A degenerate one-token source has beta ~0 and an (undefined ->
    filtered) flat zipf; a zipfian synthetic source fits slope ~ -1."""
    from riemann_spark.plans import QUERIES as catalog

    # source A: 200 copies of one token; source B: zipf f(r) ~ 1/r
    zipf_tokens = []
    for r in range(1, 41):
        zipf_tokens += [f"t{r}"] * max(1, int(200 / r))
    rows = [(0, "aaa " * 200, "A"), (1, " ".join(zipf_tokens), "B")]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from riemann_spark.functions import text as tx

    tok = d.select("source", F.explode(tx.tokens("text")).alias("token"))
    vg = {
        r.source: r
        for r in tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("token").cast("long").alias("n_types"),
        )
        .collect()
    }
    assert vg["A"].n_types == 1 and vg["B"].n_types == 40
    # full catalog query on the fixture corpus: sane ranges
    got = catalog["vocab_growth"](spark, "/root/testdata/sf0.001").collect()
    assert got and all(0 < r.heaps_beta <= 1.0 and 0 < r.ttr <= 1.0 for r in got)
    zs = catalog["zipf_slope"](spark, "/root/testdata/sf0.001").collect()
    assert zs and all(r.zipf_slope < 0 and r.n_terms <= 100 for r in zs)


def test_bottomk_sample_plan_and_exactness(spark):
    """Exactly k rows, rank dense from 1..k, and the physical plan is
    TakeOrderedAndProject — a per-task heap + driver merge, NOT a
    global sort shuffle."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["bottomk_sample"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 200
    assert sorted(r.rank for r in rows) == list(range(1, 201))
    pr = [r.priority for r in sorted(rows, key=lambda r: r.rank)]
    assert pr == sorted(pr) and all(0 <= p < 1 for p in pr)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") <= 1  # the post-limit 200-row window only


def test_soft_dedup_weights_conserve_cluster_mass(spark):
    """Weights within a cluster sum to exactly 1 per cluster; every
    doc appears once; singletons keep weight 1.0; eff_tokens sums to
    the deduped token budget."""
    from riemann_spark.plans import QUERIES

    out = QUERIES["soft_dedup_weights"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == len({r.doc_id for r in rows}) == 500
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cluster, []).append(r)
    for c, mem in by_c.items():
        assert len(mem) == mem[0].csize
        assert abs(sum(m.weight for m in mem) - 1.0) < 1e-9
        if len(mem) == 1:
            assert mem[0].weight == 1.0 and mem[0].eff_tokens == mem[0].n_tokens
    assert any(r.csize > 1 for r in rows), "fixture plants near-dups"


def test_greedy_pack_never_straddles_and_counts_waste(spark):
    """First-fit placements: no example crosses a bin boundary, bins
    never exceed budget, oversize docs truncate to one full bin, and
    placements are invariant under repartitioning."""
    sizes = [5, 4, 4, 12, 2, 8, 8, 1]
    d = spark.createDataFrame(
        [(i + 1, "w " * n, "s") for i, n in enumerate(sizes)],
        "doc_id long, text string, source string",
    )
    out = text.greedy_pack(d, 8, n_shards=1).orderBy("doc_id").collect()
    assert [(r.bin, r.bin_offset, r.n_packed, r.truncated) for r in out] == [
        (0, 0, 5, False),
        (1, 0, 4, False),
        (1, 4, 4, False),   # exact fill closes bin 1
        (2, 0, 8, True),    # 12 truncates to a full bin
        (3, 0, 2, False),
        (4, 0, 8, False),   # 8 won't fit after 2 -> new bin, exact
        (5, 0, 8, False),
        (6, 0, 1, False),
    ]
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin, 0)
        assert r.bin_offset == by_bin[r.bin]  # contiguous, no straddle
        by_bin[r.bin] += r.n_packed
        assert by_bin[r.bin] <= 8
    again = text.greedy_pack(d.repartition(5), 8, n_shards=1).collect()
    assert sorted(map(tuple, again)) == sorted(
        map(tuple, text.greedy_pack(d, 8, n_shards=1).collect())
    )


@pytest.mark.slow
def test_winnowing_matches_pure_python_reference_property(spark):
    """Property: the Spark winnowing selection equals a from-scratch
    Python implementation of Schleimer et al.'s algorithm on random
    corpora (ties, short docs, repeated tokens included)."""
    import hashlib
    import random

    def py_winnow(text_, k=4, w=4):
        toks = text_.strip().split()
        n = len(toks)
        gl = min(k, n)
        m = max(n - k + 1, 1)
        hs = []
        for i in range(m):
            gram = " ".join(toks[i : i + gl])
            hs.append(int(hashlib.md5(gram.encode()).hexdigest()[:13], 16))
        wl = min(w, m)
        sel = set()
        for j in range(m - wl + 1):
            best_h, best_p = None, None
            for p in range(j, j + wl):
                if best_h is None or hs[p] <= best_h:
                    best_h, best_p = hs[p], p
            sel.add((best_p, best_h))
        return sel

    rng = random.Random(99)
    texts = []
    for _ in range(12):
        n = rng.randrange(1, 40)
        vocab = rng.randrange(2, 12)
        texts.append(" ".join(f"v{rng.randrange(vocab)}" for _ in range(n)))
    texts += ["one", "a b", "x x x x x x x x"]
    d = docs(spark, *texts)
    got = {}
    for r in text.winnowing(d, k=4, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == py_winnow(t), f"doc {i}: {t!r}"


# ---------------------------------------------- round-6 fifth batch


def test_canonical_fingerprint_folds_edits(spark):
    df = docs(
        spark,
        "Hello,   World!",
        "hello world",
        "hello worlds",
    )
    rows = (
        df.select("doc_id", text.canonical_fingerprint("text").alias("c"))
        .orderBy("doc_id")
        .collect()
    )
    assert rows[0].c == rows[1].c  # case/punct/ws-invariant
    assert rows[0].c != rows[2].c  # alphanumeric content differs


def test_bigram_lm_scores_hand_computed(spark):
    import math

    # train = doc 0 only: "a b a b" -> bigrams ab, ba, ab; V = 2
    # c12: ab=2, ba=1; c1: a=2, b=1
    df = docs(spark, "a b a b", "a b", "c a")
    got = {
        r.doc: (r.mean_logprob, r.n_bigrams)
        for r in text.bigram_lm_scores(df, F.col("doc_id") == 0).collect()
    }
    p_ab = (2 + 1) / (2 + 2)  # seen bigram
    p_ba = (1 + 1) / (1 + 2)
    p_ca = (0 + 1) / (0 + 2)  # unseen head c -> Laplace floor
    assert got[0] == (
        round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6),
        3,
    )
    assert got[1] == (round(math.log(p_ab), 6), 1)
    assert got[2] == (round(math.log(p_ca), 6), 1)


def test_bigram_lm_short_docs_have_no_row(spark):
    df = docs(spark, "one", "two words")
    out = text.bigram_lm_scores(df, F.lit(True)).collect()
    assert [r.doc for r in out] == [1]


def test_cross_decontamination_verdicts(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [(0, base), (1, base + " extra"), (2, "completely unrelated words here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {
        r.doc: (r.n_eval_matches, r.keep)
        for r in dedup.cross_decontamination(train, ev, 0.5).collect()
    }
    assert got[0] == (1, False)  # exact copy of an eval doc -> drop
    assert got[1] == (1, False)  # near-dup -> drop
    assert got[2] == (0, True)  # unrelated -> keep; still gets a row


def test_span_corruption_shapes(spark):
    # 25 tokens -> 2 blocks (20 + 5); each block yields one sentinel
    df = docs(spark, " ".join(f"w{i}" for i in range(25)), "a b c")
    rows = {r.doc_id: r for r in text.span_corruption(df).collect()}
    r0 = rows[0]
    assert (r0.n_tokens, r0.n_spans) == (25, 2)
    assert 0 <= r0.n_corrupted <= 6  # up to 3 per block, clamped by n
    r1 = rows[1]
    assert (r1.n_tokens, r1.n_spans) == (3, 1)
    # determinism: same input -> same fingerprints
    again = {r.doc_id: r for r in text.span_corruption(df).collect()}
    assert again[0].input_fp == r0.input_fp and again[0].target_fp == r0.target_fp


def test_containment_pairs_directional(spark):
    """Containment catches the asymmetric case Jaccard misses: a short
    doc fully inside a long one has c(short→long)=1.0 while Jaccard
    stays at |short|/|long|. Unrelated docs produce no pair."""
    from riemann_spark.functions.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    other = "zeta eta theta iota kappa lambda"
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], "doc_id long, text string"
    )
    rows = containment_pairs(df, 0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc1"], r["doc2"]) == (1, 2)
    assert r["c12"] == 1.0  # short's 3 shingles all inside long
    assert r["c21"] < 0.1


def test_cc_warmstart_equals_scratch(spark):
    """Star compression preserves components and min-id reps: CC over
    (prior star edges UNION new edges) must equal from-scratch CC over
    (old UNION new) — including the hard cases: a new edge merging two
    old clusters, a chain crossing the old/new boundary, and new nodes
    never seen by the prior snapshot."""
    cases = [
        # (old edges, new edges)
        ([(1, 2), (2, 3), (10, 11)], [(3, 10)]),          # merge two priors
        ([(1, 2), (4, 5)], [(2, 4), (5, 6), (7, 8)]),     # chain + fresh pair
        ([(1, 2)], [(3, 4)]),                             # disjoint new
        ([(5, 9), (9, 7), (20, 30), (30, 40)], [(7, 20), (100, 40)]),
    ]
    for old, new in cases:
        old_df = spark.createDataFrame(old, "doc1 long, doc2 long")
        new_df = spark.createDataFrame(new, "doc1 long, doc2 long")
        prior = dedup.connected_components(old_df)
        star = prior.select(
            F.col("node").alias("doc1"), F.col("cluster").alias("doc2")
        )
        warm = dedup.connected_components(star.unionByName(new_df))
        scratch = dedup.connected_components(old_df.unionByName(new_df))
        assert sorted(map(tuple, warm.collect())) == sorted(
            map(tuple, scratch.collect())
        ), (old, new)


def test_incremental_index_writeback_batch2_sees_batch1(spark, tmp_path):
    """The write-back loop's defining property, asserted directly: a
    batch2 doc near-duplicating a BATCH1 doc (no lake copy) can only
    pair with it through the (doc, band) rows batch 1 APPENDED to the
    stored index — the initial lake state contains neither endpoint.
    Crafted corpus: ids 5 (lake), 10 (batch1), 11 (batch2) share one
    text; the catalog query must emit (10, 11) in phase batch2, and
    all three docs must land in ONE final cluster."""
    from riemann_spark.plans import QUERIES

    dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    other = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"
    # doc_id % 5: lake in {2,3,4}, batch1 == 0, batch2 == 1
    rows = [(2, dup), (10, dup), (11, dup), (7, other), (16, other)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        (r.doc1, r.doc2): (r.phase, r.cluster)
        for r in QUERIES["incremental_index_writeback"](
            spark, str(tmp_path)
        ).collect()
    }
    # batch2(11) x batch1(10) — exists ONLY via the written-back rows
    assert got[(10, 11)][0] == "batch2"
    # batch1 x lake via the initial index; batch2 x lake likewise
    assert got[(2, 10)][0] == "batch1"
    assert got[(2, 11)][0] == "batch2"
    # one component, min-id representative, across all three phases
    assert all(c == 2 for (_, c) in [got[(2, 10)], got[(2, 11)], got[(10, 11)]])
    # the second family: lake(7) x batch2(16) only
    assert got[(7, 16)] == ("batch2", 7)
    assert len(got) == 4


def test_ivf_assign_expr_matches_window_assignment(spark):
    """The ingest-time expression argmin must be BIT-IDENTICAL to the
    crossJoin+window assignment the batch/search paths use — same
    _dots folds, same precomputed norms, same (cos DESC, cell ASC)
    tie-break via the (cos, -cell) struct max."""
    from riemann_spark.plans.catalog_ml import _ivf_codebook_state

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents = _ivf_codebook_state(spark, sf)
    lits = similarity.centroid_literals(cents.collect())
    a = {r.vec_id: r.cell for r in similarity.ivf_cell_assignments(e, cents).collect()}
    b = {
        r.vec_id: r.cell
        for r in e.select(
            "vec_id",
            similarity.ivf_assign_expr(F.col("embedding"), lits).alias("cell"),
        ).collect()
    }
    assert a == b and len(a) == e.count()


def test_minhash_band_array_matches_grouped(spark):
    """The pure-expression band keys (minhash_band_array — the
    stateless-stream lane) must emit EXACTLY the grouped
    minhash_bands rows: same two-md5 hash family, same 8-hex chunks,
    same band strings; docs with < k tokens contribute nothing on
    either side."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    grouped = sorted(
        (r.doc, r.band) for r in dedup.minhash_bands(d).collect()
    )
    expr = sorted(
        (r.doc, r.band)
        for r in d.select(
            F.col("doc_id").alias("doc"),
            F.explode(dedup.minhash_band_array("text")).alias("band"),
        ).collect()
    )
    assert grouped == expr and len(grouped) > 0


def test_minhash_band_array_short_doc_empty(spark):
    """A doc with fewer than k tokens has no shingles: the expression
    form must yield an EMPTY array (not null bands), mirroring the
    grouped form where such docs simply have no shingle rows."""
    d = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    rows = d.select(
        dedup.minhash_band_array("text").alias("bands")
    ).collect()
    assert rows[0].bands == []


def test_pq_encode_with_dist_consistent(spark):
    """with_dist=True must not perturb the code assignment, and d2q
    must equal the independently recomputed quantized squared-L2
    between the subvector and its WINNING codeword."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = similarity.pq_codebook(e)
    plain = {
        (r.id, r.m): r.code
        for r in similarity.pq_encode(e, codebook=cb).collect()
    }
    withd = similarity.pq_encode(e, codebook=cb, with_dist=True)
    got = {(r.id, r.m): (r.code, r.d2q) for r in withd.collect()}
    assert plain == {k: v[0] for k, v in got.items()}
    # recompute the winner's distance through the same expression tree
    sub_w = 8
    recomputed = {
        (r.id, r.m): r.d2q_chk
        for r in withd.join(cb, ["m", "code"])
        .join(
            e.select(F.col("vec_id").alias("id"), "embedding"), "id"
        )
        .select(
            "id",
            "m",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(
                            F.col("embedding").cast("array<double>"),
                            F.col("m") * sub_w + 1,
                            sub_w,
                        ),
                        F.col("cw"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("d2q_chk"),
        )
        .collect()
    }
    assert recomputed == {k: v[1] for k, v in got.items()}


def test_streaming_neardup_probe_matches_batch(spark):
    """The stream-static probe (expression bands + static index join)
    must emit exactly the batch band-collision set between arrivals
    (doc_id % 4 == 3) and the lake index."""
    from riemann_spark.plans.catalog_ml import (
        streaming_neardup_probe_drained,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.band, r.doc_new, r.doc_lake)
        for r in streaming_neardup_probe_drained(spark, sf).collect()
    )
    d = spark.read.parquet(f"{sf}/documents.parquet")
    bands = dedup.minhash_bands(d)
    arr = bands.filter(F.col("doc") % 4 == 3).select(
        "band", F.col("doc").alias("doc_new")
    )
    lake = bands.filter(F.col("doc") % 4 != 3).select(
        "band", F.col("doc").alias("doc_lake")
    )
    want = sorted(
        (r.band, r.doc_new, r.doc_lake)
        for r in arr.join(lake, "band").collect()
    )
    assert got == want and len(want) > 0


@pytest.mark.slow
def test_minhash_band_array_property(spark):
    """Property form of the expression/grouped equivalence: on RANDOM
    small corpora (shared word pool so shingles repeat across docs,
    doc lengths straddling the k=3 shingle threshold), the pure-
    expression band keys must equal minhash_bands row-for-row —
    including docs with < 3 tokens contributing nothing on either
    side."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    doc = st.lists(
        st.sampled_from([f"w{i}" for i in range(10)]),
        min_size=1, max_size=9,
    )
    corpus = st.lists(doc, min_size=1, max_size=12)

    @settings(max_examples=5, deadline=None)
    @given(docs=corpus)
    def prop(docs):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        grouped = sorted(
            (r.doc, r.band) for r in dedup.minhash_bands(df).collect()
        )
        expr = sorted(
            (r.doc, r.band)
            for r in df.select(
                F.col("doc_id").alias("doc"),
                F.explode(dedup.minhash_band_array("text")).alias("band"),
            ).collect()
        )
        assert grouped == expr

    prop()


def test_simhash64_bands_shape_and_determinism(spark):
    """simhash64_bands emits exactly 4 band rows per doc with ≥1
    distinct token, ordinal-prefixed 16-bit values, deterministic
    across runs; identical token SETS yield identical bands (signature
    is a set function)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha alpha"),
         (3, "wholly different tokens here")],
        "doc_id long, text string",
    )
    a = sorted((r.doc, r.band) for r in dedup.simhash64_bands(df).collect())
    b = sorted((r.doc, r.band) for r in dedup.simhash64_bands(df).collect())
    assert a == b
    by_doc = {}
    for doc, band in a:
        by_doc.setdefault(doc, []).append(band)
    assert all(len(v) == 4 for v in by_doc.values())
    for v in by_doc.values():
        for band in v:
            ordinal, val = band.split("|")
            assert ordinal in "0123" and 0 <= int(val) < 65536
    # docs 1 and 2 have the same distinct-token set -> same signature
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] != by_doc[3]


def test_streaming_fertility_gate_matches_batch(spark):
    """The streaming gate's per-doc decisions must equal the same
    baked-merge projection run as a batch query over the same corpus
    (stream-vs-batch agreement for the stateless serving shape)."""
    from riemann_spark.functions import text
    from riemann_spark.plans.catalog_ml import (
        _bpe_win_col,
        _N_BPE_MERGES,
        streaming_fertility_gate_drained,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.doc_id, r.n_ws_tokens, r.n_bpe_tokens, r.flagged)
        for r in streaming_fertility_gate_drained(spark, sf).collect()
    )
    d = spark.read.parquet(f"{sf}/documents.parquet")
    merges = text.bpe_train(d.filter(_bpe_win_col() == 0), _N_BPE_MERGES)
    base = (
        d.filter(_bpe_win_col() == 0)
        .agg(
            F.sum(text.token_count("text").cast("long")).alias("sw"),
            F.sum(text.bpe_trained_token_count("text", merges)).alias("sb"),
        )
        .collect()[0]
    )
    f0 = base.sb / float(base.sw)
    ws = text.token_count("text").cast("long")
    bpe = text.bpe_trained_token_count("text", merges)
    fert = bpe / ws.cast("double")
    want = sorted(
        (r.doc_id, r.n_ws_tokens, r.n_bpe_tokens, r.flagged)
        for r in d.select(
            "doc_id",
            ws.alias("n_ws_tokens"),
            bpe.alias("n_bpe_tokens"),
            (fert > F.lit(f0) * F.lit(1.25)).alias("flagged"),
        ).collect()
    )
    # decisions agree doc-for-doc; on this uniform-vocabulary corpus
    # the 1.25x threshold trips nowhere (fertility is tight around the
    # baseline), so assert coverage + variation, not a flag
    assert got == want and len(got) == d.count()
    ferts = {b / w for _, w, b, _ in got}
    assert len(ferts) > 1


def test_lsh_topk_probe_depth_requires_multiprobe():
    # ADVICE r11: probe_depth > 1 with multiprobe=False silently
    # returned single-bucket results; it must raise instead. The
    # validation precedes any plan construction, so no frames needed.
    with pytest.raises(ValueError, match="multiprobe"):
        similarity.lsh_topk(None, None, 5, multiprobe=False, probe_depth=2)


def test_shared_band_cap_constants_thread_through():
    # ADVICE r11: the runaway-bucket caps live in dedup.MAX_BAND_DF /
    # MAX_SHINGLE_DF and every consumer derives from them — the
    # function defaults and the catalog's oracle templates alike.
    import inspect

    from riemann_spark.plans import catalog_ml

    assert catalog_ml._BAND_CAP == dedup.MAX_BAND_DF
    assert catalog_ml._SHINGLE_CAP == dedup.MAX_SHINGLE_DF
    sig = inspect.signature(dedup.lsh_candidate_pairs)
    assert sig.parameters["max_band_df"].default == dedup.MAX_BAND_DF
    sig = inspect.signature(dedup.incremental_lsh_pairs)
    assert sig.parameters["max_band_df"].default == dedup.MAX_BAND_DF
    sig = inspect.signature(dedup.ngram_jaccard_pairs)
    assert sig.parameters["max_shingle_df"].default == dedup.MAX_SHINGLE_DF
    # and the compiled oracles carry the evaluated constant
    from riemann_spark.plans import ORACLES

    assert f"> {dedup.MAX_BAND_DF})" in ORACLES["dedup_minhash_lsh"]


def test_ann_recall_scan_frac_derived_from_constants():
    # ADVICE r11: scan_frac must be computed from _N_PLANES/_IVF_CELLS,
    # not hardcoded 1/16-style literals on both sides.
    from riemann_spark.plans import catalog_ml as cml

    n = cml._N_PLANES
    assert cml._lsh_scan(0) == (1, 2**n)
    assert cml._lsh_scan(1) == (1 + n, 2**n)
    assert cml._lsh_scan(2) == (1 + n + n * (n - 1) // 2, 2**n)
    assert cml._ivf_scan(2) == (2, cml._IVF_CELLS)
    from riemann_spark.plans import ORACLES

    num, den = cml._lsh_scan(2)
    assert f"{num}.0 / {den}" in ORACLES["ann_recall_report"]
