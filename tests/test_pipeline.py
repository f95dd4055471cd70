"""Training-data pipeline operators: probabilistic ones are verified against
their exact counterparts on the driver testdata."""

import pytest
from pyspark.sql import functions as F

from sequenzo_spark.pipeline.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from sequenzo_spark.pipeline.similarity import (
    brute_force_cosine_topk,
    lsh_cosine_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_minhash_lsh_recall_on_planted_dups(spark, docs):
    exact = {
        (r.d1, r.d2)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert len(exact) >= 5, "testdata should contain planted near-dups"
    cand = {
        (r.d1, r.d2) for r in minhash_lsh_candidates(docs).collect()
    }
    found = exact & cand
    # 16 bands × 4 rows at j≥0.8 → expected recall ≈ 1-(1-0.8^4)^16 ≈ 0.9996
    assert len(found) / len(exact) >= 0.9, (len(found), len(exact))


def test_minhash_estimate_close_to_exact(spark, docs):
    exact = {
        (r.d1, r.d2): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    est = {
        (r.d1, r.d2): r.jaccard_est
        for r in minhash_lsh_candidates(docs).collect()
    }
    checked = 0
    for pair, j in exact.items():
        if pair in est:
            assert abs(est[pair] - j) < 0.25, (pair, j, est[pair])
            checked += 1
    assert checked >= 5


def test_simhash_near_dups_have_small_hamming(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.9).collect()
    sims = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert pairs
    for r in pairs:
        ham = bin((sims[r.d1] ^ sims[r.d2]) & ((1 << 64) - 1)).count("1")
        assert ham <= 16, (r.d1, r.d2, ham)


def test_lsh_cosine_topk_overlaps_brute_force(spark, emb):
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    bf = [r.vec_id for r in brute_force_cosine_topk(emb, qvec, k=10).collect()]
    ann = [r.vec_id for r in lsh_cosine_topk(emb, qvec, k=10).collect()]
    assert bf[0] == 0  # the query vector itself is its own nearest neighbor
    assert ann[0] == 0
    # sign-LSH with 4 tables of 8 planes: expect most of the true top-10
    assert len(set(bf) & set(ann)) >= 5, (bf, ann)


def test_brute_force_topk_is_exact_and_sorted(spark, emb):
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    rows = brute_force_cosine_topk(emb, qvec, k=10).collect()
    assert abs(rows[0].cosine - 1.0) < 1e-9
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_short_docs_do_not_crash_shingles(spark):
    """Round-1 advisor HIGH finding: docs with < n tokens made F.sequence
    descend and F.slice throw. Empty/one-word/two-word docs must flow
    through every shingle-based op and simply produce no shingles."""
    rows = [
        (1, ""), (2, "one"), (3, "two words"),
        (4, "three word doc"), (5, "three word doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert {(r.d1, r.d2) for r in pairs} == {(4, 5)}
    cand = minhash_lsh_candidates(docs).collect()
    assert {(r.d1, r.d2) for r in cand} == {(4, 5)}
    # split(trim("")) yields one empty-string token, so all 5 docs fingerprint
    assert simhash64(docs).count() == 5


def test_batch_ann_matches_single_query_lsh(spark, emb):
    """Batch ANN (bucket equi-join over many queries) must return exactly the
    single-query LSH result per query — same planes, same buckets, same
    exact-cosine rerank — plus each query itself at rank 1."""
    from sequenzo_spark.pipeline.similarity import lsh_cosine_topk_batch

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_cosine_topk_batch(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert rows[0]["vec_id"] == qid and rows[0]["cosine"] > 0.999999
        qvec = [float(x) for x in
                emb.filter(F.col("vec_id") == qid).first()["embedding"]]
        single = [r.vec_id for r in lsh_cosine_topk(emb, qvec, k=5).collect()]
        assert [r["vec_id"] for r in rows] == single


def test_minhash_signature_positions_vary_by_seed(spark):
    """Regression (round-3): a two-parameter transform lambda let the array
    index shadow the hash seed, making all 64 signature positions identical
    per doc and position-dependent across docs. Distinct seeds must yield
    distinct hash functions, and a high-overlap unaligned pair must match in
    most positions."""
    from sequenzo_spark.pipeline.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [
            # same 9-token tail, one extra leading token in doc 1: shingle
            # arrays are unaligned but share most shingles
            (1, "zzz a b c d e f g h i"),
            (2, "a b c d e f g h i"),
        ],
        "doc_id long, text string",
    )
    sig = {r.doc_id: list(r.signature) for r in minhash_signatures(docs).collect()}
    # distinct hash functions: a single doc's 64 positions can't all be equal
    assert len(set(sig[1])) > 1
    # shared shingles dominate → most positions agree despite misalignment
    agree = sum(1 for x, y in zip(sig[1], sig[2]) if x == y)
    assert agree >= 40, agree


def test_minhash_verified_pairs_equals_exact(spark):
    """minhash_verified_pairs == ngram_jaccard_pairs on a corpus with an
    UNALIGNED near-dup (prefix insertion), which the pre-fix LSH missed."""
    from sequenzo_spark.pipeline.dedup import (
        minhash_verified_pairs,
        ngram_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "intro " + base),          # near-dup, shingles shifted
            (3, "completely different words in this one about spark plans"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.d1, r.d2) for r in minhash_verified_pairs(docs, threshold=0.7).collect()
    }
    want = {
        (r.d1, r.d2)
        for r in ngram_jaccard_pairs(docs, threshold=0.7, max_shingle_df=None).collect()
    }
    assert got == want and got == {(1, 2)}, (got, want)


def test_simhash_hilo_matches_python_md5_reference(spark):
    """simhash64_hilo's per-row fold (shared with simhash64) must reproduce
    the definition exactly: md5 token hash split into 32-bit halves, ±1 bit
    counts over the token MULTISET, majority packing. Pure-Python oracle."""
    import hashlib
    import re

    from sequenzo_spark.pipeline.dedup import simhash64_hilo

    texts = [
        ("a", "the quick brown fox the quick"),
        ("b", "  spaced   out   tokens "),
        ("c", "single"),
        ("d", ""),  # empty text → single empty-string token (split semantics)
    ]
    docs = spark.createDataFrame(texts, "doc_id string, text string")
    got = {r["doc_id"]: (r["simhash_hi"], r["simhash_lo"])
           for r in simhash64_hilo(docs).collect()}
    for doc_id, text in texts:
        toks = re.split(r"\s+", text.strip())
        counts = [0] * 64
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            hi, lo = int(h[:8], 16), int(h[8:16], 16)
            for b in range(64):
                bit = (lo >> b) & 1 if b < 32 else (hi >> (b - 32)) & 1
                counts[b] += 1 if bit else -1
        want = (
            sum(1 << (b - 32) for b in range(32, 64) if counts[b] > 0),
            sum(1 << b for b in range(32) if counts[b] > 0),
        )
        assert got[doc_id] == want, doc_id


def test_ngram_prefix_filter_mode_identical(spark, docs):
    """prefix_filter=True (Bayardo-style candidate generation + capped-array
    rescore) must produce BIT-IDENTICAL pairs and Jaccard values to the
    direct self-join, at several thresholds (the completeness proof's
    overlap bound i >= ceil(tau*|full|) is exercised at each)."""
    for tau in (0.5, 0.8, 0.9):
        direct = sorted(
            tuple(r) for r in ngram_jaccard_pairs(docs, threshold=tau).collect()
        )
        pf = sorted(
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs, threshold=tau, prefix_filter=True
            ).collect()
        )
        assert direct == pf, (tau, len(direct), len(pf))
        assert len(direct) > 0  # planted near-dups exist at every tau here
