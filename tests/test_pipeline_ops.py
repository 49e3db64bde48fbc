"""Training-data pipeline operators: ANN recall, dedup candidate quality,
multimodal plumbing, densify semantics (tests beyond the driver's DuckDB
oracle — behavioral properties the oracle can't express)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_lsh_ann_recall_vs_bruteforce(spark, embs):
    from dhr_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    qs = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = cosine_topk_bruteforce(qs, embs, k=10).collect()
    approx = cosine_topk_lsh(qs, embs, k=10, dim=64).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["vec_id"])
    got = {}
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # rank-1 must be the query itself in both (cosine=1.0 self-match)
    for r in exact + approx:
        if r["rank"] == 1:
            assert r["vec_id"] == r["qid"]


def test_minhash_candidates_cover_true_near_dups(spark, docs):
    """Every pair with 3-gram Jaccard >= 0.9 must be an LSH candidate
    (16 hashes, 4x4 bands: P[miss | j=0.9] = (1-0.9^4)^4 ~ 1.5% per pair —
    the planted near-dups at this sf must all collide)."""
    from dhr_spark.operators.dedup import lsh_candidate_pairs, ngram_jaccard_pairs

    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    cands = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(docs).collect()
    }
    assert truth, "test data should contain planted near-duplicates"
    missed = truth - cands
    assert not missed, f"LSH missed true near-dups: {missed}"


def test_exact_dedup_survivors(spark, docs):
    from dhr_spark.operators.dedup import exact_dedup

    uniq = exact_dedup(docs)
    assert uniq.count() == docs.select("text").distinct().count()


def test_simhash_near_dups_have_small_hamming(spark, docs):
    from dhr_spark.operators.dedup import ngram_jaccard_pairs, simhash, hamming64

    near = ngram_jaccard_pairs(docs, n=3, threshold=0.9)
    s = simhash(docs)
    joined = (
        near.join(s.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha")), "id_a")
        .join(s.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb")), "id_b")
        .select(hamming64(F.col("ha"), F.col("hb")).alias("d"))
        .collect()
    )
    assert joined
    # jaccard>=0.9 pairs should be far below the ~30-bit random expectation
    assert sum(r["d"] for r in joined) / len(joined) <= 12


def test_embedding_lsh_pairs_recall_on_near_dups(spark):
    """Planted near-identical vectors (cosine > 0.99) must survive the LSH
    gate: per-table collision prob at theta~0 is ~(1-theta/pi)^6 ~ 1, so
    missing all 8 tables is ~impossible. Checks the scale path loses no
    true near-dups vs the brute verifier."""
    import numpy as np

    from dhr_spark.operators.dedup import embedding_dup_pairs, embedding_dup_pairs_lsh

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # 10 planted near-dups of vectors 0..9 (ids 100..109)
    for i in range(10):
        rows.append((100 + i, [float(x) for x in base[i] + 0.01 * rng.standard_normal(64)]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(embs, threshold=0.99).collect()
    }
    gated = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(embs, threshold=0.99).collect()
    }
    assert brute, "planted near-dups should exceed cosine 0.99"
    recall = len(brute & gated) / len(brute)
    assert recall >= 0.95, (recall, brute - gated)


def test_ivf_ann_self_hit_and_recall(spark, embs):
    """IVF-probed ANN: a query's own cell is always probed (self-hit exact);
    cross-cell recall vs brute force bounded like the LSH path."""
    from dhr_spark.operators.ivf import cosine_topk_ivf
    from dhr_spark.operators.similarity import cosine_topk_bruteforce

    qs = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = cosine_topk_bruteforce(qs, embs, k=10).collect()
    approx = cosine_topk_ivf(qs, embs, k=10).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
        if r["rank"] == 1:
            assert r["vec_id"] == r["qid"]
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_quantized_ann_close_to_exact(spark, embs):
    """int8 scalar quantization: top-1 self-hit preserved; top-10 overlap
    with exact cosine >= 0.8 (the precision/storage tradeoff bound)."""
    from dhr_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_quantized,
    )

    qs = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = cosine_topk_bruteforce(qs, embs, k=10).collect()
    quant = cosine_topk_quantized(qs, embs, k=10).collect()
    t, g = {}, {}
    for r in exact:
        t.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in quant:
        g.setdefault(r["qid"], set()).add(r["vec_id"])
        if r["rank"] == 1:
            assert r["vec_id"] == r["qid"]
    overlaps = [len(t[q] & g[q]) / len(t[q]) for q in t]
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps


def test_simhash_blocked_pairs_equal_brute(spark, docs):
    """Pigeonhole blocking is a lossless decomposition: the bucketed scale
    path must produce EXACTLY the brute crossJoin's pairs."""
    from dhr_spark.operators.dedup import simhash_blocked_pairs, simhash_dup_pairs

    for d in (3, 8):
        brute = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_dup_pairs(docs, max_hamming=d).collect()
        }
        blocked = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_blocked_pairs(docs, max_hamming=d).collect()
        }
        assert blocked == brute, f"d={d}: {blocked ^ brute}"


def test_minhash_sentinel_docs_not_banded(spark):
    """Docs shorter than the shingle width all share the -1 sentinel
    signature; they must NOT appear as LSH candidates of each other."""
    from dhr_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    rows = [(1, "hi"), (2, "ok no"), (3, "yes"), (4, "a proper longer document text here"),
            (5, "a proper longer document text here")]
    short_docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(short_docs).collect()}
    for i in (1, 2, 3):
        assert sigs[i] == [-1] * 16
    assert sigs[4] == sigs[5] != [-1] * 16
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(short_docs).collect()}
    assert pairs == {(4, 5)}


def test_multimodal_fake_features_deterministic(spark, docs):
    from dhr_spark.operators.multimodal import blob_features, with_blob

    wb = with_blob(docs.limit(20))
    a = {r["doc_id"]: r["feature"] for r in blob_features(wb, fake=True).collect()}
    b = {r["doc_id"]: r["feature"] for r in blob_features(wb, fake=True).collect()}
    assert a == b
    for f in a.values():
        assert len(f) == 16
        assert abs(sum(f) - 1.0) < 1e-3  # L1-normalized histogram


def _pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil(), reason="Pillow installed: real decode active")
def test_multimodal_real_decode_raises_without_pil(spark, docs):
    from dhr_spark.operators.multimodal import blob_features, with_blob
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        blob_features(with_blob(docs.limit(2)), fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


@pytest.mark.skipif(not _pil(), reason="Pillow not installed")
def test_multimodal_real_decode_with_pil(spark):
    """With Pillow present, decode_blob opens a real 2x2 PNG and emits the
    L1-normalized 16-bin luminance histogram in the stand-in's schema."""
    import io

    import numpy as np
    from PIL import Image

    from dhr_spark.operators.multimodal import blob_features

    img = Image.fromarray(
        np.array([[0, 255], [16, 240]], dtype=np.uint8), mode="L"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, blob binary")
    rows = blob_features(df, fake=False).collect()
    assert len(rows) == 1
    f = rows[0]["feature"]
    assert len(f) == 16 and abs(sum(f) - 1.0) < 1e-3
    # pixel values 0,16,240,255 land in bins 0,1,15,15
    assert f[0] == 0.25 and f[1] == 0.25 and f[15] == 0.5


def test_multimodal_fake_path_byte_stable(spark):
    """The stand-in featurizer is a pure function of the bytes — pinned
    output for a fixed payload, so oracle hashes can never drift."""
    from dhr_spark.operators.multimodal import blob_features

    df = spark.createDataFrame(
        [(7, bytearray(bytes(range(32))))], "doc_id long, blob binary"
    )
    f = blob_features(df, fake=True).collect()[0]["feature"]
    assert f[0] == 0.5 and f[1] == 0.5 and sum(f[2:]) == 0.0


def test_dup_clusters_chain_converges_fast(spark):
    """A 200-node path graph is the pathological near-dup chain: plain
    min-label propagation needs ~200 rounds; with pointer jumping the loop
    must converge within max_iter=12 (~2*log2(200)) and still label every
    node with the component minimum."""
    from dhr_spark.operators.dedup import dup_clusters

    n = 200
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1, 0.9) for i in range(n - 1)],
        "id_a long, id_b long, jaccard double",
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(docs, pairs, max_iter=12).collect()}
    assert out == {i: 0 for i in range(n)}


def test_maxsim_takes_per_qtoken_max(spark):
    """The max is load-bearing: one query token matching several doc terms
    via the prefix key must contribute only the best weight, once."""
    from dhr_spark.operators.maxsim import maxsim_score

    qt = spark.createDataFrame(
        [("q1", 0, "sparking"), ("q1", 1, "sparking")],
        "qid string, qpos int, term string",
    )
    post = spark.createDataFrame(
        [("sparkle", 7, 2.0), ("sparky", 7, 5.0), ("other", 7, 9.0)],
        "term string, docid long, weight double",
    )
    rows = maxsim_score(qt, post).collect()
    # both occurrences match {sparkle, sparky} via key 'spar'; max = 5.0 each
    assert len(rows) == 1
    assert rows[0]["qid"] == "q1" and rows[0]["docid"] == 7
    assert rows[0]["score"] == 10.0


def test_wordpiece_slot_raises_without_transformers(spark):
    from dhr_spark.functions.wordpiece import hf_wordpiece_udf

    try:
        import transformers  # noqa: F401
        pytest.skip("transformers installed; slot is live")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="transformers"):
        hf_wordpiece_udf()


def test_hybrid_fusion_self_hit_top(spark, docs, embs):
    """Query-by-example hybrid: the query document itself gets cosine 1.0
    plus its full lexical self-score, so it must land in the top 5 (BM25
    query-by-example can legitimately rank a term-denser doc above self,
    so exact rank-1 is NOT an invariant)."""
    from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
    from dhr_spark.operators.hybrid import hybrid_topk
    from dhr_spark.operators.termfreq import doc_lengths, term_freqs, with_tokens

    tok = with_tokens(docs, mode="simple").withColumnRenamed("doc_id", "docid")
    tfs = term_freqs(tok)
    dls = doc_lengths(tok)
    cs = dls.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf", idf_col(F.col("df"), int(cs["n"]))
    )
    post = (
        tfs.join(dls, "docid")
        .join(F.broadcast(ts.select("term", "idf")), "term")
        .select("term", "docid", bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"), F.lit(float(cs["a"])), 0.9, 0.4
        ).alias("weight"))
    )
    dq = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    qtfs = tfs.filter(F.col("docid") < 3).select(
        F.col("docid").alias("qid"), "term", F.col("tf").alias("qtf")
    )
    out = hybrid_topk(dq, embs, qtfs, post, k=5, lam=0.5).collect()
    top5 = {}
    for r in out:
        top5.setdefault(r["qid"], set()).add(r["docid"])
    assert set(top5) == {0, 1, 2}
    for qid, docs5 in top5.items():
        assert qid in docs5, (qid, docs5)


def test_densify_keeps_slot_max(spark):
    from dhr_spark.operators.densify import collision_counts, densify

    post = spark.createDataFrame(
        [(1, 0, 2.0), (1, 4, 5.0), (1, 8, 5.0), (1, 1, 1.0), (2, 9, 3.0)],
        "docid long, term_id long, weight double",
    )
    out = {(r["docid"], r["slot"]): (r["value"], r["bucket"])
           for r in densify(post, dim=4).collect()}
    # terms 0,4,8 share slot 0: max weight 5.0, tie between buckets 1 and 2
    # -> smaller bucket wins
    assert out[(1, 0)] == (5.0, 1)
    assert out[(1, 1)] == (1.0, 0)
    assert out[(2, 1)] == (3.0, 2)
    coll = {r["docid"]: r["collisions"] for r in
            collision_counts(post, dim=4).collect()}
    assert coll == {1: 2, 2: 0}


def test_pq_adc_recall_vs_bruteforce(spark, embs):
    """PQ/ADC approximate top-k: no pruning, only quantization error, so
    recall vs brute force should beat the coarse-probe paths; top-1 should
    be the self-hit for most queries."""
    from dhr_spark.operators.pq import cosine_topk_pq
    from dhr_spark.operators.similarity import cosine_topk_bruteforce

    qs = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = cosine_topk_bruteforce(qs, embs, k=10).collect()
    approx = cosine_topk_pq(qs, embs, k=10).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["vec_id"])
    self_hits = 0
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
        if r["rank"] == 1 and r["vec_id"] == r["qid"]:
            self_hits += 1
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    assert self_hits >= len(truth) // 2, self_hits


def test_pq_codes_shape(spark, embs):
    """Every vector gets exactly m codes, each a valid centroid id."""
    from dhr_spark.operators.pq import PQ_KSUB, PQ_M, pq_codebooks, pq_encode

    books = pq_codebooks(embs)
    codes = pq_encode(embs, books)
    n = embs.count()
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == n and all(r["count"] == PQ_M for r in per_vec)
    rng = codes.agg(F.min("cid"), F.max("cid")).collect()[0]
    assert rng[0] >= 0 and rng[1] < PQ_KSUB


def _np_aggregate(dense, dims):
    """Reference Aggretriever aggregate(full=True) replayed in numpy
    (utils.py:16-44): slice/pad to a multiple of 2*dims, bucket-max, then
    the signed even/odd pair select."""
    import numpy as np

    width = 2 * dims
    vocab = dense.shape[1]
    rm = vocab % width
    if rm > 1000:
        rm -= width
    if rm >= 0:
        x = dense[:, rm:]
    else:
        x = np.pad(dense, [(0, 0), (0, -rm)])
    x = x.reshape(dense.shape[0], -1, width)
    tok = x.max(axis=1)
    pos, neg = tok[:, 0::2], tok[:, 1::2]
    return np.where(pos > neg, pos, -neg)


@pytest.mark.parametrize("vocab,dims", [(100, 16), (4640, 32)])
def test_aggregate_pool_matches_reference_semantics(spark, vocab, dims):
    """aggregate_pool == the reference's dense aggregate() on random sparse
    fixtures; vocab=4640/dims=32 exercises the rm>1000 negative-pad branch
    (4640 % 64 = 32 <= 1000 keeps slice; use a vocab forcing rm > 1000)."""
    import numpy as np

    from dhr_spark.operators.densify import aggregate_pool

    rng = np.random.default_rng(11)
    n_docs = 6
    dense = np.zeros((n_docs, vocab))
    rows = []
    for d in range(n_docs):
        for t in rng.choice(vocab, size=min(40, vocab // 2), replace=False):
            w = round(float(rng.uniform(0.1, 5.0)), 6)
            dense[d, t] = w
            rows.append((d, int(t), w))
    post = spark.createDataFrame(rows, "docid long, term_id long, weight double")
    got = {
        (r["docid"], r["slot"]): r["value"]
        for r in aggregate_pool(post, dims, vocab).collect()
    }
    want = _np_aggregate(dense, dims)
    for (d, s), v in got.items():
        assert abs(v - round(float(want[d, s]), 6)) < 1e-9, (d, s)
    # pairs absent from the sparse output must be zero in the dense result
    for d in range(n_docs):
        for s in range(dims):
            if (d, s) not in got:
                assert want[d, s] == 0.0


def test_dup_clusters_10k_chain_logarithmic_rounds(spark):
    """Adversarial 10k-node path graph (the worst-case near-dup chain):
    pointer jumping must converge in O(log n) rounds — bound 2*ceil(log2 n)
    + 2 slack — and still label every node with the component minimum."""
    import math

    from dhr_spark.operators.dedup import dup_clusters

    n = 10_000
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats = {}
    out = dup_clusters(docs, pairs, max_iter=40, stats=stats)
    bound = 2 * math.ceil(math.log2(n)) + 2
    assert stats["rounds"] <= bound, stats
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cluster_id") == 0).cast("int")).alias("zeros"),
    ).collect()[0]
    assert agg["n"] == n and agg["zeros"] == n


def test_decontaminate_flags_ngram_overlap(spark):
    from dhr_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w"), (3, "q a b c x"), (4, "a b")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "a b c"), ("b2", "c d e f")], "doc_id string, text string"
    )
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(docs, bench, n=3, min_hits=1).collect()}
    # doc1 shares "a b c" and "c d e"; doc3 shares "a b c"; doc4 too short
    assert got == {1: (2, True), 2: (0, False), 3: (1, True), 4: (0, False)}
    strict = {r["doc_id"]: r["contaminated"]
              for r in decontaminate(docs, bench, n=3, min_hits=2).collect()}
    assert strict == {1: True, 2: False, 3: False, 4: False}


def test_unigram_xent_reference(spark):
    import math

    from dhr_spark.operators.textstats import unigram_xent

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["xent"], r["ppl"])
        for r in unigram_xent(docs).collect()
    }
    pa, pb, pc = 2 / 5, 2 / 5, 1 / 5
    x0 = -(2 * math.log2(pa) + math.log2(pb)) / 3
    x1 = -(math.log2(pb) + math.log2(pc)) / 2
    assert got == {
        0: (3, round(x0, 6), round(2 ** x0, 4)),
        1: (2, round(x1, 6), round(2 ** x1, 4)),
    }  # empty doc dropped (P6 convention)


def test_unigram_xent_external_lm_oov_floor(spark):
    import math

    from dhr_spark.operators.textstats import unigram_xent

    docs = spark.createDataFrame([(1, "b c")], "doc_id long, text string")
    lm = spark.createDataFrame([("a", 4), ("b", 4)], "term string, ctf long")
    got = {r["doc_id"]: r["xent"]
           for r in unigram_xent(docs, lm=lm, lm_total=10).collect()}
    # c is OOV -> add-half floor ctf=0.5
    want = -(math.log2(4 / 10) + math.log2(0.5 / 10)) / 2
    assert got == {1: round(want, 6)}
    import pytest as _pt
    with _pt.raises(ValueError, match="lm_total"):
        unigram_xent(docs, lm=lm)


def test_unigram_xent_flags_repetitive_docs(spark):
    """A doc of one repeated common token scores LOWER xent than a doc of
    rare tokens — the quality-filter direction (high xent = surprising)."""
    from dhr_spark.operators.textstats import unigram_xent

    rows = [(0, "the " * 50), (1, "zeitgeist perihelion qanat")]
    rows += [(i, "the common words here") for i in range(2, 12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["xent"] for r in unigram_xent(docs).collect()}
    assert got[0] < got[1]


def test_stratified_sample_determinism_and_rates(spark):
    from dhr_spark.operators.textstats import stratified_sample

    rows = [(i, "keepme" if i % 2 == 0 else "crawl",
             f"text {i}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = stratified_sample(
        docs, "source", {"keepme": 1.0, "crawl": 0.25}
    )
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {r["doc_id"] for r in kept.collect()}
    assert ids1 == ids2  # deterministic across runs
    assert all(i in ids1 for i in range(0, 400, 2))  # rate 1.0 keeps all
    n_crawl = sum(1 for i in ids1 if i % 2 == 1)
    assert 20 <= n_crawl <= 80  # ~50 of 200 at rate .25 (hash variance)
    # membership stable under corpus growth: same ids survive in a superset
    more = spark.createDataFrame(
        [(i, "crawl", f"t {i}") for i in range(400, 800)],
        "doc_id long, source string, text string",
    )
    grown = {
        r["doc_id"]
        for r in stratified_sample(
            docs.unionByName(more), "source", {"keepme": 1.0, "crawl": 0.25}
        ).collect()
    }
    assert ids1 == {i for i in grown if i < 400}


def test_stratified_sample_default_rate_and_guards(spark):
    import pytest as _pt

    from dhr_spark.operators.textstats import stratified_sample

    docs = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "doc_id long, source string, text string"
    )
    # default_rate=0 drops strata not named
    assert stratified_sample(docs, "source", {"x": 1.0}).count() == 1
    assert stratified_sample(docs, "source", {"x": 1.0}, default_rate=1.0).count() == 2
    with _pt.raises(ValueError, match="rate"):
        stratified_sample(docs, "source", {"x": 1.5})


def test_temperature_sample_rates_and_determinism(spark):
    from dhr_spark.operators.textstats import temperature_sample

    # 300 big-domain rows, 60 small-domain rows: alpha=0.5 keeps all of
    # small and ~sqrt(60/300)=44.7% of big
    rows = [(i, "big" if i < 300 else "small", f"t {i}") for i in range(360)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept1 = {r["doc_id"] for r in temperature_sample(docs, "source").collect()}
    kept2 = {r["doc_id"] for r in temperature_sample(docs, "source").collect()}
    assert kept1 == kept2  # deterministic
    assert all(i in kept1 for i in range(300, 360))  # smallest domain: 100%
    n_big = sum(1 for i in kept1 if i < 300)
    assert 90 <= n_big <= 180  # ~134 expected at rate .4472 (hash variance)
    # alpha=1 is a no-op (shares already proportional)
    assert temperature_sample(docs, "source", alpha=1.0).count() == 360
    # alpha=0 flattens to uniform: big keeps at rate 60/300 = 0.2
    flat = {
        r["doc_id"]
        for r in temperature_sample(docs, "source", alpha=0.0).collect()
    }
    assert 30 <= sum(1 for i in flat if i < 300) <= 95  # ~60 expected


def test_temperature_sample_guards(spark):
    import pytest as _pt

    from dhr_spark.operators.textstats import temperature_sample

    docs = spark.createDataFrame(
        [(1, "x", "a")], "doc_id long, source string, text string"
    )
    with _pt.raises(ValueError, match="alpha"):
        temperature_sample(docs, "source", alpha=1.5)
    assert temperature_sample(docs, "source", alpha=0.5).count() == 1


def test_mixture_sample_rates_binding_and_drops(spark):
    from dhr_spark.operators.textstats import mixture_sample

    # a=400, b=100, c=50, d=200 docs; weights a:4 b:2 c:1 (d unweighted)
    rows = (
        [(i, "a", "t") for i in range(400)]
        + [(400 + i, "b", "t") for i in range(100)]
        + [(500 + i, "c", "t") for i in range(50)]
        + [(550 + i, "d", "t") for i in range(200)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = mixture_sample(docs, "source", {"a": 4, "b": 2, "c": 1})
    got = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # binding = argmin c/w: b (100/2=50) == c (50/1=50) -> tie by value "b";
    # rates: b 100%, a (4*100)/(2*400)=50%, c (1*100)/(2*50)=100%
    assert got["b"] == 100 and got["c"] == 50
    assert 130 <= got["a"] <= 260  # ~200 expected at 50% hash rate
    assert "d" not in got  # unweighted domain dropped
    # deterministic across invocations
    k2 = mixture_sample(docs, "source", {"a": 4, "b": 2, "c": 1})
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in k2.collect()
    }


def test_mixture_sample_guards(spark):
    import pytest as _pt

    from dhr_spark.operators.textstats import mixture_sample

    docs = spark.createDataFrame(
        [(1, "x", "a")], "doc_id long, source string, text string"
    )
    with _pt.raises(ValueError, match="positive integers"):
        mixture_sample(docs, "source", {"x": 0.5})
    with _pt.raises(ValueError, match="non-empty"):
        mixture_sample(docs, "source", {})
    with _pt.raises(ValueError, match="absent from the corpus"):
        mixture_sample(docs, "source", {"x": 1, "ghost": 2})


def test_duplicate_ngram_fraction(spark):
    from dhr_spark.operators.dedup import duplicate_ngram_fraction

    rows = [
        (1, "a b c"),       # bigrams: "a b", "b c"
        (2, "a b x"),       # bigrams: "a b", "b x"
        (3, "z"),           # shorter than n -> no shingles
        (4, "b c b c"),     # distinct bigrams: "b c", "c b" ("b c" repeats)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup"], r["dup_fraction"])
        for r in duplicate_ngram_fraction(docs, n=2).collect()
    }
    # "a b" shared by 1+2; "b c" shared by 1+4; every other shingle unique
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (2, 1, 0.5)
    assert len(got) == 4  # shingle-less docs still reported


def test_mmr_rerank_properties(spark):
    from dhr_spark.operators.diversify import mmr_rerank

    # q: d1 highest rel; d2 near-duplicate of d1; d3 dissimilar, mid rel
    embs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.045, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    cand = spark.createDataFrame(
        [(9, 1, 1.0), (9, 2, 0.98), (9, 3, 0.5), (9, 4, 0.1)],
        "qid long, vec_id long, cosine double",
    )
    # lam=0.5: seed d1; d2 (rel .98 but cos ~.999 to d1) scores
    # 8*980000-8*998987 < 0 while d3 scores 8*500000 -> diversity wins
    order = [
        r["vec_id"]
        for r in mmr_rerank(cand, embs, lam=0.5, k=3)
        .orderBy("rank").collect()
    ]
    assert order[0] == 1 and order[1] == 3
    # lam=1: pure relevance order
    pure = [
        r["vec_id"]
        for r in mmr_rerank(cand, embs, lam=1.0, k=4)
        .orderBy("rank").collect()
    ]
    assert pure == [1, 2, 3, 4]
    # lam=0: after the relevance seed, maximal dissimilarity rules
    div = [
        r["vec_id"]
        for r in mmr_rerank(cand, embs, lam=0.0, k=2)
        .orderBy("rank").collect()
    ]
    assert div[0] == 1 and div[1] in (3, 4)

    import pytest as _pt

    with _pt.raises(ValueError, match="multiple of 1/16"):
        mmr_rerank(cand, embs, lam=0.3)
    with _pt.raises(ValueError, match="k must"):
        mmr_rerank(cand, embs, k=0)
    # a candidate without an embedding must raise, not silently drop
    missing = spark.createDataFrame(
        [(9, 1, 1.0), (9, 99, 0.9)], "qid long, vec_id long, cosine double"
    )
    with _pt.raises(Exception, match="missing embeddings"):
        mmr_rerank(missing, embs, lam=0.75, k=2).collect()


def test_paragraph_dedup_semantics(spark):
    from dhr_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha"),   # within-doc repeat of alpha
            (2, "beta\ngamma"),          # beta already seen in doc 1
            (3, "alpha\nbeta"),          # nothing new -> empty text_clean
            (4, "delta"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs).collect()
    }
    # first occurrence (min doc_id, min par_idx) survives; repeats drop
    assert out[1]["text_clean"] == "alpha\nbeta"
    assert (out[1]["n_pars"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["text_clean"] == "gamma"
    assert (out[2]["n_pars"], out[2]["n_kept"]) == (2, 1)
    # all paragraphs previously seen -> empty string, zero kept
    assert out[3]["text_clean"] == ""
    assert (out[3]["n_pars"], out[3]["n_kept"]) == (2, 0)
    assert out[4]["text_clean"] == "delta"
    # survivors reassemble in original paragraph order
    assert out[1]["text_clean"].split("\n") == ["alpha", "beta"]


def test_qpp_predictors_hand_computed(spark):
    import math

    from dhr_spark.operators.qpp import qpp_predictors

    # corpus stats: N=4 docs, total_dl=10; dictionary df/ctf fixed
    ts = spark.createDataFrame(
        [("apple", 2, 3), ("banana", 1, 1)], "term string, df long, ctf long"
    )
    qtfs = spark.createDataFrame(
        [("q1", "apple", 2), ("q1", "zzz", 1), ("q2", "banana", 1)],
        "qid string, term string, qtf long",
    )
    got = {r["qid"]: r.asDict() for r in
           qpp_predictors(qtfs, ts, n_docs=4, total_dl=10).collect()}
    assert got["q1"]["n_terms"] == 2 and got["q1"]["n_oov"] == 1
    idf_apple = math.log(1 + (4 - 2 + 0.5) / 2.5)
    i6 = math.floor(idf_apple * 1e6 + 0.5)
    assert got["q1"]["avg_idf"] == i6 / 1e6 == got["q1"]["max_idf"]
    # SCS for q1: only apple in vocab; p(t|q)=2/3 (OOV mass counts), p(t|C)=0.3
    scs = (2 / 3) * math.log2((2 / 3) / 0.3)
    assert abs(got["q1"]["scs"] - scs) < 2e-6
    scq = (1 + math.log(3)) * idf_apple
    assert abs(got["q1"]["sum_scq"] - scq) < 2e-6
    assert got["q2"]["n_oov"] == 0
    # all-OOV query -> NULL predictors, counts still reported
    q3 = spark.createDataFrame([("q3", "zzz", 1)], "qid string, term string, qtf long")
    r3 = qpp_predictors(q3, ts, 4, 10).collect()[0]
    assert r3["n_oov"] == 1 and r3["avg_idf"] is None and r3["scs"] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="n_docs"):
        qpp_predictors(qtfs, ts, 0, 10)


def test_semdedup_pairs_subset_of_brute_and_recall(spark):
    """SemDeDup's cluster gate yields exact-precision pairs (every emitted
    pair is a true >= threshold pair) and near-identical planted dups land
    in the same k-means cell, so recall on real near-dups is high."""
    import numpy as np

    from dhr_spark.operators.dedup import embedding_dup_pairs, semdedup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for i in range(10):
        rows.append(
            (100 + i, [float(x) for x in base[i] + 0.01 * rng.standard_normal(64)])
        )
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(embs, threshold=0.99).collect()
    }
    sem = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(embs, threshold=0.99, k=8, iters=2).collect()
    }
    assert brute, "planted near-dups should exceed cosine 0.99"
    assert sem <= brute, sem - brute  # exact precision: gate never invents
    recall = len(brute & sem) / len(brute)
    assert recall >= 0.9, (recall, brute - sem)


def test_semdedup_keep_drops_exactly_dominated_ids(spark):
    """keep == False iff the id appears as id_b of some pair: min-id-per-pair
    survivor rule, one flag per input row."""
    import numpy as np

    from dhr_spark.operators.dedup import semdedup_keep, semdedup_pairs

    rng = np.random.default_rng(13)
    base = rng.standard_normal((30, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for i in range(5):
        rows.append(
            (200 + i, [float(x) for x in base[i] + 0.005 * rng.standard_normal(64)])
        )
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dominated = {
        r["id_b"]
        for r in semdedup_pairs(embs, threshold=0.99, k=4, iters=2).collect()
    }
    flags = {
        r["vec_id"]: r["keep"]
        for r in semdedup_keep(embs, threshold=0.99, k=4, iters=2).collect()
    }
    assert len(flags) == embs.count()
    assert {v for v, kp in flags.items() if not kp} == dominated
    assert dominated, "planted dups should be dominated"
