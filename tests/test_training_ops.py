"""Training-data operator suite: sanity + invariants (the line-by-line
engine-vs-SQL equivalence is covered by tools/check_oracles.py and the
driver's DuckDB harness)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from kafka_jdbc_sink_connector_spark.operators import (
    docdedup,
    multimodal,
    similarity,
    text,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()


def test_exact_dedup_canonical_invariants(docs):
    out = docdedup.exact_dedup(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r["canonical_id"] <= r["doc_id"]
        assert r["is_dup"] == (r["canonical_id"] != r["doc_id"])


def test_minhash_candidates_catch_exact_dups(spark, docs):
    """Any two docs with identical text share every band — LSH must
    propose them."""
    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    widened = docs.unionByName(dup)
    pairs = docdedup.minhash_lsh_candidates(widened, n_perm=8, bands=4)
    first_id = docs.limit(1).collect()[0]["doc_id"]
    hit = pairs.filter(
        (F.col("doc_a") == first_id) & (F.col("doc_b") == first_id + 100000)
    ).collect()
    assert len(hit) == 1 and hit[0]["n_bands_shared"] == 4


def test_ngram_jaccard_exact_dup_scores_one(spark, docs):
    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    widened = docs.unionByName(dup)
    pairs = docdedup.ngram_jaccard_pairs(widened, threshold=0.99, max_df=1000)
    first_id = docs.limit(1).collect()[0]["doc_id"]
    hit = pairs.filter(
        (F.col("doc_a") == first_id) & (F.col("doc_b") == first_id + 100000)
    ).collect()
    assert len(hit) == 1 and hit[0]["jaccard"] == 1.0


def test_knn_bruteforce_properties(emb):
    out = similarity.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 3), k=4)
    rows = out.collect()
    by_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]  # self excluded
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_ann_subset_of_bucket(emb):
    """ANN results must score identically to brute force for the pairs
    it does return (it only restricts the candidate set)."""
    ann = similarity.lsh_ann_candidates(
        emb, emb.filter(F.col("vec_id") < 3), k=4
    ).collect()
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.knn_bruteforce(
            emb, emb.filter(F.col("vec_id") < 3), k=500
        ).collect()
    }
    for r in ann:
        assert bf[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_bpe_token_count_matches_duckdb_on_unicode(spark):
    """The BPE pretokenizer regex must agree across engines beyond the
    ASCII corpus (Java regex vs RE2, \\p{L}/\\p{N} classes)."""
    import duckdb

    texts = [
        "héllo wörld 123, foo!bar",
        "中文 text 42 — mixed; «quotes»",
        "  spaced   out  ",
        "don't stop-me now 3.14",
    ]
    rows = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in rows.select(
            "doc_id", text.bpe_token_count("text").alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        (want,) = duckdb.sql(
            r"SELECT len(regexp_extract_all($t,"
            r" ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+'))",
            params={"t": t},
        ).fetchone()
        assert got[i] == want, (t, got[i], want)


def test_repetition_ratio_and_pii_redaction(spark):
    rows = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e a b c d e"),   # repeated windows
            (2, "one two three four five six seven"),  # all distinct
            (3, "short"),
            (4, "mail me at john.doe+x@sub.example.org or 123456789 now"),
            (5, "digits 123456 too short and 12345678 long enough"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in rows.select(
            "doc_id",
            text.repetition_ratio(F.col("text"), 5).alias("rr"),
            text.redact_pii(F.col("text")).alias("red"),
            *[v.alias(k) for k, v in text.pii_counts(F.col("text")).items()],
        ).collect()
    }
    # doc 1: 11 windows of 5 over 15 tokens, 5 distinct → 1 - 5/11
    assert out[1]["rr"] == round(1 - 5 / 11, 4)
    assert out[2]["rr"] == 0.0
    assert out[3]["rr"] == 0.0  # single whole-doc shingle
    assert out[4]["red"] == "mail me at <EMAIL> or <NUM> now"
    assert out[4]["n_emails"] == 1 and out[4]["n_digit_runs"] == 1
    # 6-digit run stays; 8-digit run redacts
    assert out[5]["red"] == "digits 123456 too short and <NUM> long enough"
    assert out[5]["n_digit_runs"] == 1


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (needs >1 propagation round), a 2-clique, and an
    edge-free node: labels = min node id per component."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain, diameter 4
         (10, 11),                             # island pair
         (20, 21), (21, 20)],                  # duplicate/reversed edges
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["component"]
           for r in docdedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_matches_union_find(spark, docs):
    """Property check on real LSH pairs: the distributed hash-to-min
    fixpoint equals a sequential union-find over the same edges."""
    pairs = docdedup.minhash_lsh_candidates(docs, n_perm=8, bands=4, k=5)
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = {r["node"]: r["component"]
           for r in docdedup.connected_components(pairs).collect()}
    assert got == want


def test_hash_split_deterministic_and_proportional(spark):
    """Split assignment equals an independent hashlib recompute, is
    stable across runs, and lands near the requested proportions."""
    import hashlib

    from pyspark.sql import functions as F

    from kafka_jdbc_sink_connector_spark.operators.text import hash_split

    ids = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["doc_id"]: r["s"] for r in ids.select(
        "doc_id", hash_split("doc_id", w, salt="s1").alias("s")
    ).collect()}

    def want(i):
        u = hashlib.md5(f"s1{i}".encode()).hexdigest()[:8]
        if u < format(int(0.8 * 16**8), "08x"):
            return "train"
        if u < format(int(0.9 * 16**8), "08x"):
            return "val"
        return "test"

    assert out == {i: want(i) for i in range(2000)}
    from collections import Counter

    frac = Counter(out.values())
    assert 0.75 < frac["train"] / 2000 < 0.85
    assert 0.07 < frac["val"] / 2000 < 0.13
    # a different salt reshuffles membership
    out2 = {r["doc_id"]: r["s"] for r in ids.select(
        "doc_id", hash_split("doc_id", w, salt="s2").alias("s")
    ).collect()}
    assert out2 != out
    # single-bucket degenerate case
    one = ids.select(hash_split("doc_id", {"all": 1.0}).alias("s"))
    assert one.distinct().collect()[0]["s"] == "all"
    # zero-weight splits receive NO rows — the cumulative cut reaching
    # 16^8 must not produce a 9-hex-digit threshold that breaks the
    # fixed-width string compare and leaks the tail into them
    z = ids.select(
        hash_split("doc_id", {"train": 0.95, "val": 0.05, "test": 0.0})
        .alias("s")
    )
    zc = {r["s"]: r["n"] for r in z.groupBy("s").agg(
        F.count("*").alias("n")).collect()}
    assert zc.get("test", 0) == 0 and zc["train"] > zc["val"] > 0
    zz = ids.select(
        hash_split("doc_id", {"a": 1.0, "b": 0.0}).alias("s")
    ).distinct().collect()
    assert [r["s"] for r in zz] == ["a"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-negative"):
        hash_split("doc_id", {"a": -1.0, "b": 2.0})
    with _pytest.raises(ValueError, match="sum"):
        hash_split("doc_id", {"a": 0.0})


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_cc_chain_where_hash_to_min_exceeds_budget(spark):
    """A 60-node chain: hash-to-min needs ~diameter rounds and RAISES
    at max_iters=25; the two-phase star contraction is
    diameter-insensitive and labels the whole chain with node 0."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        docdedup.connected_components(chain, max_iters=25)
    got = {r["node"]: r["component"]
           for r in docdedup.connected_components(
               chain, algorithm="two-phase-star").collect()}
    assert got == {i: 0 for i in range(61)}


def test_star_cc_agrees_with_hash_to_min_on_lsh_pairs(spark, docs):
    """Both implementations must produce identical labels on the real
    near-dup candidate graph (near-cliques, the default's home turf)."""
    pairs = docdedup.minhash_lsh_candidates(docs, n_perm=8, bands=4, k=5)
    h2m = {r["node"]: r["component"]
           for r in docdedup.connected_components(pairs).collect()}
    star = {r["node"]: r["component"]
            for r in docdedup.connected_components(
                pairs, algorithm="two-phase-star").collect()}
    assert star == h2m and len(star) > 0


def test_star_cc_random_graph_matches_union_find(spark):
    """Seeded random graph with chains, cliques, isolated pairs, AND
    self-loop-only nodes (kept by both algorithms: a node seen only as
    (u, u) labels itself) — labels equal a sequential union-find."""
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    # nodes that appear ONLY in self-pairs: both variants must emit
    # them with component = self (coverage parity across algorithms)
    edges += [(5000, 5000), (5001, 5001)]
    # add a long chain in a disjoint id range (diameter stress)
    edges += [(1000 + i, 1001 + i) for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = _union_find(edges)
    got = {r["node"]: r["component"]
           for r in docdedup.connected_components(
               pairs, algorithm="two-phase-star").collect()}
    assert got == want

    with pytest.raises(ValueError, match="unknown algorithm"):
        docdedup.connected_components(pairs, algorithm="bogus")


def test_multimodal_decode_plumbing(docs):
    media = multimodal.attach_binary_payload(docs)
    out = multimodal.decode_metadata(media).collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(out) == len(src)
    for r in out[:50]:
        n = len(src[r["doc_id"]].encode())
        assert r["n_bytes"] == n
        assert r["width"] == n % 640
        assert r["n_frames"] == n % 30
        assert len(r["checksum"]) == 32


def test_multimodal_resize_and_frame_sample_plumbing(docs):
    media = multimodal.attach_binary_payload(docs.limit(40))
    rs = multimodal.resize_images(media, target_w=64, target_h=32)
    rows = rs.collect()
    assert len(rows) == 40
    assert all(r["resized_w"] == 64 and r["resized_h"] == 32 for r in rows)
    assert all(len(r["resized_checksum"]) == 32 for r in rows)
    fr = multimodal.sample_frames(media, every_n=5).collect()
    # fanout: every doc with n_frames>0 contributes ceil(n/5) rows
    import math

    want = 0
    for r in media.select("doc_id", "payload").collect():
        n = len(bytes(r["payload"])) % 30
        want += math.ceil(n / 5)
    assert len(fr) == want
    assert all(r["frame_idx"] % 5 == 0 for r in fr)


def test_multimodal_real_decoder_is_gated(docs):
    media = multimodal.attach_binary_payload(docs.limit(1))
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        multimodal.decode_metadata(media, use_real_decoder=True).collect()


def test_entry_contract_consistency(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query carries a DuckDB oracle — including true BPE, whose
    # greedy ranked merge loop is oracled by an independent
    # recursive-CTE encoder (see _sql_bpe_token_count_true)
    assert set(qs) == set(oracles)
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.schema is not None


def test_simhash_dup_pairs_banded_candidates(spark, docs):
    """Banded simhash pairs: identical docs are found at hamming 0,
    and every reported pair's hamming is exact popcount(xor)."""
    from pyspark.sql import functions as F

    dup = docs.limit(3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    both = docs.limit(50).select("doc_id", "text").unionByName(dup)
    out = text.simhash_dup_pairs(both, max_hamming=3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    base_ids = [r["doc_id"] for r in docs.limit(3).collect()]
    for i in base_ids:
        assert got.get((i, i + 100000)) == 0, (i, got)
    sh = {r["doc_id"]: r["simhash"]
          for r in text.simhash32_table(both).collect()}
    for (a, b), h in got.items():
        assert bin(sh[a] ^ sh[b]).count("1") == h
        assert h <= 3


def test_simhash64_wide_bands(spark, docs):
    """64-bit simhash (16-bit bands): exact dups still pair at hamming
    0, the fingerprint uses the full width (negative longs appear when
    bit 63 is set), and banded candidates stay exact on popcount."""
    dup = docs.limit(2).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    both = docs.limit(40).select("doc_id", "text").unionByName(dup)
    sh = {r["doc_id"]: r["simhash"]
          for r in text.simhash_table(both, n_bits=64).collect()}
    # width actually used: some fingerprint must exceed 32 bits
    assert any(abs(v) >= (1 << 32) for v in sh.values())
    out = text.simhash_dup_pairs(
        both, max_hamming=3, n_bands=4, n_bits=64
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    for r in docs.limit(2).collect():
        assert got.get((r["doc_id"], r["doc_id"] + 200000)) == 0
    for (a, b), h in got.items():
        assert bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") == h


def test_connected_components_nonconvergence_raises(spark):
    """Exceeding the round budget must fail loudly, never return
    silently-wrong (split) components."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        docdedup.connected_components(chain, max_iters=2)
    # with budget it converges fine
    got = docdedup.connected_components(chain, max_iters=40).collect()
    assert all(r["component"] == 1 for r in got)


def test_connected_components_budget_equals_diameter_accepts(spark):
    """Converging exactly on the last allowed round must be accepted
    (certified by a propagation probe), not spuriously rejected."""
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    # this chain needs exactly 3 propagation rounds; round 3 applies
    # the final change so the loop exhausts — probe certifies success
    got = {r["node"]: r["component"] for r in
           docdedup.connected_components(chain, max_iters=3).collect()}
    assert got == {n: 1 for n in range(1, 6)}


def test_ngram_contamination_semantics(spark):
    """Planted duplicate → 1.0; clean doc → 0.0 (still emitted);
    partial overlap → exact distinct-shingle fraction."""
    train = spark.createDataFrame(
        [(1, "a b c d e f g h"),
         (2, "completely different training material here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "a b c d e f g h"),          # exact dup of train doc 1
         (11, "nothing shared with corpus at all whatsoever"),
         (12, "x y z q w a b c d e")],     # suffix overlaps train 1
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           docdedup.ngram_contamination(train, ev, k=5).collect()}
    assert set(out) == {10, 11, 12}
    assert out[10]["contamination"] == 1.0
    assert out[11]["contamination"] == 0.0
    assert out[11]["n_overlap"] == 0
    # doc 12: shingles of "x y z q w a b c d e" (k=5) = 6 windows,
    # exactly one ("a b c d e") appears in train doc 1's windows
    assert out[12]["n_shingles"] == 6
    assert out[12]["n_overlap"] == 1
    assert out[12]["contamination"] == round(1 / 6, 4)


def test_stratified_keep_deterministic_and_scoped(spark, docs):
    keep = text.stratified_keep(
        "doc_id", "lang", {"en": 0.5, "de": 1.0}, salt="s1"
    )
    a = sorted(r["doc_id"] for r in docs.filter(keep).collect())
    b = sorted(r["doc_id"] for r in docs.filter(keep).collect())
    assert a == b and len(a) > 0            # deterministic
    langs = {r["lang"] for r in docs.filter(keep)
             .select("lang").distinct().collect()}
    assert langs <= {"en", "de"}            # unlisted strata dropped
    n_de = docs.filter(F.col("lang") == "de").count()
    n_de_kept = docs.filter(keep).filter(F.col("lang") == "de").count()
    assert n_de_kept == n_de                # frac 1.0 keeps all
    none = text.stratified_keep("doc_id", "lang", {"en": 0.0})
    assert docs.filter(none).count() == 0   # frac 0.0 keeps none
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        text.stratified_keep("doc_id", "lang", {})
    with _pytest.raises(ValueError, match="in \\[0, 1\\]"):
        text.stratified_keep("doc_id", "lang", {"en": 1.5})


def test_temperature_mix_exact_integer_semantics(spark, docs):
    """T=0.5 keep decision is pure integer arithmetic — replay it
    row-by-row with hashlib and assert bit-for-bit agreement, plus the
    structural invariants: smallest domain kept whole, unlisted
    domains dropped, deterministic across evaluations."""
    import hashlib

    counts = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    n_min = min(counts.values())
    keep = text.temperature_mix_keep(
        "doc_id", "lang", counts, temperature=0.5, salt="s1"
    )
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in docs.filter(keep).select("doc_id", "lang").collect()
    )
    want = []
    for r in docs.select("doc_id", "lang").collect():
        h = int(
            hashlib.md5(("s1" + str(r["doc_id"])).encode()).hexdigest()[:4],
            16,
        )
        if h * h * counts[r["lang"]] < n_min * (1 << 32):
            want.append((r["doc_id"], r["lang"]))
    assert got == sorted(want)
    # smallest domain: h^2 * n_min < n_min * 2^32 <=> h^2 < 2^32,
    # always true for h < 2^16 -> kept whole
    smallest = min(counts, key=counts.get)
    assert (
        docs.filter(keep).filter(F.col("lang") == smallest).count()
        == counts[smallest]
    )
    # head domain actually downsampled (en is ~3x the others in
    # the testdata, so sqrt(n_min/n_en) < 1)
    head = max(counts, key=counts.get)
    assert (
        docs.filter(keep).filter(F.col("lang") == head).count()
        < counts[head]
    )
    # unlisted domain dropped
    part = {k: v for k, v in counts.items() if k != head}
    keep_part = text.temperature_mix_keep(
        "doc_id", "lang", part, temperature=0.5, salt="s1"
    )
    assert (
        docs.filter(keep_part).filter(F.col("lang") == head).count() == 0
    )
    # deterministic across evaluations
    again = sorted(
        (r["doc_id"], r["lang"])
        for r in docs.filter(keep).select("doc_id", "lang").collect()
    )
    assert again == got


def test_temperature_mix_wrapper_and_temperature_knob(spark, docs):
    """temperature_mix(df) == manual counts + keep filter; raising T
    toward 1 keeps MORE of the head domain (rate (n_min/n_d)^(1-T)
    rises to 1); validation errors fire."""
    counts = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    manual = docs.filter(
        text.temperature_mix_keep(
            "doc_id", "lang", counts, temperature=0.5, salt="s"
        )
    )
    wrapped = text.temperature_mix(
        docs, "doc_id", "lang", temperature=0.5, salt="s"
    )
    assert sorted(r["doc_id"] for r in wrapped.collect()) == sorted(
        r["doc_id"] for r in manual.collect()
    )
    head = max(counts, key=counts.get)
    kept_05 = manual.filter(F.col("lang") == head).count()
    kept_09 = (
        docs.filter(
            text.temperature_mix_keep(
                "doc_id", "lang", counts, temperature=0.9, salt="s"
            )
        )
        .filter(F.col("lang") == head)
        .count()
    )
    kept_10 = (
        docs.filter(
            text.temperature_mix_keep(
                "doc_id", "lang", counts, temperature=1.0, salt="s"
            )
        )
        .filter(F.col("lang") == head)
        .count()
    )
    assert kept_05 <= kept_09 <= kept_10 == counts[head]  # T=1: no-op
    with pytest.raises(ValueError, match="non-empty"):
        text.temperature_mix_keep("doc_id", "lang", {})
    with pytest.raises(ValueError, match="must be > 0"):
        text.temperature_mix_keep("doc_id", "lang", {"en": 0})
    with pytest.raises(ValueError, match="temperature"):
        text.temperature_mix_keep("doc_id", "lang", {"en": 5}, 1.5)


def test_filter_verdict_reasons_and_order(spark):
    """Each drop rule fires on a crafted doc; the reason is the FIRST
    failing rule in the fixed order (a doc failing several rules
    reports the earliest one); keeps carry a NULL reason."""
    good = ("the cat sat on the mat and the dog slept near the door "
            "while it rained in the town all day long")
    rows = [
        (1, good),                                          # keep
        (2, "just three words"),                            # too_short
        (3, " ".join(["supercalifragilisticexpialidocious"] * 25)),
        # ^ words_too_long (avg len ≫ 12); ALSO repetitive + low
        #   stopword density — first rule in order wins
        (4, " ".join(["the cat sat on the mat and it is fine"] * 6)),
        # ^ repetitive (same 10 words × 6 → shingle dup ratio high)
        (5, " ".join(f"w{i}" for i in range(30))),
        # ^ low_stopword_density (30 distinct short non-stopwords)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keep, reason = text.filter_verdict("text")
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in df.select("doc_id", keep.alias("keep"),
                              reason.alias("reason")).collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "words_too_long")   # first failing rule
    assert got[4] == (False, "repetitive")
    assert got[5] == (False, "low_stopword_density")


# --- incremental dedup against a persisted index ----------------------


def test_incremental_dedup_equals_corpus_wide(spark, docs, tmp_path):
    """Processing the corpus in batches against the persisted MinHash
    index yields EXACTLY the corpus-wide LSH pair set, including the
    n_bands_shared counts — regardless of batch partition."""
    from kafka_jdbc_sink_connector_spark.operators.incremental import (
        MinHashDedupIndex,
    )

    corpus = {
        (r["doc_a"], r["doc_b"], r["n_bands_shared"])
        for r in docdedup.minhash_lsh_candidates(
            docs, n_perm=8, bands=4, k=5
        ).collect()
    }
    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "idx"), n_buckets=4, n_perm=8, bands=4, k=5
    )
    # three uneven batches (parity ∪ mod-3 split would overlap; use
    # mod 3 on doc_id for disjoint coverage)
    got = set()
    for b in range(3):
        pairs = idx.add_and_find_dups(
            docs.filter(F.col("doc_id") % 3 == b), batch_id=b
        )
        got |= {
            (r["doc_a"], r["doc_b"], r["n_bands_shared"])
            for r in pairs.collect()
        }
    assert got == corpus


def test_incremental_dedup_exactly_once_replay(spark, docs, tmp_path):
    """Replaying a batch id already committed returns the same pairs
    and does NOT double-index its signatures; a mid-stream duplicate
    doc id cannot pair with its own indexed copy."""
    from kafka_jdbc_sink_connector_spark.operators.incremental import (
        MinHashDedupIndex,
    )

    b0 = docs.filter(F.col("doc_id") < 50)
    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "idx"), n_buckets=4, n_perm=8, bands=4, k=5
    )
    first = {
        tuple(r) for r in idx.add_and_find_dups(b0, batch_id=0).collect()
    }
    n_sigs = idx.read_signatures().count()
    v = idx.table.version
    replay = {
        tuple(r) for r in idx.add_and_find_dups(b0, batch_id=0).collect()
    }
    assert replay == first
    assert idx.read_signatures().count() == n_sigs  # no double-append
    assert idx.table.refresh().version == v  # no new commit at all
    # next batch id appends normally
    idx.add_and_find_dups(docs.filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 80)), batch_id=1)
    assert idx.read_signatures().count() > n_sigs


def test_incremental_index_load_roundtrip(spark, docs, tmp_path):
    from kafka_jdbc_sink_connector_spark.operators.incremental import (
        MinHashDedupIndex,
    )

    path = str(tmp_path / "idx")
    idx = MinHashDedupIndex.create(
        spark, path, n_buckets=4, n_perm=8, bands=2, k=3
    )
    idx.add_and_find_dups(docs.limit(20), batch_id=0)
    re = MinHashDedupIndex.load(spark, path)
    assert (re.n_perm, re.bands, re.k) == (8, 2, 3)
    assert re.read_signatures().count() == idx.read_signatures().count()


# --- corpus-level line dedup -----------------------------------------


def test_line_dedup_semantics(spark):
    """Boilerplate lines (>= min_df distinct docs) drop everywhere,
    within-doc repeats alone don't count, blank lines survive, order
    is preserved, and a fully-boilerplate doc yields empty text."""
    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"alpha one\n{boiler}\n\nbody text here"),
        (2, f"{boiler}\nbeta two"),
        (3, "gamma three\ngamma three\ngamma three"),  # within-doc only
        (4, boiler),                                   # all boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in docdedup.line_dedup(df, min_df=2).collect()
    }
    assert got[1] == ("alpha one\n\nbody text here", 4, 1)
    assert got[2] == ("beta two", 2, 1)
    # min_df counts DISTINCT docs: doc 3's triple repeat is kept
    assert got[3] == ("gamma three\ngamma three\ngamma three", 3, 0)
    assert got[4] == ("", 1, 1)


def test_line_dedup_trim_matching_and_threshold(spark):
    """Lines match on trimmed form ('  foo ' == 'foo'); min_df=3
    keeps a 2-doc line."""
    rows = [
        (1, "  shared line \nunique a"),
        (2, "shared line\nunique b"),
        (3, "unique c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by_id = {
        r["doc_id"]: r["clean_text"]
        for r in docdedup.line_dedup(df, min_df=2).collect()
    }
    assert by_id[1] == "unique a" and by_id[2] == "unique b"
    kept3 = {
        r["doc_id"]: r["n_removed"]
        for r in docdedup.line_dedup(df, min_df=3).collect()
    }
    assert kept3 == {1: 0, 2: 0, 3: 0}


def test_pack_chunks_invariants(spark):
    """Packing is deterministic under repartitioning, offsets are a
    contiguous per-shard token stream, and boundary flags agree with
    the arithmetic."""
    from kafka_jdbc_sink_connector_spark.operators.text import pack_chunks

    docs = spark.createDataFrame(
        [(i, "w " * (1 + (i * 37) % 700)) for i in range(400)],
        "doc_id long, text string",
    )
    L = 256
    out = pack_chunks(docs, max_tokens=L).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 400
    # determinism under a different input partitioning
    out2 = pack_chunks(docs.repartition(13), max_tokens=L).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}
    # per shard: offsets sorted in (hash, id) order are contiguous
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 10  # genuinely sharded
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["start_off"])
        acc = 0
        for r in rs:
            assert r["start_off"] == acc, (shard, r)
            assert r["pack_id"] == r["start_off"] // L
            assert r["spans_boundary"] == (
                (r["start_off"] % L) + r["n_tokens"] > L
            )
            acc += r["n_tokens"]
