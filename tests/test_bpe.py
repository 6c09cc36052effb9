"""True BPE encode (operators/bpe.py): deterministic training,
hand-computed encode fixtures, an independent reference encoder,
Spark-column vs pure-Python agreement, and the DuckDB recursive-CTE
oracle (the driver's independent check) exercised on adversarial
pretokens beyond what the driver data contains."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.operators import bpe, text


def test_pretokenizer_parity_python_vs_jvm(spark):
    """bpe.PRETOKEN_RE (Python re) must split exactly like
    text.BPE_TOKEN_RE (JVM \\p{L}/\\p{N} classes) — the documented
    equivalence the encoder relies on."""
    samples = [
        "hello world",
        "  leading and trailing  ",
        "num 12345 mixed a1b2",
        "punct , . ! ?? ... under_score",
        "unicodé lëtters ärger résumé naïve",
        "tabs\tand\nnewlines",
        "",
        "a",
        "CamelCase and ALLCAPS",
        "price $19.99 at 50% off!",
        # non-decimal Unicode numerics (No/Nl): \\p{N} matches them,
        # stdlib \\d does not — the regex-module path must agree with
        # the JVM classes here
        "x² and ½ cup plus Ⅻ chapters",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    jvm = [
        r["toks"]
        for r in df.select(
            F.regexp_extract_all("t", F.lit(text.BPE_TOKEN_RE), 0)
            .alias("toks")
        ).collect()
    ]
    py = [bpe.pretokenize(s) for s in samples]
    assert jvm == py


def test_train_bpe_known_answer():
    # "ababab": (a,b) x3 beats (b,a) x2; then ab-pairs chain up
    merges = bpe.train_bpe(["ababab"], 3)
    assert merges == [("a", "b"), ("ab", "ab"), ("abab", "ab")]
    # frequency-weighted across words, deterministic tie-break
    m2 = bpe.train_bpe(["low low lower"], 2)
    assert m2[0] in (("l", "o"), ("o", "w")) and len(m2) == 2
    assert bpe.train_bpe(["low low lower"], 2) == m2  # deterministic


def test_encode_hand_fixture():
    merges = [("l", "o"), ("lo", "w")]
    assert bpe.encode("low lower", merges) == [
        "low", " ", "low", "e", "r"
    ]
    # rank order matters: with (o,w) first, 'low' becomes l+ow
    assert bpe.encode("low", [("o", "w"), ("l", "o")]) == ["l", "ow"]
    # unknown characters stay single symbols
    assert bpe.encode("xyz", merges) == ["x", "y", "z"]
    assert bpe.encode("", merges) == []


def _reference_encode(tok: str, merges) -> list[str]:
    """Independent oracle: repeatedly merge only the FIRST occurrence
    of the lowest-ranked pair. For any TRAINED vocab this equals the
    all-occurrences-per-pass loop (a pair containing a merged token
    always ranks later than the merge that created the token)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    sym = list(tok)
    while True:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return sym
        i = best[1]
        sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2:]


def test_encode_matches_independent_reference():
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "tokenization of the training corpus with the trained vocab",
        "aaaa bbbb abab the the the",
    ]
    merges = bpe.train_bpe(corpus, 60)
    for s in corpus + ["unseen words entirely", "the dog", "aaaaaaa"]:
        got = bpe.encode(s, merges)
        want = [
            t for tok in bpe.pretokenize(s)
            for t in _reference_encode(tok, merges)
        ]
        assert got == want, s


def test_default_vocab_roundtrip_and_bound():
    merges = bpe.default_merges()
    assert len(merges) == 128
    assert bpe.default_merges() is merges  # cached
    s = "the engine applies the latest update for every key"
    toks = bpe.encode(s, list(merges))
    assert "".join(toks) == s                      # lossless
    # merges act WITHIN pretokens: every pretoken yields >= 1 token
    # (pretokenizer count is the LOWER bound) and <= its char count
    assert len(bpe.pretokenize(s)) <= len(toks) <= len(s)
    # the trained vocab actually compresses vs raw characters
    assert len(toks) < len(s)


def test_spark_column_agrees_with_python(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    merges = list(bpe.default_merges())
    got = docs.select(
        "doc_id",
        bpe.bpe_count("text", merges).alias("n"),
        text.bpe_token_count("text").alias("n_pre"),
    ).collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == 60
    for r in got:
        want = len(bpe.encode(src[r["doc_id"]], merges))
        assert r["n"] == want, r["doc_id"]
        # each pretoken encodes to >= 1 token: the codegen'd
        # pretokenizer proxy is a true lower bound
        assert r["n"] >= r["n_pre"]


def test_bpe_tokens_column(spark):
    df = spark.createDataFrame([("the dog and the fox",)], "t string")
    (row,) = df.select(
        bpe.bpe_tokens("t", list(bpe.default_merges())).alias("toks")
    ).collect()
    assert "".join(row["toks"]) == "the dog and the fox"


def test_duckdb_recursive_cte_oracle_adversarial():
    """The driver-facing DuckDB oracle re-implements greedy ranked
    merges declaratively; pin it against the Python encoder on inputs
    the driver corpus does NOT contain: repeated-pair runs (the
    left-to-right non-overlap rule), quotes (SQL escaping), digits,
    punctuation runs, whitespace pretokens, and empty text."""
    import duckdb

    import __spark_entry__ as entrymod

    texts = [
        "aaaa the thethe 'quoted' text",
        "ababab   mixed 12345 !!??..",
        "deduplicate streams the the the",
        "x",
        "",
        "   ",
        "it's the dog's toy''s",
    ]
    lit = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in texts
    ) + "]"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT i AS doc_id, t AS text FROM ("
        "SELECT unnest(range(" + str(len(texts)) + ")) AS i, "
        "unnest(" + lit + ") AS t)"
    )
    rows = con.sql(entrymod._sql_bpe_token_count_true()).fetchall()
    merges = list(bpe.default_merges())
    got = {r[0]: (r[1], r[2]) for r in rows}
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        want = (len(bpe.encode(t, merges)), len(bpe.pretokenize(t)))
        assert got[i] == want, (i, t, got[i], want)
