from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    for i in range(40):
        words = base.split()
        # rotate so docs differ, except planted near-dup pairs
        rot = words[i % 5 :] + words[: i % 5]
        rows.append((i, " ".join(rot) + f" unique{i} marker{i}"))
    # planted near-dups: 100+i is doc i with one word appended
    for i in range(0, 40, 10):
        rows.append((100 + i, rows[i][1] + " extra"))
    # exact dups: 200+i identical to doc i
    for i in range(0, 40, 20):
        rows.append((200 + i, rows[i][1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs):
    groups = textops.exact_dup_groups(docs).collect()
    dup_groups = [g for g in groups if g["group_size"] > 1]
    assert len(dup_groups) == 2  # docs 0/200 and 20/220
    deduped = textops.exact_dedup(docs)
    assert deduped.count() == docs.count() - 2
    kept = {r["doc_id"] for r in deduped.collect()}
    assert 0 in kept and 200 not in kept


def test_minhash_finds_planted_neardups(spark, docs):
    pairs = textops.minhash_dedup_pairs(docs, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(0, 40, 10):
        assert (i, 100 + i) in got, f"missed planted near-dup ({i}, {100+i})"
    for r in pairs.collect():
        assert r["jaccard"] >= 0.5


def test_minhash_signature_shape(spark, docs):
    sigs = textops.minhash_signature(docs, "doc_id", "text", n_hashes=16)
    row = sigs.first()
    assert len(row["sig"]) == 16
    assert sigs.count() == docs.count()


def test_simhash_neardups(spark, docs):
    pairs = textops.simhash_neardup_pairs(docs, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact dups have identical simhash (hamming 0)
    assert (0, 200) in got and (20, 220) in got
    for r in pairs.collect():
        assert r["hamming"] <= 6


def test_simhash_deterministic(spark, docs):
    a = {(r["doc_id"], r["sh"]) for r in docs.select("doc_id", textops.simhash_udf("text").alias("sh")).collect()}
    b = {(r["doc_id"], r["sh"]) for r in docs.select("doc_id", textops.simhash_udf("text").alias("sh")).collect()}
    assert a == b


def test_ngram_jaccard_exact(spark, docs):
    pairs = textops.ngram_jaccard_pairs(docs, k=3, threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 200)] == 1.0  # identical docs
    assert got[(20, 220)] == 1.0


def test_lang_id_markers(spark):
    rows = [
        (1, "the cat and the dog is a friend of mine"),
        (2, "le chat et la souris est un ami de"),
        (3, "der hund und die katze ist ein freund von"),
        (4, "xyzzy plugh nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in textops.lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "und"


def test_quality_and_tokens(spark, docs):
    q = textops.quality_score(docs).first()
    assert 0.0 <= q["quality"] <= 1.0
    t = textops.token_count(docs).collect()
    for r in t:
        assert r["re_tokens"] >= r["ws_tokens"] > 0


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["fp_md5"] for r in textops.fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_pack_corpus_budget_and_order(spark):
    from crawlspark import textops

    docs = spark.createDataFrame(
        [
            (1, "en", "a b c d", 0.9),     # 4 tokens, best
            (2, "en", "e f g", 0.8),       # 3 tokens
            (3, "en", "h i j k l", 0.7),   # 5 tokens - would blow the budget
            (4, "en", "m n", 0.6),         # 2 tokens - but greedy prefix stops at 3
            (5, "fr", "p q r s t u", 0.9), # fr: 6 tokens
            (6, "fr", "v w", None),        # null quality sorts last
        ],
        "doc_id long, lang string, text string, quality double",
    )
    out = textops.pack_corpus(docs, 8, group_col="lang", quality_col="quality")
    rows = {r["doc_id"]: r for r in out.collect()}
    # en: 1 (cum 4), 2 (cum 7), 3 would hit 12 > 8 -> excluded; 4 after 3 in
    # order => cum 14 > 8 -> excluded (greedy PREFIX, not knapsack).
    # fr: 5 (cum 6), then null-quality 6 sorts last and lands exactly on 8.
    assert set(rows) == {1, 2, 5, 6}
    assert rows[2]["cum_tokens"] == 7
    assert rows[6]["cum_tokens"] == 8

    # DuckDB oracle: identical window SQL
    import duckdb

    pdf = docs.toPandas()
    oracle = duckdb.sql(
        """
        WITH t AS (
          SELECT doc_id, lang,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                 quality
          FROM pdf
        )
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC NULLS LAST, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM t QUALIFY cum_tokens <= 8 ORDER BY doc_id
        """
    ).df()
    got = out.orderBy("doc_id").toPandas()
    assert list(got["doc_id"]) == list(oracle["doc_id"])
    assert list(got["cum_tokens"]) == list(oracle["cum_tokens"])


def test_contamination_screen(spark):
    from crawlspark import textops

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated corpus document text here now"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog today"),  # fully contained
            (101, "zz yy xx ww vv uu tt ss rr qq"),                       # disjoint
            (102, "the quick brown fox jumps over the lazy cat instead"), # partial
        ],
        "doc_id long, text string",
    )
    out = {r["eval_id"]: r for r in textops.contamination(corpus, evalset, k=4).collect()}
    assert out[100]["contamination"] == 1.0
    assert out[101]["contamination"] == 0.0
    assert 0.0 < out[102]["contamination"] < 1.0

    # python oracle for the partial case
    def shingles(t, k=4):
        w = t.split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    corp_sh = shingles("the quick brown fox jumps over the lazy dog today") | shingles(
        "completely unrelated corpus document text here now"
    )
    ev_sh = shingles("the quick brown fox jumps over the lazy cat instead")
    expect = round(len(ev_sh & corp_sh) / len(ev_sh), 6)
    assert out[102]["contamination"] == expect
    assert out[102]["n_shingles"] == len(ev_sh)


def test_neardup_dedup_transitive_clusters_quality_canonical(spark):
    # pairs: {1~2, 2~3} one cluster, {10~11} another; 99 unpaired
    df = spark.createDataFrame(
        [
            (1, "a", 0.5),
            (2, "b", 0.9),
            (3, "c", 0.9),
            (10, "d", None),
            (11, "e", 0.1),
            (99, "f", 0.0),
        ],
        "doc_id long, text string, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in textops.neardup_dedup(df, pairs, quality_col="quality").collect()
    )
    # cluster {1,2,3}: quality tie 2 vs 3 at 0.9 → min id 2; cluster
    # {10,11}: null quality sorts last → 11; 99 passes through
    assert kept == [2, 11, 99]


def test_neardup_dedup_no_quality_min_id(spark):
    df = spark.createDataFrame(
        [(i, "t") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(5, 3), (3, 4)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in textops.neardup_dedup(df, pairs).collect())
    assert kept == [0, 1, 2, 3]


def test_neardup_dedup_end_to_end_with_minhash(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 6
    docs = [
        (1, base),
        (2, base + "tail tweak"),            # near-dup of 1
        (3, base.replace("quick", "rapid")),  # near-dup of 1
        (4, "an entirely different document about spark shuffles " * 8),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = textops.minhash_dedup_pairs(df, threshold=0.5)
    out = sorted(r["doc_id"] for r in textops.neardup_dedup(df, pairs).collect())
    assert out == [1, 4]


def test_sample_bernoulli_deterministic_nested_and_layout_free(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in textops.sample_bernoulli(df, 0.1, seed=7).collect()}
    # same selection regardless of partition layout (df.sample would differ)
    s10b = {
        r["doc_id"]
        for r in textops.sample_bernoulli(df.repartition(13), 0.1, seed=7).collect()
    }
    assert s10 == s10b
    # fraction is approximately honored
    assert 0.07 < len(s10) / 4000 < 0.13
    # nesting: smaller fraction is a subset of the larger, same seed
    s02 = {r["doc_id"] for r in textops.sample_bernoulli(df, 0.02, seed=7).collect()}
    assert s02 <= s10
    # different seed draws a different set
    s10c = {r["doc_id"] for r in textops.sample_bernoulli(df, 0.1, seed=8).collect()}
    assert s10 != s10c
    # edge fractions
    assert textops.sample_bernoulli(df, 0.0).count() == 0
    assert textops.sample_bernoulli(df, 1.0).count() == 4000


def test_sample_stratified_exact_k_per_group(spark):
    rows = [(g * 100 + i, f"g{g}") for g in range(3) for i in range(g * 5 + 2)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = textops.sample_stratified(df, k=4, group_col="lang", seed=1)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"g0": 2, "g1": 4, "g2": 4}  # min(k, |group|)
    # deterministic across runs and layouts
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in textops.sample_stratified(
            df.repartition(7), k=4, group_col="lang", seed=1
        ).collect()
    )
    assert a == b


def _rep_oracle(text):
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    from collections import Counter

    lc = Counter(lines)
    n_lines = len(lines)
    dup_line_frac = (
        sum(c for c in lc.values() if c > 1) / n_lines if n_lines else 0.0
    )
    line_chars = sum(len(ln) for ln in lines)
    dup_line_chars = sum(len(ln) * c for ln, c in lc.items() if c > 1)
    dup_line_char_frac = dup_line_chars / line_chars if line_chars else 0.0
    words = text.split()
    word_chars = sum(len(w) for w in words)
    bigrams = Counter(
        " ".join(words[i : i + 2]) for i in range(len(words) - 1)
    )
    if bigrams and word_chars:
        top_c = max(bigrams.values())
        top_len = max(len(bg) - 1 for bg, c in bigrams.items() if c == top_c)
        top_bigram_char_frac = top_c * top_len / word_chars
    else:
        top_bigram_char_frac = 0.0
    return (
        round(dup_line_frac, 6),
        round(dup_line_char_frac, 6),
        round(top_bigram_char_frac, 6),
        n_lines,
    )


def test_repetition_stats_vs_python_oracle(spark):
    docs = [
        (1, "buy now\nbuy now\nunique line here\nbuy now"),
        (2, "clean prose with no repeated lines\nanother fine line"),
        (3, "spam spam spam spam spam wonderful spam"),
        (4, ""),
        (5, "one"),
        (6, "a b\n\n  \na b\nxyz"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.repetition_stats(df).collect()}
    for doc_id, text in docs:
        dl, dlc, tb, nl = _rep_oracle(text)
        r = got[doc_id]
        assert r["n_lines"] == nl, doc_id
        assert r["dup_line_frac"] == dl, doc_id
        assert r["dup_line_char_frac"] == dlc, doc_id
        assert r["top_bigram_char_frac"] == tb, doc_id


def test_clean_corpus_end_to_end(spark):
    good = (
        "the cat and the dog walked over a bridge of stone while the sun "
        "set over a quiet field and the birds sang of the evening air "
    ) * 3
    docs = [
        (1, good),                                  # survives
        (2, good + " extra tail words here"),       # near-dup of 1 (lower id loses on equal quality? quality differs slightly)
        (3, good),                                  # exact dup of 1
        (4, "short"),                               # quality too low
        (5, ("spam spam " * 40).strip()),           # top-bigram repetition
        (6, "\n".join(["the same line of the day"] * 12)),  # dup lines
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textops.clean_corpus(
        df, langs=["en"], min_quality=0.3, minhash_threshold=0.5
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 3 drops as exact dup of 1; {1,2} near-dup cluster keeps the better-
    # quality doc; 4/5/6 fail the filters
    assert len(kept) == 1 and kept[0] in (1, 2)
    row = out.collect()[0]
    assert row["pred_lang"] == "en"
    assert row["quality"] >= 0.3
    assert set(out.columns) >= {
        "doc_id", "text", "pred_lang", "quality", "dup_line_frac",
        "top_bigram_char_frac",
    }


def test_pack_sequences_vs_python_oracle(spark):
    docs = [
        (1, "a " * 7),     # 7 tokens
        (2, "b " * 10),    # 10 tokens: crosses the 8-boundary twice
        (3, "c " * 3),
        (4, ""),           # empty doc dropped
        (5, "d " * 8),     # exactly one full sequence worth
    ]
    seq_len = 8
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["seq_id"], r["doc_id"], r["doc_start"], r["seq_start"], r["n_toks"])
        for r in textops.pack_sequences(df, seq_len).collect()
    )

    # python oracle: lay out in id order, chunk
    expect = []
    pos = 0
    for doc_id, text in docs:
        n = len(text.split())
        if n == 0:
            continue
        d = 0
        while d < n:
            seq_id = (pos + d) // seq_len
            take = min(n - d, (seq_id + 1) * seq_len - (pos + d))
            expect.append((seq_id, doc_id, d, (pos + d) % seq_len, take))
            d += take
        pos += n
    assert got == sorted(expect)
    # every sequence except the last is exactly full
    per_seq = {}
    for seq_id, *_rest, n_toks in [(g[0], g[4]) for g in got]:
        per_seq[seq_id] = per_seq.get(seq_id, 0) + n_toks
    last = max(per_seq)
    assert all(v == seq_len for s, v in per_seq.items() if s != last)


def test_pack_sequences_grouped(spark):
    df = spark.createDataFrame(
        [(1, "en", "w " * 5), (2, "en", "w " * 5), (3, "de", "w " * 9)],
        "doc_id long, lang string, text string",
    )
    out = textops.pack_sequences(df, 4, group_col="lang")
    rows = sorted(
        (r["lang"], r["seq_id"], r["doc_id"], r["n_toks"]) for r in out.collect()
    )
    # each group packs independently from seq 0
    assert ("de", 0, 3, 4) in rows and ("de", 2, 3, 1) in rows
    assert ("en", 0, 1, 4) in rows and ("en", 2, 2, 2) in rows


def test_pii_scrub_vs_duckdb_oracle(spark):
    """Redaction + counts match a DuckDB RE2 twin (patterns are portable by
    construction: no lookarounds/backrefs), and each PII shape is caught."""
    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+spam@mail.example.org or call (555) 123-4567"),
            (2, "server 192.168.001.1 and card 4111 1111 1111 1111 ok"),
            (3, "intl +4915123456789 and date 2024-01-01 stays"),
            (4, "no pii here, just text with numbers 42 and 7"),
            (5, "two mails a@b.co c@d.io and ip 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    out = textops.pii_scrub(docs).orderBy("doc_id").collect()
    r = {row["doc_id"]: row for row in out}
    assert "<EMAIL>" in r[1]["text"] and "<PHONE>" in r[1]["text"]
    assert "jane" not in r[1]["text"]
    assert r[2]["text"].count("<IP>") == 1 and "<CC>" in r[2]["text"]
    assert "<PHONE>" in r[3]["text"] and "2024-01-01" in r[3]["text"]
    assert r[4]["text"] == "no pii here, just text with numbers 42 and 7"
    assert r[5]["n_email"] == 2 and r[5]["n_ipv4"] == 1
    assert r[1]["n_phone"] == 1 and r[2]["n_cc"] == 1

    import duckdb

    pdf = docs.toPandas()  # noqa: F841
    email, ipv4, cc, phone = (p for _, p, _ in textops.PII_RULES)
    oracle = duckdb.sql(
        f"""
        WITH s1 AS (SELECT doc_id, regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t,
                           len(regexp_extract_all(text, '{email}')) AS n_email FROM pdf),
             s2 AS (SELECT doc_id, regexp_replace(t, '{ipv4}', '<IP>', 'g') AS t, n_email,
                           len(regexp_extract_all(t, '{ipv4}')) AS n_ipv4 FROM s1),
             s3 AS (SELECT doc_id, regexp_replace(t, '{cc}', '<CC>', 'g') AS t, n_email, n_ipv4,
                           len(regexp_extract_all(t, '{cc}')) AS n_cc FROM s2)
        SELECT doc_id, regexp_replace(t, '{phone}', '<PHONE>', 'g') AS text,
               n_email, n_ipv4, n_cc,
               len(regexp_extract_all(t, '{phone}')) AS n_phone
        FROM s3 ORDER BY doc_id
        """
    ).df()
    got = textops.pii_scrub(docs).orderBy("doc_id").toPandas()
    for col in ("text", "n_email", "n_ipv4", "n_cc", "n_phone"):
        assert list(got[col]) == list(oracle[col]), col


def test_remove_boilerplate_vs_duckdb_oracle(spark):
    """Line-level boilerplate dedup matches a DuckDB twin; order preserved,
    all-boilerplate docs survive with empty text, blank lines never count."""
    rows = []
    for i in range(12):
        body = f"unique body line {i}\nsecond unique {i}"
        rows.append((i, f"COOKIE NOTICE\n{body}\n\nfooter (c) site"))
    rows.append((100, "COOKIE NOTICE\nfooter (c) site"))  # all boilerplate
    rows.append((101, "totally unique document"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r["text"] for r in textops.remove_boilerplate(docs, min_docs=10).collect()}
    assert len(out) == 14  # row count stable
    assert out[0] == "unique body line 0\nsecond unique 0\n"  # blank line kept
    assert out[100] == ""
    assert out[101] == "totally unique document"

    import duckdb

    pdf = docs.toPandas()  # noqa: F841
    oracle = duckdb.sql(
        """
        WITH lines AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                 unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
          FROM pdf),
        hot AS (
          SELECT trim(line) AS key FROM lines WHERE trim(line) <> ''
          GROUP BY trim(line) HAVING count(DISTINCT doc_id) >= 10),
        kept AS (
          SELECT l.* FROM lines l WHERE trim(l.line) NOT IN (SELECT key FROM hot))
        SELECT d.doc_id,
               coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS text
        FROM (SELECT DISTINCT doc_id FROM pdf) d
        LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    ).df()
    got = textops.remove_boilerplate(docs, min_docs=10).orderBy("doc_id").toPandas()
    assert list(got["doc_id"]) == list(oracle["doc_id"])
    assert list(got["text"]) == list(oracle["text"])


def test_remove_boilerplate_threshold_boundary(spark):
    """A line in exactly min_docs-1 docs stays; at min_docs it is dropped."""
    docs = spark.createDataFrame(
        [(i, f"shared line\nbody {i}") for i in range(4)]
        + [(10, "almost shared\nbody x"), (11, "almost shared\nbody y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in textops.remove_boilerplate(docs, min_docs=4).collect()}
    assert out[0] == "body 0"          # 4 docs >= 4: dropped
    assert out[10] == "almost shared\nbody x"  # 2 docs < 4: kept


def test_textcol_roundtrip_and_literal_sep(spark):
    """ADVICE r3: pii_scrub / remove_boilerplate keep the caller's text
    column name (text_col='body' must not silently rename to 'text'), and
    line_sep is a LITERAL separator — '|' must not regex-split per char."""
    docs = spark.createDataFrame(
        [(i, f"shared|body {i} a{i}@b.co") for i in range(10)] + [(99, "solo|x")],
        "doc_id long, body string",
    )
    scrubbed = textops.pii_scrub(docs, text_col="body")
    assert "body" in scrubbed.columns and "text" not in scrubbed.columns
    assert scrubbed.filter(scrubbed.body.contains("<EMAIL>")).count() == 10
    # round-trip: scrub output feeds boilerplate removal under the same name
    out = textops.remove_boilerplate(scrubbed, min_docs=10, text_col="body", line_sep="|")
    assert "body" in out.columns and "text" not in out.columns
    rows = {r["doc_id"]: r["body"] for r in out.collect()}
    assert rows[0] == "body 0 <EMAIL>"  # 'shared' dropped, '|' split intact
    assert rows[99] == "solo|x"


def test_clean_corpus_cache_handle(spark):
    """clean_corpus exposes its internal persisted frame for caller-owned
    release in long-lived sessions (ADVICE r3)."""
    good = (
        "the cat and the dog walked over a bridge of stone while the sun "
        "set over a quiet field and the birds sang of the evening air "
    ) * 3
    docs = spark.createDataFrame(
        [(i, good + f" unique tail {i} closing words") for i in range(10)],
        "doc_id long, text string",
    )
    handle: list = []
    out = textops.clean_corpus(docs, cache_handle=handle)
    assert out.count() > 0
    assert len(handle) == 1 and handle[0].is_cached
    handle[0].unpersist(blocking=True)
    assert not handle[0].is_cached


def _py_dup_spans(docs: dict[int, str], k: int, min_docs: int) -> dict[int, list[tuple[int, int]]]:
    """Brute-force oracle: positioned k-grams -> cross-doc freq -> merged spans."""
    from collections import defaultdict

    grams = defaultdict(set)  # gram -> {doc}
    pos = {}
    for d, t in docs.items():
        ws = t.split()
        pos[d] = [(i, " ".join(ws[i : i + k])) for i in range(max(len(ws) - k + 1, 0))]
        for _, g in pos[d]:
            grams[g].add(d)
    hot = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = {}
    for d in docs:
        ivs = sorted((i, i + k) for i, g in pos[d] if g in hot)
        merged: list[list[int]] = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        if merged:
            out[d] = [tuple(m) for m in merged]
    return out


def test_duplicate_ngram_spans_vs_python_oracle(spark):
    """Exact-substring (Lee et al.) span finder matches the brute-force
    oracle, incl. overlap merging, docs shorter than k, and the threshold."""
    shared = " ".join(f"dup{i}" for i in range(20))  # 20-word verbatim passage
    shared2 = " ".join(f"also{i}" for i in range(10))
    docs = {
        1: f"alpha one two three {shared} tail1 x y z",
        2: f"beta {shared} middle {shared2} end2",
        3: f"gamma unique words only here nothing repeats at all {shared2} omega",
        4: "delta totally original text with no duplicated passages anywhere",
        5: "short doc",  # < k words: no grams
        6: f"epsilon {shared} zeta",  # third copy of shared
    }
    k, min_docs = 8, 2
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    spans = textops.duplicate_ngram_spans(df, k=k, min_docs=min_docs)
    got = {}
    for r in spans.collect():
        got.setdefault(r["doc_id"], []).append((r["start_word"], r["end_word"]))
    got = {d: sorted(v) for d, v in got.items()}
    want = _py_dup_spans(docs, k, min_docs)
    assert got == want

    # strip: covered words removed, untouched docs byte-identical
    stripped = {
        r["doc_id"]: r["text"]
        for r in textops.strip_duplicate_spans(df, spans).collect()
    }
    for d, t in docs.items():
        ws = t.split()
        keep = [
            w
            for i, w in enumerate(ws)
            if not any(s <= i < e for s, e in want.get(d, []))
        ]
        assert stripped[d] == (" ".join(keep) if d in want else t), d
    # no dup-word survives anywhere
    for d in (1, 2, 6):
        assert "dup0" not in stripped[d] and "dup19" not in stripped[d]
    assert stripped[4] == docs[4]


def test_duplicate_ngram_spans_threshold(spark):
    """min_docs=3: a passage shared by only two docs is NOT flagged."""
    shared = " ".join(f"p{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, f"a {shared} b"), (2, f"c {shared} d"), (3, "nothing in common here at all today")],
        "doc_id long, text string",
    )
    assert textops.duplicate_ngram_spans(df, k=8, min_docs=3).count() == 0
    assert textops.duplicate_ngram_spans(df, k=8, min_docs=2).count() == 2


def test_mix_corpus_deterministic_nested_weighted(spark):
    """Source mixing: per-source keep rates hit their targets, decisions
    are layout-invariant, lower weights nest inside higher ones, and
    unknown sources follow default_weight."""
    rows = [(i, ["web", "code", "books"][i % 3], f"t{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    mixed = textops.mix_corpus(df, {"web": 0.25, "code": 1.0}, seed=7)
    per = {r["source"]: r["n"] for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["code"] == 1000            # weight 1.0 keeps all
    assert "books" not in per             # absent from map -> default 0.0
    assert abs(per["web"] - 250) < 60     # ~25% of 1000

    # layout-invariance: same selected set after repartitioning
    ids = {r["doc_id"] for r in mixed.collect()}
    ids_re = {r["doc_id"] for r in textops.mix_corpus(df.repartition(13), {"web": 0.25, "code": 1.0}, seed=7).collect()}
    assert ids == ids_re

    # nesting: web@0.1 is a subset of web@0.25 at the same seed
    lo = {r["doc_id"] for r in textops.mix_corpus(df, {"web": 0.1}, seed=7).collect()}
    hi = {r["doc_id"] for r in textops.mix_corpus(df, {"web": 0.25}, seed=7).collect()}
    assert lo <= hi

    # default_weight: unknown sources kept at the default rate
    dflt = textops.mix_corpus(df, {"web": 0.0}, seed=7, default_weight=1.0)
    per2 = {r["source"]: r["n"] for r in dflt.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per2 == {"code": 1000, "books": 1000}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        textops.mix_corpus(df, {"web": 1.5})


def test_ensure_parallelism_plan_shapes(spark, tmp_path):
    """r4 review: scan-only AND broadcast-join-only plans (no shuffle
    exchange — the stream side keeps the scan's 1-2 partitions) must
    repartition up; shuffle-bearing plans are left alone (their width is
    already shuffle.partitions)."""
    target = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "narrow")
    spark.createDataFrame([(i, f"t {i}") for i in range(200)],
                          "doc_id long, text string").coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    assert scan.rdd.getNumPartitions() < target
    # scan-only: widened
    assert textops.ensure_parallelism(scan).rdd.getNumPartitions() >= target
    # broadcast-join-only: stream side is still the 1-partition scan
    dim = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    bj = scan.join(F.broadcast(dim), "doc_id")
    assert "BroadcastHashJoin" in bj._jdf.queryExecution().sparkPlan().toString()
    assert textops.ensure_parallelism(bj).rdd.getNumPartitions() >= target
    # shuffle-bearing: untouched (object identity — no extra repartition)
    agg = scan.groupBy("doc_id").count()
    assert textops.ensure_parallelism(agg) is agg


def test_hamming_neardup_pairs_matches_bruteforce(spark):
    """Generic bit-slice blocking is EXACT within the radius: every run at
    every (radius, n_chunks) combo reproduces the python all-pairs brute
    force over a hash set with planted ≤5-bit perturbations."""
    import numpy as np

    rng = np.random.default_rng(7)
    hashes = [int(v) for v in rng.integers(-(2 ** 63), 2 ** 63, size=40, dtype=np.int64)]
    for i in range(0, 40, 4):  # planted near twins of varying distance
        h = hashes[i]
        for b in rng.choice(64, size=int(rng.integers(1, 6)), replace=False):
            h ^= 1 << int(b)
        if h >= 2 ** 63:
            h -= 2 ** 64
        hashes.append(h)
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id long, h long"
    )

    def brute(max_h):
        out = set()
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                d = bin((hashes[i] ^ hashes[j]) & (2 ** 64 - 1)).count("1")
                if d <= max_h:
                    out.add((i, j, d))
        return out

    for max_h, n_chunks in [(0, None), (3, None), (6, None), (3, 8), (7, 8)]:
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in textops.hamming_neardup_pairs(
                df, "id", "h", max_hamming=max_h, n_chunks=n_chunks
            ).collect()
        }
        assert got == brute(max_h), f"mismatch at max_hamming={max_h} n_chunks={n_chunks}"
    assert brute(6), "fixture must actually plant >3-bit pairs"


def test_hamming_neardup_pairs_validation(spark):
    import pytest

    df = spark.createDataFrame([(0, 0)], "id long, h long")
    with pytest.raises(ValueError, match="max_hamming"):
        textops.hamming_neardup_pairs(df, "id", "h", max_hamming=32)
    with pytest.raises(ValueError, match="pigeonhole"):
        textops.hamming_neardup_pairs(df, "id", "h", max_hamming=4, n_chunks=4)
    with pytest.raises(ValueError, match="power of two"):
        textops.hamming_neardup_pairs(df, "id", "h", max_hamming=3, n_chunks=5)


def test_hamming_neardup_pairs_partition_cols(spark):
    """partition_cols rows pair only within matching values — identical
    hashes in different partitions (the silent-audio / static-video
    degenerate) never meet — and the a-side value is carried in the
    output."""
    rows = [
        (0, 0, "a"),
        (1, 0, "a"),   # same hash, same partition  -> pair
        (2, 0, "b"),   # same hash, other partition -> no cross pair
        (3, 1, "b"),   # 1 bit from id 2 within "b" -> pair
    ]
    df = spark.createDataFrame(rows, "id long, h long, kind string")
    got = {
        (r["kind"], r["id_a"], r["id_b"], r["hamming"])
        for r in textops.hamming_neardup_pairs(
            df, "id", "h", max_hamming=3, partition_cols=("kind",)
        ).collect()
    }
    assert got == {("a", 0, 1, 0), ("b", 2, 3, 1)}


def test_hamming_partition_cols_null_safe(spark):
    """Null partition values (unknown language) pair among themselves
    instead of silently never pairing."""
    df = spark.createDataFrame(
        [(0, 5, None), (1, 5, None), (2, 5, "en")], "id long, h long, lang string"
    )
    got = {
        (r["lang"], r["id_a"], r["id_b"])
        for r in textops.hamming_neardup_pairs(
            df, "id", "h", max_hamming=3, partition_cols=("lang",)
        ).collect()
    }
    assert got == {(None, 0, 1)}


def test_clean_corpus_strip_spans(spark):
    """clean_corpus(strip_spans=True) — the full modern pipeline with the
    Lee-et-al. exact-substring strip as the final stage (r4 verdict item
    5).  Oracle: composition equivalence against the standalone ops (each
    already brute-force/python-oracled) applied to the strip_spans=False
    survivor set, plus a python-computed expected text for the planted
    duplicated passage."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    uniq = [
        "the quick brown fox jumped over a lazy dog near the river bank "
        "while children played in the warm afternoon light of summer",
        "distant mountains rose above the valley floor where farmers "
        "tended their fields and traders walked the old stone road home",
        "a ship sailed past the harbor wall as gulls circled overhead "
        "and fishermen hauled their heavy nets onto the wooden pier",
    ]
    docs = [
        (i + 1, f"{u} {passage} close{i} words{i} tail{i}")
        for i, u in enumerate(uniq)
    ]
    docs.append((4, "short"))  # fails quality, never reaches the strip
    df = spark.createDataFrame(docs, "doc_id long, text string")

    kwargs = dict(langs=["en"], min_quality=0.2, minhash_threshold=0.9)
    out = {
        r["doc_id"]: r["text"]
        for r in textops.clean_corpus(
            df, strip_spans=True, strip_k=8, strip_min_docs=2, **kwargs
        ).collect()
    }

    # composition oracle: standalone spans+strip over the no-strip survivors
    survivors = textops.clean_corpus(df, **kwargs)
    spans = textops.duplicate_ngram_spans(survivors, k=8, min_docs=2)
    expect = {
        r["doc_id"]: r["text"]
        for r in textops.strip_duplicate_spans(survivors, spans).collect()
    }
    assert out == expect

    # python oracle for the planted passage: docs 1-3 survive (distinct
    # content, good quality) and each loses exactly the 8-word passage
    assert set(out) == {1, 2, 3}
    for i, u in enumerate(uniq):
        assert out[i + 1] == f"{u} close{i} words{i} tail{i}"
        assert passage not in out[i + 1]
