"""Training-data prep operators (pipelines/training.py): PII
redaction, Gopher repetition signals, domain stats, stratified
sampling, and the hierarchical-prefix-sum sequence packer."""

import duckdb
import pandas as pd
import pyarrow as pa

from pdf_parser_ray.pipelines import training

SF = "/root/testdata/sf0.001"


def test_pii_redactor_counts_and_redaction():
    df = pd.DataFrame({"doc_id": [7, 10000], "text": ["hello world", "x"]})
    out = training.PiiRedactor()(df)
    assert list(out["n_emails"]) == [1, 1]
    assert list(out["n_phones"]) == [1, 1]
    assert (
        out["clean_text"][0]
        == "hello world contact <EMAIL> or dial <PHONE>"
    )
    # doc 10000: phone is 555-0000 (id % 10000), email user10000@mail4...
    assert "<EMAIL>" in out["clean_text"][1]
    assert "@" not in out["clean_text"][1]
    assert "555-" not in out["clean_text"][1]


def test_pii_injection_matches_sql_rebuild():
    df = pd.DataFrame({"doc_id": [123], "text": ["w"]})
    assert (
        training.inject_pii(df)[0]
        == "w contact user123@mail4.example.com or dial 555-0123"
    )


def test_repetition_stats_hand_case():
    batch = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": ["a a a b", "x", ""]}
    )
    out = training.RepetitionStats()(batch)
    # "a a a b": 4 tokens, top word 'a' x3; bigrams (a,a)x2 (a,b)x1 ->
    # 3 bigrams, duplicate-bigram mass 2
    assert out["n_tokens"].to_pylist() == [4, 1, 0]
    assert out["top_word_n"].to_pylist() == [3, 1, 0]
    assert out["n_bigrams"].to_pylist() == [3, 0, 0]
    assert out["dup_bigram_n"].to_pylist() == [2, 0, 0]


def test_pack_sequences_matches_window_sql(ray_session):
    # tiny bucket/fanout so the hierarchy is exercised for real:
    # 500 docs -> 32 buckets -> 8 superbuckets
    got = (
        training.pack_sequences(SF, budget=512, bucket_size=16, fanout=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH tok AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
                   AS n_tokens
          FROM '{SF}/documents.parquet'
        )
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS start_tok
        FROM tok ORDER BY doc_id
        """
    ).df()
    assert list(got["start_tok"]) == list(want["start_tok"])
    assert list(got["seq_id"]) == [s // 512 for s in want["start_tok"]]
    # packing invariant: consecutive docs tile the token stream exactly
    nxt = got["start_tok"].shift(-1).dropna().astype(int)
    assert (nxt.values == (got["start_tok"] + got["n_tokens"]).values[:-1]).all()


def test_stratified_sample_rates(ray_session):
    got = training.stratified_sample(SF).to_pandas()
    assert ((got["doc_id"] % 100) < got["lang"].map(training.SAMPLE_RATES)).all()


def test_ngram_emitter_hand_case():
    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "text": ["a b c d e f g h i"]}
    )
    out = training.NGramEmitter(8)(batch)
    # 9 tokens -> two 8-gram positions, both distinct
    assert len(out) == 2
    assert out["c"].to_pylist() == [1, 1]
    assert out["doc_id"].to_pylist() == [1, 1]


def test_dup_ngram_mass_cross_doc(ray_session, tmp_path):
    import duckdb
    import ray.data

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "a b c d e f g h i",      # grams: a..h, b..i
                "x a b c d e f g h",      # grams: x..g, a..h (shared)
                "q r s t u v w x y z",    # no shared grams
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": pa.array([17, 17, 19], pa.int64()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.dup_ngram_mass(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [1, 2]
    assert list(got["n_dup_grams"]) == [1, 1]


def test_vocab_stats_matches_counter(ray_session):
    from collections import Counter
    import re

    import pyarrow.parquet as pq

    got = training.vocab_stats(SF).to_pandas().set_index("word")
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    word = re.compile(r"[A-Za-z0-9]+")
    tf, df = Counter(), Counter()
    for t in texts:
        toks = word.findall(t)
        tf.update(toks)
        df.update(set(toks))
    assert dict(got["tf"]) == dict(tf)
    assert dict(got["df"]) == dict(df)


def test_blocklist_filter_drops_blocked_domains(ray_session):
    got = training.blocklist_filter(SF).to_pandas()
    ks = got["domain"].str.extract(r"^site(\d+)\.example$", expand=False).astype(int)
    assert (ks % 7 != 0).all()
    assert ((got["doc_id"] % 97) % 7 != 0).all()
    assert len(got) == 427  # 500 - 73 blocked


def test_bpe_token_counts_hand_case():
    s = pd.Series(["hello, world 42", ""])
    # "hello" + "," + " world" + " 42" -> 4 pre-tokens
    assert list(s.str.count(training.BPE_RE)) == [4, 0]


def test_fnv_int_strings_vectorized_equivalence():
    import numpy as np

    from pdf_parser_ray.functions.hashing import fnv1a64, fnv1a64_of_int_strings

    ids = np.array([0, 1, 9, 10, 99, 12345, 2**31, 2**62], dtype=np.int64)
    got = fnv1a64_of_int_strings(ids)
    want = [fnv1a64(str(int(i)).encode()) for i in ids]
    assert [int(x) for x in got] == want


def test_shuffle_assignment_positions(ray_session):
    from pdf_parser_ray.functions.hashing import fnv1a64

    got = training.shuffle_assignment(SF).to_pandas()
    assert len(got) == 500
    assert set(got["shard"]) <= set(range(64))
    # each shard's positions are exactly 1..n in FNV-key order
    for shard, g in got.groupby("shard"):
        keys = [fnv1a64(str(i).encode()) for i in g["doc_id"]]
        assert all(k % 64 == shard for k in keys)
        order = [d for _, d in sorted(zip(keys, g["doc_id"]))]
        by_pos = list(g.sort_values("pos")["doc_id"])
        assert by_pos == order
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))


def test_decontaminate_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # doc 0 is eval (0 % 41 == 0); doc 1 shares its 8-gram, doc 2 not
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "a b c d e f g h",
                "z a b c d e f g h",   # grams: z..g, a..h (a..h is eval's)
                "q r s t u v w x y",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": pa.array([15, 17, 17], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.decontaminate(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every corpus (non-eval) doc gets a row; clean docs count 0
    assert list(got["doc_id"]) == [1, 2]
    assert list(got["n_contaminated_grams"]) == [1, 0]


def test_training_mix_pipeline_invariants(ray_session):
    got = (
        training.training_mix_pipeline(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # survivors tile the packed token stream exactly
    nxt = got["start_tok"].shift(-1).dropna().astype(int)
    assert (nxt.values == (got["start_tok"] + got["n_tokens"]).values[:-1]).all()
    assert (got["seq_id"] == got["start_tok"] // 256).all()
    # the gate + sample actually dropped docs
    assert 0 < len(got) < 500


def test_domain_stats_covers_all_domains(ray_session):
    got = training.domain_stats(SF).to_pandas()
    assert len(got) == 97
    assert int(got["n_docs"].sum()) == 500
    assert set(got["domain"].str.extract(r"^site(\d+)\.example$", expand=False).astype(int)) == set(range(97))


def test_rare_token_mass_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # 'common' appears 6x (>= threshold 5); everything else is rare.
    # injection adds tok<i> (hapax, rare) and mid<i%50> per doc.
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "common common common rareword",
                "common common othertoken",
                "common xyz",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": pa.array([30, 24, 10], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.rare_token_mass(str(tmp_path), threshold=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # per doc after injection: +2 tokens (tok<i>, mid<i%50>), both rare
    # (each appears once in this 3-doc corpus)
    assert list(got["n_tokens"]) == [6, 5, 4]
    assert list(got["n_rare"]) == [3, 3, 3]


def test_line_dedup_boilerplate_removed(ray_session):
    got = training.line_dedup(SF).to_pandas()
    assert (got["n_lines"] == 4).all()
    # footer (500/7 docs each) and banner (500/3) are always
    # boilerplate at >= 3 docs; 'sig <id>' is always kept
    assert got["text_clean"].str.contains("sig ").all()
    assert not got["text_clean"].str.contains("footer").any()
    assert not got["text_clean"].str.contains("banner").any()
    # kept = sig + (base text unless that exact text appears in >= 3 docs)
    assert got["n_kept"].between(1, 2).all()
    assert (got["n_kept"] >= 1).all()


def test_normalize_text_nfc_and_whitespace(ray_session, tmp_path):
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([3], pa.int64()),
            "text": ["hello   world"],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": pa.array([13], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = training.normalize_text(str(tmp_path)).to_pandas()
    # injected: 'hello   world' + '  cafe' + U+0301 + tab + ' x3'
    assert got["text_norm"][0] == "hello world café x3"
    # NFC composes e+combining (-1), collapse removes 4 extra spaces/tab
    assert got["n_chars_raw"][0] == len("hello   world") + 11
    assert got["n_chars_norm"][0] == len("hello world café x3")


def test_tfidf_top_terms_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # 'rare' appears only in doc 0 (df=1), 'common' in all three (df=3):
    # rare must outrank common for doc 0 despite equal tf
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["rare common", "common zz", "common yy"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": pa.array([11, 9, 9], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.tfidf_top_terms(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d0 = got[got["doc_id"] == 0]
    assert list(d0["word"]) == ["rare", "common"]
    assert list(d0["df"]) == [1, 3]
    assert d0["score_scaled"].iloc[0] == 10**12        # tf=1, df=1
    assert d0["score_scaled"].iloc[1] == 10**12 // 3   # tf=1, df=3
    # every doc gets at most k=3 rows, ranks contiguous from 1
    for _, g in got.groupby("doc_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_bigram_lm_score_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # corpus bigram counts: (a,b) x2, (b,a) x2, (a,c) x1
    # prefixes: a -> 3 bigram positions, b -> 2
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a b a", "a b a c", ""],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": pa.array([5, 7, 0], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.bigram_lm_score(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # prefixes: a -> (a,b)x2 + (a,c)x1 = 3; b -> (b,a)x2 = 2
    ab = (2 * 10**6) // 3
    ba = (2 * 10**6) // 2
    ac = (1 * 10**6) // 3
    assert list(got["doc_id"]) == [0, 1, 2]
    assert list(got["n_bigrams"]) == [2, 3, 0]
    assert list(got["lm_score_scaled"]) == [ab + ba, ab + ba + ac, 0]


def test_dup_span_removal_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # docs 0 and 1 share the run "t1 .. t9" (two overlapping 8-grams at
    # positions 1 and 2 in each doc -> ONE merged span of 9 tokens);
    # doc 2 has no duplicated grams.
    shared = " ".join(f"t{i}" for i in range(1, 10))
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                shared + " only0 a b c",
                shared + " only1 x y z",
                "nothing shared here at all beyond seven tokens",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.dup_span_removal(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [0, 1]
    assert list(got["n_dup_positions"]) == [2, 2]
    assert list(got["n_spans"]) == [1, 1]
    assert list(got["n_removed_tokens"]) == [9, 9]


def test_dup_span_removal_split_spans(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # two shared 8-gram runs separated by a unique middle -> 2 spans
    run_a = " ".join(f"a{i}" for i in range(8))
    run_b = " ".join(f"b{i}" for i in range(8))
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": [
                run_a + " mid0 unique0 " + run_b,
                run_a + " mid1 unique1 " + run_b,
            ],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": pa.array([1, 1], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        training.dup_span_removal(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # positions: run_a 8-gram at pos 1; run_b at pos 11 (tokens 11..18)
    # gap 11-1=10 > 8 -> two spans, 8 tokens each
    assert list(got["n_spans"]) == [2, 2]
    assert list(got["n_removed_tokens"]) == [16, 16]
    assert list(got["n_dup_positions"]) == [2, 2]


def test_boilerplate_dedup_pipeline_cleaning_enables_dedup(
    ray_session, tmp_path
):
    """Mixed corpus (some chrome boilerplate, some kept): the engine
    must agree exactly with an independent local rebuild of df ->
    strip -> dedup."""
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.curation import boilerplate_dedup_pipeline

    docs = pa.table(
        {
            "doc_id": pa.array([0, 7, 14, 21, 1, 2], pa.int64()),
            "text": ["same page", "same page", "a", "b", "c", "d"],
            "lang": ["en"] * 6,
            "source": ["t"] * 6,
            "n_chars": pa.array([1] * 6, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        boilerplate_dedup_pipeline(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # assert exact agreement with an independent local rebuild of the
    # whole chain (line df -> strip -> group by cleaned text)
    lines = {
        i: [t, f"footer {i % 7}", f"banner {i % 3}"]
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    from collections import Counter

    df = Counter()
    for i, ls in lines.items():
        df.update(set(ls))
    cleaned = {
        i: "\n".join(l for l in ls if df[l] < 3) for i, ls in lines.items()
    }
    groups = Counter(cleaned.values())
    for i, c in cleaned.items():
        assert got.loc[i, "dup_group_size"] == groups[c]
        keeper = min(j for j, cj in cleaned.items() if cj == c)
        assert got.loc[i, "is_canonical"] == int(i == keeper)


def test_boilerplate_dedup_merges_chrome_variants(ray_session, tmp_path):
    """The headline story: same text + both chrome lines boilerplate ->
    one dup group across chrome variants."""
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.curation import boilerplate_dedup_pipeline

    # 6 docs, all text 'same', ids chosen so every footer/banner value
    # appears >= 3 times -> all chrome removed -> one group of 6
    ids = [0, 21, 42, 63, 84, 105]  # all % 7 == 0, % 3 == 0
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": ["same"] * 6,
            "lang": ["en"] * 6,
            "source": ["t"] * 6,
            "n_chars": pa.array([4] * 6, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        boilerplate_dedup_pipeline(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["dup_group_size"]) == [6] * 6
    assert list(got["is_canonical"]) == [1, 0, 0, 0, 0, 0]


def test_dup_span_removal_identical_doc_flood(ray_session, tmp_path):
    """Adversarial skew: many identical docs -> every position is a dup
    site, group sizes are linear in corpus (the in-group dup test is a
    transform, not a pair generator), and the result stays exact."""
    import pyarrow.parquet as pq

    n_docs, text = 600, " ".join(f"w{i}" for i in range(40))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": [text] * n_docs,
            "lang": ["en"] * n_docs,
            "source": ["t"] * n_docs,
            "n_chars": pa.array([len(text)] * n_docs, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = training.dup_span_removal(str(tmp_path)).to_pandas()
    assert len(got) == n_docs
    # 40 tokens -> 33 8-gram positions, one merged span covering all 40
    assert (got["n_dup_positions"] == 33).all()
    assert (got["n_spans"] == 1).all()
    assert (got["n_removed_tokens"] == 40).all()
