"""End-to-end corpus curation (functions/curation.py): the composed
canonicalize → dedup → resolve → decontaminate → split flow, plus the
hive-partitioned routed write (reference analog: the full main() lifecycle,
parse_avc.py:3584-4117)."""

from pyspark.sql import functions as F


def _corpus(spark):
    """12-doc micro-corpus planting every drop reason exactly once:
    - docs 0/1 share a canonical URL under different decorations → drop 1;
    - docs 2/3/4 carry identical text → near-dup cluster, keeper 2 → drop 3,4;
    - doc 5's text is lifted verbatim into the eval suite → contaminated;
    - docs 6-11 are clean survivors."""
    dup_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    lifted = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (0, "HTTPS://Site.COM/a?utm_source=x", "clean page zero body words here padd zero aa bb"),
        (1, "https://site.com/a#frag", "clean page one body words here padd one cc dd"),
        (2, "https://site.com/b", dup_text),
        (3, "https://site.com/c", dup_text),
        (4, "https://site.com/d", dup_text),
        (5, "https://site.com/e", lifted),
    ] + [
        (i, f"https://site.com/p{i}",
         f"distinct survivor document number {i} with enough unique words body {i * 7}")
        for i in range(6, 12)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def _evals(spark):
    return spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten eleven twelve")],
        "eval_id long, text string",
    )


def test_curate_corpus_every_stage_drops(spark):
    from avc_parser_spark.functions.curation import curate_corpus

    out = curate_corpus(_corpus(spark), _evals(spark)).orderBy("doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    # survivors: 0 (url keeper), 2 (cluster keeper), 6..11
    assert sorted(rows) == [0, 2] + list(range(6, 12))
    assert rows[0]["canon_url"] == "https://site.com/a"
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())


def test_curate_corpus_skips_optional_stages(spark):
    """eval_docs=None skips decontamination; the lifted doc then survives."""
    from avc_parser_spark.functions.curation import curate_corpus

    out = curate_corpus(_corpus(spark), None)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 5] + list(range(6, 12))


def test_curated_write_partition_prunes(spark, tmp_path):
    """write_curated materializes hive-partitioned by split; a split=train
    read must carry the predicate as PartitionFilters (directory pruning),
    and the union of partitions must round-trip the curated rows."""
    from avc_parser_spark.functions.curation import curate_corpus, write_curated

    curated = curate_corpus(_corpus(spark), _evals(spark)).select(
        "doc_id", "canon_url", "split"
    )
    path = str(tmp_path / "curated")
    write_curated(curated, path)

    back = spark.read.parquet(path)
    train = back.filter(F.col("split") == "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "split" in plan.split("PartitionFilters:")[1][:200]

    want = sorted((r["doc_id"], r["canon_url"], r["split"]) for r in curated.collect())
    got = sorted((r["doc_id"], r["canon_url"], r["split"]) for r in back.collect())
    assert got == want


def test_split_by_hash_md5_portable(spark):
    """method='md5' must re-derive in plain SQL: bucket = first 16 md5 bits
    of the id string — the property the DuckDB oracle (and any other
    engine) relies on. Spot-check against hashlib."""
    import hashlib

    from avc_parser_spark.functions.text import split_by_hash

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r["split"] for r in split_by_hash(docs, method="md5").collect()}
    for i in (0, 7, 42, 199):
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 10_000
        want = "train" if bucket < 9000 else ("val" if bucket < 9500 else "test")
        assert out[i] == want, (i, bucket)


def test_curate_corpus_lm_perplexity_filter(spark):
    """lm + max_ppl drop surviving docs the reference LM finds implausible;
    clean docs and too-short-to-score docs are kept. The LM is trained on
    the corpus domain (the CCNet pattern: reference LM over in-domain
    text), so every in-domain doc scores well below the all-OOV backoff
    ceiling the gibberish doc hits."""
    from avc_parser_spark.functions.curation import curate_corpus
    from avc_parser_spark.functions.text import build_ngram_lm, lm_score

    corpus = _corpus(spark).unionByName(
        spark.createDataFrame(
            [
                (20, "https://site.com/junk", "qzx wvb kjh plm ytr qzx nmk"),
                (21, "https://site.com/tiny", "solo"),
            ],
            "doc_id long, url string, text string",
        )
    )
    lm = build_ngram_lm(_corpus(spark))
    # pick a threshold between the clean docs' max ppl and the junk doc's
    scored = {
        r["doc_id"]: r["ppl"]
        for r in lm_score(corpus, lm).collect()
    }
    clean_max = max(p for d, p in scored.items() if d != 20)
    assert scored[20] > clean_max * 2
    cutoff = (clean_max + scored[20]) / 2
    out = curate_corpus(corpus, _evals(spark), lm=lm, max_ppl=cutoff)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 20 dropped by the LM filter; 21 (<2 tokens, unscoreable) kept
    assert ids == [0, 2] + list(range(6, 12)) + [21]


def test_curate_corpus_domain_blocklist_and_cap(spark):
    """blocked_domains drops every doc from listed hosts before any
    sketching; max_per_domain keeps the K smallest-md5(id) docs per
    domain — re-derived here, so the selection is pinned, not just
    counted."""
    import hashlib

    from avc_parser_spark.functions.curation import curate_corpus

    rows = [
        (i, f"https://spam.example/p{i}",
         f"spam farm page number {i} words {i * 13}")
        for i in range(10)
    ] + [
        (100 + i, f"https://ok.example/p{i}",
         f"good page number {i} body {i * 11}")
        for i in range(4)
    ] + [
        (200, "https://blocked.example/x", "blocked host page body words"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = curate_corpus(
        corpus,
        None,
        blocked_domains=["blocked.example"],
        max_per_domain=3,
    )
    got = sorted(r["doc_id"] for r in out.collect())
    md5 = lambda i: hashlib.md5(str(i).encode()).hexdigest()  # noqa: E731
    want_spam = sorted(sorted(range(10), key=lambda i: (md5(i), i))[:3])
    want_ok = sorted(sorted(range(100, 104), key=lambda i: (md5(i), i))[:3])
    assert got == want_spam + want_ok
    doms = {r["doc_id"]: r["domain"] for r in out.collect()}
    assert all(d in ("spam.example", "ok.example") for d in doms.values())


def test_write_sharded_controls_file_counts(spark, tmp_path):
    """Shard counts derive from MEASURED per-split text bytes: a split
    with ~3 target-sizes of text gets 3 parquet files, a small one gets
    1 — neither the small-files nor the giant-shard failure mode."""
    import glob

    from avc_parser_spark.functions.curation import write_sharded

    big = "x" * 1000
    rows = [(i, big, "train") for i in range(300)] + [
        (1000 + i, "tiny", "val") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    path = str(tmp_path / "sharded")
    shards = write_sharded(
        df, path, target_shard_mb=1
    )  # 1 MiB target: both splits fit in one shard each
    assert shards == {"train": 1, "val": 1}

    rows_big = [(i, big * 400, "train") for i in range(8)]  # 3.2 MB total
    df_big = spark.createDataFrame(
        rows_big, "doc_id long, text string, split string"
    )
    shards = write_sharded(df_big, path + "2", target_shard_mb=1)
    assert shards == {"train": 4}  # ceil(3.2 MB / 1 MiB)
    files = glob.glob(path + "2/split=train/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(path + "2")
    assert back.count() == 8


def test_corpus_report_rollup(spark):
    """Data-card rollup: split totals plus split-by-lang breakdown in one
    GROUPING SETS pass; token/byte sums exact."""
    from avc_parser_spark.functions.curation import corpus_report

    df = spark.createDataFrame(
        [
            (0, "one two three", "train", "en", "a.com"),
            (1, "vier fuenf", "train", "de", "b.com"),
            (2, "six seven", "val", "en", "a.com"),
        ],
        "doc_id long, text string, split string, lang string, domain string",
    )
    rows = {
        (r["split"], r["lang"]): r
        for r in corpus_report(df, lang_col="lang").collect()
    }
    assert rows[("train", None)]["docs"] == 2
    assert rows[("train", None)]["tokens"] == 5
    assert rows[("train", None)]["n_domains"] == 2
    assert rows[("train", "en")]["docs"] == 1
    assert rows[("train", "en")]["text_bytes"] == 13
    assert rows[("val", "en")]["tokens"] == 2
    # without lang: plain per-split rollup
    plain = {r["split"]: r for r in corpus_report(df).collect()}
    assert plain["train"]["docs"] == 2 and plain["val"]["n_domains"] == 1


def test_curate_corpus_quality_battery(spark):
    """c4_clean + gopher stages (FineWeb order): the C4 doc screens drop
    code/lorem pages, a javascript line is REWRITTEN away while its doc
    survives, the Gopher screens drop a too-short page and the repetition
    screen drops a looping page — all before sketching; clean docs flow
    through to splits unchanged."""
    from avc_parser_spark.functions.curation import curate_corpus

    good = (
        "This is a perfectly ordinary opening line with enough words in it.\n"
        "Another complete thought follows and the vocabulary stays varied.\n"
        "Different phrasing closes out the paragraph quite nicely today."
    )
    js_doc = (
        "A first clean opener that is long enough to survive the filter.\n"
        "Please enable javascript to view this page now folks.\n"
        "Some second remark that also has plenty of words within it.\n"
        "One final varied statement rounds out this document rather well."
    )
    rep = ("spam ham " * 40).strip() + "."
    rows = [
        (0, "https://q.com/good", good),
        (1, "https://q.com/js", js_doc),
        (2, "https://q.com/code", "function f() { return 1; } " + good),
        (3, "https://q.com/lorem", "Lorem ipsum dolor sit amet. " + good),
        (4, "https://q.com/short", "tiny."),
        (5, "https://q.com/rep", rep),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = curate_corpus(
        docs, None, c4_clean=True, gopher=True, gopher_min_words=10
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert sorted(got) == [0, 1]
    # the js line is gone, every other line of doc 1 survives in order
    assert got[1] == "\n".join(
        line for line in js_doc.split("\n") if "javascript" not in line
    )
    assert got[0] == good
    # default-off: the battery never runs unless asked — the code/lorem/
    # short/rep pages survive it; 2 and 3 still near-dup-cluster with 0
    # (they share the `good` body), so only those drop, via dedup not C4
    base = curate_corpus(docs, None)
    assert sorted(r["doc_id"] for r in base.collect()) == [0, 1, 4, 5]


def test_curate_delta_incremental(spark, tmp_path):
    """Incremental ingest: a delta batch dedups against the STORED curated
    corpus without reprocessing it — url-level, exact-text, cross-batch
    near-dup, within-batch near-dup and contamination drops each planted
    once; commit_delta appends survivors + sketches so the NEXT delta
    dedups against them too."""
    from avc_parser_spark.functions.curation import (
        commit_delta,
        curate_corpus,
        curate_delta,
        write_curated,
    )
    from avc_parser_spark.functions.dedup import write_sketch_table

    base_rows = [
        (i, f"https://base.com/p{i}",
         f"stored document number {i} keeps twelve distinct words in every "
         f"single line body {i * 13}")
        for i in range(10)
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, url string, text string")
    corpus_path = str(tmp_path / "corpus")
    sketch_path = str(tmp_path / "sketches")
    curated = curate_corpus(base, None)
    write_curated(curated, corpus_path)
    write_sketch_table(curated, sketch_path, mode="overwrite")

    eval_text = ("held out benchmark sentence with many overlapping tokens "
                 "for the contamination check stage")
    evals = spark.createDataFrame([(900, eval_text)], "eval_id long, text string")
    near = base_rows[3][2] + " extra"     # high-jaccard, different digest
    delta_rows = [
        (100, "https://base.com/p4?utm_source=x",  # canon_url == stored p4
         "entirely novel text that only shares the url with stored page four"),
        (101, "https://d.com/a", base_rows[5][2]),          # exact text copy
        (102, "https://d.com/b", near),                     # cross near-dup
        (103, "https://d.com/c", "within batch twin text that repeats "
                                 "across two fresh delta documents today"),
        (104, "https://d.com/d", "within batch twin text that repeats "
                                 "across two fresh delta documents today"),
        (105, "https://d.com/e", eval_text),                # contaminated
        (106, "https://d.com/f", "a genuinely fresh clean delta document "
                                 "with its own vocabulary and nothing shared"),
    ]
    delta = spark.createDataFrame(delta_rows, "doc_id long, url string, text string")

    out = curate_delta(spark, delta, corpus_path, sketch_path, eval_docs=evals)
    got = {r["doc_id"]: r for r in out.collect()}
    assert sorted(got) == [103, 106]
    assert all(r["split"] in ("train", "val", "test") for r in got.values())

    # commit, then a second delta copying survivor 106 must now drop
    commit_delta(out.select(*curated.columns), corpus_path, sketch_path)
    delta2 = spark.createDataFrame(
        [(200, "https://d2.com/x", delta_rows[-1][2]),      # copy of 106
         (201, "https://d2.com/y", "second wave document standing alone "
                                   "with completely independent words")],
        "doc_id long, url string, text string",
    )
    out2 = curate_delta(spark, delta2, corpus_path, sketch_path)
    assert sorted(r["doc_id"] for r in out2.collect()) == [201]
    # the store now holds base survivors + both committed deltas
    stored = spark.read.parquet(corpus_path)
    assert stored.count() == curated.count() + 2


def test_curate_corpus_link_rank_floor(spark):
    """ranks + min_rank_micro drop low-rank survivors BEFORE sketching;
    docs absent from the rank table are kept (pinned keep-on-missing)."""
    from avc_parser_spark.functions.curation import curate_corpus

    # 6 and 7 are low-rank spam; 8 is high-rank; 9-11 have no rank rows.
    ranks = spark.createDataFrame(
        [(6, 100), (7, 99_999), (8, 5_000_000), (2, 3_000_000)],
        "node long, rank_micro long",
    )
    out = curate_corpus(
        _corpus(spark), _evals(spark), ranks=ranks, min_rank_micro=100_000
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 8, 9, 10, 11]

    # floor alone (no ranks frame) must not activate the stage
    out2 = curate_corpus(_corpus(spark), _evals(spark), min_rank_micro=10)
    assert sorted(r["doc_id"] for r in out2.collect()) == [0, 2] + list(
        range(6, 12)
    )
