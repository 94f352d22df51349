"""longest_shared_run (operators/dedup.py): exact-length recovery on
constructed fixtures where the true longest shared token run is known."""

from __future__ import annotations

from scraper_db_refine_merge_spark.operators.dedup import longest_shared_run


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval_ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _words(a, b):
    return " ".join(f"w{i}" for i in range(a, b))


def test_exact_run_lengths_recovered(spark):
    """Runs of 8 (= base window), 12, and 20 tokens report exactly those
    lengths; a 7-token overlap (below base) reports nothing."""
    eval_doc = _words(0, 40)  # tokens w0..w39
    rows = [
        (100, eval_doc),
        # 20-token run w10..w29 wrapped in unique filler
        (1, "x1 x2 " + _words(10, 30) + " y1 y2"),
        # 12-token run w0..w11
        (2, _words(0, 12) + " z9 z8 z7"),
        # exactly-8-token run w5..w12
        (3, "q1 " + _words(5, 13) + " q2"),
        # 7-token overlap — below the base window, invisible by design
        (4, "r1 " + _words(20, 27) + " r2"),
    ]
    out = longest_shared_run(
        _docs(spark, rows), "doc_id", "text", _eval_ids(spark, [100]), base_window=8
    )
    got = {(r.doc_id, r.eval_doc): r.longest_run_tokens for r in out.collect()}
    assert got == {(1, 100): 20, (2, 100): 12, (3, 100): 8}


def test_two_separate_runs_report_the_longest(spark):
    """Two disjoint shared runs (9 and 15 tokens) on different diagonals —
    the per-pair result is the max, not a sum or a chain."""
    eval_doc = _words(0, 60)
    doc = "a1 " + _words(3, 12) + " b1 b2 b3 " + _words(30, 45) + " c1"
    out = longest_shared_run(
        _docs(spark, [(200, eval_doc), (5, doc)]),
        "doc_id",
        "text",
        _eval_ids(spark, [200]),
        base_window=8,
    )
    got = {(r.doc_id, r.eval_doc): r.longest_run_tokens for r in out.collect()}
    assert got == {(5, 200): 15}


def test_min_run_filters(spark):
    eval_doc = _words(0, 30)
    rows = [(300, eval_doc), (6, _words(0, 10)), (7, _words(0, 25))]
    out = longest_shared_run(
        _docs(spark, rows), "doc_id", "text", _eval_ids(spark, [300]),
        base_window=8, min_run=20,
    )
    got = {(r.doc_id, r.eval_doc): r.longest_run_tokens for r in out.collect()}
    assert got == {(7, 300): 25}


def test_repeated_window_content_does_not_inflate(spark):
    """The same 8-token phrase appearing TWICE in the training doc (two
    diagonals) still reports the true longest run, not a merged artifact."""
    eval_doc = _words(0, 20)
    doc = _words(4, 12) + " sep1 sep2 " + _words(4, 12)
    out = longest_shared_run(
        _docs(spark, [(400, eval_doc), (8, doc)]), "doc_id", "text",
        _eval_ids(spark, [400]), base_window=8,
    )
    got = {(r.doc_id, r.eval_doc): r.longest_run_tokens for r in out.collect()}
    assert got == {(8, 400): 8}
