"""Bigram-LM scoring + DSIR weights: algebraic invariants the oracles
can't see (fold-order independence, identity target, empty-text rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.lm import (
    LM_SCALE,
    bigram_lm_scores,
    dsir_weights,
    fold_bigram_index,
    lm_scores_from_index,
)
from scraper_db_refine_merge_spark.sources.tables import load_table


def test_fold_order_invariance(spark, sf_dir, tmp_path):
    """Folding batches in any order yields identical index scores — the
    mergeability claim, checked beyond q129's single order."""
    d = load_table(spark, sf_dir, "documents")
    whole = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
             for r in bigram_lm_scores(d, "doc_id", "text").collect()}
    for perm, name in [((0, 1, 2), "a"), ((2, 0, 1), "b")]:
        root = str(tmp_path / f"idx_{name}")
        for i in perm:
            fold_bigram_index(spark, root, d.filter(F.col("doc_id") % 3 == i), "doc_id", "text")
        got = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
               for r in lm_scores_from_index(spark, root, d, "doc_id", "text").collect()}
        assert got == whole, name


def test_dsir_identity_target(spark, sf_dir):
    """Target = whole corpus → every bucket ratio is exactly 1 → every
    document's weight is exactly `scale` micro-units."""
    d = load_table(spark, sf_dir, "documents")
    w = dsir_weights(d, "doc_id", "text", F.lit(True))
    vals = {r["dsir_weight"] for r in w.collect()}
    assert vals == {1_000_000}


def test_short_docs_have_no_bigrams(spark):
    d = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_bigrams"] for r in bigram_lm_scores(d, "doc_id", "text").collect()}
    # 0- and 1-token docs produce no bigram rows at all; 2-token doc has 1
    assert out == {3: 1}


def test_lm_score_bounds(spark, sf_dir):
    """unit = (c12+1)·S div (c1+V) ≤ S since c12 ≤ c1 < c1+V−1... scores
    stay within (0, LM_SCALE]."""
    d = load_table(spark, sf_dir, "documents")
    s = bigram_lm_scores(d, "doc_id", "text")
    r = s.agg(F.min("lm_score"), F.max("lm_score")).first()
    assert 0 < r[0] and r[1] <= LM_SCALE


def test_unseen_bigrams_get_add_one_smoothing(spark, tmp_path):
    """ADVICE r6: scoring NEW documents against a frozen index must apply
    true add-one smoothing to bigrams the index never saw — unit =
    scale div (c1 + V), or scale div V when the prefix itself is unseen —
    not silently drop them (the inner-join bug)."""
    corpus = spark.createDataFrame([(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    root = str(tmp_path / "lm_idx")
    fold_bigram_index(spark, root, corpus, "doc_id", "text")
    # corpus stats: bigrams {ab:2, ba:1, ac:1}; c1: a->3, b->1; V=3 (a,b,c)
    new = spark.createDataFrame([(10, "b c z")], "doc_id long, text string")
    got = lm_scores_from_index(spark, root, new, "doc_id", "text").collect()
    assert len(got) == 1
    r = got[0]
    # bigrams of new doc: (b,c) unseen with seen prefix b (c1=1) -> S div (1+3)
    #                     (c,z) unseen with unseen prefix c... c appears as w2
    #   only, so c1(c)=0 -> S div (0+3)
    expect_units = [LM_SCALE // 4, LM_SCALE // 3]
    assert r["n_bigrams"] == 2
    assert r["lm_score"] == sum(expect_units) // 2


def test_decimal_div_parity_beyond_bigint(spark):
    """ROADMAP 1a(e) probe, pinned: Spark `DECIMAL(38,0) div BIGINT` equals
    DuckDB `HUGEINT //` (truncation toward zero) for numerators far beyond
    2^63 — the property that lets the integer-unit LM/DSIR operators carry
    corpus counts past the BIGINT product ceiling. Also pins the failure
    mode that motivated the fix: the BIGINT product itself wraps."""
    import duckdb

    # numerators beyond 2^63; quotients within BIGINT — the operator
    # contract (unit ≤ scale because c12 ≤ c1). A quotient that itself
    # exceeds 2^63 wraps (Spark div returns BIGINT) — out of contract.
    cases = [
        (2**70 + 12345, 2**20 + 9),
        (2**89 - 1, 2**40 + 7),
        (10**27 + 11, 10**9 + 7),
        (123456789012345678901234567, 1000000007),
    ]
    for a, b in cases:
        s = spark.sql(
            f"SELECT CAST('{a}' AS DECIMAL(38,0)) div CAST({b} AS BIGINT) AS q"
        ).collect()[0]["q"]
        d = duckdb.sql(
            f"SELECT CAST(CAST('{a}' AS HUGEINT) // {b} AS VARCHAR) AS q"
        ).fetchone()[0]
        assert int(d) == s == a // b  # positive operands: floor == trunc

    # truncation direction (both engines: toward zero, NOT floor)
    for a, b in [(-7, 2), (7, -2), (-7, -2)]:
        s = spark.sql(f"SELECT CAST({a} AS DECIMAL(38,0)) div CAST({b} AS BIGINT) AS q").collect()[0]["q"]
        d = duckdb.sql(f"SELECT {a} // {b} AS q").fetchone()[0]
        assert s == d == int(a / b)


def test_lm_unit_no_overflow_at_huge_counts(spark):
    """The widened numerator computes the true quotient where the old
    BIGINT product would have wrapped: c12 = 2^40 at nano-scale makes
    (c12+1)*1e9 ≈ 1.1e21 > 2^63."""
    from pyspark.sql import functions as F

    c12, c1, v, scale = 2**40, 2**41, 50_000, 1_000_000_000
    row = spark.createDataFrame([(c12, c1, v)], "c12 long, c1 long, v long")
    got = row.select(
        F.expr(
            f"(CAST(coalesce(c12, 0) + 1 AS DECIMAL(38,0)) * {scale}) div (coalesce(c1, 0) + v)"
        ).alias("unit")
    ).collect()[0]["unit"]
    assert got == ((c12 + 1) * scale) // (c1 + v)  # exact, ~scale/2
    assert (c12 + 1) * scale > 2**63  # the case BIGINT arithmetic cannot carry


def test_dsir_unit_double_parity_at_2p53_boundary(spark):
    """ROADMAP 1a(e), closing probe (r16): the DSIR unit is a FIXED IEEE
    double expression tree, so CROSS-ENGINE parity holds even when the
    intermediate products cross 2^53 — both engines execute the identical
    rounded operations in the identical order. What degrades past 2^53 is
    EXACTNESS versus the true rational (pinned below with a concrete
    witness), deterministically and identically in both engines; a caller
    needing exact units at such counts lifts the products into the q126
    DECIMAL(38,0)-div formulation, whose beyond-2^63 parity is pinned in
    test_decimal_div_parity_beyond_bigint."""
    from fractions import Fraction

    import duckdb

    scale = 1_000_000_000
    B = 4096
    cases = [
        (2**52 - 1, 2**52 + 1, 2**53 + 4097, 2**53 - 1),   # products straddle 2^53
        (2**53 - 1, 2**53 - 3, 2**55 + 17, 2**55 + 19),    # far past, still parity
        (12345, 99999, 10**6 + 3, 10**6 + 7),              # small control
    ]
    expr = (
        "CAST(floor(CAST(({ct} + 1) AS DOUBLE) * CAST(({R} + {B}) AS DOUBLE)"
        " / (CAST(({cr} + 1) AS DOUBLE) * CAST(({T} + {B}) AS DOUBLE))"
        " * CAST({scale} AS DOUBLE) + 0.5) AS BIGINT)"
    )
    for ct, cr, R, T in cases:
        q = expr.format(ct=ct, cr=cr, R=R, T=T, B=B, scale=scale)
        s = spark.sql(f"SELECT {q} AS u").collect()[0]["u"]
        d = duckdb.sql(f"SELECT {q} AS u").fetchone()[0]
        assert s == d, (ct, cr, R, T)  # bit-identical across engines

    # The boundary that actually matters is the UNIT's magnitude, not the
    # raw counts: with counts past 2^53 but a unit near `scale` (~1e9) the
    # double value is still exactly representable and the unit equals the
    # true rational (first loop above). Exactness degrades only when
    # scale·ratio itself passes 2^53 — a target-only hot bucket with a
    # huge count ratio. Concrete witness (found by search): both engines
    # agree with EACH OTHER bit-for-bit but sit one off the exact
    # rational, so the divergence is accuracy, never cross-engine parity.
    ct, cr, R, T = 10_000_013, 0, 2**31 + 11, 2**31 - 7
    exact = int(
        Fraction(ct + 1) * Fraction(R + B) / (Fraction(cr + 1) * Fraction(T + B))
        * scale
        + Fraction(1, 2)
    )
    # pre-summed literals: DuckDB types bare small ints INT32 and the +B
    # addition would overflow before the DOUBLE cast
    q = (
        f"CAST(floor(CAST({ct + 1} AS DOUBLE) * CAST({R + B} AS DOUBLE)"
        f" / (CAST({cr + 1} AS DOUBLE) * CAST({T + B} AS DOUBLE))"
        f" * CAST({scale} AS DOUBLE) + 0.5) AS BIGINT)"
    )
    s = spark.sql(f"SELECT {q} AS u").collect()[0]["u"]
    d = duckdb.sql(f"SELECT {q} AS u").fetchone()[0]
    assert exact == 10000014083818989 and s == d == exact - 1
