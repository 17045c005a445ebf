"""DSIR importance resampling (Xie et al., NeurIPS 2023): the hash gate
lives in the integer-exact `curate_dsir_masses` oracle; here the
ln-dependent weights/selection are pinned on a PLANTED skew where the
right answer is unambiguous."""

from __future__ import annotations

from pyspark.sql import functions as F


def _planted_docs(spark):
    """60 docs: 20 'en' target docs over vocabulary A (apple..fig), 20
    raw-background docs over vocabulary B (rock..sand), 20 mixed docs.
    DSIR weights against target='en' must order A-docs > mixed > B-docs
    (A tokens dominate the target model, B tokens only the raw model)."""
    va = "apple banana cherry date elder fig"
    vb = "rock iron slate gravel basalt sand"
    rows = []
    for i in range(20):
        rows.append((i, f"{va} {va.split()[i % 6]}", "en"))
    for i in range(20, 40):
        rows.append((i, f"{vb} {vb.split()[i % 6]}", "xx"))
    for i in range(40, 60):
        rows.append((i, f"{va} {vb}", "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_weights_rank_planted_skew(spark):
    from vector_ai_npm_spark.text.curation import dsir_weights

    docs = _planted_docs(spark)
    w = {r.doc_id: r.dsir_weight for r in dsir_weights(docs).collect()}
    a = [w[i] for i in range(20)]
    b = [w[i] for i in range(20, 40)]
    m = [w[i] for i in range(40, 60)]
    assert min(a) > max(m), "pure target-vocab docs must outrank mixed"
    assert min(m) > max(b), "mixed docs must outrank pure background"
    assert all(x > 0 for x in a), "target-like docs: positive log ratio"
    assert all(x < 0 for x in b), "background docs: negative log ratio"


def test_dsir_select_enriches_target_slice(spark, sf_oracle):
    """On the fixture corpus: the selected top-10% must not be a random
    sample — its average weight strictly exceeds the corpus average,
    ranks are 1..k dense, and the selection is deterministic."""
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.io.sources import load_table
    from vector_ai_npm_spark.text.curation import dsir_weights

    sel = registry.run("curate_dsir_select", spark, sf_oracle).collect()
    n_docs = load_table(spark, sf_oracle, "documents").count()
    k = max(1, n_docs // 10)
    assert len(sel) == k
    assert sorted(r.rank for r in sel) == list(range(1, k + 1))
    wsel = sum(r.dsir_weight for r in sel) / len(sel)
    all_w = dsir_weights(
        load_table(spark, sf_oracle, "documents")
    ).agg(F.avg("dsir_weight")).collect()[0][0]
    assert wsel > all_w
    again = registry.run("curate_dsir_select", spark, sf_oracle).collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, again))


def test_dsir_masses_parity_shape(spark, sf_oracle):
    """target_mass <= raw_mass (target slice is a subset of raw) and
    every document appears exactly once."""
    from vector_ai_npm_spark import registry

    rows = registry.run("curate_dsir_masses", spark, sf_oracle).collect()
    assert len(rows) == len({r.doc_id for r in rows})
    assert all(r.target_mass <= r.raw_mass for r in rows)
    assert all(r.n_toks > 0 for r in rows)


def test_dsir_select_contract_exact_key(spark, sf_oracle):
    """The hash-checkable selection face: affinity_e18 is an exact
    18-digit expansion of target_mass/raw_mass, so it is bounded by
    1e18 (ratio <= 1), the selected set is enriched in the target
    slice, and ranks are a dense 1..k permutation."""
    from pyspark.sql import functions as F

    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.io.sources import load_table

    docs = load_table(spark, sf_oracle, "documents")
    n = docs.count()
    sel = registry.run("curate_dsir_select_contract", spark, sf_oracle).collect()
    assert len(sel) == max(1, n // 10)
    assert sorted(r.rank for r in sel) == list(range(1, len(sel) + 1))
    assert all(0 <= r.affinity_e18 <= 10**18 for r in sel)
    # affinity is DESC in rank order (tiebreak never inverts the key)
    by_rank = sorted(sel, key=lambda r: r.rank)
    assert all(
        a.affinity_e18 >= b.affinity_e18
        for a, b in zip(by_rank, by_rank[1:])
    )
    # enrichment: the 'en' share among selected exceeds the corpus share
    sel_ids = {r.doc_id for r in sel}
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    en_sel = sum(1 for i in sel_ids if langs[i] == "en") / len(sel_ids)
    en_all = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert en_sel > en_all
