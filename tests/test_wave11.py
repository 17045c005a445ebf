"""Wave-11 invariants: RAKE keywords, Kaplan-Meier survival, MinHash
calibration — each re-derived in pure Python on the smoke fixture."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from vector_ai_npm_spark import registry
from vector_ai_npm_spark.io.sources import load_table


def _run(spark, name, sf):
    return registry.run(name, spark, sf)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ------------------------------------------------------------------- rake


def test_rake_matches_pure_python(spark, sf_smoke):
    from vector_ai_npm_spark.text.rake import _STOPS, _TOP_K

    rows = _run(spark, "text_rake_keywords", sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents").collect()

    phrases: list[tuple[str, str]] = []   # (lang, phrase)
    for d in docs:
        run: list[str] = []
        for tok in _toks(d["text"]) + [None]:
            if tok is None or tok in _STOPS:
                if run:
                    phrases.append((d["lang"], " ".join(run)))
                run = []
            else:
                run.append(tok)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for _, p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    inst = Counter(phrases)
    scores = {
        (lang, p): sum(deg[w] / freq[w] for w in p.split(" "))
        for (lang, p) in inst
    }
    langs = {lang for lang, _ in inst}
    expected = {}
    for lang in langs:
        cands = sorted(
            ((lp, s) for lp, s in scores.items() if lp[0] == lang),
            key=lambda kv: (-kv[1], kv[0][1]),
        )[: _TOP_K]
        for rank, ((_, p), s) in enumerate(cands, 1):
            expected[(lang, rank)] = (p, s)
    assert rows
    for r in rows:
        p, s = expected[(r["lang"], r["rank"])]
        assert r["phrase"] == p, (r, p)
        assert math.isclose(r["score"], s, rel_tol=1e-7)
        assert all(w not in _STOPS for w in r["phrase"].split(" "))
        assert r["n_words"] == len(r["phrase"].split(" "))


# --------------------------------------------------------------- survival


def test_km_matches_pure_python(spark, sf_smoke):
    rows = sorted(
        _run(spark, "events_survival_km", sf_smoke).collect(),
        key=lambda r: r["day"],
    )
    ev = load_table(spark, sf_smoke, "events").collect()
    wm = max(r["ts"] for r in ev)
    per_user: dict[int, dict[str, object]] = {}
    for r in ev:
        u = per_user.setdefault(r["user_id"], {})
        if r["event_type"] in ("signup", "purchase"):
            k = "s" if r["event_type"] == "signup" else "p"
            if k not in u or r["ts"] < u[k]:
                u[k] = r["ts"]
    life = []
    for u in per_user.values():
        if "s" not in u:
            continue
        if "p" in u and u["p"] >= u["s"]:
            life.append(((u["p"].date() - u["s"].date()).days, True))
        else:
            life.append(((wm.date() - u["s"].date()).days, False))
    days = sorted({t for t, _ in life})
    surv = 1.0
    expected = {}
    for t in days:
        d = sum(1 for tt, c in life if tt == t and c)
        cc = sum(1 for tt, c in life if tt == t and not c)
        n = sum(1 for tt, _ in life if tt >= t)
        surv *= 1.0 - d / n
        expected[t] = (d, cc, n, surv)
    assert [r["day"] for r in rows] == days
    last = 1.0
    for r in rows:
        d, cc, n, s = expected[r["day"]]
        assert (r["n_events"], r["n_censored"], r["n_at_risk"]) == (d, cc, n)
        assert math.isclose(r["survival"], s, rel_tol=1e-12)
        assert r["survival"] <= last + 1e-15
        last = r["survival"]


# ------------------------------------------------------------ calibration


def test_minhash_estimate_matches_exact_jaccard(spark, sf_smoke):
    rows = _run(spark, "dedup_minhash_estimate", sf_smoke).collect()
    assert rows, "no banded candidates at smoke scale"
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_smoke, "documents").collect()
    }

    def shingle_set(doc_id: int) -> set[str]:
        toks = _toks(texts[doc_id])
        if len(toks) >= 3:
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    for r in rows:
        assert 0 <= r["n_match"] <= 8
        assert math.isclose(r["jaccard_est"], r["n_match"] / 8.0)
        a, b = shingle_set(r["doc_id_a"]), shingle_set(r["doc_id_b"])
        inter, uni = len(a & b), len(a | b)
        assert r["intersection"] == inter, r
        assert r["union_"] == uni
        assert math.isclose(r["jaccard_exact"], inter / uni, rel_tol=1e-12)
        assert math.isclose(
            r["abs_err"], abs(r["jaccard_est"] - r["jaccard_exact"]),
            rel_tol=1e-12,
        )


# -------------------------------------------------------------- plan gates


def test_wave11_plan_gates(spark, sf_smoke):
    """* text_rake_keywords: the phrase-instance frame is a checkpoint
      leaf, so segmentation (doc-keyed window) runs ONCE and the final
      plan keeps exactly the two word-explode Generates (wstat +
      type-level scoring).
    * dedup_minhash_estimate: pairs + signatures enter as checkpoint
      leaves; the shingle index re-derives map-only (deliberate — no
      shuffle to save), bounded at its consumer count.  No cross
      products anywhere.
    """

    def plan(name):
        df = registry.run(name, spark, sf_smoke)
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan("text_rake_keywords")
    assert p.count("Generate") == 2, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    p = plan("dedup_minhash_estimate")
    assert p.count("Generate") <= 4, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
