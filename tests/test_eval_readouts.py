"""Evaluation-readout queries: langid confusion vs the text_langid
prediction surface it summarizes, and DSIR ESS vs a pure-python Kish
recomputation from the driver-verified dsir_score column (the two
queries share the exact rounded score surface by construction)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq


class TestLangidConfusion:
    def test_consistent_with_langid_predictions(self, spark, sf_dir):
        import __spark_entry__ as entry

        qs = entry.queries()
        conf = qs["text_langid_confusion"](spark, sf_dir).collect()
        preds = {
            r.doc_id: r.predicted_lang
            for r in qs["text_langid"](spark, sf_dir).collect()
        }
        docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
        want = {}
        for doc_id, lang in zip(docs.doc_id, docs.lang):
            key = (lang, preds[doc_id])
            want[key] = want.get(key, 0) + 1
        got = {(r.true_lang, r.predicted_lang): r.n_docs for r in conf}
        assert got == want

    def test_shares_sum_to_one_per_true_lang(self, spark, sf_dir):
        import __spark_entry__ as entry

        conf = entry.queries()["text_langid_confusion"](spark, sf_dir).collect()
        by_true = {}
        for r in conf:
            by_true.setdefault(r.true_lang, []).append(r)
            assert r.is_correct == (r.true_lang == r.predicted_lang)
            # the classifier is 4-way: zh can never be predicted
            assert r.predicted_lang in {"en", "es", "fr", "de"}
        for rows in by_true.values():
            assert abs(sum(r.recall_share for r in rows) - 1.0) < 1e-5


class TestDsirEss:
    def test_matches_kish_recompute_from_scores(self, spark, sf_dir):
        import __spark_entry__ as entry

        qs = entry.queries()
        got = qs["curation_dsir_ess"](spark, sf_dir).first()
        scores = [
            r.dsir_score for r in qs["curation_dsir_weights"](spark, sf_dir).collect()
        ]
        ms = max(scores)
        w = [math.exp((s - ms) / 5.0) for s in scores]
        sw, sw2 = sum(w), sum(x * x for x in w)
        ess = sw * sw / sw2
        assert got.n_docs == len(scores)
        assert abs(got.ess - round(ess, 4)) < 1e-6
        assert abs(got.ess_fraction - round(ess / len(scores), 6)) < 1e-6
        assert abs(got.top_weight_share - round(max(w) / sw, 6)) < 1e-6
        # Kish bounds: 1 <= ESS <= n
        assert 1.0 <= got.ess <= got.n_docs + 1e-9
