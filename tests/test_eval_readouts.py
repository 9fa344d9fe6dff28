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


class TestLshQuality:
    def test_exact_duplicates_always_recalled(self, spark, tmp_path):
        # exact duplicates agree on EVERY band (J=1 -> identical
        # minhash signatures), so recall@0.5 must be 1.0 on a corpus
        # whose only true pairs are exact dups
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq2

        from emission_project_spark.plans.extensions import dedup_lsh_quality

        texts = [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
            (3, " ".join(f"u{i} v{i} w{i}" for i in range(12))),
            (4, " ".join(f"x{i} y{i} z{i}" for i in range(12))),
        ]
        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in texts], type=pa.int64()),
                "text": pa.array([s for _, s in texts], type=pa.string()),
                "lang": pa.array(["en"] * 4, type=pa.string()),
                "source": pa.array(["web"] * 4, type=pa.string()),
                "n_chars": pa.array([len(s) for _, s in texts], type=pa.int64()),
            }
        )
        pq2.write_table(t, os.path.join(tmp_path, "documents.parquet"))
        row = dedup_lsh_quality(spark, str(tmp_path)).first()
        assert row.n_true_pairs >= 1
        assert row.recall_at_05 == 1.0
        assert row.true_positives <= row.n_candidates
        assert row.true_positives <= row.n_true_pairs

    def test_invariants_on_corpus(self, spark, sf_dir):
        import __spark_entry__ as entry

        row = entry.queries()["dedup_lsh_quality"](spark, sf_dir).first()
        assert row.true_positives <= min(row.n_candidates, row.n_true_pairs)
        if row.n_candidates:
            assert 0.0 <= row.precision_at_05 <= 1.0
        if row.n_true_pairs:
            assert 0.0 <= row.recall_at_05 <= 1.0
