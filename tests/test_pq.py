"""Product quantization (extensions/pq.py). The correctness anchor is
the ADC identity — ADC(q, codes) must equal the exact squared distance
between q and the decoded reconstruction — plus encode determinism and
an end-to-end recall sanity floor vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from emission_project_spark.extensions.pq import (
    fit_pq,
    pq_decode,
    pq_encode,
    pq_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(emb):
    return fit_pq(emb, dim=64, m=8, k=16, iterations=3)


@pytest.fixture(scope="module")
def local(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    return ids, x


@pytest.fixture(scope="module")
def encoded(emb, model):
    return pq_encode(emb, model).cache()


def test_codebook_shape(model):
    assert model.codebooks.shape == (8, 16, 8)
    assert np.isfinite(model.codebooks).all()


def test_encode_codes_in_range_and_deterministic(emb, model, encoded):
    rows = encoded.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
    again = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode(emb.repartition(7), model).collect()
    }
    first = {r["vec_id"]: tuple(r["codes"]) for r in rows}
    assert first == again  # partitioning-invariant


def test_encode_matches_local_argmin(model, encoded, local):
    ids, x = local
    got = {r["vec_id"]: np.array(r["codes"]) for r in encoded.collect()}
    dsub = model.dsub
    for i in np.random.default_rng(0).choice(len(ids), 40, replace=False):
        for s in range(model.m):
            xs = x[i, s * dsub : (s + 1) * dsub]
            d2 = ((model.codebooks[s] - xs) ** 2).sum(axis=1)
            assert got[ids[i]][s] == int(np.argmin(d2))


def test_adc_identity(model, encoded, local, spark):
    """ADC distance == exact distance to the decoded vector, per pair."""
    ids, x = local
    q = x[:5]
    out = pq_topk(encoded, q, ids[:5], model, k=7).collect()
    codes = {r["vec_id"]: np.array(r["codes"]) for r in encoded.collect()}
    for r in out:
        qi = int(np.where(ids == r["query_id"])[0][0])
        recon = pq_decode(codes[r["vec_id"]][None, :], model)[0]
        exact = float(((x[qi] - recon) ** 2).sum())
        assert r["ad2"] == pytest.approx(exact, rel=1e-9, abs=1e-9)


def test_topk_shape_and_order(model, encoded, local):
    ids, x = local
    out = pq_topk(encoded, x[:3], ids[:3], model, k=10)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["ad2"])
    assert set(per_q) == set(ids[:3].tolist())
    for dists in per_q.values():
        assert len(dists) == 10


def test_recall_floor_vs_brute_force(model, encoded, local):
    """PQ@10 must recover a meaningful share of the exact top-10 — and
    beat chance by orders of magnitude (chance ≈ 10/500 = 2%)."""
    ids, x = local
    nq = 20
    out = pq_topk(encoded, x[:nq], ids[:nq], model, k=10).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qi in range(nq):
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(d2, kind="stable")[:10]].tolist())
        hits += len(exact & got[ids[qi]])
        total += 10
    recall = hits / total
    assert recall >= 0.3, f"recall@10 = {recall}"


def test_reconstruction_improves_with_k(emb, local):
    ids, x = local
    errs = []
    for k in (2, 16):
        mdl = fit_pq(emb, dim=64, m=8, k=k, iterations=3)
        codes = np.stack(
            [
                np.array(r["codes"])
                for r in pq_encode(emb, mdl).orderBy("vec_id").collect()
            ]
        )
        order = np.argsort(ids)
        recon = pq_decode(codes, mdl)
        errs.append(float(((x[order] - recon) ** 2).mean()))
    assert errs[1] < errs[0]


def test_fit_validations(emb):
    with pytest.raises(ValueError):
        fit_pq(emb, dim=64, m=7, k=4)


# --- IVF-PQ ---------------------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq_model(emb):
    from emission_project_spark.extensions.pq import fit_ivfpq

    return fit_ivfpq(emb, dim=64, n_cells=8, m=8, k=16, iterations=3)


@pytest.fixture(scope="module")
def ivfpq_encoded(emb, ivfpq_model):
    from emission_project_spark.extensions.pq import ivfpq_encode

    return ivfpq_encode(emb, ivfpq_model).cache()


def test_ivfpq_encode_covers_corpus(emb, ivfpq_encoded):
    rows = ivfpq_encoded.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["cell_id"] < 8 for r in rows)
    assert all(len(r["codes"]) == 8 for r in rows)


def test_ivfpq_adc_identity(ivfpq_model, ivfpq_encoded, local):
    """ADC == ‖q − (c_cell + decode(codes))‖² for every returned pair."""
    from emission_project_spark.extensions.pq import ivfpq_topk, pq_decode

    ids, x = local
    out = ivfpq_topk(
        ivfpq_encoded, x[:5], ids[:5], ivfpq_model, n_probe=3, k=7
    ).collect()
    enc = {
        r["vec_id"]: (r["cell_id"], np.array(r["codes"]))
        for r in ivfpq_encoded.collect()
    }
    for r in out:
        qi = int(np.where(ids == r["query_id"])[0][0])
        cell, codes = enc[r["vec_id"]]
        recon = (
            ivfpq_model.coarse[cell]
            + pq_decode(codes[None, :], ivfpq_model.pq)[0]
        )
        exact = float(((x[qi] - recon) ** 2).sum())
        assert r["ad2"] == pytest.approx(exact, rel=1e-9, abs=1e-9)


def test_ivfpq_scan_respects_probe_pruning(ivfpq_model, ivfpq_encoded, local):
    """Returned neighbors must come only from each query's probed cells."""
    from emission_project_spark.extensions.pq import ivfpq_topk

    ids, x = local
    n_probe = 2
    out = ivfpq_topk(
        ivfpq_encoded, x[:6], ids[:6], ivfpq_model, n_probe=n_probe, k=10
    ).collect()
    cells = {r["vec_id"]: r["cell_id"] for r in ivfpq_encoded.collect()}
    cd = ((x[:6, None, :] - ivfpq_model.coarse[None]) ** 2).sum(axis=2)
    probe = {
        int(ids[qi]): set(np.argsort(cd[qi], kind="stable")[:n_probe].tolist())
        for qi in range(6)
    }
    for r in out:
        assert cells[r["vec_id"]] in probe[r["query_id"]]


def test_ivfpq_recall_floor(ivfpq_model, ivfpq_encoded, local):
    """Full probe (n_probe = n_cells) ⇒ residual-PQ ranking of the whole
    corpus; recall@10 must beat the raw-PQ floor's chance level by far."""
    from emission_project_spark.extensions.pq import ivfpq_topk

    ids, x = local
    nq = 20
    out = ivfpq_topk(
        ivfpq_encoded, x[:nq], ids[:nq], ivfpq_model, n_probe=8, k=10
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = 0
    for qi in range(nq):
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(d2, kind="stable")[:10]].tolist())
        hits += len(exact & got[ids[qi]])
    recall = hits / (10 * nq)
    assert recall >= 0.3, f"ivfpq recall@10 = {recall}"


def test_ivfpq_expr_twin_matches_numpy_path(spark, emb, local):
    """The oracle-checked expression twin (ivfpq_topk_expr — the
    registered similarity_ivfpq_topk plan) must return the same ranked
    neighbors as the numpy fit_ivfpq → ivfpq_encode → ivfpq_topk path
    at identical hyperparameters: same coarse quantizer, same residual
    codebooks, and ADC identity ⇒ identical distances up to float
    association. This bridge is what lets the driver's green oracle row
    stand in for the 32×-compression numpy path."""
    from emission_project_spark.extensions.pq import (
        fit_ivfpq,
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_topk_expr,
    )
    from pyspark.sql import functions as F

    ids, x = local
    expr_out = ivfpq_topk_expr(
        emb, emb.filter(F.col("vec_id") < 3),
        dim=64, n_cells=4, m=4, k_codes=8, iterations=2, n_probe=2, k=10,
    ).collect()

    model = fit_ivfpq(emb, dim=64, n_cells=4, m=4, k=8, iterations=2)
    encoded = ivfpq_encode(emb, model)
    qsel = np.isin(ids, [0, 1, 2])
    np_out = ivfpq_topk(
        encoded, x[qsel], ids[qsel], model, n_probe=2, k=10
    ).collect()

    def keyed(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(
                (r["vec_id"], float(r["ad2"]))
            )
        return {q: sorted(v, key=lambda t: (t[1], t[0])) for q, v in out.items()}

    e, n = keyed(expr_out), keyed(np_out)
    assert set(e) == set(n) == {0, 1, 2}
    for q in e:
        assert [v for v, _ in e[q]] == [v for v, _ in n[q]], f"query {q}"
        for (_, d_expr), (_, d_np) in zip(e[q], n[q]):
            assert d_expr == pytest.approx(d_np, rel=1e-6, abs=1e-6)


class TestRerank:
    """ivfpq_rerank_topk_expr: the FAISS IndexRefineFlat composition."""

    KW = dict(dim=64, n_cells=4, m=4, k_codes=8, iterations=2, n_probe=2)

    @pytest.fixture(scope="class")
    def results(self, spark, emb):
        from pyspark.sql import functions as F

        from emission_project_spark.extensions.pq import (
            ivfpq_rerank_topk_expr,
            ivfpq_topk_expr,
        )

        q = emb.filter(F.col("vec_id") < 3)
        adc = ivfpq_topk_expr(emb, q, k=20, **self.KW).collect()
        rr = ivfpq_rerank_topk_expr(emb, q, shortlist=20, k=10, **self.KW).collect()
        return adc, rr

    def test_rerank_subset_of_shortlist(self, results):
        adc, rr = results
        short = {}
        for r in adc:
            short.setdefault(r["query_id"], set()).add(r["vec_id"])
        assert all(r["vec_id"] in short[r["query_id"]] for r in rr)

    def test_rank1_is_self_at_zero(self, results):
        _, rr = results
        for r in rr:
            if r["rank"] == 1:
                assert r["vec_id"] == r["query_id"]
                assert r["ed2"] == 0.0

    def test_exact_order_monotone(self, results):
        _, rr = results
        by_q = {}
        for r in rr:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["ed2"], r["vec_id"]))
        for rows in by_q.values():
            rows.sort()
            ranks = [r[0] for r in rows]
            assert ranks == list(range(1, len(rows) + 1))
            # ed2 non-decreasing; ties broken by ascending vec_id
            for (_, d1, v1), (_, d2, v2) in zip(rows, rows[1:]):
                assert d1 < d2 or (d1 == d2 and v1 < v2)

    def test_refine_is_load_bearing(self, results):
        """Quantization error inverts near-ties: exact re-ranking must
        actually permute the ADC order somewhere, else the second tier
        is dead code on this corpus."""
        adc, rr = results
        adc_at = {(r["query_id"], r["rank"]): r["vec_id"] for r in adc}
        assert any(
            adc_at.get((r["query_id"], r["rank"])) != r["vec_id"] for r in rr
        )
