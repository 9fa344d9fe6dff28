"""Drift-monitor statistics pinned against independent pure-python
recomputations (numpy/pandas, not SQL) — the DuckDB oracle checks
cross-engine parity in tools/compare.py; these check the MATH: exact
KS D against a brute-force ECDF walk, Mann-Whitney U and its
tie-corrected z against a rank-based recompute, PSI against a direct
binned formula, and the textbook small-sample identities (U_a + U_b =
n_a*n_b; D in [0,1])."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq


def _samples(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    a = ev.loc[ev.event_type == "click", "value"].to_numpy()
    b = ev.loc[ev.event_type == "purchase", "value"].to_numpy()
    return ev, a, b


class TestKS:
    def test_matches_bruteforce_ecdf(self, spark, sf_dir):
        import __spark_entry__ as entry

        got = entry.queries()["stats_ks_two_sample"](spark, sf_dir).first()
        _, a, b = _samples(sf_dir)
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
        d = np.abs(fa - fb).max()
        assert got.n_a == len(a) and got.n_b == len(b)
        assert abs(got.d_stat - round(d, 6)) < 1e-9
        assert 0.0 <= got.d_stat <= 1.0
        crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
        assert abs(got.crit_5pct - round(crit, 6)) < 1e-9
        assert got.drifted_5pct == (d > crit)


class TestMannWhitney:
    def test_matches_rank_recompute(self, spark, sf_dir):
        import __spark_entry__ as entry
        import pandas as pd

        got = entry.queries()["stats_mannwhitney_u"](spark, sf_dir).first()
        _, a, b = _samples(sf_dir)
        combined = pd.Series(np.concatenate([a, b]))
        ranks = combined.rank(method="average").to_numpy()
        r_a = ranks[: len(a)].sum()
        n_a, n_b = len(a), len(b)
        u = r_a - n_a * (n_a + 1) / 2.0
        n = n_a + n_b
        _, t = np.unique(combined.to_numpy(), return_counts=True)
        ties = float((t.astype(float) ** 3 - t).sum())
        sigma = math.sqrt(n_a * n_b / 12.0 * ((n + 1) - ties / (n * (n - 1))))
        z = (u - n_a * n_b / 2.0) / sigma
        assert got.n_a == n_a and got.n_b == n_b
        assert abs(got.u_stat - round(u, 1)) < 1e-9
        assert abs(got.z_stat - round(z, 4)) < 1e-9
        assert got.significant_5pct == (abs(z) > 1.96)

    def test_u_symmetry_identity(self, spark, sf_dir):
        # U_a + U_b = n_a * n_b (average ranks make this exact even
        # with ties) — recover U_b from the same rank walk
        import pandas as pd

        _, a, b = _samples(sf_dir)
        combined = pd.Series(np.concatenate([a, b]))
        ranks = combined.rank(method="average").to_numpy()
        u_a = ranks[: len(a)].sum() - len(a) * (len(a) + 1) / 2.0
        u_b = ranks[len(a):].sum() - len(b) * (len(b) + 1) / 2.0
        assert abs((u_a + u_b) - len(a) * len(b)) < 1e-6


class TestPSI:
    def test_matches_direct_formula(self, spark, sf_dir):
        import __spark_entry__ as entry

        rows = entry.queries()["stats_psi_value_drift"](spark, sf_dir).collect()
        ev, _, _ = _samples(sf_dir)
        split = np.datetime64("2024-01-16T00:00:00")
        bins = np.minimum(np.floor(ev.value.to_numpy() / 50).astype(int), 9)
        is_early = ev.ts.to_numpy() < split
        present = sorted(set(bins.tolist()))
        k = len(present)
        tot_e, tot_l = int(is_early.sum()), int((~is_early).sum())
        want_terms = {}
        for bn in present:
            ce = int(((bins == bn) & is_early).sum())
            cl = int(((bins == bn) & ~is_early).sum())
            pe = (ce + 0.5) / (tot_e + 0.5 * k)
            pl = (cl + 0.5) / (tot_l + 0.5 * k)
            want_terms[bn] = (ce, cl, (pl - pe) * math.log(pl / pe))
        total = sum(t for _, _, t in want_terms.values())
        assert len(rows) == k
        for r in rows:
            ce, cl, term = want_terms[r.bin]
            assert (r.n_early, r.n_late) == (ce, cl)
            assert abs(r.psi_term - round(term, 6)) < 1e-9
            assert abs(r.psi_total - round(total, 6)) < 1e-9
            assert r.drift_action == (total > 0.2)

    def test_identical_halves_score_zero(self, spark):
        # PSI of a distribution against itself is exactly 0 per bin
        from emission_project_spark.plans.drift_stats import stats_psi_value_drift
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            rows = [
                (i, "2024-01-%02d 12:00:00" % (2 + ((i // 10) % 2) * 20), i % 7, "click",
                 float(50 * (i % 10) + 1), "{}")
                for i in range(200)
            ]
            df = spark.createDataFrame(
                rows,
                "event_id bigint, ts string, user_id bigint, event_type string,"
                " value double, props string",
            ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
            df.write.parquet(os.path.join(td, "events.parquet"))
            out = stats_psi_value_drift(spark, td).collect()
            assert len(out) == 10
            for r in out:
                assert r.psi_term == 0.0
                assert r.psi_total == 0.0
                assert r.drift_action is False


class TestLDiversity:
    def test_invariants_and_pandas_recompute(self, spark, sf_dir):
        import __spark_entry__ as entry

        rows = entry.queries()["privacy_l_diversity_customers"](spark, sf_dir).collect()
        cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
        cust["bal_bucket"] = np.floor(cust.c_acctbal / 1000).astype(int)
        g = cust.groupby(["c_nationkey", "bal_bucket"]).agg(
            n=("c_custkey", "size"), l=("c_mktsegment", "nunique")
        )
        per_nation = g.groupby(level=0).agg(
            n_groups=("n", "size"),
            n_low=("l", lambda s: int((s < 3).sum())),
            min_l=("l", "min"),
        )
        exposed = g[g.l < 3].groupby(level=0)["n"].sum()
        assert len(rows) == len(per_nation)
        for r in rows:
            want = per_nation.loc[r.c_nationkey]
            assert r.n_groups == want.n_groups
            assert r.n_low_diversity == want.n_low
            assert r.min_l == want.min_l
            assert r.n_exposed_rows == int(exposed.get(r.c_nationkey, 0))
            # a group with l < 3 has at least l rows: exposure bounds
            assert r.n_low_diversity <= r.n_exposed_rows or r.n_low_diversity == 0
