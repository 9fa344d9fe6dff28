"""Constructed invariants for the session-5 queries (domain cap,
hourly ACF, classifier calibration) — properties the oracle hash
can't state (it proves engine parity, not meaning)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

SF001 = "/root/testdata/sf0.01"  # smallest SF where some cells exceed the cap


class TestDomainCap:
    def test_cap_arithmetic_and_cell_totals(self, spark, sf_dir):
        from emission_project_spark.plans.corpus_ops import (
            _CELL_CAP,
            curation_domain_cap,
        )
        from emission_project_spark.catalog.tables import load_table

        rows = curation_domain_cap(spark, sf_dir).collect()
        docs = load_table(spark, sf_dir, "documents")
        want = {
            (r["source"], r["lang"]): r["n"]
            for r in docs.groupBy("source", "lang").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        got = {(r.source, r.lang): r for r in rows}
        assert set(got) == set(want)
        for key, r in got.items():
            assert r.n_docs == want[key]
            assert r.n_kept == min(r.n_docs, _CELL_CAP)
            assert r.n_kept + r.n_dropped == r.n_docs
            assert r.capped == (r.n_docs > _CELL_CAP)
            assert abs(r.kept_frac - round(r.n_kept / r.n_docs, 4)) < 1e-9

    def test_hot_cells_actually_capped_at_sf001(self, spark):
        from emission_project_spark.plans.corpus_ops import curation_domain_cap

        rows = curation_domain_cap(spark, SF001).collect()
        assert any(r.capped for r in rows), "cap never binds at sf0.01"
        assert any(not r.capped for r in rows), "cap binds everywhere"


class TestHourlyAcf:
    def test_matches_numpy_recompute(self, spark, sf_dir):
        from emission_project_spark.plans.drift_stats import events_hourly_acf

        got = {r.lag: r for r in events_hourly_acf(spark, sf_dir).collect()}
        assert set(got) == {1, 2, 3, 24}

        ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
        series = (
            ev.assign(hour=ev.ts.dt.floor("h"))
            .groupby("hour")
            .size()
            .sort_index()
            .to_numpy(dtype=float)
        )
        for lag, r in got.items():
            a, b = series[lag:], series[:-lag]
            assert r.n_pairs == len(a)
            want = float(np.corrcoef(a, b)[0, 1])
            assert abs(r.acf - round(want, 4)) < 1e-6
            assert -1.0 <= r.acf <= 1.0


class TestClassifierCalibration:
    def test_bins_partition_corpus_and_ece_recomputes(self, spark, sf_dir):
        from emission_project_spark.plans.quality_gates import (
            stats_classifier_calibration,
            text_gopher_rules,
            text_quality_linear_classifier,
        )

        rows = stats_classifier_calibration(spark, sf_dir).collect()
        p = {
            r.doc_id: r.p_keep
            for r in text_quality_linear_classifier(spark, sf_dir).collect()
        }
        gold = {
            r.doc_id: r.passes_gopher
            for r in text_gopher_rules(spark, sf_dir).collect()
        }
        assert sum(r.n_docs for r in rows) == len(p)

        by_bin: dict[int, list[int]] = {}
        for doc_id, pk in p.items():
            by_bin.setdefault(min(int(math.floor(pk * 10)), 9), []).append(doc_id)
        got = {r.bin: r for r in rows}
        assert set(got) == set(by_bin)
        total = len(p)
        for b, ids in by_bin.items():
            r = got[b]
            assert 0 <= r.bin <= 9
            assert r.n_docs == len(ids)
            mp = sum(p[i] for i in ids) / len(ids)
            fg = sum(1 for i in ids if gold[i]) / len(ids)
            assert abs(r.mean_p_keep - round(mp, 4)) < 1e-6
            assert abs(r.frac_gold - round(fg, 4)) < 1e-6
            assert abs(r.abs_gap - round(abs(mp - fg), 4)) < 1e-6
            assert abs(r.ece_term - round(len(ids) * abs(mp - fg) / total, 6)) < 1e-6


class TestHourlyAcfDegenerate:
    def test_constant_series_yields_null_not_error(self, spark, tmp_path):
        """Spark 4 ANSI `corr` throws DIVIDE_BY_ZERO on zero variance;
        the moments+try_divide form must return NULL (DuckDB corr
        semantics) on a constant hourly series instead."""
        import datetime as dt

        import pyarrow as pa

        from emission_project_spark.plans.drift_stats import events_hourly_acf

        rows = []
        for h in range(30):  # 30 hours, exactly 2 events each → constant
            for j in range(2):
                rows.append(
                    (
                        h * 2 + j,
                        dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=j),
                        1,
                        "click",
                        1.0,
                        "{}",
                    )
                )
        cols = list(zip(*rows))
        table = pa.table(
            {
                "event_id": pa.array(cols[0], type=pa.int64()),
                "ts": pa.array(cols[1], type=pa.timestamp("us")),
                "user_id": pa.array(cols[2], type=pa.int64()),
                "event_type": pa.array(cols[3], type=pa.string()),
                "value": pa.array(cols[4], type=pa.float64()),
                "props": pa.array(cols[5], type=pa.string()),
            }
        )
        pq.write_table(table, str(tmp_path / "events.parquet"))
        got = {r.lag: r for r in events_hourly_acf(spark, str(tmp_path)).collect()}
        assert got[1].n_pairs == 29 and got[1].acf is None
        assert got[24].n_pairs == 6 and got[24].acf is None


class TestCusumChangepoint:
    @staticmethod
    def _write_events(tmp_path, counts):
        import datetime as dt

        import pyarrow as pa

        rows = []
        eid = 0
        for h, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=j % 60),
                        1,
                        "click",
                        1.0,
                        "{}",
                    )
                )
                eid += 1
        cols = list(zip(*rows))
        table = pa.table(
            {
                "event_id": pa.array(cols[0], type=pa.int64()),
                "ts": pa.array(cols[1], type=pa.timestamp("us")),
                "user_id": pa.array(cols[2], type=pa.int64()),
                "event_type": pa.array(cols[3], type=pa.string()),
                "value": pa.array(cols[4], type=pa.float64()),
                "props": pa.array(cols[5], type=pa.string()),
            }
        )
        pq.write_table(table, str(tmp_path / "events.parquet"))

    def test_planted_level_shift_is_localized(self, spark, tmp_path):
        import datetime as dt

        from emission_project_spark.plans.drift_stats import events_cusum_changepoint

        # 20 quiet hours (2/h) then 20 loud hours (10/h): |S| peaks at
        # the boundary hour t=20 (hour index 19), S_20 = 40 - 20*6 = -80
        self._write_events(tmp_path, [2] * 20 + [10] * 20)
        r = events_cusum_changepoint(spark, str(tmp_path)).first()
        assert r.n_hours == 40
        assert r.change_hour == dt.datetime(2024, 1, 1, 19)
        assert abs(r.mean_cnt - 6.0) < 1e-9
        assert r.significant_5pct is True
        # stat recompute: 80 / (sd * sqrt(40))
        sd = (40 * (20 * 4 + 20 * 100) - 240.0 * 240.0) / (40.0 * 39.0)
        assert abs(r.cusum_stat - round(80.0 / (sd**0.5 * 40**0.5), 4)) < 1e-6

    def test_constant_series_is_null_not_error(self, spark, tmp_path):
        from emission_project_spark.plans.drift_stats import events_cusum_changepoint

        self._write_events(tmp_path, [3] * 12)
        r = events_cusum_changepoint(spark, str(tmp_path)).first()
        assert r.n_hours == 12
        assert r.cusum_stat is None and r.significant_5pct is None
