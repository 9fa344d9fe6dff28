"""The emission star-schema ETL — the reference's primary product
(``dags/emission-dag.py`` transform_and_load, 223 LoC of pandas)
re-expressed as one lazy Spark job.

Per-run shape (reference lifecycle, SURVEY §3.1): extract CSV feeds →
incremental dimension loads (dedup → anti-join vs warehouse state →
surrogate keys → append) → fact assembly (null-safe car join → derived
total_emission → driver/date/city/country joins → 7-id dedup →
incremental append) → roll-up views.

Catalyst plans the whole fact assembly as broadcast-hash joins over a
single scan of the logbook; at 100 TB the fact partition key is
``date_id`` and every dimension broadcasts.

Deliberate fixes over the reference (SURVEY §4.5, kept as engine
semantics and covered by tests):
- city keyed by (city_name, country_id), not city_name alone
- city cold-start path reads the country *table*, not a dangling local
- archive-after-commit instead of archive-before-load
- cars incremental anti-join on the 7-col natural key (12-col in the
  reference, which can fan out the fact join on re-delivery)
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emission_project_spark.catalog import schemas as S
from emission_project_spark.functions.datetime import date_dim
from emission_project_spark.operators.dedup import dedup_subset
from emission_project_spark.operators.incremental import incremental_insert
from emission_project_spark.operators.joins import join_nullsafe
from emission_project_spark.operators.keys import add_surrogate_key
from emission_project_spark.operators.validation import validate_fks
from emission_project_spark.sources.csv_feed import archive_consumed, read_feed
from emission_project_spark.sources.warehouse import Warehouse


@dataclass
class RunStats:
    inserted: dict[str, int] = field(default_factory=dict)
    archived: list[str] = field(default_factory=list)
    fk_violations: dict[str, int] = field(default_factory=dict)
    # Wall-clock per stage (init / extract / dim_* / fact / archive).
    # Spark is lazy, but every stage here ends in an action (count or
    # append), so the boundary times are real work, not plan-building.
    stage_seconds: dict[str, float] = field(default_factory=dict)


class EmissionPipeline:
    def __init__(self, spark: SparkSession, warehouse: Warehouse):
        self.spark = spark
        self.wh = warehouse

    # --- DDL / init (reference create_tables task, S8) ---

    def init_warehouse(self) -> None:
        """Idempotent: build the generated date dim once
        (create_tables.py:69-85)."""
        if not self.wh.exists("date"):
            self.wh.overwrite_atomic(date_dim(self.spark), "date")

    # --- helpers ---

    def _next_id(self, dim: DataFrame, id_col: str) -> int:
        row = dim.agg(F.max(id_col).alias("m")).first()
        return int(row.m) + 1 if row.m is not None else 1

    def _load_dim(
        self,
        batch: DataFrame,
        table: str,
        schema,
        id_col: str,
        natural_key: list[str],
        order_by: list[str],
        stats: RunStats,
    ) -> DataFrame:
        """Incremental dimension load: dedup batch → anti-join vs
        warehouse → SERIAL-style ids in sorted order → append.
        Returns the refreshed dimension."""
        t0 = time.perf_counter()
        current = self.wh.read(table, schema)
        fresh = dedup_subset(batch, natural_key)
        new_rows = incremental_insert(current, fresh, natural_key)
        new_rows = add_surrogate_key(
            new_rows, id_col, order_by=order_by, start=self._next_id(current, id_col)
        )
        # persist the (batch-sized) insert set: the count guard and the
        # append are two actions — without it the feed scan + dedup +
        # anti-join + rank chain executes twice per dimension (r10
        # verdict task #5; MEMORY_AND_DISK, so a huge batch spills
        # instead of OOMing)
        new_rows = new_rows.persist()
        try:
            n = new_rows.count()
            if n:
                self.wh.append(
                    new_rows.select(*[f.name for f in schema.fields]), table
                )
        finally:
            new_rows.unpersist()
        stats.inserted[table] = n
        stats.stage_seconds[f"dim_{table}"] = round(time.perf_counter() - t0, 3)
        return self.wh.read(table, schema)

    # --- the run ---

    def run(self, incoming_root: str, archive_root: str | None = None) -> RunStats:
        """One scheduled run. ``incoming_root`` contains the three feed
        dirs (``drivers_incoming_data`` etc. per README.md:58)."""
        stats = RunStats()
        t0 = time.perf_counter()
        self.init_warehouse()
        stats.stage_seconds["init"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        drivers_raw, f1 = read_feed(
            self.spark, os.path.join(incoming_root, "drivers_incoming_data"), S.DRIVERS_FEED
        )
        vehicles_raw, f2 = read_feed(
            self.spark,
            os.path.join(incoming_root, "vehicle_fuel_consumptions_incoming_data"),
            S.VEHICLES_FEED_RAW,
            rename=S.VEHICLES_RENAME,
        )
        logbook, f3 = read_feed(
            self.spark, os.path.join(incoming_root, "drivers_logbook_incoming_data"), S.LOGBOOK_FEED
        )
        # The logbook feed fans out to FIVE consumers (country batch ×2
        # legs, city batch ×2 legs, fact assembly) each ending in its
        # own action — persist the CSV parse once instead of re-reading
        # the feed per consumer (r10 verdict task #5)
        logbook = logbook.persist()
        stats.stage_seconds["extract"] = round(time.perf_counter() - t0, 3)

        # every logbook consumer (the four dim loads AND the fact
        # assembly) runs under one try/finally: a failure in any dim
        # load must not leak the cached feed for the session
        try:
            drivers = self._load_dim(
                drivers_raw.select("name", "first_name"),
                "drivers",
                S.DRIVERS_DIM,
                "driver_id",
                S.DRIVERS_NK,
                order_by=["name", "first_name"],  # SERIAL order = sort_values('name')
                stats=stats,
            )
            cars = self._load_dim(
                vehicles_raw,
                "cars",
                S.CARS_DIM,
                "car_id",
                S.CARS_NK,
                order_by=["brand", "model", "vehicle_class", "engine_size_l"],
                stats=stats,
            )

            # countries: set-union of start/target columns (U1)
            countries_batch = (
                logbook.select(F.col("start_country").alias("country_name"))
                .unionByName(logbook.select(F.col("target_country").alias("country_name")))
                .filter(F.col("country_name").isNotNull())
            )
            country = self._load_dim(
                countries_batch,
                "country",
                S.COUNTRY_DIM,
                "country_id",
                ["country_name"],
                order_by=["country_name"],
                stats=stats,
            )

            # cities keyed by (city_name, country_id) — fixed key (§4.5)
            cities_batch = (
                logbook.select(
                    F.col("start_city").alias("city_name"),
                    F.col("start_country").alias("country_name"),
                )
                .unionByName(
                    logbook.select(
                        F.col("target_city").alias("city_name"),
                        F.col("target_country").alias("country_name"),
                    )
                )
                .filter(F.col("city_name").isNotNull())
            )
            cities_batch = join_nullsafe(
                cities_batch, country, ["country_name"], how="left", broadcast_right=True
            ).select("city_name", "country_id")
            city = self._load_dim(
                cities_batch,
                "city",
                S.CITY_DIM,
                "city_id",
                ["city_name", "country_id"],
                order_by=["city_name", "country_id"],
                stats=stats,
            )

            t0 = time.perf_counter()
            self._load_fact(logbook, drivers, cars, country, city, stats)
        finally:
            logbook.unpersist()
        stats.stage_seconds["fact"] = round(time.perf_counter() - t0, 3)

        if archive_root:
            # crash-safe ordering: archive only after all writes landed
            t0 = time.perf_counter()
            for files, sub in ((f1, "drivers_used_data"), (f2, "vehicle_fuel_consumptions_used_data"), (f3, "drivers_logbook_used_data")):
                stats.archived += archive_consumed(files, os.path.join(archive_root, sub))
            stats.stage_seconds["archive"] = round(time.perf_counter() - t0, 3)
        return stats

    def _load_fact(
        self,
        logbook: DataFrame,
        drivers: DataFrame,
        cars: DataFrame,
        country: DataFrame,
        city: DataFrame,
        stats: RunStats,
    ) -> None:
        if logbook.isEmpty():
            stats.inserted["car_driver_log"] = 0
            return
        dates = self.wh.read("date", S.DATE_DIM)

        # J6: attach car_id + co2 over the 6-col null-safe attribute FK
        # (pandas NaN==NaN parity — the §4.4 trap); cars broadcast
        fact = join_nullsafe(
            logbook,
            cars.select(*S.CARS_LOGBOOK_KEYS, "car_id", "co2_emission_g_per_km"),
            S.CARS_LOGBOOK_KEYS,
            how="left",
            broadcast_right=True,
        )
        # P4: THE derived measure (emission-dag.py:161-162)
        fact = fact.withColumn(
            "total_emission", F.col("distance_km") * F.col("co2_emission_g_per_km")
        )
        # J7: driver_id (orphans → null, preserved in the fact)
        fact = join_nullsafe(fact, drivers, S.DRIVERS_NK, how="left", broadcast_right=True)
        # J8: date_id via the date dim (out-of-range dates → null)
        fact = join_nullsafe(
            fact.withColumn("date", F.to_date("date")),
            dates.select("date", "date_id"),
            ["date"],
            how="left",
            broadcast_right=True,
        )
        # J10 then J9 (role-playing country/city, fixed city key)
        for role in ("start", "target"):
            fact = join_nullsafe(
                fact,
                country.select(
                    F.col("country_name").alias(f"{role}_country"),
                    F.col("country_id").alias(f"{role}_country_id"),
                ),
                [f"{role}_country"],
                how="left",
                broadcast_right=True,
            )
            fact = join_nullsafe(
                fact,
                city.select(
                    F.col("city_name").alias(f"{role}_city"),
                    F.col("country_id").alias(f"{role}_country_id"),
                    F.col("city_id").alias(f"{role}_city_id"),
                ),
                [f"{role}_city", f"{role}_country_id"],
                how="left",
                broadcast_right=True,
            )

        fact = fact.select(*[f.name for f in S.FACT_CAR_DRIVER_LOG.fields])
        # D1 + J11: in-batch dedup then incremental anti-join, both on
        # the 7-id natural key (null-safe: orphan ids are null)
        fact = dedup_subset(fact, S.FACT_NK, tiebreaker=["distance_km", "total_emission"])
        current = self.wh.read("car_driver_log", S.FACT_CAR_DRIVER_LOG)
        # persist the insert batch: the count guard, the FK counters,
        # and the append previously each re-executed the WHOLE fact
        # assembly (the 66-83%-of-wall stage) — now it materializes once
        new_rows = incremental_insert(current, fact, S.FACT_NK).persist()
        try:
            n = new_rows.count()
            if n:
                # FK enforcement (SURVEY §1.3: the reference's DDL
                # constraints become an anti-join orphan check),
                # validated from the CACHED batch — 1.4 s at x100 vs
                # 3.9 s as a recompute. (An observe-counter ride on the
                # append action was built and MEASURED WORSE: +55 s at
                # x100 — the metric joins de-optimized the write stage —
                # and reverted; `fk_violation_observation` remains for
                # callers whose action isn't a partitioned write.)
                stats.fk_violations = validate_fks(
                    new_rows,
                    [
                        ("fact.car_id->cars", "car_id", cars, "car_id"),
                        ("fact.driver_id->drivers", "driver_id", drivers, "driver_id"),
                        ("fact.start_city_id->city", "start_city_id", city, "city_id"),
                        ("fact.target_city_id->city", "target_city_id", city, "city_id"),
                        ("fact.start_country_id->country", "start_country_id", country, "country_id"),
                        ("fact.target_country_id->country", "target_country_id", country, "country_id"),
                        ("fact.date_id->date", "date_id", dates, "date_id"),
                    ],
                )
                # Fact partitioned by date_id (module docstring / SURVEY
                # §3.1): date-bounded roll-ups prune to the touched
                # partitions instead of scanning the whole 100 TB fact;
                # the append co-locates date_id before the write (the
                # small-files fix measured 134 → 14 s in Warehouse.append).
                self.wh.append(new_rows, "car_driver_log", partition_by=["date_id"])
        finally:
            new_rows.unpersist()
        stats.inserted["car_driver_log"] = n

    # --- consumption surface (README.md:3 roll-ups, A2) ---

    def fact_df(self) -> DataFrame:
        return self.wh.read("car_driver_log", S.FACT_CAR_DRIVER_LOG)

    def emission_by_brand(self) -> DataFrame:
        cars = self.wh.read("cars", S.CARS_DIM)
        return (
            self.fact_df()
            .join(F.broadcast(cars.select("car_id", "brand")), "car_id", "left")
            .groupBy("brand")
            .agg(F.sum("total_emission").alias("total_emission"))
        )

    def emission_by_car(self) -> DataFrame:
        return (
            self.fact_df().groupBy("car_id").agg(F.sum("total_emission").alias("total_emission"))
        )

    def emission_by_driver(self) -> DataFrame:
        return (
            self.fact_df()
            .groupBy("driver_id")
            .agg(F.sum("total_emission").alias("total_emission"))
        )

    @contextmanager
    def rollup_views(self):
        """All three roll-up readouts from ONE scan of the fact.

        The individual methods above are each the right plan alone, but
        a consumer running all three per schedule (the reference's
        reporting cadence) scans the partitioned fact three times —
        measured 6.2 s vs 2.9 s at the ×100 feed (round 12 A/B; the
        grouping-sets single-pass variant measured 3.1 s and lost to
        the cache on expansion overhead). Here the 3-column projection
        persists once (MEMORY_AND_DISK — a fact outgrowing executor
        memory spills instead of OOMing) and the three groupBys read
        the cache; the context manager owns the unpersist.

            with pipe.rollup_views() as views:
                for name, df in views.items():
                    df.write...
        """
        base = self.fact_df().select(
            "car_id", "driver_id", "total_emission"
        ).persist()
        try:
            cars = self.wh.read("cars", S.CARS_DIM)
            yield {
                "emission_by_brand": (
                    base.join(
                        F.broadcast(cars.select("car_id", "brand")),
                        "car_id",
                        "left",
                    )
                    .groupBy("brand")
                    .agg(F.sum("total_emission").alias("total_emission"))
                ),
                "emission_by_car": base.groupBy("car_id").agg(
                    F.sum("total_emission").alias("total_emission")
                ),
                "emission_by_driver": base.groupBy("driver_id").agg(
                    F.sum("total_emission").alias("total_emission")
                ),
            }
        finally:
            base.unpersist()
