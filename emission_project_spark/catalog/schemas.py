"""Declared schemas for the emission-domain feeds and warehouse tables.

The reference infers feed schemas on read and declares sink schemas in
Postgres DDL (SURVEY.md §1.3). We declare BOTH ends: explicit
``StructType`` at the scan (deterministic at 100 TB — no sampling
pass, no drift) and the same types at the sink.

Types follow the reference DDL (``dags/create_tables.py``):
- ``cylinders``/``comb_mpg`` stay DOUBLE/INT per the pandas NaN-upcast
  behavior documented in SURVEY.md §1.2
- ids are LongType (BIGINT) — the 100 TB-safe choice for SERIAL
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- raw feed schemas (reference data/*.csv headers) ---

DRIVERS_FEED = _s(
    ("name", StringType()),
    ("first_name", StringType()),
    ("city", StringType()),  # dropped by the pipeline (emission-dag.py:74)
)

# UPPERCASE/messy header of vehicle_fuel_consumptions.csv → canonical
# snake_case rename map (emission-dag.py:89-92)
VEHICLES_RENAME = {
    "BRAND": "brand",
    "MODEL": "model",
    "VEHICLE CLASS": "vehicle_class",
    "ENGINE SIZE L": "engine_size_l",
    "CYLINDERS": "cylinders",
    "TRANSMISSION": "transmission",
    "FUEL_TYPE": "fuel_type",
    "FUEL CONSUMPTION (L/100 km)": "fuel_consumption_l_per_hundred_km",
    "HWY (L/100 km)": "hwy_l_per_hundred_km",
    "COMB (L/100 km)": "comb_l_per_hundred",
    "COMB (mpg)": "comb_mpg",
    "CO2_Emissions(g/km)": "co2_emission_g_per_km",
}

VEHICLES_FEED_RAW = _s(
    ("BRAND", StringType()),
    ("MODEL", StringType()),
    ("VEHICLE CLASS", StringType()),
    ("ENGINE SIZE L", DoubleType()),
    ("CYLINDERS", DoubleType()),  # FLOAT: NaN-upcast parity (SURVEY §1.2)
    ("TRANSMISSION", StringType()),
    ("FUEL_TYPE", StringType()),
    ("FUEL CONSUMPTION (L/100 km)", DoubleType()),
    ("HWY (L/100 km)", DoubleType()),
    ("COMB (L/100 km)", DoubleType()),
    ("COMB (mpg)", IntegerType()),
    ("CO2_Emissions(g/km)", IntegerType()),
)

VEHICLES_FEED = _s(*[(VEHICLES_RENAME[f.name], f.dataType) for f in VEHICLES_FEED_RAW.fields])

LOGBOOK_FEED = _s(
    ("brand", StringType()),
    ("model", StringType()),
    ("engine_size_l", DoubleType()),
    ("cylinders", DoubleType()),
    ("fuel_type", StringType()),
    ("transmission", StringType()),
    ("name", StringType()),
    ("first_name", StringType()),
    ("start_city", StringType()),
    ("start_country", StringType()),
    ("target_city", StringType()),
    ("target_country", StringType()),
    ("distance_km", DoubleType()),
    ("date", StringType()),  # yyyy-MM-dd, parsed at the date join (P6)
)

# --- warehouse (star schema) ---

DRIVERS_DIM = _s(
    ("driver_id", LongType()),
    ("name", StringType()),
    ("first_name", StringType()),
)

CARS_DIM = _s(
    ("car_id", LongType()),
    *[(f.name, f.dataType) for f in VEHICLES_FEED.fields],
)

COUNTRY_DIM = _s(("country_id", LongType()), ("country_name", StringType()))

CITY_DIM = _s(
    ("city_id", LongType()),
    ("city_name", StringType()),
    ("country_id", LongType()),
)

DATE_DIM = _s(
    ("date_id", IntegerType()),
    ("date", DateType()),
    ("week_day", StringType()),
    ("day", IntegerType()),
    ("month", IntegerType()),
    ("week", IntegerType()),
    ("quarter", IntegerType()),
    ("year", IntegerType()),
)

FACT_CAR_DRIVER_LOG = _s(
    ("car_id", LongType()),
    ("driver_id", LongType()),
    ("start_city_id", LongType()),
    ("start_country_id", LongType()),
    ("target_city_id", LongType()),
    ("target_country_id", LongType()),
    ("distance_km", DoubleType()),
    ("date_id", IntegerType()),
    ("total_emission", DoubleType()),
)

# natural keys (reference anti-join/dedup key sets, SURVEY §2.3-2.4)
DRIVERS_NK = ["name", "first_name"]
CARS_NK = [
    "brand",
    "model",
    "vehicle_class",
    "engine_size_l",
    "cylinders",
    "transmission",
    "fuel_type",
]
# the 6-col attribute FK from logbook into cars (J6; vehicle_class not
# present in the logbook feed)
CARS_LOGBOOK_KEYS = ["brand", "model", "engine_size_l", "cylinders", "fuel_type", "transmission"]
FACT_NK = [
    "car_id",
    "driver_id",
    "start_city_id",
    "start_country_id",
    "target_city_id",
    "target_country_id",
    "date_id",
]
