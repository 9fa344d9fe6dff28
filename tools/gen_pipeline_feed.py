"""Deterministic scale generator for the emission ETL's CSV feeds.

The §2 product path (`EmissionPipeline.run`) is golden-tested on
hand-written fixtures but its wall-time had never appeared in a decade
block (round-9 verdict task #6). This tool writes the three feeds at
``--scale N`` times the reference envelope (reference: 1,000 drivers /
999 vehicles / 5,000 logbook rows — FIXTURES.md), preserving the trap
RATES the pipeline's semantics hinge on, so wall-time across decades
measures the ETL, not a drifting data profile:

- ~5% null ``cylinders`` and ~10% null ``fuel_type`` on BOTH the
  vehicle feed and the logbook rows that reference those vehicles
  (the §4.4 NaN==NaN null-safe join trap: every null-keyed logbook
  row still matches its car);
- ~0.5% duplicate natural keys in each dim feed (survivor dedup);
- ~1% orphan drivers in the logbook (NULL driver_id, not an FK
  violation);
- one city name shared by two countries (the §4.5 city-key trap);
- logbook dates spanning ~2 years (the date dim's smart-key range).

Usage: python tools/gen_pipeline_feed.py --dst DIR --scale N
Deterministic for a given (scale); safe to cache under .scale/.
"""

from __future__ import annotations

import argparse
import os
import random

VEHICLE_HEADER = (
    "BRAND,MODEL,VEHICLE CLASS,ENGINE SIZE L,CYLINDERS,TRANSMISSION,FUEL_TYPE,"
    '"FUEL CONSUMPTION (L/100 km)","HWY (L/100 km)","COMB (L/100 km)","COMB (mpg)",'
    "CO2_Emissions(g/km)"
)
LOGBOOK_HEADER = (
    "brand,model,engine_size_l,cylinders,fuel_type,transmission,name,first_name,"
    "start_city,start_country,target_city,target_country,distance_km,date"
)
COUNTRIES = ["Finland", "Germany", "France", "Sweden", "Norway"]


def _vehicle_key(i: int) -> tuple[str, str, str, str, str, str, str]:
    """Natural 7-key for vehicle #i — nulls (empty CSV fields) at the
    reference rates, deterministic in i."""
    cylinders = "" if i % 20 == 0 else str(3 + (i % 7))
    fuel = "" if i % 10 == 3 else "XZDE"[i % 4]
    return (
        f"brand{i % 40}",
        f"model{i}",
        f"class{i % 16}",
        f"{1.0 + (i % 74) / 10.0:.1f}",
        cylinders,
        f"T{i % 9}",
        fuel,
    )


def write_feeds(dst: str, scale: int) -> None:
    rng = random.Random(10_000 + scale)
    n_drivers, n_vehicles, n_logbook = 1000 * scale, 999 * scale, 5000 * scale

    os.makedirs(os.path.join(dst, "drivers_incoming_data"), exist_ok=True)
    os.makedirs(
        os.path.join(dst, "vehicle_fuel_consumptions_incoming_data"),
        exist_ok=True,
    )
    os.makedirs(os.path.join(dst, "drivers_logbook_incoming_data"), exist_ok=True)

    with open(
        os.path.join(dst, "drivers_incoming_data", "drivers.csv"), "w"
    ) as f:
        f.write("name,first_name,city\n")
        for i in range(n_drivers):
            f.write(f"name{i},first{i % 97},city{i % 450}\n")
            if i % 200 == 0:  # duplicate (name, first_name) pair → dedup
                f.write(f"name{i},first{i % 97},othercity\n")

    with open(
        os.path.join(
            dst, "vehicle_fuel_consumptions_incoming_data", "vehicles.csv"
        ),
        "w",
    ) as f:
        f.write(VEHICLE_HEADER + "\n")
        for i in range(n_vehicles):
            k = _vehicle_key(i)
            cons = 5.0 + (i % 90) / 10.0
            f.write(
                ",".join(k)
                + f",{cons:.1f},{cons - 1.5:.1f},{cons - 0.7:.1f},"
                f"{int(282 / cons)},{100 + (i * 7) % 400}\n"
            )
            if i % 200 == 7:  # dup natural key, different consumption
                f.write(
                    ",".join(k)
                    + f",{cons + 2:.1f},{cons:.1f},{cons + 1:.1f},"
                    f"{int(240 / cons)},{120 + (i * 7) % 400}\n"
                )

    # one shared city name in two countries (§4.5); the rest unique-ish
    with open(
        os.path.join(dst, "drivers_logbook_incoming_data", "logbook.csv"), "w"
    ) as f:
        f.write(LOGBOOK_HEADER + "\n")
        for j in range(n_logbook):
            v = rng.randrange(n_vehicles)
            brand, model, vclass, engine, cyl, trans, fuel = _vehicle_key(v)
            if rng.random() < 0.01:  # orphan driver → NULL driver_id
                name, first = f"ghost{j}", "Bob"
            else:
                d = rng.randrange(n_drivers)
                name, first = f"name{d}", f"first{d % 97}"
            sc = rng.randrange(457)
            tc = rng.randrange(457)
            s_city = "Sharedville" if sc == 0 else f"city{sc}"
            t_city = "Sharedville" if tc == 0 else f"city{tc}"
            # Sharedville exists in TWO countries — as start it is
            # Finnish, as target German — so the (city_name,
            # country_id) key trap is live at every scale
            s_ctry = COUNTRIES[sc % len(COUNTRIES)]
            t_ctry = COUNTRIES[1] if tc == 0 else COUNTRIES[tc % len(COUNTRIES)]
            day = rng.randrange(730)
            date = (
                f"{2014 + day // 365}-"
                f"{1 + (day % 365) // 31:02d}-{1 + day % 28:02d}"
            )
            f.write(
                f"{brand},{model},{engine},{cyl},{fuel},{trans},"
                f"{name},{first},{s_city},{s_ctry},{t_city},{t_ctry},"
                f"{rng.randrange(5, 900) / 10.0:.1f},{date}\n"
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", required=True)
    ap.add_argument("--scale", type=int, default=1)
    args = ap.parse_args()
    write_feeds(args.dst, args.scale)
    print(f"feeds written to {args.dst} at scale x{args.scale}")


if __name__ == "__main__":
    main()
