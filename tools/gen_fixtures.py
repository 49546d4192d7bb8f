"""Generate the reference-pipeline input fixtures (FIXTURES.md family A).

Deterministic (fixed seeds per FIXTURES.md); writes under fixtures/:
  climate_data/climate.csv
  refugee_and_migrant_data/asylum_cleaned.csv
  i94_visitor_data/{i94cit_and_i94res.json,i94port.json,i94visa.json,
                    sas_data/part-0.parquet}
  legal_immigrant_data/{h1b_kaggle.csv,H-1B_Disclosure_Data_FY17.csv}

Run once; outputs are checked into git so queries and oracles see stable
inputs. Re-running reproduces byte-identical files.
"""

from __future__ import annotations

import csv
import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

COUNTRIES = [
    "United States", "El Salvador", "Guatemala", "Honduras", "Mexico",
    "China", "India", "Viet Nam", "South Korea", "Philippines",
    "Dominican Republic", "Cuba", "Colombia", "Brazil", "Haiti",
    "Jamaica", "Canada", "United Kingdom", "Germany", "France",
]

STATE_NAMES = [
    "CALIFORNIA", "TEXAS", "NEW YORK", "FLORIDA", "ILLINOIS", "WASHINGTON",
    "MASSACHUSETTS", "NEW JERSEY", "GEORGIA", "NORTH CAROLINA", "OHIO",
    "PENNSYLVANIA", "MICHIGAN", "VIRGINIA", "ARIZONA", "COLORADO",
]
STATE_ABBRS = [
    "CA", "TX", "NY", "FL", "IL", "WA", "MA", "NJ", "GA", "NC", "OH", "PA",
    "MI", "VA", "AZ", "CO",
]
CITIES = [
    "SAN JOSE", "AUSTIN", "NEW YORK", "MIAMI", "CHICAGO", "SEATTLE",
    "BOSTON", "NEWARK", "ATLANTA", "CHARLOTTE", "COLUMBUS", "PHILADELPHIA",
    "DETROIT", "RICHMOND", "PHOENIX", "DENVER",
]


def climate(rng: random.Random) -> None:
    rows = []
    for country in COUNTRIES:
        for i in range(100):
            year = 1980 + i // 12
            month = i % 12 + 1
            dt = f"{year:04d}-{month:02d}-01"
            temp = None if rng.random() < 0.05 else round(rng.uniform(-10, 35), 3)
            unc = None if temp is None else round(rng.uniform(0.1, 2.0), 3)
            rows.append((dt, temp, unc, country))
    # inject duplicates
    rows += [rows[i] for i in range(0, len(rows), 97)]
    rng.shuffle(rows)
    path = os.path.join(ROOT, "climate_data")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "climate.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dt", "AverageTemperature", "AverageTemperatureUncertainty", "Country"])
        for dt, t, u, c in rows:
            w.writerow([dt, "" if t is None else t, "" if u is None else u, c])


def asylum(rng: random.Random) -> None:
    rows = []
    for country in sorted(COUNTRIES * 2)[:40]:
        for year in range(2009, 2019):
            if rng.random() < 0.05:
                rows.append((country, year, "", "", ""))
            else:
                rows.append(
                    (
                        country,
                        year,
                        rng.randint(0, 5000),
                        rng.randint(0, 800),
                        rng.randint(0, 300),
                    )
                )
    seen = set()
    uniq = []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            uniq.append(r)
    uniq += [uniq[i] for i in range(0, len(uniq), 23)]  # duplicates
    path = os.path.join(ROOT, "refugee_and_migrant_data")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "asylum_cleaned.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            [
                "country",
                "year",
                "num_arrivals",
                "num_accepted_affirmitavely",
                "num_accepted_defensively",
            ]
        )
        w.writerows(uniq)


def visitor(rng: random.Random) -> None:
    path = os.path.join(ROOT, "i94_visitor_data")
    os.makedirs(os.path.join(path, "sas_data"), exist_ok=True)
    cit = []
    for i, country in enumerate(COUNTRIES):
        cit.append({"code": 100 + i, "region": country, "valid": True})
    for code in (900, 901, 902):  # scrubbed No-Country-Code entries
        cit.append({"code": code, "region": None, "valid": False})
    ports = []
    for i, (city, st) in enumerate(zip(CITIES, STATE_ABBRS)):
        ports.append({"code": f"P{i:02d}", "municipality": city.title(), "region": st})
    for i, country in enumerate(COUNTRIES[:8]):
        ports.append({"code": f"F{i:02d}", "municipality": None, "region": country.title()})
    ports += [{"code": "XXX", "municipality": None, "region": None}]
    visa = [
        {"code": 1, "type": "Business"},
        {"code": 2, "type": "Pleasure"},
        {"code": 3, "type": "Student"},
    ]
    with open(os.path.join(path, "i94cit_and_i94res.json"), "w") as f:
        json.dump(cit, f, indent=2)
    with open(os.path.join(path, "i94port.json"), "w") as f:
        json.dump(ports, f, indent=2)
    with open(os.path.join(path, "i94visa.json"), "w") as f:
        json.dump(visa, f, indent=2)

    n = 5000
    cicid, i94res, i94port, arrdate, i94visa, i94addr, depdate, visatype = (
        [], [], [], [], [], [], [], []
    )
    i94bir, gender = [], []
    port_codes = [p["code"] for p in ports]
    for i in range(n):
        cicid.append(float(6_000_000 + i))
        # ~5% dangling codes (absent from lookup -> dropped by inner join)
        i94res.append(float(rng.choice([100 + rng.randrange(len(COUNTRIES)), 999]))
                      if rng.random() < 0.05 else float(100 + rng.randrange(len(COUNTRIES))))
        i94port.append(rng.choice(port_codes + ["ZZZ"]) if rng.random() < 0.05
                       else rng.choice(port_codes))
        arrdate.append(None if rng.random() < 0.03 else float(rng.randint(20000, 21500)))
        i94visa.append(float(rng.choice([1, 2, 3])))
        i94addr.append(rng.choice(STATE_ABBRS))
        depdate.append(None if rng.random() < 0.2 else float(rng.randint(20100, 22000)))
        visatype.append(rng.choice(["B1", "B2", "F1", "WT", "WB"]))
        i94bir.append(float(rng.randint(18, 90)))
        gender.append(rng.choice(["M", "F", None]))
    # duplicates: repeat a slice verbatim
    dup = slice(0, 250)
    table = pa.table(
        {
            "cicid": cicid + cicid[dup],
            "i94res": i94res + i94res[dup],
            "i94port": i94port + i94port[dup],
            "arrdate": arrdate + arrdate[dup],
            "i94visa": i94visa + i94visa[dup],
            "i94addr": i94addr + i94addr[dup],
            "depdate": depdate + depdate[dup],
            "visatype": visatype + visatype[dup],
            "i94bir": i94bir + i94bir[dup],
            "gender": gender + gender[dup],
        }
    )
    pq.write_table(table, os.path.join(path, "sas_data", "part-0.parquet"))


def worker(rng_k: random.Random, rng_f: random.Random) -> None:
    path = os.path.join(ROOT, "legal_immigrant_data")
    os.makedirs(path, exist_ok=True)
    employers = [f"{w} {s}" for w in ("ACME", "GLOBEX", "INITECH", "UMBRELLA", "STARK",
                                      "WAYNE", "HOOLI", "VANDELAY")
                 for s in ("CORP LLC", "INC", "SYSTEMS", "LABS")]
    statuses = ["CERTIFIED", "DENIED", "WITHDRAWN", "CERTIFIED-WITHDRAWN"]
    rows = []
    for _ in range(1400):
        city_i = rng_k.randrange(len(CITIES))
        kind = rng_k.random()
        if kind < 0.8:  # full state name -> abbreviated by the engine
            worksite = f"{CITIES[city_i]}, {STATE_NAMES[city_i]}"
        elif kind < 0.9:  # already-2-letter (passes through, keeps lead space)
            worksite = f"{CITIES[city_i]}, {STATE_ABBRS[city_i]}"
        else:  # non-state (passes through unabbreviated)
            worksite = "SAN JUAN, PUERTO RICO"
        rows.append(
            (
                rng_k.choice(statuses),
                rng_k.choice(employers),
                rng_k.choice([2015, 2016, 2017]),
                worksite,
            )
        )
    rows += [rows[i] for i in range(0, len(rows), 13)]  # duplicates
    with open(os.path.join(path, "h1b_kaggle.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["CASE_STATUS", "EMPLOYER_NAME", "YEAR", "WORKSITE"])
        w.writerows(rows)

    rows2 = []
    for _ in range(1400):
        i = rng_f.randrange(len(CITIES))
        j = rng_f.randrange(len(CITIES))
        bad = rng_f.random()
        if bad < 0.85:
            ws_state = STATE_ABBRS[j]
        elif bad < 0.9:
            ws_state = STATE_ABBRS[j].lower()  # fails uppercase set test
        elif bad < 0.95:
            ws_state = STATE_NAMES[j]  # fails length-2 test
        else:
            ws_state = "XXZ"  # junk
        start_y = rng_f.choice([2016, 2017])
        has_dates = rng_f.random() > 0.1
        rows2.append(
            (
                rng_f.choice(statuses),
                rng_f.choice(["H-1B", "E-3 Australian", "H-1B1 Chile"]),
                f"{start_y}-{rng_f.randint(1,12):02d}-{rng_f.randint(1,28):02d}" if has_dates else "",
                f"{start_y+3}-{rng_f.randint(1,12):02d}-{rng_f.randint(1,28):02d}" if has_dates and rng_f.random() > 0.1 else "",
                rng_f.choice(employers).title(),
                CITIES[i].title(),
                STATE_ABBRS[i],
                CITIES[j].title(),
                ws_state,
            )
        )
    rows2 += [rows2[i] for i in range(0, len(rows2), 17)]
    with open(os.path.join(path, "H-1B_Disclosure_Data_FY17.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            [
                "CASE_STATUS", "VISA_CLASS", "EMPLOYMENT_START_DATE",
                "EMPLOYMENT_END_DATE", "EMPLOYER_NAME", "EMPLOYER_CITY",
                "EMPLOYER_STATE", "WORKSITE_CITY", "WORKSITE_STATE",
            ]
        )
        w.writerows(rows2)


def main() -> None:
    os.makedirs(ROOT, exist_ok=True)
    climate(random.Random(42))
    asylum(random.Random(43))
    visitor(random.Random(44))
    worker(random.Random(45), random.Random(46))
    print(f"fixtures written under {ROOT}")


if __name__ == "__main__":
    main()
