"""Deterministic synthetic `hr_dirty` fixture (FIXTURES.md fixture 2 shape).

500 rows engineered so the reference's two cleaning sequences produce the
golden row counts by construction:

- seq 1 (3-sigma fit on full data for age/salary, drop null last_promo_date):
  500 -> 405, then a re-fit 3-sigma pass on the survivors: 405 -> 396.
  The 18 extreme outliers all live inside the 95-row null-promo block (so the
  first pass removes only null-promo rows), and 9 mild outliers (age 60) sit
  inside the inflated full-fit bounds but outside the tighter re-fit bounds.
- seq 2 (median-fill age/salary/bonus/perf, fill promo with min join_date,
  3-sigma on age/salary/bonus): 500 -> 482 (exactly the 18 extremes drop).
- min(join_date) == '2015-08-05' (single engineered row).

All quirk placements are deterministic (explicit LCG, no ``random``).
"""

from __future__ import annotations

HEADER = "employee_id,name,age,department,salary,join_date,last_promo_date,bonus_percent,performance_score,left_company"

DEPARTMENTS = ["Engineering", "Marketing", "HR", "Customer Support", "Sales"]


def hr_dirty_rows() -> list[list]:
    state = 12345

    def nxt() -> float:
        nonlocal state
        state = (1664525 * state + 1013904223) % (2**32)
        return state / 2**32

    rows: list[list] = []
    for i in range(500):
        eid = 1001 + i
        name = f"Employee {eid}"
        age: float | None = round(28 + 18 * nxt(), 1)
        dept = DEPARTMENTS[i % 5]
        salary: float | None = round(55000 + 40000 * nxt(), 2)
        bonus: float | None = round(2 + 10 * nxt(), 1)
        perf: float | None = round(1 + 4 * nxt(), 1)
        jd = f"{2016 + (i % 9)}-{1 + (i % 12):02d}-{1 + (i % 28):02d}"
        promo: str | None = f"{2018 + (i % 6)}-{1 + (i * 7 % 12):02d}-{1 + (i * 3 % 28):02d}"
        left = "True" if i % 7 == 0 else "False"
        rows.append([eid, name, age, dept, salary, jd, promo, bonus, perf, left])
    rows[0][5] = "2015-08-05"  # unique minimum join_date
    for i in range(95):  # null-promo block
        rows[i][6] = None
    for i in range(18):  # extreme outliers, all inside the null-promo block
        if i % 3 == 0:
            rows[i][2] = 91.0
        elif i % 3 == 1:
            rows[i][4] = 500000.0 + i * 1000
        else:
            rows[i][7] = 60.0
    for i in range(20, 27):
        rows[i][2] = None  # 7 age nulls
    for i in range(27, 66):
        rows[i][4] = None  # 39 salary nulls
    for i in range(66, 72):
        rows[i][7] = None  # 6 bonus nulls
    for i in range(20, 47):
        rows[i][8] = None  # 27 performance nulls
    for i in range(100, 109):  # 9 mild age outliers with non-null promo
        rows[i][2] = 60.0
    return rows


def hr_dirty_csv_text() -> str:
    def cell(v) -> str:
        return "" if v is None else str(v)

    lines = [HEADER]
    for r in hr_dirty_rows():
        lines.append(",".join(cell(v) for v in r))
    return "\n".join(lines) + "\n"
