"""Deterministic arXiv-shaped fixtures (FIXTURES.md family A).

Seeded synthetic raw records exercising every ingestion edge case the
reference's behavior depends on: duplicate ids, null DOIs, the ``cs.``
wildcard-regex trap, short titles, unicode/punctuated names, empty first
names, author_ids shorter than 4 chars, dot-less category codes, and
author pairs sharing multiple articles.
"""

from __future__ import annotations

import json
import random

FIRST_NAMES = [
    "Maria", "John", "Wei", "Anna", "Pierre", "Sinivälï", "José", "X",
    "Olga", "Chen", "Lars", "Amélie", "",
]
LAST_NAMES = [
    "Smith", "Müller", "O'Brien", "al-Khwarizmi", "Zhang", "García",
    "Birkedal", "Li", "Næss", "Kovač", "Ivanov", "Tanaka",
]
CATS = [
    "cs.LG cs.AI", "cs.DS", "cs.LG math.ST", "cs.CL cs.AI cs.LG",
    "physics.optics cs.AI",        # excluded: contains 'physics'
    "ics.yy",                      # included: 'cs.' regex wildcard trap
    "adap-org cs.DS",              # dot-less code → null subdom
    "math.ST",                     # excluded: no 'cs.' match
    "cs.DB", "cs.CR cs.DB",
]


def gen_raw_records(n: int = 400, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    records = []
    for i in range(n):
        art_id = f"{2000 + i % 12}.{i:05d}"
        title = (
            "Short" if i % 29 == 0
            else f"A study of topic {i} in synthetic computer science"
        )
        doi = None if i % 7 == 3 else f"10.1000/test.{i}"
        cats = CATS[i % len(CATS)]
        year = 1998 + (i % 9)
        date = f"{year}-{1 + i % 12:02d}-{1 + i % 28:02d}"
        n_auth = 1 + (i * 7) % 5
        authors = []
        for a in range(n_auth):
            li = (i * 3 + a * 11) % len(LAST_NAMES)
            fi = (i * 5 + a * 13) % len(FIRST_NAMES)
            first = FIRST_NAMES[fi]
            middle = "K." if (i + a) % 4 == 0 else ""
            authors.append([LAST_NAMES[li], (first + " " + middle).strip(), ""])
        records.append(
            {
                "id": art_id,
                "submitter": f"submitter{i}",     # unused field (projection test)
                "title": title,
                "doi": doi,
                "categories": cats,
                "update_date": date,
                "abstract": "lorem ipsum " * 3,
                "authors_parsed": authors,
            }
        )
    # exact duplicate ids (dropDuplicates keep-first)
    for i in [5, 17, 42]:
        dup = dict(records[i])
        dup["title"] = "A DIFFERENT title for the duplicate record!!"
        records.append(dup)
    rng.shuffle(records)
    return records


def write_arxiv_raw(path: str, n: int = 400, seed: int = 42) -> None:
    with open(path, "w") as f:
        for rec in gen_raw_records(n, seed):
            f.write(json.dumps(rec) + "\n")


def names_genders_rows() -> list[tuple[str, str, str, str]]:
    rows = [
        ("Maria", "1", "F", "0.99"),
        ("John", "2", "M", "0.99"),
        ("Wei", "3", "F", "0.55"),
        ("Anna", "4", "F", "0.99"),
        ("Pierre", "5", "M", "0.98"),
        ("Jose", "6", "M", "0.97"),
        ("Olga", "7", "F", "0.99"),
        ("Chen", "8", "M", "0.52"),
        ("Lars", "9", "M", "0.99"),
        ("Maria", "1", "F", "0.98"),  # duplicate first_name (fan-out hazard)
    ]
    return rows


def fake_fetcher(dois: list[str]) -> dict[str, tuple[str, int, str | None]]:
    """Deterministic Crossref stand-in (shape per augmentations.py:29-43):
    some DOIs error out (absent), some are proceedings, some lack ISSN."""
    out = {}
    for doi in dois:
        i = int(doi.rsplit(".", 1)[1])
        if i % 13 == 6:
            continue  # request error → row left untouched
        if i % 5 == 0:
            out[doi] = ("proceedings-article", (i * 37) % 450, None)
        else:
            issn = None if i % 11 == 7 else f"{1000 + i % 17:04d}-{5000 + i % 23:04d}"
            out[doi] = ("journal-article", (i * 37) % 450, issn)
    return out


def cwts_rows() -> list[tuple[str, str, str, float, int]]:
    """source_title, print_issn, electronic_issn, snip, year — includes
    electronic-only matches (dropped by reference quirk), dup print ISSNs,
    and non-2021 years."""
    rows = []
    for j in range(17):
        for k in range(23):
            issn = f"{1000 + j:04d}-{5000 + k:04d}"
            if (j + k) % 6 == 1:
                # electronic-only: print ISSN unknown to articles
                rows.append((f"Journal E{j}-{k}", f"9{j:03d}-{k:04d}", issn, 1.1, 2021))
            elif (j + k) % 6 == 2:
                pass  # ISSN absent from CWTS → journal dropped
            else:
                rows.append((f"Journal {j}-{k}", issn, f"8{j:03d}-{k:04d}",
                             round(0.5 + ((j * 23 + k) % 40) / 10, 2), 2021))
    rows.append(("Old Journal", "1000-5000", "", 9.9, 2019))  # non-2021 year
    rows.append(("Journal 0-0 DUP", "1000-5000", "", 7.7, 2021))  # dup print_issn
    return rows
