"""Deterministic synthetic fixtures (FIXTURES.md §1-3).

- presidents_a / presidents_b / presidents_gold: the reference's executable
  smoke example (reference README.md:159-188 and blocking variant
  :236-299) — 5 correct links, distractors, one deliberate block mismatch;
- voters_a / voters_b / voters_gold: fastLink-voter-file style benchmark
  (reference data-raw/my_pkg_data.R:1-56) — base records + corrupted
  duplicates (typos, nickname swaps, middle-name drops);
- repo_files + gold clusters: the north-rule input shape, with
  cloned/renamed/lightly-edited file families forming known entity
  clusters.

Everything is seeded; two calls produce byte-identical tables.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# presidents (reference README smoke example)
# ---------------------------------------------------------------------------

_PRESIDENTS_A = [
    ("Joe Biden", "Delaware", 81),
    ("Donald Trump", "New York", 77),
    ("Barack Obama", "Illinois", 62),
    ("George W. Bush", "Texas", 77),
    ("Bill Clinton", "Arkansas", 77),
]

_PRESIDENTS_B = [
    ("Joseph Robinette Biden", "Delaware", "trains"),
    ("Donald John Trump", "Florida", "golf"),       # deliberate block mismatch
    ("Barack Hussein Obama", "Illinois", "basketball"),
    ("George Walker Bush", "Texas", "painting"),
    ("William Jefferson Clinton", "Arkansas", "saxophone"),
    ("Biff Tannen", "California", "sports almanac"),
    ("Joe Riley", "South Carolina", "history"),
    ("George Herbert Walker Bush", "Texas", "horseshoes"),
]

_PRESIDENTS_GOLD = [
    ("Joe Biden", "Joseph Robinette Biden"),
    ("Donald Trump", "Donald John Trump"),
    ("Barack Obama", "Barack Hussein Obama"),
    ("George W. Bush", "George Walker Bush"),
    ("Bill Clinton", "William Jefferson Clinton"),
]


def presidents(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    dfa = spark.createDataFrame(_PRESIDENTS_A, schema="name string, state string, age int")
    dfb = spark.createDataFrame(_PRESIDENTS_B, schema="name string, state string, hobby string")
    gold = spark.createDataFrame(_PRESIDENTS_GOLD, schema="a_name string, b_name string")
    return dfa, dfb, gold


# ---------------------------------------------------------------------------
# voters (fastLink-style benchmark shape)
# ---------------------------------------------------------------------------

_FIRST = ["James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
          "Linda", "William", "Elizabeth", "David", "Barbara", "Richard",
          "Susan", "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen",
          "Christopher", "Lisa", "Daniel", "Nancy", "Matthew", "Betty"]
_NICK = {"James": "Jim", "Robert": "Bob", "John": "Jack", "Michael": "Mike",
         "William": "Bill", "Elizabeth": "Liz", "Richard": "Dick",
         "Joseph": "Joe", "Thomas": "Tom", "Christopher": "Chris",
         "Daniel": "Dan", "Matthew": "Matt"}
_MIDDLE = ["A.", "B.", "C.", "D.", "E.", "J.", "K.", "L.", "M.", "R.", "S.", "T."]
_LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
         "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
         "Wilson", "Anderson", "Taylor", "Moore", "Jackson", "Martin", "Lee",
         "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark"]
_STREET = ["Oak St", "Maple Ave", "Main St", "Cedar Ln", "Pine Rd", "Elm Dr",
           "Lake View", "Hill Crest", "River Rd", "Sunset Blvd"]
_CITY = ["Springfield", "Riverton", "Fairview", "Greenville", "Madison",
         "Georgetown", "Clinton", "Salem"]


def _typo(rng: random.Random, s: str) -> str:
    if len(s) < 4:
        return s
    ops = ["swap", "drop", "dup", "sub"]
    op = rng.choice(ops)
    i = rng.randrange(1, len(s) - 2)
    if op == "swap":
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    if op == "drop":
        return s[:i] + s[i + 1:]
    if op == "dup":
        return s[:i] + s[i] + s[i:]
    return s[:i] + rng.choice("aeiou") + s[i + 1:]


def voters(spark: SparkSession, n_base: int = 300, match_rate: float = 0.6,
           seed: int = 42) -> tuple[DataFrame, DataFrame, DataFrame]:
    """dfA = registered voters; dfB = base records ∪ corrupted duplicates of
    a ``match_rate`` subset of dfA; gold carries (a_id, b_id, is_match)."""
    rng = random.Random(seed)
    rows_a = []
    for i in range(n_base):
        first = rng.choice(_FIRST)
        middle = rng.choice(_MIDDLE)
        last = rng.choice(_LAST)
        full = f"{first} {middle} {last}"
        rows_a.append((i, full, rng.randrange(1, 9999), rng.choice(_STREET),
                       rng.choice(_CITY), rng.randrange(1930, 2002)))

    rows_b = []
    gold = []
    bid = 0
    for (aid, full, housenum, street, city, by) in rows_a:
        if rng.random() < match_rate:
            first, middle, last = full.split(" ", 2)
            variant = rng.random()
            if variant < 0.3 and first in _NICK:
                corrupted = f"{_NICK[first]} {middle} {last}"
            elif variant < 0.55:
                corrupted = f"{first} {last}"          # middle drop
            else:
                corrupted = _typo(rng, full)
            rows_b.append((bid, corrupted, housenum, street, city, by))
            gold.append((aid, bid, True))
            bid += 1
    # distractors: fresh records, same city pool
    for _ in range(n_base // 2):
        first = rng.choice(_FIRST)
        last = rng.choice(_LAST)
        rows_b.append((bid, f"{first} {rng.choice(_MIDDLE)} {last}",
                       rng.randrange(1, 9999), rng.choice(_STREET),
                       rng.choice(_CITY), rng.randrange(1930, 2002)))
        bid += 1

    schema_a = ("a_id bigint, full_name string, housenum int, streetname string, "
                "city string, birthyear int")
    schema_b = ("b_id bigint, full_name string, housenum int, streetname string, "
                "city string, birthyear int")
    dfa = spark.createDataFrame(rows_a, schema=schema_a)
    dfb = spark.createDataFrame(rows_b, schema=schema_b)
    gold_df = spark.createDataFrame(gold, schema="a_id bigint, b_id bigint, is_match boolean")
    return dfa, dfb, gold_df


# ---------------------------------------------------------------------------
# repo_files (north-rule input shape) with known entity clusters
# ---------------------------------------------------------------------------

_LANGS = ["python", "java", "go", "rust", "js"]
_WORDS = ("spark join shuffle partition hash sort merge filter scan batch "
          "column row table query plan stage task executor driver memory "
          "cache broadcast skew salt window agg stream state checkpoint").split()


def repo_files(spark: SparkSession, n_clusters: int = 60,
               copies_per_cluster: int = 4, seed: int = 7,
               return_pandas: bool = False):
    """Synthetic repo-file table: each cluster is one 'original' file plus
    cloned/renamed/lightly-edited copies across repos — the entity to
    recover. Returns (files_df, gold_pairs_df, gold_assign_df)."""
    rng = random.Random(seed)
    rows = []
    gold_pairs = []
    assign = []
    fid = 0
    for c in range(n_clusters):
        lang = rng.choice(_LANGS)
        stem = f"{rng.choice(_WORDS)}_{rng.choice(_WORDS)}_{c}"
        body_words = [rng.choice(_WORDS) for _ in range(rng.randrange(60, 140))]
        members = []
        for k in range(copies_per_cluster):
            repo = f"org{rng.randrange(20)}/proj{rng.randrange(50)}"
            commit = hashlib.sha1(f"{seed}:{c}:{k}".encode()).hexdigest()
            if k == 0:
                name, words = stem, list(body_words)
            else:
                name = stem if rng.random() < 0.5 else f"{stem}_v{k}"
                words = list(body_words)
                for _ in range(rng.randrange(0, 6)):     # light edits
                    words[rng.randrange(len(words))] = rng.choice(_WORDS)
            path = f"src/{name}.{lang[:2]}"
            content = f"// {name}\n" + " ".join(words)
            rows.append((fid, repo, path, commit, lang, content))
            members.append(fid)
            assign.append((fid, members[0]))
            fid += 1
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                gold_pairs.append((members[i], members[j]))
    # noise files: unique, no cluster
    for _ in range(n_clusters * 2):
        lang = rng.choice(_LANGS)
        name = f"{rng.choice(_WORDS)}_{rng.choice(_WORDS)}_x{fid}"
        content = f"// {name}\n" + " ".join(rng.choice(_WORDS) for _ in range(80))
        rows.append((fid, f"org{rng.randrange(20)}/proj{rng.randrange(50)}",
                     f"src/{name}.{lang[:2]}",
                     hashlib.sha1(f"{seed}:n:{fid}".encode()).hexdigest(),
                     lang, content))
        assign.append((fid, fid))
        fid += 1

    files_schema = ("file_id bigint, repo string, path string, commit string, "
                    "lang string, content string")
    if return_pandas:
        return (
            pd.DataFrame(rows, columns=["file_id", "repo", "path", "commit", "lang", "content"]),
            pd.DataFrame(gold_pairs, columns=["a", "b"]),
            pd.DataFrame(assign, columns=["file_id", "cluster"]),
        )
    files = spark.createDataFrame(rows, schema=files_schema)
    gold_df = spark.createDataFrame(gold_pairs, schema="a bigint, b bigint")
    assign_df = spark.createDataFrame(assign, schema="file_id bigint, cluster bigint")
    return files, gold_df, assign_df
