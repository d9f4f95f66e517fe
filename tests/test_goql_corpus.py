"""GOQL golden-corpus parity.

Evaluates the reference's full query corpus
(/root/reference/src/test/resources/feature/queries.fab, ~150 queries ×
70 tag fixtures from tags.fab) against our GOQL→Column compiler, exactly
as MatcherCompilerTest does (fixtures evaluated as WAY features).

The corpus files are read from the reference at test time (data, not
code); tests skip if the reference tree is absent.  Fixture values pass
through the same conversion the reference harness applies
(TagsParser.value(): dotted numbers → Java Double.toString, integers →
Long.toString — TagsParser.java:68-95).
"""

from __future__ import annotations

import os
import re

import pytest

from geodesk_spark.goql import GoqlError, compile_goql

QUERIES_FAB = "/root/reference/src/test/resources/feature/queries.fab"
TAGS_FAB = "/root/reference/src/test/resources/feature/tags.fab"

pytestmark = pytest.mark.skipif(
    not os.path.exists(QUERIES_FAB), reason="reference corpus not available"
)


def load_tags():
    fixtures: dict[str, dict[str, str]] = {}
    current = None
    for line in open(TAGS_FAB, encoding="utf-8"):
        raw = line.rstrip("\n")
        stripped = raw.strip()
        if not stripped or stripped.startswith("//"):
            continue
        if not raw[0] in " \t":  # top-level: fixture name
            name = stripped.rstrip(":")
            current = {}
            fixtures[name] = current
            continue
        k, _, v = stripped.partition("=")
        k = k.strip().strip('"')
        v = v.strip()
        if v.startswith('"'):
            v = re.sub(r"\\(.)", r"\1", v[1:-1])
        elif re.fullmatch(r"-?[0-9]+\.[0-9]+", v):
            v = repr(float(v))  # Java Double.toString ≈ Python repr (shortest round-trip)
        elif re.fullmatch(r"-?[0-9]+", v):
            v = str(int(v))
        fixtures[name][k] = v
    return fixtures


def load_queries():
    cases = []
    cur = None
    for line in open(QUERIES_FAB, encoding="utf-8"):
        raw = line.rstrip("\n")
        stripped = raw.strip()
        if not stripped or stripped.startswith("//"):
            continue
        if raw.startswith("query:"):
            cur = {"query": raw[len("query:"):].strip(), "expected": {}, "error": None}
            cases.append(cur)
            continue
        if cur is None:
            continue
        body = stripped.split("//")[0].strip()
        if not body:
            continue
        k, _, v = body.partition(":")
        k, v = k.strip(), v.strip()
        if k == "error":
            cur["error"] = v
        else:
            cur["expected"][k] = v == "true"
    return cases


def test_corpus(spark):
    fixtures = load_tags()
    cases = load_queries()
    assert len(cases) > 100 and len(fixtures) > 50

    import pandas as pd

    rows = pd.DataFrame(
        {
            "name": list(fixtures),
            "ftype": "way",
            "is_area": False,
            "tags": [fixtures[n] for n in fixtures],
        }
    )
    df = spark.createDataFrame(rows, schema="name string, ftype string, is_area boolean, tags map<string,string>")

    cols, meta = [], []
    n_err_ok = 0
    for idx, case in enumerate(cases):
        if case["error"] is not None:
            with pytest.raises(GoqlError):
                compile_goql(case["query"])
            n_err_ok += 1
            continue
        cols.append(compile_goql(case["query"], check_types=False).alias(f"q{idx}"))
        meta.append((idx, case))

    result = df.select("name", *cols).toPandas().set_index("name")

    failures = []
    for idx, case in enumerate(cases):
        if case["error"] is not None:
            continue
        for fixture, expected in case["expected"].items():
            if fixture not in result.index:
                failures.append(f"missing fixture {fixture} for {case['query']!r}")
                continue
            got = bool(result.loc[fixture, f"q{idx}"])
            if got != expected:
                failures.append(
                    f"{case['query']!r} on {fixture}: got {got}, want {expected} tags={fixtures[fixture]}"
                )
    assert n_err_ok >= 8
    assert not failures, f"{len(failures)} mismatches:\n" + "\n".join(failures[:25])


def test_lenient_parse_mathutils_golden(spark):
    """MathUtilsTest.testDoubleFromString ported row-for-row
    (common/math/MathUtilsTest.java:12-26): the lenient left-prefix
    parse behind every GOQL numeric comparison."""
    from pyspark.sql import functions as F

    from geodesk_spark.goql.compiler import lenient_double_col

    cases = [
        ("Test", None), ("--2", None), ("..5", None), ("-..5", None),
        ("457", 457.0), ("457.0", 457.0), ("457.000000000000000", 457.0),
        ("-00000.000000000000000", 0.0),
        ("-0013100.0000000000000000", -13100.0),
        ("-0013100.999000000000000000", -13100.999),
        ("   -001413100.99abc9000000000000000", -1413100.99),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v string")
    got = {r["v"]: r["d"] for r in df.select("v", lenient_double_col(F.col("v")).alias("d")).collect()}
    for v, want in cases:
        if want is None:
            assert got[v] is None, v  # NaN in the reference = NULL here
        else:
            assert got[v] == want, v


def test_queryparser_golden_strings(spark):
    """QueryParserTest.java:64-79 query strings parse and compile —
    exercising single-QUOTED values (SimpleParser.java:141-142 accepts
    both quote chars), spaced operators, and quoted wildcards."""
    from pyspark.sql import functions as F

    from geodesk_spark.goql import compile_goql

    df = spark.createDataFrame(
        [
            (1, "node", False, {"amenity": "pub", "local_key": "apple"}, 0, 0),
            (2, "node", False, {"amenity": "bar", "local_key": "banana"}, 0, 0),
            (3, "node", False, {"emergency": "yes"}, 0, 0),
            (4, "way", True, {"maxspeed": "10 mph"}, 0, 0),
            (5, "way", True, {"maxspeed": "50"}, 0, 0),
            (6, "node", False, {"amenity": "restaurant", "cuisine": "greek", "name": "Acropolis"}, 0, 0),
            (7, "node", False, {"amenity": "restaurant", "cuisine": "greek", "name": "Athena"}, 0, 0),
        ],
        "fid long, ftype string, is_area boolean, tags map<string,string>, x int, y int",
    )
    q1 = (
        "na[amenity=pub,bar,cafe,restaurant][local_key != 'banana'],"
        "n[emergency],"
        "wa[maxspeed='*mph'][maxspeed < 35][maxspeed < 4][maxspeed = 10]"
    )
    got1 = {r["fid"] for r in df.filter(compile_goql(q1)).collect()}
    # 1 (pub), 6+7 (restaurant) pass local_key != 'banana' (absent key
    # matches != — reference semantics); 3 (emergency); 2 excluded by !=;
    # 4 is '10 mph': wildcard *mph ∧ <35 ∧ <4 is FALSE (10≥4) — excluded
    assert got1 == {1, 3, 6, 7}
    q2 = "na[amenity=restaurant][cuisine=greek][name='Acro*','Akro*']"
    got2 = {r["fid"] for r in df.filter(compile_goql(q2)).collect()}
    assert got2 == {6}
    # both quote styles are interchangeable (SimpleParser.java:141-142)
    assert {r["fid"] for r in df.filter(compile_goql('n[local_key="banana"]')).collect()} == {
        r["fid"] for r in df.filter(compile_goql("n[local_key='banana']")).collect()
    }
