"""Round-8 second wave: cohort retention, hourly anomaly, column
profiler, blocked entity resolution, PII scrub, shard shuffle.

Oracles pin the values (parity harness); these tests pin the
semantics against independent pandas/pure-Python recomputation so a
same-wrong-both-sides oracle bug can't hide.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ae_data_integration_spark.catalog import REGISTRY, load_all, resolve
from tests.conftest import SF_SMOKE

load_all()


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[resolve(name)].fn(spark, sf).toPandas()


def _lev(a: str, b: str) -> int:
    """Textbook Wagner-Fischer edit distance (independent check)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# --- er1: blocked linkage ---------------------------------------------------


def test_er1_matches_brute_force_levenshtein(spark):
    got = _run(spark, "er1_name_matches").set_index("c_name")["n_neighbors"]
    names = pd.read_parquet(SF_SMOKE + "/customer.parquet")["c_name"].tolist()
    expected: dict[str, int] = {}
    for i, a in enumerate(names):
        n = sum(1 for j, b in enumerate(names) if i != j and _lev(a, b) <= 1)
        if n:
            expected[a] = n
    assert dict(got) == expected
    assert len(expected) > 0, "digit-suffix names have distance-1 pairs by construction"


# --- e8: cohort retention ---------------------------------------------------


def test_e8_cohort_matches_pandas(spark):
    got = _run(spark, "e8_cohort_retention")
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    week_us = 604_800_000_000
    ev["week"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000 // week_us
    uw = ev[["user_id", "week"]].drop_duplicates()
    first = uw.groupby("user_id")["week"].min().rename("cohort_week")
    j = uw.join(first, on="user_id")
    j["week_offset"] = j["week"] - j["cohort_week"]
    exp = (
        j.groupby(["cohort_week", "week_offset"])
        .size()
        .rename("n_active_users")
        .reset_index()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_dtype=False
    )
    # offset-0 cell of each cohort counts the whole cohort
    sizes = first.value_counts()
    for cw, n in sizes.items():
        cell = got[(got.cohort_week == cw) & (got.week_offset == 0)]
        assert int(cell.n_active_users.iloc[0]) == int(n)


# --- e9: hourly anomaly -----------------------------------------------------


def test_e9_zscores_match_pandas(spark):
    got = _run(spark, "e9_hourly_anomaly")
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev["hour"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000 // 3_600_000_000
    hourly = ev.groupby(["hour", "event_type"]).size().rename("n").reset_index()
    out = []
    for et, grp in hourly.groupby("event_type"):
        mu, sd = grp["n"].mean(), grp["n"].std(ddof=0)
        z = (grp["n"] - mu) / sd
        flagged = grp[np.abs(z) > 2.0]
        for (_, r), zz in zip(flagged.iterrows(), z[np.abs(z) > 2.0]):
            out.append((int(r.hour), et, int(r.n), round(float(zz), 6)))
    exp = sorted(out)
    got_rows = sorted(
        (int(r.hour_bucket), r.event_type, int(r.n_events), float(r.z))
        for r in got.itertuples()
    )
    assert len(got_rows) == len(exp)
    for g, e in zip(got_rows, exp):
        assert g[:3] == e[:3]
        assert abs(g[3] - e[3]) < 1e-6


# --- dq2: profiler ----------------------------------------------------------


def test_dq2_matches_pandas_profile(spark):
    got = _run(spark, "dq2_profile").set_index("col_name")
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        row = got.loc[c]
        s = li[c]
        assert int(row.n_rows) == len(s)
        assert int(row.n_null) == int(s.isna().sum())
        assert int(row.n_distinct) == s.nunique()
        assert row.min_v == s.min()
        assert row.max_v == s.max()
        assert abs(row.mean_v - s.mean()) < 1e-5


# --- t18: PII scrub ---------------------------------------------------------


def test_t18_digit_runs_all_redacted(spark):
    got = _run(spark, "t18_pii_scrub")
    cust = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    # every Customer#<9 digits> name carries a >=6-digit run -> all redacted
    assert int(got.n_rows.sum()) == len(cust)
    assert int(got.n_redacted.sum()) == len(cust)
    # chars_removed = (9 digits - len('[ID]')) per name = 5 per row
    per_name = 9 - len("[ID]")
    assert int(got.chars_removed.sum()) == per_name * len(cust)
    # scrubbed names collapse to one value per segment
    assert (got.n_distinct_scrubbed == 1).all()


def test_t18_patterns_fire_on_synthetic_pii(spark):
    """The email/IP patterns (zero hits on this data) actually work."""
    from ae_data_integration_spark.catalog.text_q import _PII_PATTERNS

    text = "mail a@b.co x 10.0.0.1 y 1234567"
    for pat, repl in _PII_PATTERNS:
        text = re.sub(pat, repl, text)
    assert text == "mail [EMAIL] x [IP] y [ID]"


# --- t19: shard shuffle -----------------------------------------------------


def test_t19_shards_partition_the_corpus(spark):
    got = _run(spark, "t19_shard_shuffle")
    docs = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    assert int(got.n_docs.sum()) == len(docs)
    assert int(got.total_chars.sum()) == int(docs.n_chars.sum())
    assert sorted(got.shard) == list(range(len(got)))  # contiguous ids, no gaps
    # deterministic: per-shard boundary keys are md5 hex, disjoint ranges
    import hashlib

    hx = {
        d: hashlib.md5(f"shard:{d}".encode()).hexdigest()
        for d in docs.doc_id
    }
    shard_of = {d: int(h[:12], 16) % 16 for d, h in hx.items()}
    exp_counts = pd.Series(list(shard_of.values())).value_counts()
    for r in got.itertuples():
        assert int(r.n_docs) == int(exp_counts[r.shard])
        keys = sorted(h for d, h in hx.items() if shard_of[d] == r.shard)
        assert r.first_key == keys[0] and r.last_key == keys[-1]


# --- scd1: SCD2 versioning --------------------------------------------------


def test_scd1_versions_match_pandas(spark):
    got = _run(spark, "scd1_versions")
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    o = o[o.o_custkey % 30 == 0].copy()
    o["from_us"] = o["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1000
    o = o.sort_values(["o_custkey", "from_us", "o_orderkey"])
    o["version"] = o.groupby("o_custkey").cumcount() + 1
    o["effective_to_us"] = o.groupby("o_custkey")["from_us"].shift(-1)
    # current version closes at the high-date sentinel, not NULL — the
    # column must stay non-nullable int64 in every pandas consumer
    from ae_data_integration_spark.catalog.relational_q import _SCD1_OPEN_END_US

    assert str(got["effective_to_us"].dtype) == "int64"
    for r in got.itertuples():
        e = o[(o.o_custkey == r.o_custkey) & (o.version == r.version)].iloc[0]
        assert int(r.effective_from_us) == int(e.from_us)
        if pd.isna(e.effective_to_us):
            assert int(r.effective_to_us) == _SCD1_OPEN_END_US
            assert r.is_current == 1
        else:
            assert int(r.effective_to_us) == int(e.effective_to_us)
            assert r.is_current == 0
        assert r.o_orderpriority == e.o_orderpriority
    assert len(got) == len(o)
    # intervals tile: each key's version n closes exactly where n+1 opens
    for _, g in got.groupby("o_custkey"):
        g = g.sort_values("version")
        assert (g.effective_to_us.iloc[:-1].values
                == g.effective_from_us.iloc[1:].values).all()
        assert g.is_current.iloc[-1] == 1 and (g.is_current.iloc[:-1] == 0).all()


# --- dq3: key-skew report ---------------------------------------------------


def test_dq3_matches_pandas_counts(spark):
    got = _run(spark, "dq3_key_skew").iloc[0]
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    vc = li["l_orderkey"].value_counts()
    assert int(got.n_keys) == len(vc)
    assert int(got.n_rows) == len(li)
    assert int(got.max_cnt) == int(vc.max())
    assert int(got.min_cnt) == int(vc.min())
    assert abs(got.skew_ratio - round(vc.max() * len(vc) / len(li), 6)) < 1e-9
    assert int(got.heaviest_key) == int(min(vc[vc == vc.max()].index))
