"""Messy-input parity for every documents/embeddings probe.

The driver's sf-testdata contains no NULL text, NULL embeddings, or
zero-norm vectors — so a probe whose two engines diverge on those
rows passes every driver round until real data hits it (exactly how
the q42 NULL-text divergence stayed latent, review r4).  This suite
runs each probe's Spark plan AND DuckDB oracle over a corpus made of
the messy rows and compares values, pinning the contract:

- NULL text ≡ '' (tokenizes to nothing) in every text probe;
- NULL and zero-norm embeddings are EXCLUDED from similarity ops
  (cosine undefined) by the shared filter (probes._EMB_CTE / _emb),
  whose DuckDB form must stay MATERIALIZED (the optimizer otherwise
  evaluates the join's cosine below the filter on parquet sources).
"""

import math
import os
import re

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud_based_web_crawling_indexing_system_spark.plans import probes


@pytest.fixture(scope="module")
def messy_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("messy_corpus"))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": ["the cat and the dog", None, "", "数据 网络", "aaa bbb aaa", "x"],
            "lang": ["en", None, "en", "zh", "en", "en"],
            "source": ["web", "web", None, "wiki", "wiki", "web"],
            "n_chars": [19, 0, 0, 5, 11, 1],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), os.path.join(d, "documents.parquet"))
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4, 5],
            "embedding": [
                [0.1] * 64,
                None,  # NULL vector
                [0.0] * 64,  # zero norm
                [1.0] + [0.0] * 63,
                [-0.5] * 64,
                [1.0, None] + [0.0] * 62,  # NULL ELEMENT: DuckDB's
                # list_sum skips NULLs while Spark's aggregate
                # propagates them — both engines must drop this row
            ],
        }
    )
    tb = pa.Table.from_pandas(
        emb,
        schema=pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]),
    )
    pq.write_table(tb, os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def messy_ddb(messy_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{messy_dir}/{t}.parquet'")
    return con


def _doc_probe_names():
    out = []
    for name, sql in probes.oracles().items():
        if re.search(r"\b(documents|embeddings)\b", sql) and not re.search(
            r"\b(lineitem|orders|customer|events|supplier|part|nation|region)\b", sql
        ):
            out.append(name)
    return sorted(out)


def _null_eq(x, y) -> bool:
    xe = None if x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NA else x
    ye = None if y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NA else y
    if isinstance(xe, (int, float)) and isinstance(ye, (int, float)):
        return abs(float(xe) - float(ye)) < 1e-9
    return xe == ye


@pytest.mark.parametrize("name", _doc_probe_names())
def test_probe_matches_oracle_on_messy_corpus(spark, messy_dir, messy_ddb, name):
    sdf = probes.registry()[name](spark, messy_dir).toPandas()
    odf = messy_ddb.execute(probes.oracles()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    o = odf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    assert len(s) == len(o), f"{name}: {len(s)} vs {len(o)} rows"
    for c in cols:
        for i, (x, y) in enumerate(zip(s[c].tolist(), o[c].tolist())):
            assert _null_eq(x, y), f"{name}.{c}[{i}]: spark={x!r} oracle={y!r}"


# ---------------------------------------------------------------------
# events probes: NULL user_id / event_type / value / props — pins that
# GROUP BY-NULL, window, and transition semantics agree across engines
# (Spark and DuckDB have DIFFERENT default NULL ordering in ORDER BY,
# so any probe that lets a nullable column reach a window sort would
# diverge here first)
# ---------------------------------------------------------------------

from datetime import datetime, timedelta


@pytest.fixture(scope="module")
def messy_events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("messy_events"))
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append(
            {
                "event_id": i,
                "ts": base + timedelta(minutes=i * 7),
                "user_id": (i % 5) if i % 11 else None,
                "event_type": ["view", "click", "error", None][i % 4],
                "value": None if i % 7 == 3 else round(0.5 * i, 2),
                "props": None if i % 9 == 4 else '{"k": 1}',
            }
        )
    ev = pd.DataFrame(rows)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(
            ev,
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def messy_events_ddb(messy_events_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{messy_events_dir}/events.parquet'"
    )
    return con


def _event_probe_names():
    return sorted(
        n for n, sql in probes.oracles().items() if re.search(r"\bevents\b", sql)
    )


@pytest.mark.parametrize("name", _event_probe_names())
def test_event_probe_matches_oracle_on_messy_events(
    spark, messy_events_dir, messy_events_ddb, name
):
    sdf = probes.registry()[name](spark, messy_events_dir).toPandas()
    odf = messy_events_ddb.execute(probes.oracles()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    o = odf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    assert len(s) == len(o), f"{name}: {len(s)} vs {len(o)} rows"
    for c in cols:
        for i, (x, y) in enumerate(zip(s[c].tolist(), o[c].tolist())):
            assert _null_eq(x, y), f"{name}.{c}[{i}]: spark={x!r} oracle={y!r}"
