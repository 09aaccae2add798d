"""Round-6 webtext-pipeline operators: PII scrub (q57), block-level
exact dedup (q58), eval-set decontamination (q59), host PageRank
(q60).

The driver gate (tests/test_probes_duckdb.py + scripts/driver_sim.py)
proves Spark==DuckDB on the sf corpora, and the messy-input suite
covers NULL text; this file pins the semantics themselves on
hand-computed fixtures — the complement parity tests can't give
(shared-kernel blindness: a bug mirrored into both engines passes
every parity gate)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cloud_based_web_crawling_indexing_system_spark.functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_count_cols,
    scrub_pii,
)
from cloud_based_web_crawling_indexing_system_spark.plans import probes

# ---------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------

# (input, expected scrub, n_emails, n_ipv4, n_phones) — boundary cases:
# leftmost-first match remainders (<PHONE>567), dotted-quad inside a
# longer quad (<IP>.5), @ without TLD, short +numbers, empty string
_PII_CASES = [
    ("contact user3@example.com from 10.2.3.4 call +12025550123",
     "contact <EMAIL> from <IP> call <PHONE>", 1, 1, 1),
    ("a@b.co x@y 1.2.3.4567 999.1.1.1 +123 +12345678901234567",
     "<EMAIL> x@y 1.2.3.4567 <IP> +123 <PHONE>567", 1, 1, 1),
    ("u.s-er%x+1@mail-host.org end. 10.2.3.4.5 mid+12025550123x",
     "<EMAIL> end. <IP>.5 mid<PHONE>x", 1, 1, 1),
    ("", "", 0, 0, 0),
    ("no pii at all the quick brown fox",
     "no pii at all the quick brown fox", 0, 0, 0),
    ("two a@b.com c@d.net and 1.2.3.4 5.6.7.8",
     "two <EMAIL> <EMAIL> and <IP> <IP>", 2, 2, 0),
]


def test_pii_scrub_expected_and_cross_engine(spark):
    """Spark output equals the hand-written expectation AND DuckDB's
    RE2 output byte-for-byte — the regex patterns live in the
    Java-regex/RE2 common subset by contract."""
    df = spark.createDataFrame([(i, t) for i, (t, *_) in enumerate(_PII_CASES)],
                               "i long, t string")
    counts = pii_count_cols(F.col("t"))
    got = {
        r["i"]: r
        for r in df.select(
            "i", scrub_pii(F.col("t")).alias("s"),
            counts["n_emails"].alias("e"), counts["n_ipv4"].alias("p4"),
            counts["n_phones"].alias("ph"),
        ).collect()
    }
    con = duckdb.connect()
    for i, (t, want, ne, ni, np_) in enumerate(_PII_CASES):
        r = got[i]
        assert r["s"] == want, f"case {i}: {r['s']!r}"
        assert (r["e"], r["p4"], r["ph"]) == (ne, ni, np_), f"case {i}"
        ds, de, di, dp = con.execute(
            """SELECT regexp_replace(regexp_replace(regexp_replace(?, ?,
                 '<EMAIL>', 'g'), ?, '<IP>', 'g'), ?, '<PHONE>', 'g'),
               len(regexp_extract_all(?, ?)),
               len(regexp_extract_all(?, ?)),
               len(regexp_extract_all(?, ?))""",
            [t, EMAIL_RE, IPV4_RE, PHONE_RE, t, EMAIL_RE, t, IPV4_RE, t, PHONE_RE],
        ).fetchone()
        assert ds == want and (de, di, dp) == (ne, ni, np_), f"duckdb case {i}"


# ---------------------------------------------------------------------
# fixture corpus for q58/q59 semantics
# ---------------------------------------------------------------------


def _write_docs(d, rows):
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    docs["n_chars"] = docs["text"].fillna("").str.len()
    pq.write_table(pa.Table.from_pandas(docs), os.path.join(d, "documents.parquet"))
    return d


BLOCK = " ".join(f"w{i}" for i in range(10))  # one exact 10-token block


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chunk_corpus"))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    return _write_docs(d, [
        # doc 0 and 1 share BLOCK (their first block); doc 2 unique;
        # doc 3 repeats BLOCK twice but no OTHER doc -> still dup
        # (cross-doc with 0/1); doc 4 nine tokens (one short block);
        # doc 5 empty
        (0, BLOCK + " " + uniq_a, "en", "s0"),
        (1, BLOCK + " " + uniq_b, "en", "s1"),
        (2, " ".join(f"c{i}" for i in range(25)), "en", "s2"),
        (3, BLOCK + " " + BLOCK, "en", "s3"),
        (4, " ".join(f"d{i}" for i in range(9)), "en", "s4"),
        (5, "", "en", "s5"),
    ])


def test_chunk_dedup_semantics(spark, chunk_dir):
    rows = {
        (r["doc_id"], r["kind"]): r
        for r in probes.registry()["q58_chunk_dedup"](spark, chunk_dir).collect()
    }
    # (n_chunks, n_dup_chunks, dup_permille)
    want = {
        # block route: non-overlapping 10-token paragraphs
        (0, "block"): (2, 1, 500),
        (1, "block"): (2, 1, 500),
        (2, "block"): (3, 0, 0),
        (3, "block"): (2, 2, 1000),
        (4, "block"): (1, 0, 0),
        (5, "block"): (0, 0, 0),
        # window route: stride-1 10-token spans (exact-substring
        # criterion).  20-token docs have 11 windows; only the BLOCK
        # span itself is shared cross-doc — doc 3 (BLOCK twice)
        # carries 2 duplicated instances (offsets 1 and 11); doc 4 is
        # 9 tokens, too short for any window
        (0, "window"): (11, 1, 90),
        (1, "window"): (11, 1, 90),
        (2, "window"): (16, 0, 0),
        (3, "window"): (11, 2, 181),
        (4, "window"): (0, 0, 0),
        (5, "window"): (0, 0, 0),
    }
    got = {k: (r["n_chunks"], r["n_dup_chunks"], r["dup_permille"])
           for k, r in rows.items()}
    assert got == want


@pytest.fixture(scope="module")
def decon_dir(tmp_path_factory):
    # doc 0 is the eval doc (0 % 97 == 0); the probe PLANTS the
    # benchmark sentences itself, so the fixture only controls which
    # ids hit the %13 injection arms:
    #   id 5  -> one sentence (5 % 3 = 2 -> sent 2): 1 overlap
    #   id 8  -> sents 0+1 adjacent: 2 + 7 straddles = 9 overlaps
    #   id 1  -> clean: 0 overlaps
    d = str(tmp_path_factory.mktemp("decon_corpus"))
    # per-doc DISTINCT base text — otherwise the eval doc's ordinary
    # n-grams legitimately contaminate everyone (shared boilerplate is
    # real contamination to this operator, by design)
    return _write_docs(d, [
        (i, " ".join(f"t{i}x{j}" for j in range(12)), "en", "s")
        for i in (0, 1, 5, 8)
    ])


def test_decontam_semantics(spark, decon_dir):
    rows = {
        r["doc_id"]: r
        for r in probes.registry()["q59_decontam"](spark, decon_dir).collect()
    }
    assert sorted(rows) == [1, 5, 8]  # eval doc 0 excluded from output
    assert rows[1]["n_contaminated"] == 0 and not rows[1]["contaminated"]
    assert rows[5]["n_contaminated"] == 1 and rows[5]["contaminated"]
    # sents 0+1 planted adjacently: both 8-gram sentences match, plus
    # the 7 windows straddling them (eval carries the same adjacency)
    assert rows[8]["n_contaminated"] == 9 and rows[8]["contaminated"]


# ---------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_r6_webtext_probe_plan_shapes(spark):
    """- q57: pure per-row Catalyst — zero Exchange, zero Python;
    - q59: the eval n-gram set and the per-doc match counts reach the
      train side as BROADCAST joins (the train corpus is never
      shuffled on the match key)."""
    plan = _plan(probes.registry()["q57_pii_scrub"](spark, SF))
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan

    # r7 final shape: the benchmark-sized eval n-gram set is collected
    # once (a job over the 1/97 eval slice) and broadcast as a Python
    # set; the returned train-side plan is ONE scan + ONE Arrow stage
    # — zero joins, zero corpus-sized aggregates, the only exchange
    # is the doc_id spread for the Python workers
    plan = _plan(probes.registry()["q59_decontam"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("MapInPandas") == 1

    # q61: fixture repartition + final per-doc agg are the only
    # exchanges; encode + record-walk are the two Arrow stages
    plan = _plan(probes.registry()["q61_warc_roundtrip"](spark, SF))
    assert plan.count("Exchange") <= 2
    assert plan.count("MapInPandas") == 2


# ---------------------------------------------------------------------
# PageRank (q60's kernel)
# ---------------------------------------------------------------------

from cloud_based_web_crawling_indexing_system_spark.functions.graph import (  # noqa: E402
    pagerank_scaled,
    pagerank_scaled_reference,
)

# cycle + hub + dangling leaf + multi-edge: every structural case the
# integer recurrence must handle
_PR_EDGES = [
    ("a", "b"), ("b", "a"), ("c", "a"), ("c", "a"), ("c", "d"),
    ("d", "hub"), ("a", "hub"), ("b", "hub"), ("e", "hub"),
]


def test_pagerank_matches_reference_and_partition_invariant(spark):
    want = pagerank_scaled_reference(_PR_EDGES, iters=4)
    df = spark.createDataFrame(_PR_EDGES, "src string, dst string")
    for nparts in (1, 7):
        got = {
            r["v"]: r["rank"]
            for r in pagerank_scaled(df.repartition(nparts), iters=4).collect()
        }
        assert got == want, f"nparts={nparts}"
    # hub has 4 in-edges and no competition: strictly top-ranked
    assert max(want, key=want.get) == "hub"
    # dangling-as-source-only node e holds exactly the base mass
    assert want["e"] == (15 * 10**12) // 100


def test_pii_regex_parity_randomized(spark):
    """Seeded randomized cross-engine sweep: 300 strings built from
    PII-adjacent fragments (near-miss emails, over-long quads, bare
    +digit runs, juxtapositions) must produce byte-identical scrub
    output and identical match counts in Spark's Java regex and
    DuckDB's RE2 — the strongest practical evidence the patterns sit
    in the dialects' common subset, beyond the hand-picked corpus."""
    import random

    rng = random.Random(4242)
    frags = [
        "a@b.co", "x@y", "@", "user3@example.com", ".com", "a.b", "..",
        "1.2.3.4", "10.0.0.256", "999.999.999.999", "1.2.3.4567",
        "1.2.3", ".1.2.3.4.", "+12025550123", "+123", "+1234567890123456",
        "plus+", "p+1@q.de", " ", "  ", "word", "W0rd-", "%", "_", "-",
        "127.0.0.1:80", "a@b@c.org", "@d.net", "e.f@", "0", "5551234",
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "i long, t string")
    counts = pii_count_cols(F.col("t"))
    srows = {
        r["i"]: (r["s"], r["e"], r["p4"], r["ph"])
        for r in df.select(
            "i", scrub_pii(F.col("t")).alias("s"),
            counts["n_emails"].alias("e"), counts["n_ipv4"].alias("p4"),
            counts["n_phones"].alias("ph"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, ?)" for i in range(len(cases)))
                + ") t(i, t)", cases)
    drows = {
        i: (s, e, p4, ph)
        for i, s, e, p4, ph in con.execute(
            f"""SELECT i,
                regexp_replace(regexp_replace(regexp_replace(t,
                  '{EMAIL_RE}', '<EMAIL>', 'g'),
                  '{IPV4_RE}', '<IP>', 'g'),
                  '{PHONE_RE}', '<PHONE>', 'g'),
                len(regexp_extract_all(t, '{EMAIL_RE}')),
                len(regexp_extract_all(t, '{IPV4_RE}')),
                len(regexp_extract_all(t, '{PHONE_RE}'))
                FROM c""").fetchall()
    }
    for i, t in enumerate(cases):
        assert srows[i] == drows[i], f"case {i}: {t!r}\n spark={srows[i]}\n duck={drows[i]}"


# ---------------------------------------------------------------------
# WARC codec (q61's kernel)
# ---------------------------------------------------------------------

from cloud_based_web_crawling_indexing_system_spark.functions.warc import (  # noqa: E402
    decode_warc,
    encode_warc,
)


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    resp = [("http://a.example/1", b"hello world"),
            ("http://a.example/2", "uni\xe9 body".encode())]
    recs = decode_warc(encode_warc(resp, per_record_gzip=gz))
    assert [r["rec_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert all(r["parsed"] for r in recs)
    got = [(r["url"], r["http_status"], r["body"]) for r in recs[1:]]
    assert got == [(u, 200, b) for u, b in resp]


def test_warc_refuses_dont_guess():
    blob = encode_warc([("http://a/1", b"x" * 50)])
    # truncated mid-record: zero rows, no partial guesses
    assert decode_warc(blob[:60]) == []
    # bad version magic: refuse from the top
    assert decode_warc(blob.replace(b"WARC/1.0", b"WARX/1.0", 1)) == []
    # forged HTTP Content-Length (first occurrence is the HTTP one —
    # the WARC-level length is larger): the record walk continues but
    # THAT record is parsed=False with no body guess
    recs = decode_warc(blob.replace(b"Content-Length: 50", b"Content-Length: 49", 1))
    assert [(r["rec_type"], r["parsed"]) for r in recs] == [
        ("warcinfo", True), ("response", False)]
    assert recs[1]["body"] is None
    # corrupt gzip member: refuse the whole blob
    gzblob = encode_warc([("http://a/1", b"x")], per_record_gzip=True)
    assert decode_warc(gzblob[:-5] + b"\x00" * 5) == []
    # payload that EMBEDS a fake record separator + version line must
    # not split the walk (records advance by declared length only)
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    recs = decode_warc(encode_warc([("http://a/1", evil)]))
    assert [r["rec_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["body"] == evil


def test_warc_archive_sink_roundtrip_and_idempotence(spark, tmp_path):
    """S5 raw-page archive sink: write a (url, html) corpus as
    per-partition .warc.gz, read every file back with the real
    decoder, and require exact (url, body) set equality; a second
    write (the task-retry scenario) must produce byte-identical
    files."""
    import glob
    import hashlib
    import json

    from cloud_based_web_crawling_indexing_system_spark.functions.warc import (
        decode_warc,
        write_warc_archive,
    )

    rows = [(f"http://h{i % 5}.example/p/{i}", f"<html>{i}</html>".encode())
            for i in range(57)]
    df = spark.createDataFrame(rows, "url string, html binary").repartition(4, "url")
    out = str(tmp_path / "archive")
    manifest = write_warc_archive(df, out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    files = sorted(glob.glob(os.path.join(out, "part-*.warc.gz")))
    assert [m["file"] for m in manifest] == [os.path.basename(f) for f in files]
    got = []
    for f in files:
        recs = decode_warc(open(f, "rb").read())
        assert all(r["parsed"] for r in recs)
        assert recs[0]["rec_type"] == "warcinfo"
        got += [(r["url"], r["body"]) for r in recs if r["rec_type"] == "response"]
    assert sorted(got) == sorted(rows)
    assert sum(m["n_records"] for m in manifest) == len(rows)
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == manifest

    md5s = {f: hashlib.md5(open(f, "rb").read()).hexdigest() for f in files}
    write_warc_archive(df, out)  # retry/rewrite: idempotent bytes
    for f in files:
        assert hashlib.md5(open(f, "rb").read()).hexdigest() == md5s[f]


def test_pagerank_damped_contraction():
    """No exact integer fixpoint exists on cyclic graphs (the cycle
    sustains a bounded oscillation that shrinks geometrically with
    the 0.85 damping), so the convergence contract is CONTRACTION,
    not equality: the iterate-to-iterate gap at round 60 is both an
    order of magnitude under the round-20 gap and under 1e-6 of the
    scale — what a production run relies on when choosing the
    iteration count."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "a"), ("e", "a")]
    scale = 10**12

    def gap(k):
        a = pagerank_scaled_reference(edges, iters=k, scale=scale)
        b = pagerank_scaled_reference(edges, iters=k + 1, scale=scale)
        return max(abs(a[v] - b[v]) for v in a), b

    g20, _ = gap(20)
    g60, r = gap(60)
    assert g60 < g20 / 10
    assert g60 < scale // 1_000_000
    # total mass is bounded by n*scale (damping leaks via dangling
    # truncation, never grows)
    assert sum(r.values()) <= len(r) * scale


def test_chunk_dup_pairs_feed_cc_clustering(spark, chunk_dir):
    """End-to-end composition: q58's duplicated-chunk relation ->
    star edges -> hash-min connected components = the sub-document
    dedup CLUSTER pipeline.  On the chunk fixture, docs 0/1/3 share
    BLOCK-derived chunks (one cluster, survivor = min doc_id = 0);
    docs 2/4/5 stay singletons."""
    from cloud_based_web_crawling_indexing_system_spark.functions.graph import (
        connected_components,
        star_edges,
    )
    from cloud_based_web_crawling_indexing_system_spark.functions.text_ops import (
        tokens,
    )

    d = (
        spark.read.parquet(os.path.join(chunk_dir, "documents.parquet"))
        .withColumn("t", tokens("text"))
        .select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(0, CAST((size(t) + 9) div 10 AS INT) - 1),"
                " i -> array_join(slice(t, 10*i+1, 10), ' '))"
            )).alias("chunk"),
        )
        .select("doc_id", F.md5(F.encode("chunk", "utf-8")).alias("h"))
    )
    edges = star_edges(d, "h", "doc_id")
    lbl = connected_components(edges, iters=4)
    got = {r["v"]: r["lbl"] for r in lbl.collect()}
    assert got[0] == got[1] == got[3] == 0  # the shared-BLOCK cluster
    # singletons never enter the edge relation (star edges only link
    # docs that share a chunk) — absent from labels = own cluster
    assert 2 not in got and 4 not in got and 5 not in got
