"""Driver-contract conformance: every SQL-backed query in __ray_entry__
must match its DuckDB oracle exactly (row count, schema-sorted values) —
the same comparison the driver performs at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _normalize(obj) -> pd.DataFrame:
    if hasattr(obj, "to_pandas"):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        df = obj.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


SQL_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(ray_session, con, name):
    got = _normalize(entrymod.queries()[name](SF))
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    for col in got.columns:
        g, e = got[col].to_numpy(), exp[col].to_numpy()
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            assert np.allclose(g.astype(float), e.astype(float), atol=0, rtol=0), (
                f"{name}.{col}: float values differ")
        else:
            assert (g.astype(object) == e.astype(object)).all(), (
                f"{name}.{col}: values differ")


def test_rows_only_queries_run(ray_session):
    """Queries without oracles must at least run and return stable rows."""
    qs = entrymod.queries()
    rows_only = [n for n in qs if n not in entrymod.oracle_sql()]
    assert rows_only  # crawl_bfs etc. exist
    for name in rows_only:
        out = qs[name](SF)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) >= 0, name


def test_image_corpus_closed_form(ray_session):
    """The closed-form per-host corpus enumeration equals the original
    level-by-level BFS expansion of SyntheticWeb(256, max_class=3)
    seeds (same multiset of URLs, no dupes)."""
    from frontera_ray.graphs import SyntheticWeb

    web = SyntheticWeb(256, seed=42, max_class=3)
    bfs = list(web.seeds())
    frontier = list(web.seeds())
    for _ in range(3):
        nxt = []
        for u in frontier:
            nxt.extend(web.resolve(link) for link in web.links_of(u))
        bfs.extend(nxt)
        frontier = nxt
    got = [r["url"] for r in
           entrymod._image_url_corpus().take_all()]
    assert len(got) == len(bfs) == 3211
    assert len(set(got)) == len(got)
    assert set(got) == set(bfs)


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    assert ds.count() > 0
    assert "image_id" in ds.schema().names


def test_quantile_sketch_vs_exact(ray_session):
    """The one-pass sketch estimates land within the analytic rank
    bound of DuckDB's exact quantile_disc on the same column."""
    import duckdb

    import __ray_entry__ as em

    got = em.queries()["quantile_sketch"](SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    vals = con.execute(
        "SELECT round(l_extendedprice*100)::BIGINT FROM lineitem "
        "ORDER BY 1").df().iloc[:, 0].to_numpy()
    n = len(vals)
    # slack: n/(2k) per block summary x blocks, plus rounding
    import numpy as np
    slack = int(np.ceil(n / (2 * 1024))) * 32 + 32
    for _, row in got.iterrows():
        target = int(row["q"] * n)
        lo = vals[max(target - slack, 0)]
        hi = vals[min(target + slack, n - 1)]
        assert lo - 100 <= row["est_cents"] <= hi + 100, dict(row)


def test_line_dedup_planted_boilerplate(ray_session, tmp_path):
    """The shipped corpora are single-line unique-text docs, so the
    boilerplate branch of q_line_dedup never fires there; plant real
    cross-doc repeated lines and verify kernel == DuckDB twin with the
    branch actually taken (same-source >=3 rule, cross-source immunity,
    within-doc repeats counted per instance but one vote per doc)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = "subscribe to our newsletter"
    rare = "only two docs share me"
    docs = [
        (0, f"{boiler}\nunique body zero\n{boiler}", "en", "a"),   # repeat in-doc
        (1, f"{boiler}\nunique body one", "en", "a"),
        (2, f"unique body two\n{boiler}\n\n{rare}", "en", "a"),
        (3, f"{boiler}\n{rare}", "en", "b"),                        # other source
        (4, "nothing shared here", "en", "b"),
        (5, f"{rare}\nunique body five", "en", "a"),                # rare: 2 < 3
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = _normalize(entrymod.queries()["line_dedup"](str(tmp_path)))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{tmp_path}/documents.parquet')")
    exp = _normalize(c.execute(entrymod.oracle_sql()["line_dedup"]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) == 6
    for col in got.columns:
        assert (got[col].to_numpy().astype(object)
                == exp[col].to_numpy().astype(object)).all(), col
    by_id = got.set_index("doc_id")
    # boiler line is in docs 0,1,2 of source a (>=3) -> struck there ...
    assert by_id.loc[0, "n_boiler"] == 2      # both in-doc instances struck
    assert by_id.loc[1, "n_boiler"] == 1
    assert by_id.loc[2, "n_boiler"] == 1
    # ... but doc 3 is source b: same text, different source -> kept
    assert by_id.loc[3, "n_boiler"] == 0
    # rare line appears in only 2 docs of source a -> kept everywhere
    assert by_id.loc[5, "n_boiler"] == 0
    assert bool(by_id.loc[0, "flagged"])      # 2/3 lines boiler > 30%


def test_template_3gram_cross_block_exact(ray_session, tmp_path):
    """The hash-partitioned census must merge counts for a gram whose
    instances are scattered across MANY input blocks (the property the
    exchange exists to guarantee): plant a template gram in 64 docs of
    one source spread over the whole id range, with decoy grams that
    are block-local, and check count and share exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for i in range(256):
        if i % 4 == 0:                      # every 4th doc carries it
            txt = f"w{i}a click here now w{i}b"
        else:
            txt = f"w{i}a w{i}b w{i}c w{i}d w{i}e"
        rows.append((i, txt, "en", "s0"))
    rows.append((256, "other source text here", "en", "s1"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"),
                   row_group_size=16)   # many row groups -> many blocks

    got = entrymod.queries()["template_3gram"](str(tmp_path))
    s0 = got[got["source"] == "s0"].iloc[0]
    # 64 docs * 1 instance of 'click here now'; every doc contributes
    # 3 trigrams (5 tokens) -> 256*3 grams for s0
    assert s0["top_gram"] == "click here now"
    assert s0["cnt"] == 64
    assert s0["n_grams"] == 256 * 3
    assert s0["share_ppm"] == 1_000_000 * 64 // (256 * 3)
    s1 = got[got["source"] == "s1"].iloc[0]
    assert s1["cnt"] == 1 and s1["n_grams"] == 2
