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
