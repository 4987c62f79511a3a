"""Unit tests for the ML-evaluation / changepoint / link-prediction
kernels (roc_auc_binary, calibration_table, per_key_cusum,
link_prediction_edges) — brute-force parity on small inputs, including
ties and block splits."""

import numpy as np
import pyarrow as pa
import pytest


def _auc_brute(scores, labels):
    """Midrank Mann-Whitney AUC as exact Fraction-free integers."""
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    num2 = 0
    for p in pos:
        num2 += 2 * int((neg < p).sum()) + int((neg == p).sum())
    return num2, 2 * len(pos) * len(neg)


@pytest.mark.usefixtures("ray_session")
class TestRocAuc:
    def test_matches_brute_with_ties(self):
        import ray

        from frontera_ray.stages.relational import roc_auc_binary

        rng = np.random.RandomState(7)
        s = rng.randint(0, 20, size=500).astype(np.int64)  # heavy ties
        lab = (rng.rand(500) < 0.3).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "s": pa.array(s), "lab": pa.array(lab)})) \
            .repartition(7)  # force multi-block partials
        out = roc_auc_binary(ds, "s", "lab")
        num2, den2 = _auc_brute(s, lab)
        assert out["auc_num2"][0].as_py() == num2
        assert out["auc_den2"][0].as_py() == den2
        assert out["auc_ppm"][0].as_py() == (1_000_000 * num2) // den2

    def test_perfect_separation(self):
        import ray

        from frontera_ray.stages.relational import roc_auc_binary

        s = np.array([1, 2, 3, 10, 11, 12], np.int64)
        lab = np.array([0, 0, 0, 1, 1, 1], np.int64)
        ds = ray.data.from_arrow(pa.table({"s": pa.array(s),
                                           "lab": pa.array(lab)}))
        out = roc_auc_binary(ds, "s", "lab")
        assert out["auc_ppm"][0].as_py() == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestCalibration:
    def test_bins_and_ece_identity(self):
        import ray

        from frontera_ray.stages.relational import calibration_table

        rng = np.random.RandomState(3)
        conf = rng.randint(0, 101, size=400).astype(np.int64)
        lab = (rng.rand(400) < conf / 100.0).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "c": pa.array(conf), "lab": pa.array(lab)})).repartition(5)
        out = calibration_table(ds, "c", "lab", n_bins=10, conf_max=100)
        # brute per-bin
        b = np.minimum(conf // 10, 9)
        for _, row in out.iterrows():
            m = b == row["bin"]
            assert row["n"] == m.sum()
            assert row["n_pos"] == lab[m].sum()
            assert row["conf_sum_c"] == conf[m].sum()
            assert row["acc_ppm"] == (1_000_000 * lab[m].sum()) // m.sum()
        # the telescoped ECE identity: sum over bins of
        # (n_b/N)*|acc-conf| == sum|100*pos - conf_sum| / (100*N)
        lhs = sum(abs(100 * int(r["n_pos"]) - int(r["conf_sum_c"]))
                  for _, r in out.iterrows()) / (100 * len(conf))
        rhs = sum((bm.sum() / len(conf))
                  * abs(lab[bm].mean() - conf[bm].mean() / 100)
                  for bm in (b == i for i in np.unique(b)))
        assert abs(lhs - rhs) < 1e-12


@pytest.mark.usefixtures("ray_session")
class TestCusum:
    def test_matches_brute(self):
        import ray

        from frontera_ray.stages.relational import per_key_cusum

        rng = np.random.RandomState(11)
        n = 300
        key = rng.randint(0, 9, size=n).astype(np.int64)
        order = rng.permutation(n).astype(np.int64)
        # inject a level shift for key 0
        v = rng.randint(-5, 6, size=n).astype(np.int64)
        v[key == 0] += np.where(order[key == 0] > n // 2, 50, 0)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(key), "o": pa.array(order),
            "v": pa.array(v)})).repartition(6)
        out = per_key_cusum(ds, "k", "o", "v").to_pandas() \
            .set_index("k").sort_index()
        for k in np.unique(key):
            m = key == k
            vv = v[m][np.argsort(order[m], kind="stable")]
            nn, tot = len(vv), int(vv.sum())
            pref = np.cumsum(vv)
            i = np.arange(1, nn + 1)
            brute = int(np.abs(nn * pref - i * tot).max())
            row = out.loc[int(k)]
            assert row["n"] == nn
            assert row["total"] == tot
            assert row["cusum_max"] == brute, f"key {k}"

    def test_both_exchanges_agree(self):
        import ray

        from frontera_ray.stages.relational import per_key_cusum

        rng = np.random.RandomState(5)
        t = pa.table({
            "k": pa.array(rng.randint(0, 20, 500).astype(np.int64)),
            "o": pa.array(np.arange(500, dtype=np.int64)),
            "v": pa.array(rng.randint(0, 100, 500).astype(np.int64))})
        ds = ray.data.from_arrow(t).repartition(4)
        a = per_key_cusum(ds, "k", "o", "v", exchange="groups") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        b = per_key_cusum(ds, "k", "o", "v", exchange="hash") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestLinkPrediction:
    def test_matches_brute_sets(self):
        import ray

        from frontera_ray.stages.pagerank import link_prediction_edges

        rng = np.random.RandomState(2)
        n = 40
        # random sparse undirected graph WITH duplicate multi-edges
        src = rng.randint(0, n, size=120).astype(np.int64)
        dst = rng.randint(0, n, size=120).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array(src), "dst": pa.array(dst)})).repartition(4)
        out = link_prediction_edges(ds, n).to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)

        nbrs = {i: set() for i in range(n)}
        for a, b in zip(src, dst):
            nbrs[int(a)].add(int(b))
            nbrs[int(b)].add(int(a))
        edges = sorted({(min(a, b), max(a, b))
                        for a, b in zip(src, dst)})
        assert list(map(tuple, out[["u", "v"]].to_numpy())) == edges
        deg = {i: len(nbrs[i]) for i in range(n)}
        for _, row in out.iterrows():
            u, v = int(row["u"]), int(row["v"])
            common = nbrs[u] & nbrs[v]
            assert row["cn"] == len(common)
            assert row["ra_micro"] == sum(
                1_000_000 // deg[z] for z in common)
            den = deg[u] + deg[v] - len(common)
            assert row["jac_ppm"] == (1_000_000 * len(common)) // den

    def test_triangle_edge(self):
        import ray

        from frontera_ray.stages.pagerank import link_prediction_edges

        # triangle 0-1-2 plus pendant 3 off node 0
        t = pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                      "dst": pa.array([1, 2, 0, 3], pa.int64())})
        out = link_prediction_edges(ray.data.from_arrow(t), 4) \
            .to_pandas().set_index(["u", "v"])
        # edge (1,2): common neighbor 0 with deg 3
        assert out.loc[(1, 2), "cn"] == 1
        assert out.loc[(1, 2), "ra_micro"] == 1_000_000 // 3
        # jac(1,2) = 1 / (2 + 2 - 1)
        assert out.loc[(1, 2), "jac_ppm"] == 1_000_000 // 3
        # pendant edge (0,3): no common neighbors
        assert out.loc[(0, 3), "cn"] == 0
        assert out.loc[(0, 3), "ra_micro"] == 0


@pytest.mark.usefixtures("ray_session")
class TestTwoHopReach:
    def test_matches_brute_bfs(self):
        import ray

        from frontera_ray.stages.pagerank import two_hop_reach

        rng = np.random.RandomState(9)
        n = 30
        src = rng.randint(0, n, size=70).astype(np.int64)
        dst = rng.randint(0, n, size=70).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array(src), "dst": pa.array(dst)})).repartition(3)
        out = two_hop_reach(ds, n).to_pandas().set_index("node")

        nbrs = {i: set() for i in range(n)}
        for a, b in zip(src, dst):
            nbrs[int(a)].add(int(b))
            nbrs[int(b)].add(int(a))
        for v in range(n):
            if not nbrs[v]:
                assert v not in out.index
                continue
            reach = set(nbrs[v])
            for u in nbrs[v]:
                reach |= nbrs[u]
            reach.discard(v)
            assert out.loc[v, "deg"] == len(nbrs[v])
            assert out.loc[v, "reach2"] == len(reach), f"node {v}"

    def test_path_graph(self):
        import ray

        from frontera_ray.stages.pagerank import two_hop_reach

        # path 0-1-2-3-4: reach2(0)={1,2}, reach2(2)={0,1,3,4}
        t = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 3, 4], pa.int64())})
        out = two_hop_reach(ray.data.from_arrow(t), 5) \
            .to_pandas().set_index("node")
        assert out.loc[0, "reach2"] == 2
        assert out.loc[2, "reach2"] == 4
        assert out.loc[4, "reach2"] == 2
