"""Text / image / relational stage unit tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from frontera_ray.payload import fetch_simulated, png_encode
from frontera_ray.stages.images import (
    AudioFeatureStage,
    DecodeStatsStage,
    ResizeStage,
    ValidateStage,
    VideoFrameSampleStage,
    resize_nearest,
)
from frontera_ray.stages.text import (
    langid_table,
    quality_features_table,
    simhash64,
    token_count_table,
)


def _doc_batch():
    return pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "The quick brown fox and the dog.",
            "der hund und die katze das haus ein baum",
            "",
        ], pa.string()),
    })


def test_token_count():
    out = token_count_table(_doc_batch())
    assert out["n_tokens"].to_pylist() == [7, 9, 0]


def test_quality_features():
    out = quality_features_table(_doc_batch())
    assert out["n_punct"].to_pylist()[0] == 1
    assert out["n_upper"].to_pylist()[0] == 1
    s = out["quality_score"].to_pylist()
    assert all(0.0 <= x <= 1.0 for x in s)


def test_langid():
    out = langid_table(_doc_batch())
    assert out["lang_pred"].to_pylist() == ["en", "de", "und"]


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("completely different words entirely here now")
    ha = bin((a ^ b) & (2**64 - 1)).count("1")
    hc = bin((a ^ c) & (2**64 - 1)).count("1")
    assert ha < hc
    assert simhash64("") == 0


def _pages_batch(n=4):
    rows = [fetch_simulated(f"http://host-0000{i}.test/1") for i in range(n)]
    return pa.table({
        "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
        "caption": pa.array([r["caption"] for r in rows], pa.string()),
    })


def test_decode_stats_stage():
    out = DecodeStatsStage()(_pages_batch())
    assert out["decode_ok"].to_pylist() == [True] * 4
    assert all(0 < b < 255 for b in out["brightness"].to_pylist())


def test_decode_stats_flags_unknown_fmt():
    b = _pages_batch(2)
    real_fmt = b["fmt"].to_pylist()[1]
    b = b.set_column(2, "fmt", pa.array(["jpeg", real_fmt], pa.string()))
    out = DecodeStatsStage()(b)
    assert out["decode_ok"].to_pylist() == [False, True]
    with pytest.raises(NotImplementedError):
        DecodeStatsStage(strict=True)(b)


def test_resize_stage():
    out = ResizeStage(8, 8)(_pages_batch())
    assert len(out) == 4
    from frontera_ray.payload import png_decode

    thumb = png_decode(out["thumb"][0].as_py())
    assert thumb.shape == (8, 8, 3)


def test_resize_nearest_exact():
    pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(pix, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (up[::2, ::2] == pix).all()


def test_validate_stage():
    out = ValidateStage()(_pages_batch())
    assert out["pixels_ok"].to_pylist() == [True] * 4
    assert out["caption_ok"].to_pylist() == [True] * 4
    assert all(p >= 40.0 for p in out["psnr"].to_pylist())


def test_gated_stages_raise():
    """Real-world formats (mp3/mp4) stay env-gated: strict mode raises,
    default mode marks decode_ok=False / skips — while the deterministic
    qaud/qvid containers decode for real (covered in test_payload /
    test_queries audio_features+video_motion)."""
    from frontera_ray.payload import qaud_encode, qvid_encode

    ab = pa.table({
        "audio_id": pa.array(["a0", "a1"], pa.string()),
        "bytes": pa.array([b"\x00" * 16,
                           qaud_encode(np.array([1, -2, 3], np.int16))],
                          pa.binary()),
        "fmt": pa.array(["mp3", "qaud"], pa.string()),
    })
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(ab)
    out = AudioFeatureStage()(ab)
    assert out["decode_ok"].to_pylist() == [False, True]
    assert out["n_samples"].to_pylist() == [0, 3]

    frame = np.zeros((2, 2, 3), np.uint8)
    vb = pa.table({
        "video_id": pa.array(["v0", "v1"], pa.string()),
        "bytes": pa.array([b"\x00" * 16, qvid_encode([frame, frame])],
                          pa.binary()),
        "fmt": pa.array(["mp4", "qvid"], pa.string()),
    })
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(strict=True)(vb)
    out = VideoFrameSampleStage(every=1)(vb)
    assert set(out["video_id"].to_pylist()) == {"v1"}  # mp4 skipped
    assert len(out) == 2


def test_broadcast_join_and_topk(ray_session):
    import ray
    from frontera_ray.stages.relational import broadcast_join, global_topk, per_key_topk

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "v": pa.array([10.0, 20.0, 30.0, 40.0])})
    small = pa.table({"k": pa.array([1, 3], pa.int64()),
                      "name": pa.array(["a", "c"], pa.string())})
    ds = ray.data.from_arrow(left)
    out = broadcast_join(ds, small, key="k").to_pandas().sort_values("k")
    assert list(out["k"]) == [1, 3]
    assert list(out["name"]) == ["a", "c"]

    t = pa.table({"k": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([5.0, 9.0, 7.0, 1.0, 3.0]),
                  "id": pa.array([0, 1, 2, 3, 4], pa.int64())})
    ds2 = ray.data.from_arrow(t)
    top = per_key_topk(ds2, "k", "v", k=2, tiebreak="id").to_pandas()
    got = sorted(zip(top["k"], top["v"]))
    assert got == [(1, 7.0), (1, 9.0), (2, 1.0), (2, 3.0)]

    g = global_topk(ds2, "v", k=2, tiebreak="id")
    assert g["v"].to_pylist() == [9.0, 7.0]


def test_sessionize(ray_session):
    import datetime as dt
    import ray
    from frontera_ray.stages.relational import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = []
    for m in (0, 5, 10, 60, 65):  # gap at 60min -> 2 sessions
        rows.append({"user_id": 1, "ts": base + dt.timedelta(minutes=m)})
    rows.append({"user_id": 2, "ts": base})
    ds = ray.data.from_items(rows)
    out = sessionize(ds).to_pandas().sort_values("user_id")
    assert list(out["n_sessions"]) == [2, 1]
    assert list(out["n_events"]) == [5, 1]


def test_equi_join_matches_pandas(ray_session):
    """Large-large shuffle join == pandas inner merge (duplicate keys
    on both sides, keys missing from either side)."""
    import ray
    from frontera_ray.stages.relational import equi_join

    rng = np.random.default_rng(9)
    lt = pa.table({"k": pa.array(rng.integers(0, 20, 200), pa.int64()),
                   "lv": pa.array(np.arange(200), pa.int64())})
    rt = pa.table({"k": pa.array(rng.integers(5, 25, 80), pa.int64()),
                   "rv": pa.array(np.arange(80) * 10, pa.int64())})
    lds = ray.data.from_arrow(lt).repartition(3)
    rds = ray.data.from_arrow(rt).repartition(2)
    out = equi_join(lds, rds, "k", ["lv"], ["rv"]).to_pandas()
    expect = lt.to_pandas().merge(rt.to_pandas(), on="k")
    key = ["k", "lv", "rv"]
    assert (sorted(map(tuple, out[key].values))
            == sorted(map(tuple, expect[key].values)))
    assert len(expect) > 200  # duplicate keys actually fanned out


def test_grouped_quantile_disc(ray_session):
    import ray
    from frontera_ray.stages.relational import grouped_quantile_disc

    rng = np.random.default_rng(3)
    t = pa.table({"k": pa.array(rng.choice(["a", "b"], 500)),
                  "v": pa.array(rng.integers(1, 51, 500).astype("float64"))})
    ds = ray.data.from_arrow(t).repartition(4)
    out = grouped_quantile_disc(ds, "k", "v", 0.5)
    kv = dict(zip(out["k"], out["q50_scaled"]))
    for key in ("a", "b"):
        vals = np.sort(t.filter(pa.compute.equal(t["k"], key))["v"].to_numpy())
        # percentile_disc: value at 1-based position ceil(q*n)
        import math
        assert kv[key] == int(vals[math.ceil(0.5 * len(vals)) - 1])


def test_grouped_count_distinct(ray_session):
    import ray
    from frontera_ray.stages.relational import grouped_count_distinct

    rng = np.random.default_rng(5)
    t = pa.table({"k": pa.array(rng.choice(["x", "y", "z"], 600)),
                  "u": pa.array(rng.integers(0, 40, 600), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    df = t.to_pandas()
    expect = df.groupby("k")["u"].nunique()
    for combine in ("shuffle", "driver"):
        out = grouped_count_distinct(ds, "k", "u", combine=combine)
        for k, n in zip(out["k"], out["n_distinct"]):
            assert n == expect[k], combine


def test_hopping_window_counts(ray_session):
    """Every event lands in exactly window/hop overlapping windows;
    counts match a brute per-event expansion."""
    import datetime as dt
    import ray
    from frontera_ray.stages.relational import hopping_window_counts

    base = dt.datetime(2024, 1, 1)
    rows = [{"ts": base + dt.timedelta(minutes=m), "event_type": "a"}
            for m in (0, 10, 16, 44, 61)]
    ds = ray.data.from_items(rows)
    out = hopping_window_counts(ds, window_s=3600, hop_s=900,
                                keys=("event_type",))
    assert out["n"].sum() == len(rows) * 4  # 4 windows per event
    # event at minute 0 is covered by windows starting -45,-30,-15,0 min
    epoch0 = int(base.timestamp())
    got0 = out[out["window_start"] == epoch0]["n"].iloc[0]
    assert got0 == 4  # minutes 0,10,16,44 all inside [0, 60min)


def test_stratified_hash_sample_deterministic(ray_session):
    import ray
    from frontera_ray.stages.sampling import stratified_hash_sample

    t = pa.table({
        "doc_id": pa.array(range(4000), pa.int64()),
        "lang": pa.array(["en", "de", "fr", "zz"] * 1000),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    kept = [sorted(stratified_hash_sample(
        ds, "doc_id", "lang", {"en": 0.5, "de": 0.25}, 0.1)
        .to_pandas()["doc_id"]) for _ in range(2)]
    assert kept[0] == kept[1] and len(kept[0]) > 0  # pure function of id
    df = stratified_hash_sample(
        ds, "doc_id", "lang", {"en": 0.5, "de": 0.25}, 0.1).to_pandas()
    frac = df.groupby("lang").size() / 1000.0
    assert abs(frac["en"] - 0.5) < 0.08
    assert abs(frac["de"] - 0.25) < 0.07
    assert abs(frac.get("fr", 0) - 0.1) < 0.05


def test_tfidf_top_terms_matches_brute(ray_session):
    import collections
    import math
    import ray
    from frontera_ray.stages.text import tfidf_top_terms

    docs = ["the cat sat", "the the dog", "cat cat cat dog", "bird"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs)})
    out = tfidf_top_terms(ray.data.from_arrow(t), n_docs=4, k=2).to_pandas()
    dfreq = collections.Counter(
        tok for d in docs for tok in set(d.split()))
    for d_id, text in enumerate(docs):
        tf = collections.Counter(text.split())
        scored = sorted(
            ((round(c * math.log(4 / dfreq[tok]) * 1e6), tok)
             for tok, c in tf.items()),
            key=lambda x: (-x[0], x[1]))[:2]
        got = out[out["doc_id"] == d_id].sort_values(
            ["score_micro", "token"], ascending=[False, True])
        assert [(s, tok) for s, tok in scored] == list(
            zip(got["score_micro"], got["token"]))


def test_range_join_matches_brute(ray_session):
    """range_join == brute double loop over every (build, probe) pair:
    same key, probe_ts in [build_ts, build_ts + window], both ends
    inclusive (boundary rows constructed explicitly)."""
    import ray
    from frontera_ray.stages.relational import range_join

    rng = np.random.default_rng(11)
    n = 300
    window = 50 * 1_000_000
    ts = rng.integers(0, 500, n) * 1_000_000
    # force exact-boundary cases: probe at build_ts and at build_ts+window
    ts[10], ts[11], ts[12] = 100_000_000, 100_000_000, 150_000_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(rng.choice(["click", "purchase", "view"], n)),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    t = t.set_column(0, "user_id", pa.array(
        np.where(np.isin(np.arange(n), [10, 11, 12]), 3,
                 t["user_id"].to_numpy()), pa.int64()))
    ds = ray.data.from_arrow(t).repartition(4)
    out = range_join(ds, "user_id", "ts", "event_type", "click",
                     "purchase", window).to_pandas()
    got = sorted(map(tuple, out[["user_id", "build_id", "probe_id"]].values))

    uid = t["user_id"].to_numpy()
    typ = np.asarray(t["event_type"].to_pylist(), dtype=object)
    tsv = t["ts"].cast(pa.int64()).to_numpy()
    expect = sorted(
        (int(uid[b]), b, p)
        for b in range(n) if typ[b] == "click"
        for p in range(n)
        if typ[p] == "purchase" and uid[p] == uid[b]
        and tsv[b] <= tsv[p] <= tsv[b] + window)
    assert got == expect and len(expect) > 0


def test_keyed_ops_exchange_equivalence(ray_session):
    """per_key_topk / sessionize / asof_join / range_join produce
    identical results through both exchanges (the kernel is run-aware
    either way)."""
    import ray
    from frontera_ray.stages.relational import (asof_join_latest,
                                                per_key_topk, range_join,
                                                sessionize)

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(rng.choice(["view", "click", "buy"], n)),
        "ts": pa.array((rng.integers(0, 10**6, n) * 1000000).astype("datetime64[us]")),
        "value": pa.array(np.round(rng.random(n), 3), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)

    def norm(d):
        df = d.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def run_all(exchange):
        return (
            norm(per_key_topk(ds, "user_id", "value", k=3,
                              tiebreak="event_id", exchange=exchange)),
            norm(sessionize(ds, exchange=exchange)),
            norm(asof_join_latest(ds, "user_id", "ts", "event_type",
                                  "click", "view", "value",
                                  exchange=exchange)),
            norm(range_join(ds, "user_id", "ts", "event_type",
                            "click", "buy", 3600 * 1_000_000,
                            exchange=exchange)),
        )

    topk_g, sess_g, asof_g, rj_g = run_all("groups")
    topk_h, sess_h, asof_h, rj_h = run_all("hash")
    assert len(topk_g) and len(sess_g) and len(asof_g) and len(rj_g)
    assert topk_g.equals(topk_h)
    assert sess_g.equals(sess_h)
    assert asof_g.equals(asof_h)
    assert rj_g.equals(rj_h)


def test_keyed_ops_string_keys_hash_exchange():
    """String-keyed sessionize/asof under exchange='hash': repartition
    emits EMPTY blocks whose schema must still carry the string key
    type (the empty-batch paths previously hardcoded int64). Runs in a
    subprocess session (hash-shuffle isolation, see
    test_neardup_exchanges_agree)."""
    import json
    import os
    import subprocess
    import sys

    script = """
import ray, json, pyarrow as pa
ray.init(address="local", num_cpus=4, include_dashboard=False, log_to_driver=False)
from frontera_ray.stages.relational import asof_join_latest, sessionize
users = ["u-a", "u-b", "u-c"]
rows = []
for i in range(30):
    rows.append((users[i % 3], 1_700_000_000_000_000 + i * 60_000_000,
                 "click" if i % 4 else "buy", float(i), i))
t = pa.table({
    "user_id": pa.array([r[0] for r in rows], pa.string()),
    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    "etype": pa.array([r[2] for r in rows], pa.string()),
    "value": pa.array([r[3] for r in rows], pa.float64()),
    "event_id": pa.array([r[4] for r in rows], pa.int64()),
})
ds = ray.data.from_arrow(t)
out = {}
for ex in ("groups", "hash"):
    s = sessionize(ds, exchange=ex)
    a = asof_join_latest(ds, "user_id", "ts", "etype", "click", "buy",
                         "value", exchange=ex)
    st = pa.concat_tables(list(s.iter_batches(batch_format="pyarrow", batch_size=None)))
    at = pa.concat_tables(list(a.iter_batches(batch_format="pyarrow", batch_size=None)))
    out[ex] = {"sess": sorted(map(tuple, zip(st["user_id"].to_pylist(),
                                             st["n_sessions"].to_pylist(),
                                             st["n_events"].to_pylist()))),
               "asof": sorted(map(tuple, zip(at["event_id"].to_pylist(),
                                             at["asof_value"].to_pylist())))}
print("RESULT " + json.dumps(out))
ray.shutdown()
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          text=True, timeout=240, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][0]
    got = json.loads(line[len("RESULT "):])
    assert got["hash"] == got["groups"]
    assert len(got["groups"]["sess"]) == 3


def test_winnow_fingerprints_properties():
    """Winnowing guarantees (Schleimer et al.): selected fingerprints
    are a subset of the doc's gram hashes; any shared substring of at
    least w+k-1 words forces at least one SHARED fingerprint (the
    local-containment property plagiarism detection relies on)."""
    import numpy as np

    from frontera_ray.stages.text import _token_hash64, winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "unrelated prefix words here " + shared
    d2 = shared + " and a completely different ending altogether now"
    f1 = winnow_fingerprints(d1)
    f2 = winnow_fingerprints(d2)
    assert len(set(f1.tolist()) & set(f2.tolist())) >= 1
    # subset-of-gram-hashes
    toks = d1.split()
    grams = {_token_hash64(" ".join(toks[i:i + 3]))
             for i in range(len(toks) - 2)}
    assert set(f1.tolist()) <= grams
    # short docs: one fingerprint (global min); empty: none
    assert len(winnow_fingerprints("one two three four")) == 1
    assert len(winnow_fingerprints("a b")) == 0
    # deterministic
    assert (winnow_fingerprints(d1) == f1).all()


def test_bpe_token_count():
    import pyarrow as pa

    from frontera_ray.stages.text import bpe_token_count_table

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["Hello, world! 42x", ""], pa.string())})
    out = bpe_token_count_table(t)
    # Hello , world ! 42 x -> 6 BPE-ish tokens; 3 whitespace tokens
    assert out["n_ws_tokens"].to_pylist() == [3, 0]
    assert out["n_bpe_tokens"].to_pylist() == [6, 0]


# ---------------------------------------------------------------------------
# semi/anti join, hash split, sequence packing, repetition, redaction,
# decontamination
# ---------------------------------------------------------------------------

def test_semi_anti_join_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from frontera_ray.stages.relational import semi_anti_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 200),
        "payload": rng.integers(0, 1000, 200),
    })
    right = pd.DataFrame({"k": rng.integers(10, 30, 150)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)

    exists = set(right["k"])
    want_semi = left[left["k"].isin(exists)]
    want_anti = left[~left["k"].isin(exists)]

    got_semi = semi_anti_join(lds, rds, "k", ["payload"]).to_pandas()
    got_anti = semi_anti_join(lds, rds, "k", ["payload"],
                              anti=True).to_pandas()
    for got, want in ((got_semi, want_semi), (got_anti, want_anti)):
        g = got.sort_values(["k", "payload"]).reset_index(drop=True)
        w = (want[["k", "payload"]].sort_values(["k", "payload"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_semi_anti_join_null_keys(ray_session):
    """SQL EXISTS semantics: NULL keys never match — semi drops
    NULL-key left rows, anti keeps them; right NULLs are ignored."""
    import ray

    from frontera_ray.stages.relational import semi_anti_join

    left = pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                     "v": pa.array([10, 20, 30, 40], pa.int64())})
    right = pa.table({"k": pa.array([2, None, 5], pa.int64())})
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    semi = semi_anti_join(lds, rds, "k", ["v"]).to_pandas()
    anti = semi_anti_join(lds, rds, "k", ["v"], anti=True).to_pandas()
    assert sorted(semi["v"].tolist()) == [20]
    assert sorted(anti["v"].tolist()) == [10, 30, 40]


def test_hash_split_deterministic_and_exact(ray_session):
    import hashlib

    import ray

    from frontera_ray.stages.sampling import hash_split

    t = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64())})
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(ray.data.from_arrow(t).repartition(5), "doc_id",
                     splits).to_pandas().sort_values("doc_id")
    out2 = hash_split(ray.data.from_arrow(t).repartition(2), "doc_id",
                      splits).to_pandas().sort_values("doc_id")
    # block structure never changes the assignment
    assert out["split"].tolist() == out2["split"].tolist()
    # exact reference: md5 top-32 vs the same rounded cut ladder
    cuts = np.minimum(np.round(np.cumsum([0.8, 0.1, 0.1]) * (1 << 32)),
                      1 << 32).astype(np.uint64)
    names = np.asarray(["train", "val", "test"], dtype=object)
    h = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                  for i in range(1000)], dtype=np.uint64)
    want = names[np.searchsorted(cuts, h, side="right")]
    assert out["split"].tolist() == want.tolist()
    # fractions roughly honored (binomial tolerance)
    frac = (out["split"] == "train").mean()
    assert 0.75 < frac < 0.85


def test_pack_sequences_invariants(ray_session):
    import ray

    from frontera_ray.stages.sampling import pack_sequences

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "n_tokens": pa.array(
            np.concatenate([rng.integers(1, 100, n - 1),
                            [400]]).astype(np.int64), pa.int64()),
    })
    budget = 128
    out = pack_sequences(ray.data.from_arrow(t).repartition(4), "doc_id",
                         "n_tokens", budget=budget,
                         bucket_size=64).to_pandas()
    out8 = pack_sequences(ray.data.from_arrow(t).repartition(8), "doc_id",
                          "n_tokens", budget=budget,
                          bucket_size=64).to_pandas()
    # deterministic w.r.t. block structure
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out8.sort_values("doc_id").reset_index(drop=True)
    assert a["pack_id"].tolist() == b["pack_id"].tolist()
    # every doc packed exactly once
    assert sorted(out["doc_id"].tolist()) == list(range(n))
    # pack sums within budget unless the pack is a single oversize row
    sums = out.groupby("pack_id")["n_tokens"].agg(["sum", "count"])
    bad = sums[(sums["sum"] > budget) & (sums["count"] > 1)]
    assert bad.empty
    # the oversize row is alone in its pack
    heavy_pack = out.loc[out["doc_id"] == n - 1, "pack_id"].iloc[0]
    assert (out["pack_id"] == heavy_pack).sum() == 1
    # packs never span buckets
    assert (out["pack_id"].to_numpy() >> 20
            == out["doc_id"].to_numpy() // 64).all()


def test_compress_ratio_monotone(ray_session):
    """Compressibility gate: repetitive text compresses hardest,
    natural prose in between, near-random noise barely; deterministic
    byte-exact across runs."""
    import ray

    from frontera_ray.stages.text import compress_ratio

    rep = "the same line again and again " * 50
    nat = ("the quick brown fox jumps over the lazy dog while pack "
           "my box with five dozen liquor jugs and vexing wizards ") * 8
    rng = np.random.default_rng(5)
    rnd = "".join(chr(33 + int(x)) for x in rng.integers(0, 90, 1400))
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([rep, nat, rnd], pa.string())})
    out = (compress_ratio(ray.data.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    r = out["ratio_ppm"].tolist()
    assert r[0] < r[1] < r[2]
    # 90-symbol uniform noise is entropy-limited near log2(90)/8 = 81%
    assert r[2] > 800_000
    out2 = (compress_ratio(ray.data.from_arrow(t)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert out.equals(out2)


def test_repetition_table_matches_brute():
    from frontera_ray.stages.text import repetition_table

    texts = [
        "a b c a b c a b c",        # heavy 3-gram repetition
        "x y z w",                   # all distinct
        "",                          # empty
        "one two",                   # fewer than k tokens
        "  pad   pad  pad   ",       # messy whitespace, repeated token
    ]
    t = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = repetition_table(t).to_pandas().set_index("doc_id")
    for i, txt in enumerate(texts):
        toks = txt.split()
        grams = [tuple(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_distinct_tokens"] == len(set(toks))
        assert out.loc[i, "n_grams"] == len(grams)
        assert out.loc[i, "n_distinct_grams"] == len(set(grams))


def test_regex_redact_table():
    from frontera_ray.stages.text import regex_redact_table

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["call 555-0100 x42", "no digits"],
                                   pa.string())})
    out = regex_redact_table(t, "text", r"[0-9]+")
    assert out["redacted"].to_pylist() == ["call #-# x#", "no digits"]
    assert out["n_matched"].to_pylist() == [3, 0]


def test_decontaminate_matches_brute(ray_session):
    import ray

    from frontera_ray.stages.text import (collect_eval_gram_hashes,
                                          decontaminate)

    k = 3
    ev_texts = ["alpha beta gamma delta", "one two three four five"]
    tr_texts = [
        "prefix alpha beta gamma suffix",   # shares 'alpha beta gamma'
        "completely clean document text",   # clean
        "two three",                        # < k tokens: never flagged
        "three four five",                  # shares a gram
    ]
    ev = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(ev_texts, pa.string())}))
    tr = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(tr_texts, pa.string())}))
    ref = ray.put(collect_eval_gram_hashes(ev, k=k))
    out = (decontaminate(tr, ref, k=k).to_pandas()
           .sort_values("doc_id"))
    assert out["contaminated"].tolist() == [1, 0, 0, 1]


def test_semi_anti_join_hash_exchange_agrees():
    """semi_anti_join under exchange='hash' (string md5-like keys) ==
    the sort exchange. Subprocess session — hash-shuffle isolation,
    see test_keyed_ops_string_keys_hash_exchange."""
    import json
    import os
    import subprocess
    import sys

    script = """
import ray, json, pyarrow as pa, numpy as np
ray.init(address="local", num_cpus=4, include_dashboard=False, log_to_driver=False)
from frontera_ray.stages.relational import semi_anti_join
rng = np.random.default_rng(5)
lk = [f"k{int(i):03d}" for i in rng.integers(0, 40, 120)]
rk = [f"k{int(i):03d}" for i in rng.integers(20, 60, 90)]
lt = pa.table({"k": pa.array(lk, pa.string()),
               "v": pa.array(list(range(120)), pa.int64())})
rt = pa.table({"k": pa.array(rk, pa.string())})
lds, rds = ray.data.from_arrow(lt).repartition(3), ray.data.from_arrow(rt).repartition(2)
out = {}
for ex in ("groups", "hash", "tasks"):
    semi = semi_anti_join(lds, rds, "k", ["v"], exchange=ex).to_pandas()
    anti = semi_anti_join(lds, rds, "k", ["v"], anti=True, exchange=ex).to_pandas()
    out[ex] = {"semi": sorted(semi["v"].tolist()), "anti": sorted(anti["v"].tolist())}
print("RESULT " + json.dumps(out))
ray.shutdown()
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          text=True, timeout=240, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][0]
    got = json.loads(line[len("RESULT "):])
    assert got["hash"] == got["groups"]
    assert got["tasks"] == got["groups"]
    assert len(got["groups"]["semi"]) + len(got["groups"]["anti"]) == 120


def test_equi_join_left_outer_matches_pandas(ray_session):
    import pandas as pd
    import ray

    from frontera_ray.stages.relational import equi_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 25, 80),
                         "lv": rng.integers(0, 100, 80)})
    right = pd.DataFrame({"k": rng.integers(15, 40, 60),
                          "rv": rng.integers(0, 100, 60)})
    got = equi_join(ray.data.from_pandas(left).repartition(3),
                    ray.data.from_pandas(right).repartition(2),
                    "k", ["lv"], ["rv"], how="left").to_pandas()
    want = left.merge(right, on="k", how="left")
    g = (got.fillna({"rv": -1}).astype({"rv": "int64"})
         .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    w = (want.fillna({"rv": -1}).astype({"rv": "int64"})
         [["k", "lv", "rv"]].sort_values(["k", "lv", "rv"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("exchange", ["groups", "hash", "tasks"])
def test_equi_join_full_outer(ray_session, exchange):
    """FULL OUTER: matched rows expand, unmatched LEFT rows null-pad
    the right payload, unmatched RIGHT rows null-pad the left payload
    and contribute their own key (COALESCE semantics); NULL keys never
    match but are emitted once from their own side."""
    import ray

    from frontera_ray.stages.relational import equi_join

    left = pa.table({"k": pa.array([1, 1, None, 2, 9], pa.int64()),
                     "lv": pa.array([1, 2, 3, 4, 5], pa.int64())})
    right = pa.table({"k": pa.array([1, None, 3, 2, 2], pa.int64()),
                      "rv": pa.array([10, 20, 30, 40, 50], pa.int64())})
    out = (equi_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     "k", ["lv"], ["rv"], how="full", exchange=exchange)
           .to_pandas())
    got = sorted((-1 if pd.isna(k) else int(k),
                  -1 if pd.isna(l) else int(l),
                  -1 if pd.isna(r) else int(r))
                 for k, l, r in out.itertuples(index=False))
    want = sorted([(1, 1, 10), (1, 2, 10), (-1, 3, -1), (2, 4, 40),
                   (2, 4, 50), (9, 5, -1), (-1, -1, 20), (3, -1, 30)])
    assert got == want


@pytest.mark.parametrize("exchange", ["hash", "tasks"])
def test_equi_join_full_outer_string_keys_hash(ray_session, exchange):
    """String keys (incl. NULLs) on the hash/tasks exchanges — the
    documented paths for object-dtype NULL join keys."""
    import ray

    from frontera_ray.stages.relational import equi_join

    left = pa.table({"k": ["a", "a", None, "b", "x"],
                     "lv": pa.array([1, 2, 3, 4, 5], pa.int64())})
    right = pa.table({"k": ["a", None, "c", "b", "b"],
                      "rv": pa.array([10, 20, 30, 40, 50], pa.int64())})
    out = (equi_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     "k", ["lv"], ["rv"], how="full", exchange=exchange)
           .to_pandas())
    got = sorted(("~" if pd.isna(k) else k,
                  -1 if pd.isna(l) else int(l),
                  -1 if pd.isna(r) else int(r))
                 for k, l, r in out.itertuples(index=False))
    want = sorted([("a", 1, 10), ("a", 2, 10), ("~", 3, -1), ("b", 4, 40),
                   ("b", 4, 50), ("x", 5, -1), ("~", -1, 20),
                   ("c", -1, 30)])
    assert got == want


def test_per_key_rank_row_numbers(ray_session):
    """per_key_rank emits the 1-based rank and drops rank > k, with
    deterministic tie-breaks."""
    import ray

    from frontera_ray.stages.relational import per_key_rank

    t = pa.table({"k": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([5, 9, 9, 3, 7], pa.int64()),
                  "id": pa.array([100, 101, 102, 103, 104], pa.int64())})
    out = (per_key_rank(ray.data.from_arrow(t), "k", "v", 2,
                        descending=True, tiebreak="id").to_pandas()
           .sort_values(["k", "rn"]).reset_index(drop=True))
    assert list(map(tuple, out[["k", "id", "rn"]].itertuples(index=False))) \
        == [(1, 101, 1), (1, 102, 2), (2, 104, 1), (2, 103, 2)]


def test_rollup_from_finest_levels():
    """Rollup grouping sets derived from the finest aggregate: one row
    set per level, additive values re-summed, labels coalesced."""
    from frontera_ray.stages.relational import rollup_from_finest

    fin = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                        "n": [1, 2, 4], "s": [10, 20, 40]})
    out = rollup_from_finest(fin, ["a", "b"], ["n", "s"])
    assert len(out) == 3 + 2 + 1
    sub = out[(out.a == "x") & (out.b == "<all>")]
    assert sub.n.tolist() == [3] and sub.s.tolist() == [30]
    tot = out[(out.a == "<all>") & (out.b == "<all>")]
    assert tot.n.tolist() == [7] and tot.s.tolist() == [70]


def test_gram_count_table_adjacency():
    """Bigrams never cross document boundaries; unigram and bigram
    counts come out of one pass."""
    from frontera_ray.stages.text import gram_count_table

    t = pa.table({"text": pa.array(["a b a", "b a"], pa.string())})
    out = gram_count_table(t)
    got = dict(zip(out["gram"].to_pylist(), out["n"].to_pylist()))
    assert got == {"a": 3, "b": 2, "a b": 1, "b a": 2}


def test_pmi_top_bigrams_matches_brute(ray_session):
    import math
    from collections import Counter

    import ray

    from frontera_ray.stages.text import pmi_top_bigrams

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(80)]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(5)
    got = pmi_top_bigrams(ds, k=10, min_count=3)
    uni = Counter(w for t in texts for w in t.split())
    bi = Counter()
    for t in texts:
        ws = t.split()
        bi.update(zip(ws, ws[1:]))
    n_uni, n_bi = float(sum(uni.values())), float(sum(bi.values()))
    rows = []
    for (w1, w2), n in bi.items():
        if n < 3:
            continue
        x = (n * n_uni * n_uni) / (n_bi * uni[w1] * uni[w2])
        rows.append((w1, w2, n,
                     int(math.floor(math.log(x) * 1e6 + 0.5))))
    want = sorted(rows, key=lambda r: (-r[3], r[0], r[1]))[:10]
    assert list(map(tuple, got[["w1", "w2", "n", "pmi_micro"]]
                    .itertuples(index=False))) == want


def test_per_key_percent_rank_ties(ray_session):
    """RANK tie semantics: equal values share the first rank; a
    single-row partition gets 0."""
    import ray

    from frontera_ray.stages.relational import per_key_percent_rank

    t = pa.table({"k": pa.array([1, 1, 1, 1, 2], pa.int64()),
                  "v": pa.array([5, 5, 7, 9, 3], pa.int64()),
                  "id": pa.array([0, 1, 2, 3, 4], pa.int64())})
    out = (per_key_percent_rank(ray.data.from_arrow(t), "k", "v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    # k=1: ranks 1,1,3,4 over n=4 -> pr = 0, 0, 2/3, 1
    assert out["pr_micro"].tolist() == [0, 0, 666667, 1000000, 0]


@pytest.mark.parametrize("exchange", ["groups", "hash", "tasks"])
def test_set_op_null_as_value(ray_session, exchange):
    """SQL set-op semantics: NULL equals NULL (unlike joins), and
    outputs are DISTINCT."""
    import ray

    from frontera_ray.stages.relational import set_op

    l = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2, 2], pa.int64())}))
    r = ray.data.from_arrow(pa.table({
        "k": pa.array([None, 2], pa.int64())}))
    i = set_op(l, r, "k", "intersect", exchange=exchange).to_pandas()
    x = set_op(l, r, "k", "except", exchange=exchange).to_pandas()
    u = set_op(l, r, "k", "union", exchange=exchange).to_pandas()
    assert sorted(i["k"].fillna(-99).astype(int).tolist()) == [-99, 2]
    assert x["k"].tolist() == [1]
    # UNION: every distinct key from either side once, one NULL row
    assert sorted(u["k"].fillna(-99).astype(int).tolist()) == [-99, 1, 2]
    # right-only keys survive (representative falls back to right)
    u2 = set_op(l, ray.data.from_arrow(pa.table({
        "k": pa.array([7], pa.int64())})), "k", "union",
        exchange=exchange).to_pandas()
    assert sorted(u2["k"].fillna(-99).astype(int).tolist()) == \
        [-99, 1, 2, 7]


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_set_op_all_multiplicities(ray_session, exchange):
    """Bag semantics: INTERSECT ALL emits min(l,r) copies per key
    (NULLs included), EXCEPT ALL emits max(l-r, 0)."""
    import ray

    from frontera_ray.stages.relational import set_op

    l = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, None, None, 2], pa.int64())}))
    r = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64())}))
    i = set_op(l, r, "k", "intersect_all", exchange=exchange).to_pandas()
    x = set_op(l, r, "k", "except_all", exchange=exchange).to_pandas()
    assert sorted(i["k"].fillna(-99).astype(int).tolist()) == [-99, 1]
    assert sorted(x["k"].fillna(-99).astype(int).tolist()) == [-99, 1, 1, 2]


def test_skew_join_zipf_head(ray_session):
    """Hybrid skew join: a Zipf-head key rides the broadcast path,
    the tail rides the exchange — union equals the plain pandas
    inner join exactly, and the detector does surface the hot key."""
    import ray

    from frontera_ray.stages.relational import hot_keys, skew_join

    rng = np.random.default_rng(7)
    # key 0 dominates (5000 rows); 200 tail keys ~ 5 rows each
    lk = np.concatenate([np.zeros(5000, np.int64),
                         rng.integers(1, 201, 1000)])
    lv = rng.integers(0, 100, len(lk)).astype(np.int64)
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "v": pa.array(lv, pa.int64())})
    # right: 0..150 present (tail keys 151..200 unmatched), key 0 has
    # TWO right rows (duplicate-key broadcast path)
    rk = np.concatenate([np.arange(151, dtype=np.int64), [0]])
    rw = np.arange(len(rk), dtype=np.int64) * 10
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "w": pa.array(rw, pa.int64())})

    lds = ray.data.from_arrow(left).repartition(8)
    hot = hot_keys(lds, "k", 1000)
    assert 0 in hot and len(hot) == 1
    out = (skew_join(lds, ray.data.from_arrow(right), "k", ["v"], ["w"],
                     hot_count=1000).to_pandas()
           .sort_values(["k", "v", "w"]).reset_index(drop=True))
    exp = (left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
           .sort_values(["k", "v", "w"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_per_key_lag_delta_runs(ray_session):
    """Run-aware LAG delta: NULL on each key's first row, diffs follow
    (order_col, tiebreak) order within the key."""
    import ray

    from frontera_ray.stages.relational import per_key_lag_delta

    t = pa.table({"k": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([10, 40, 10, 5, 7], pa.int64()),
                  "id": pa.array([0, 1, 2, 3, 4], pa.int64())})
    out = (per_key_lag_delta(ray.data.from_arrow(t), "k", "v",
                             tiebreak="id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    # k=1 sorted by (v,id): ids 0,2,1 -> deltas NULL,0,30; k=2: NULL,2
    got = {int(r.id): (None if pd.isna(r.delta) else int(r.delta))
           for r in out.itertuples()}
    assert got == {0: None, 2: 0, 1: 30, 3: None, 4: 2}


def test_per_key_locf_edges(ray_session):
    """Forward fill: sentinel before a key's first observation, carry
    across nulls, all-null keys stay sentinel, no cross-key leakage
    (an earlier key's observation must not fill a later key)."""
    import ray

    from frontera_ray.stages.relational import per_key_locf

    t = pa.table({"k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                  "o": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
                  "v": pa.array([None, 7, None, None, None, 5],
                                pa.int64())})
    out = (per_key_locf(ray.data.from_arrow(t).repartition(2), "k", "o",
                        "v", sentinel=-1).to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    assert out["filled"].tolist() == [-1, 7, 7, -1, -1, 5]


def test_gap_fill_counts_dense(ray_session):
    """Every window between a key's min and max appears (zeros
    included); counts merge partials across blocks; the dense-rows
    guard trips loudly."""
    import pytest
    import ray

    from frontera_ray.stages.relational import gap_fill_counts

    us = 1_000_000
    t = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                  "ts": pa.array([0 * us, 0 * us, 7200 * us * 1,
                                  3600 * us], pa.timestamp("us"))})
    out = (gap_fill_counts(ray.data.from_arrow(t).repartition(3),
                           "k", "ts", window_s=3600).to_pandas()
           .sort_values(["k", "window_start"]).reset_index(drop=True))
    assert out[out.k == 1]["n"].tolist() == [2, 0, 1]
    assert out[out.k == 1]["window_start"].tolist() == [0, 3600, 7200]
    assert out[out.k == 2]["n"].tolist() == [1]
    with pytest.raises(Exception, match="dense grid"):
        gap_fill_counts(ray.data.from_arrow(t), "k", "ts",
                        window_s=3600, max_dense_rows=2).to_pandas()


def test_aspect_bucket_table_snapping():
    """Nearest log-aspect bucket, ties to the smaller bucket; waste is
    the unused canvas fraction in ppm (0 for an exact bucket hit)."""
    from frontera_ray.stages.images import aspect_bucket_table

    t = pa.table({"image_id": pa.array(["a", "b", "c", "d"]),
                  "w": pa.array([100, 100, 200, 150], pa.int32()),
                  "h": pa.array([100, 200, 100, 100], pa.int32())})
    out = aspect_bucket_table(t)
    got = dict(zip(out["image_id"].to_pylist(),
                   zip(out["bucket_ppm"].to_pylist(),
                       out["waste_ppm"].to_pylist())))
    assert got["a"] == (1_000_000, 0)       # square -> 1.0 exactly
    assert got["b"] == (500_000, 0)         # 0.5 exactly
    assert got["c"] == (2_000_000, 0)       # 2.0 exactly
    # 1.5 is closer to 1.333333 than 2.0 in log space
    bucket, waste = got["d"]
    assert bucket == 1_333_333
    assert waste == round((1 - 1.333333 / 1.5) * 1e6)


def test_interval_merge_kernel(ray_session):
    """Chained overlaps collapse, touching intervals merge, a
    contained interval doesn't extend coverage, and the segment cummax
    never leaks across keys."""
    import ray

    from frontera_ray.stages.relational import interval_merge

    t = pa.table({"k": pa.array([1, 1, 1, 1, 2], pa.int64()),
                  "lo": pa.array([0, 5, 10, 40, 100], pa.int64()),
                  "hi": pa.array([10, 7, 20, 50, 101], pa.int64()),
                  "id": pa.array(range(5), pa.int64())})
    out = (interval_merge(ray.data.from_arrow(t).repartition(2),
                          "k", "lo", "hi", tiebreak="id").to_pandas()
           .sort_values("k").reset_index(drop=True))
    # k=1: [0,10]+[5,7](contained)+[10,20](touching) -> [0,20]; [40,50]
    assert out.loc[0, ["n_intervals", "n_merged", "covered"]].tolist() \
        == [4, 2, 30]
    # k=2 must not see k=1's running max (100 > 50)
    assert out.loc[1, ["n_intervals", "n_merged", "covered"]].tolist() \
        == [1, 1, 1]


def test_new_keyed_kernels_hash_exchange_parity(ray_session):
    """The session's new keyed kernels (locf, windowed dedup, running
    distinct, time-weighted, interval merge) produce identical results
    through the hash exchange and the sort-groupby exchange on a
    many-key random table — the 10^9-key path is the same kernel, so
    parity here is the scale-safety check."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from frontera_ray.stages.relational import (interval_merge,
                                                per_key_locf,
                                                per_key_running_distinct,
                                                per_key_time_weighted,
                                                windowed_dedup)

    rng = np.random.default_rng(11)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.integers(0, 60, n), pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 10_000, n)), pa.int64()),
        "id": pa.array(range(n), pa.int64()),
        "v": pa.array([None if x < 0 else int(x)
                       for x in rng.integers(-3, 50, n)], pa.int64()),
        "cat": pa.array(rng.integers(0, 4, n).astype(str)),
    })

    def runs(op):
        outs = []
        for ex in ("groups", "hash"):
            ds = ray.data.from_arrow(t).repartition(5)
            df = op(ds, ex).to_pandas()
            outs.append(df[sorted(df.columns)]
                        .sort_values(sorted(df.columns))
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    runs(lambda ds, ex: per_key_locf(ds, "k", "ts", "v", tiebreak="id",
                                     exchange=ex))
    runs(lambda ds, ex: windowed_dedup(ds, "k", "ts", window_us=50,
                                       tiebreak="id", exchange=ex))
    runs(lambda ds, ex: per_key_running_distinct(
        ds, "k", "ts", "cat", tiebreak="id", exchange=ex))
    runs(lambda ds, ex: per_key_time_weighted(
        ds.map_batches(lambda b: b.set_column(
            b.schema.get_field_index("v"),
            "v", pc.fill_null(b["v"], 0)), batch_format="pyarrow"),
        "k", "ts", "v", tiebreak="id", gap_scale=1, exchange=ex))
    runs(lambda ds, ex: interval_merge(
        ds.map_batches(lambda b: b.append_column(
            "hi", pc.add(b["ts"], pa.scalar(30, pa.int64()))),
            batch_format="pyarrow"),
        "k", "ts", "hi", tiebreak="id", exchange=ex))


def test_windowed_dedup_ttl(ray_session):
    """Duplicates inside the window drop even when the predecessor was
    itself dropped; a key is legitimate again once the window passes;
    ties keep only the smallest tiebreak."""
    import ray

    from frontera_ray.stages.relational import windowed_dedup

    t = pa.table({"k": pa.array(["a", "a", "a", "a", "b", "b"]),
                  "ts": pa.array([0, 5, 9, 20, 0, 0], pa.int64()),
                  "id": pa.array(range(6), pa.int64())})
    # W=6: a@0 keep, a@5 drop (0 within 6), a@9 drop (5 within 6 even
    # though 5 was dropped), a@20 keep (gap 11); b ties at 0 -> id 4 only
    out = windowed_dedup(ray.data.from_arrow(t).repartition(2),
                         "k", "ts", window_us=6, tiebreak="id").to_pandas()
    assert sorted(out["id"].tolist()) == [0, 3, 4]


def test_transition_counts_pairs(ray_session):
    """Consecutive per-key pairs only — no cross-key pair, counts
    summed globally."""
    import ray

    from frontera_ray.stages.relational import transition_counts

    t = pa.table({"k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                  "ts": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
                  "e": pa.array(["a", "b", "a", "a", "b", "c"]),
                  "id": pa.array(range(6), pa.int64())})
    out = transition_counts(ray.data.from_arrow(t), "k", "ts", "e",
                            tiebreak="id")
    got = {(r.from_val, r.to_val): int(r.n) for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_per_key_ntile_remainder_rule(ray_session):
    """SQL NTILE: the first n % tiles buckets carry the extra row;
    partitions smaller than the tile count give one bucket per row."""
    import ray

    from frontera_ray.stages.relational import per_key_ntile

    t = pa.table({"k": pa.array([1] * 7 + [2] * 2, pa.int64()),
                  "v": pa.array(list(range(7)) + [10, 11], pa.int64()),
                  "id": pa.array(range(9), pa.int64())})
    out = (per_key_ntile(ray.data.from_arrow(t), "k", "v", 3,
                         tiebreak="id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    # k=1: 7 rows into 3 tiles -> sizes 3,2,2; k=2: 2 rows -> tiles 1,2
    assert out["tile"].tolist() == [1, 1, 1, 2, 2, 3, 3, 1, 2]


def test_pivot_counts_partition_invariant(ray_session):
    import ray

    from frontera_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 20, 500)
    vals = rng.choice(["a", "b", "c"], 500)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.string())})
    outs = []
    for parts in (2, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(pivot_counts(ds, "k", "v", ["a", "b", "c"])
                    .to_pandas().sort_values("k").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert int(outs[0][["n_a", "n_b", "n_c"]].to_numpy().sum()) == 500


def test_kmeans_fixed_partition_invariant(ray_session):
    """The Lloyd recurrence is deterministic and block-layout
    independent (rounded distances + rounded re-centering)."""
    import ray

    from frontera_ray.stages.ann import kmeans_fixed

    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in X],
                                        pa.list_(pa.float32()))})
    outs = []
    for parts in (3, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(kmeans_fixed(ds, k=4, iters=2))
    assert outs[0].equals(outs[1])
    assert outs[0]["n"].sum() == 200
    assert (outs[0]["inertia_nano"] > 0).all()


def test_equi_join_left_outer_null_keys(ray_session):
    """NULL keys never match but survive a LEFT join (SQL semantics)."""
    import ray

    from frontera_ray.stages.relational import equi_join

    left = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                     "lv": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"k": pa.array([1, None], pa.int64()),
                      "rv": pa.array([100, 200], pa.int64())})
    out = (equi_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     "k", ["lv"], ["rv"], how="left").to_pandas()
           .sort_values("lv").reset_index(drop=True))
    assert out["lv"].tolist() == [10, 20, 30]
    assert out["rv"].fillna(-1).tolist() == [100, -1, -1]


def test_heavy_hitters_matches_brute(ray_session):
    from collections import Counter

    import ray

    from frontera_ray.stages.text import heavy_hitters

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(50)]
    # Zipf-ish skew so a strict subset passes the threshold
    probs = 1.0 / np.arange(1, 51)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=40, p=probs))
             for _ in range(200)]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(6)
    num, den = 2, 100  # 2% support
    got = heavy_hitters(ds, num, den)
    cnt = Counter(w for t in texts for w in t.split())
    n = sum(cnt.values())
    want = sorted((w, c) for w, c in cnt.items() if c * den >= num * n)
    assert 0 < len(want) < 50
    assert list(map(tuple, got[["token", "cnt"]].itertuples(index=False))) \
        == want


def test_quantile_unbounded_exact_and_skewed(ray_session):
    import ray

    from frontera_ray.stages.relational import quantile_unbounded

    rng = np.random.default_rng(4)
    # continuous values + a massive duplicate run (1/3 of the data is
    # the same value -> its histogram bin exceeds collect_cap and the
    # point-range short-circuit answers it)
    vals = np.concatenate([rng.uniform(0, 1000, 4000),
                           np.full(2000, 123.456)])
    ds = ray.data.from_arrow(pa.table({
        "v": pa.array(vals, pa.float64())})).repartition(5)
    qs = [0.1, 0.25, 0.5, 0.9]
    got = quantile_unbounded(ds, "v", qs, bins=64, collect_cap=100)
    s = np.sort(vals)
    for q in qs:
        want = float(s[int(np.ceil(q * len(s) - 1e-9)) - 1])
        assert got[q] == want, (q, got[q], want)
    # empty input
    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert quantile_unbounded(empty, "v", [0.5]) == {0.5: None}


def test_unigram_logprob_matches_brute(ray_session):
    import ray

    from frontera_ray.stages.text import unigram_logprob

    docs = {
        1: "the the the cat",          # common tokens -> high logprob
        2: "zyx qwv jkl mnb",          # singletons -> low logprob
        3: "the cat sat",
        4: "",                          # zero tokens -> absent from output
        5: "the the",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })).repartition(2)
    got = unigram_logprob(ds, cut_micro=-2_000_000).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute oracle
    from collections import Counter
    tf = {d: Counter(t.split()) for d, t in docs.items() if t.split()}
    corpus = Counter()
    for c in tf.values():
        corpus.update(c)
    total = sum(corpus.values())
    lp = {t: int(np.round(np.log(n / total) * 1e6))
          for t, n in corpus.items()}
    assert list(got["doc_id"]) == sorted(tf)
    for _, row in got.iterrows():
        c = tf[row["doc_id"]]
        n = sum(c.values())
        s = sum(k * lp[t] for t, k in c.items())
        assert row["n_tokens"] == n
        assert row["logprob_micro"] == s
        assert row["keep"] == (s >= n * -2_000_000)
    # the cutoff actually splits: doc 2 dropped, doc 5 kept
    keeps = dict(zip(got["doc_id"], got["keep"]))
    assert not keeps[2] and keeps[5] and keeps[1]


def test_bloom_semi_anti_join_exact_under_false_positives(ray_session):
    import ray

    from frontera_ray.stages.relational import bloom_semi_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 500, 3000).astype(np.int64)
    left = pa.table({
        "k": pa.array(list(lk) + [None, None], pa.int64()),
        "v": pa.array(np.arange(3002), pa.int64())})
    rk = rng.choice(500, 20, replace=False).astype(np.int64)
    right = pa.table({"k": pa.array(list(rk) + [None], pa.int64())})
    lds = ray.data.from_arrow(left).repartition(3)
    rds = ray.data.from_arrow(right).repartition(2)

    match = np.isin(lk, rk)
    # m_bits=64 with 500 distinct keys -> the filter saturates with
    # false positives; the exact confirm must still remove them all
    for m in (64, 1 << 16):
        semi = bloom_semi_join(lds, rds, "k", ["v"], m_bits=m) \
            .to_pandas().sort_values("v")
        assert list(semi["v"]) == list(np.flatnonzero(match))
        anti = bloom_semi_join(lds, rds, "k", ["v"], anti=True, m_bits=m) \
            .to_pandas().sort_values("v")
        # NULL keys never match -> anti keeps them
        assert list(anti["v"]) == sorted(
            list(np.flatnonzero(~match)) + [3000, 3001])


def test_bloom_semi_join_string_keys_and_prefilter_rate(ray_session):
    import ray

    from frontera_ray.stages.relational import (bloom_semi_join,
                                                build_bloom, _key_hash64,
                                                _bloom_positions)

    left = pa.table({"k": pa.array([f"u{i}" for i in range(2000)]),
                     "v": pa.array(np.arange(2000), pa.int64())})
    right = pa.table({"k": pa.array([f"u{i}" for i in range(0, 2000, 100)])})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right)
    out = bloom_semi_join(lds, rds, "k", ["v"], m_bits=1 << 14) \
        .to_pandas().sort_values("v")
    assert list(out["v"]) == list(range(0, 2000, 100))

    # prefilter quality: with 20 keys in 2^14 bits, non-members that
    # pass the bloom (false positives) must be rare (< 2%)
    words = build_bloom(rds, "k", m_bits=1 << 14, k_hashes=5)
    h = _key_hash64(left["k"].combine_chunks())
    hit = np.ones(2000, dtype=bool)
    for pos in _bloom_positions(h, 1 << 14, 5):
        hit &= ((words[(pos >> np.uint64(6)).astype(np.int64)]
                 >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
    assert hit[::100].all()          # no false negatives, ever
    assert hit.sum() <= 20 + 0.02 * 2000


def test_hll_sketch_accuracy_merge_and_branches(ray_session):
    import ray

    from frontera_ray.stages.sketches import (hll_count_distinct,
                                              hll_estimate, hll_merge,
                                              hll_partial, _md5_hash64)

    # raw-branch regime: 120k distinct >> 2.5*m/alpha
    vals = [f"k{i}" for i in range(120_000)] + \
           [f"k{i}" for i in range(5_000)]          # duplicates ignored
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
    est = hll_count_distinct(ds, "v", p=14)
    assert abs(est / 120_000 - 1) < 0.025           # ~3 sigma at p=14

    # linear-counting branch: tiny cardinality is near-exact
    small = ray.data.from_arrow(pa.table({
        "v": pa.array([f"s{i % 200}" for i in range(1000)])}))
    est_small = hll_count_distinct(small, "v", p=14)
    assert abs(est_small - 200) <= 2

    # merge associativity: sketch(A u B) == merge(sketch(A), sketch(B))
    ha = _md5_hash64([f"k{i}" for i in range(0, 60_000)])
    hb = _md5_hash64([f"k{i}" for i in range(40_000, 120_000)])
    merged = hll_merge(np.stack([hll_partial(ha, 14), hll_partial(hb, 14)]))
    whole = hll_partial(np.concatenate([ha, hb]), 14)
    assert (merged == whole).all()
    assert hll_estimate(merged) == hll_estimate(whole)

    # vectorized fast-hash path over an integer column
    ints = ray.data.from_arrow(pa.table({
        "v": pa.array(np.arange(50_000, dtype=np.int64))})).repartition(4)
    est_fast = hll_count_distinct(ints, "v", p=14, hash="fast")
    assert abs(est_fast / 50_000 - 1) < 0.025

    # empty input -> 0 (all registers empty, LC with V == m)
    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    assert hll_count_distinct(empty, "v", p=14) == 0.0


def test_window_scan_runs_and_gaps(ray_session):
    """window_scan: cumsums reset per key, gaps are lag deltas with -1
    on run-firsts, ordering is (ts, id) within key — checked against a
    tiny hand computation across a multi-key block split."""
    import ray

    from frontera_ray.stages.relational import window_scan

    us = 1_000_000
    tbl = pa.table({
        "user_id": pa.array([2, 1, 1, 2, 1], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "ts": pa.array([5 * us, 1 * us, 3 * us, 2 * us, 3 * us],
                       pa.timestamp("us")),
        "value": pa.array([1.00, 0.50, 0.25, 2.00, 0.10], pa.float64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = window_scan(ds).to_pandas().sort_values(
        ["user_id", "event_id"]).reset_index(drop=True)
    # user 1 ordered by ts,id: (11,1s,.50) (12,3s,.25) (14,3s,.10)
    u1 = out[out.user_id == 1].sort_values("run_n")
    assert list(u1.event_id) == [11, 12, 14]
    assert list(u1.run_cents) == [50, 75, 85]
    assert list(u1.gap_us) == [-1, 2 * us, 0]
    # user 2 ordered: (13,2s,2.00) (10,5s,1.00)
    u2 = out[out.user_id == 2].sort_values("run_n")
    assert list(u2.event_id) == [13, 10]
    assert list(u2.run_cents) == [200, 300]
    assert list(u2.gap_us) == [-1, 3 * us]


def test_pagerank_tiny_graph_exact(ray_session):
    """pagerank on a 3-node chain with a dangling sink matches the
    recurrence computed by hand; multi-edges collapse via dedup."""
    import ray

    from frontera_ray.stages.pagerank import pagerank

    # 0->1, 0->2, 1->2 (2 dangling); duplicate 0->1 must not double
    tbl = pa.table({"src": pa.array([0, 0, 1, 0], pa.int64()),
                    "dst": pa.array([1, 2, 2, 1], pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = pagerank(ds, n_nodes=8, iters=3).to_pandas()
    assert list(out.node) == [0, 1, 2]

    r = np.full(3, 1 / 3)
    deg = np.array([2.0, 1.0, 1.0])
    for _ in range(3):
        w = r / deg
        contrib = np.array([0.0, w[0], w[0] + w[1]])
        r = (1 - 0.85) / 3 + 0.85 * contrib
        r[0] = (1 - 0.85) / 3  # no in-edges
    assert np.allclose(out["rank"].to_numpy(), r, atol=1e-12)
    assert abs(out["rank"].sum()) <= 1.0  # leaking variant: mass <= 1


def test_pagerank_empty_graph(ray_session):
    import ray

    from frontera_ray.stages.pagerank import pagerank

    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))
    out = pagerank(empty, n_nodes=4, iters=2)
    assert out.num_rows == 0


def test_pagerank_join_matches_dense(ray_session):
    """The join path (hash-partitioned rank shards, per-iteration keyed
    all-to-all — no O(n_nodes) vector) reproduces the dense path on a
    random multigraph with dangling nodes, including the dedup
    semantics (dense packs (src,dst); join lexsort-dedups in the
    src-partition)."""
    import ray

    from frontera_ray.stages.pagerank import pagerank, pagerank_join

    rng = np.random.default_rng(11)
    n = 400
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n, 3000)

    def mk():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(5)

    dense = pagerank(mk(), n_nodes=n, iters=4).to_pandas()
    joinp = pagerank_join(mk(), iters=4).to_pandas()
    assert list(dense.node) == list(joinp.node)
    assert np.abs(dense["rank"].to_numpy()
                  - joinp["rank"].to_numpy()).max() < 1e-12


def test_hits_join_matches_dense(ray_session, monkeypatch):
    """Join-path HITS (forward authority all-to-all + reverse
    value-fetch along the same static routes) reproduces the dense
    path on a random multigraph — and hits() auto-routes there when
    the claimed node space exceeds the dense ceiling."""
    import ray

    from frontera_ray.stages.pagerank import hits, hits_join

    rng = np.random.default_rng(23)
    n = 300
    src = rng.integers(0, n, 2500)
    dst = rng.integers(0, n, 2500)

    def mk():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(4)

    dense = hits(mk(), n_nodes=n, iters=4).to_pandas()
    joinp = hits_join(mk(), iters=4).to_pandas()
    assert list(dense.node) == list(joinp.node)
    for col in ("hub", "authority"):
        assert np.abs(dense[col].to_numpy()
                      - joinp[col].to_numpy()).max() < 1e-12
    monkeypatch.setenv("PAGERANK_DENSE_MAX_NODES", "100")
    routed = hits(mk(), n_nodes=1_000_000_000, iters=4).to_pandas()
    assert np.abs(dense["hub"].to_numpy()
                  - routed["hub"].to_numpy()).max() < 1e-12


def test_min_label_prop_join_matches_dense(ray_session, monkeypatch):
    """Join-path min-label propagation matches the dense register path
    EXACTLY (integer min — no float drift) at 1 and 4 rounds, and
    min_label_prop() auto-routes there past the dense node ceiling."""
    import ray

    from frontera_ray.stages.pagerank import (min_label_prop,
                                              min_label_prop_join)

    rng = np.random.default_rng(9)
    n = 500
    src = rng.integers(0, n, 1200)
    dst = rng.integers(0, n, 1200)

    def mk():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(4)

    for iters in (1, 4):
        dense = min_label_prop(mk(), n, iters=iters).to_pandas()
        joinp = min_label_prop_join(mk(), iters=iters).to_pandas()
        assert list(dense.node) == list(joinp.node)
        assert (dense["lbl"].to_numpy() == joinp["lbl"].to_numpy()).all()
    dense4 = min_label_prop(mk(), n, iters=4).to_pandas()
    monkeypatch.setenv("PAGERANK_DENSE_MAX_NODES", "100")
    routed = min_label_prop(mk(), 1_000_000_000, iters=4).to_pandas()
    assert (routed["lbl"].to_numpy() == dense4["lbl"].to_numpy()).all()


def test_pagerank_weighted_matches_numpy(ray_session):
    """Weighted join-path PageRank equals a from-scratch numpy
    reference (parallel edges collapse by weight SUM, denominator =
    out-weight), and composes with the sparse PPR restart."""
    import collections

    import ray

    from frontera_ray.stages.pagerank import pagerank_join

    rng = np.random.default_rng(7)
    n = 300
    src = rng.integers(0, n, 2000)
    dst = rng.integers(0, n, 2000)
    w = (1.0 + rng.integers(0, 7, 2000)).astype(np.float64)

    def mk():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "w": pa.array(w, pa.float64())})).repartition(4)

    ew: dict = collections.defaultdict(float)
    for s, d, x in zip(src, dst, w):
        ew[(int(s), int(d))] += x
    es = np.array([k[0] for k in ew])
    ed = np.array([k[1] for k in ew])
    ev = np.array(list(ew.values()))
    present = np.zeros(n, bool)
    present[es] = True
    present[ed] = True
    N = present.sum()
    W = np.zeros(n)
    np.add.at(W, es, ev)

    def ref(r0, base):
        r = r0.copy()
        for _ in range(5):
            contrib = np.zeros(n)
            np.add.at(contrib, ed, r[es] / W[es] * ev)
            r = np.where(present, base + 0.85 * contrib, 0.0)
        return r[np.flatnonzero(present)]

    out = pagerank_join(mk(), iters=5, weight_col="w").to_pandas()
    exp = ref(np.where(present, 1.0 / N, 0.0),
              np.where(present, 0.15 / N, 0.0))
    assert np.abs(out["rank"].to_numpy() - exp).max() < 1e-12

    seeds = [0, 3, 7]
    live = [s for s in seeds if present[s]]
    t = np.zeros(n)
    t[live] = 1.0 / len(live)
    out2 = pagerank_join(mk(), iters=5, weight_col="w",
                         seed_teleport=seeds).to_pandas()
    exp2 = ref(np.where(present, t, 0.0),
               np.where(present, 0.15 * t, 0.0))
    assert np.abs(out2["rank"].to_numpy() - exp2).max() < 1e-12


def test_sssp_rounds_join_matches_reference(ray_session):
    """Bounded-hop weighted shortest paths: k synchronous min-plus
    rounds equal a from-scratch synchronous Bellman-Ford (undirected,
    parallel edges min-collapsed, isolated sources at dist 0)."""
    import ray

    from frontera_ray.stages.pagerank import sssp_rounds_join

    rng = np.random.default_rng(3)
    n = 250
    src = rng.integers(0, 200, 1200)  # nodes 200.. absent
    dst = rng.integers(0, 200, 1200)
    w = (1 + rng.integers(0, 9, 1200)).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "w": pa.array(w, pa.float64())})).repartition(4)
    K = 3
    sources = [0, 5, 240]  # 240 is isolated
    out = sssp_rounds_join(ds, sources, "w", rounds=K).to_pandas()

    INF = float("inf")
    d = np.full(n, INF)
    d[sources] = 0
    for _ in range(K):
        nd = d.copy()
        np.minimum.at(nd, dst, d[src] + w)
        np.minimum.at(nd, src, d[dst] + w)
        d = nd
    present = np.zeros(n, bool)
    present[src] = True
    present[dst] = True
    exp = {i: int(d[i]) for i in range(n)
           if (present[i] or i in sources) and d[i] < INF}
    assert dict(zip(out.node, out.dist)) == exp


def test_connected_components_join_converges(ray_session):
    """Convergence-detecting CC on the join path: pointer-jumping
    shortcuts make a 2000-node chain converge in O(log n) rounds (a
    relax-only loop would need 2000), and an arbitrary random graph
    matches union-find ground truth exactly."""
    import ray

    from frontera_ray.stages.dedup import dedup_keepers_np
    from frontera_ray.stages.pagerank import connected_components_join

    # known small components
    src = np.array([0, 1, 10, 20, 5], dtype=np.int64)
    dst = np.array([1, 2, 11, 20, 6], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    got = dict(zip(*(lambda d: (d.node, d.lbl))(
        connected_components_join(ds).to_pandas())))
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 10: 10, 11: 10, 20: 20}

    # high-diameter chain: must converge well inside the runaway bound
    n = 2000
    ds2 = ray.data.from_arrow(pa.table({
        "src": pa.array(np.arange(n - 1)),
        "dst": pa.array(np.arange(1, n))}))
    out2 = connected_components_join(ds2).to_pandas()
    assert (out2["lbl"] == 0).all() and len(out2) == n

    # random graph vs union-find ground truth
    rng = np.random.default_rng(2)
    s = rng.integers(0, 3000, 2500)
    d = rng.integers(0, 3000, 2500)
    ds3 = ray.data.from_arrow(pa.table({
        "src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())}))
    out3 = connected_components_join(ds3).to_pandas()
    truth = dedup_keepers_np(s, d)
    present = np.unique(np.concatenate([s, d]))
    exp = {int(x): truth.get(int(x), int(x)) for x in present}
    assert dict(zip(out3.node, out3.lbl)) == exp


def test_ppr_join_matches_dense_teleport(ray_session):
    """Sparse seed-list PPR on the join path equals the dense path's
    teleport-vector PPR (uniform over the same seeds), including the
    seeds-absent-from-graph masking."""
    import ray

    from frontera_ray.stages.pagerank import pagerank, pagerank_join

    rng = np.random.default_rng(41)
    n = 400
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n, 3000)

    def mk():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(4)

    tele = np.zeros(n)
    tele[[0, 3, 7, 11]] = 1.0
    dense = pagerank(mk(), n_nodes=n, iters=5, teleport=tele).to_pandas()
    joinp = pagerank_join(mk(), iters=5,
                          seed_teleport=[0, 3, 7, 11]).to_pandas()
    assert list(dense.node) == list(joinp.node)
    assert np.abs(dense["rank"].to_numpy()
                  - joinp["rank"].to_numpy()).max() < 1e-12


def test_bfs_levels_join_matches_dense(ray_session, monkeypatch):
    """Join-path BFS (min-plus twin of the CC join path) matches the
    dense bitset-frontier path EXACTLY — including isolated seeds
    reporting level 0 and the int64 lvl dtype — and bfs_levels()
    auto-routes there past the dense ceiling."""
    import ray

    from frontera_ray.stages.pagerank import bfs_levels, bfs_levels_join

    rng = np.random.default_rng(31)
    n = 600
    src = rng.integers(0, 350, 1300)  # nodes 350.. absent from graph
    dst = rng.integers(0, 350, 1300)

    def mk():
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(4)

    for seeds, depth in (([0, 5, 500], 3), ([1], 5), ([2, 4], 1)):
        dense = bfs_levels(mk(), n, seeds, max_depth=depth).to_pandas()
        joinp = bfs_levels_join(mk(), seeds, max_depth=depth).to_pandas()
        assert list(dense.node) == list(joinp.node), (seeds, depth)
        assert (dense["lvl"].to_numpy()
                == joinp["lvl"].to_numpy()).all(), (seeds, depth)
        assert str(dense["lvl"].dtype) == str(joinp["lvl"].dtype)
    monkeypatch.setenv("PAGERANK_DENSE_MAX_NODES", "100")
    routed = bfs_levels(mk(), 1_000_000_000, [0, 5],
                        max_depth=3).to_pandas()
    dense2 = bfs_levels_join(mk(), [0, 5], max_depth=3).to_pandas()
    assert (routed["lvl"].to_numpy() == dense2["lvl"].to_numpy()).all()


def test_pagerank_node_space_policy(ray_session, monkeypatch):
    """pagerank() routes through the join path when n_nodes exceeds
    the dense ceiling (PAGERANK_DENSE_MAX_NODES) — the automatic
    escape for URL-graph node universes beyond worker heap — and the
    result is unchanged. A 10^9 claimed node space would allocate an
    8 GB dense vector; the join path never allocates O(n_nodes)."""
    import ray

    from frontera_ray.stages import pagerank as prmod

    tbl = pa.table({"src": pa.array([0, 0, 1], pa.int64()),
                    "dst": pa.array([1, 2, 2], pa.int64())})
    monkeypatch.setenv("PAGERANK_DENSE_MAX_NODES", "100")
    routed = prmod.pagerank(ray.data.from_arrow(tbl),
                            n_nodes=1_000_000_000, iters=3).to_pandas()
    dense = prmod.pagerank(ray.data.from_arrow(tbl), n_nodes=8, iters=3,
                           node_space="dense").to_pandas()
    assert list(routed.node) == list(dense.node)
    assert np.abs(routed["rank"].to_numpy()
                  - dense["rank"].to_numpy()).max() < 1e-12


def test_label_centroids_matches_numpy(ray_session):
    import ray

    from frontera_ray.stages.ann import label_centroids

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 50).astype(np.int32)
    tbl = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = label_centroids(ds, dim=4).to_pandas()
    assert len(out) == 3 * 4
    for lb in range(3):
        want = np.round(
            vecs[labels == lb].astype(np.float64).sum(axis=0)
            / np.float64((labels == lb).sum()), 9)
        got = out[out.label == lb].sort_values("dim")["c"].to_numpy()
        assert np.allclose(got, want, atol=1e-12)


def test_grouped_mode_tiebreak_and_combine(ray_session):
    """grouped_mode sums pair counts across blocks before the argmax
    and breaks count ties toward the lexicographically smaller value."""
    import ray

    from frontera_ray.stages.relational import grouped_mode

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        # key 1: 'b' x2, 'a' x2 -> tie -> 'a'; key 2: 'z' wins 1-1? no:
        # 'y' and 'z' tie -> 'y'
        "v": pa.array(["b", "a", "b", "a", "z", "y"], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = grouped_mode(ds, "k", "v").to_pandas().sort_values("k")
    assert list(out.top_val) == ["a", "y"]
    assert list(out.n) == [2, 1]


def test_cms_overestimates_and_merges(ray_session):
    """CMS estimates are exact for these low-collision counts and the
    distributed build equals a single-block build (additive merge)."""
    import ray

    from frontera_ray.stages.sketches import (cms_build, cms_estimate,
                                              cms_partial)

    texts = ["apple banana apple", "banana cherry", "apple"] * 50
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(5)
    regs = cms_build(ds)
    est = cms_estimate(regs, ["apple", "banana", "cherry", "missing"])
    assert est[0] >= 150 and est[1] >= 100 and est[2] >= 50
    # single-shot build of the same stream must equal the merged build
    import pandas as pd

    vc = pd.Series(" ".join(texts).split()).value_counts()
    whole = cms_partial(vc.index.to_numpy(), vc.to_numpy())
    assert (regs == whole).all()


def test_curate_image_captions_gates(ray_session):
    """Composite curation: exhaustive row coverage, reason precedence,
    gate-by-gate agreement with a driver recompute on the small web."""
    import ray

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.payload import meta_batch_columns
    from frontera_ray.stages.images import (curate_image_captions,
                                            image_keeper_table)

    web = SyntheticWeb(24, seed=42, max_class=3)
    urls = sorted({web.resolve(l) for s in web.seeds()
                   for l in web.links_of(s)} | set(web.seeds()))
    ds = ray.data.from_items([{"url": u} for u in urls]).repartition(3)

    out = curate_image_captions(ds).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    assert len(out) == len(urls)
    assert set(out.reason) <= {"ok", "caption", "dims", "dup", "decode"}
    assert (out.keep == (out.reason == "ok")).all()

    meta = meta_batch_columns(urls)
    side = np.minimum(meta["w"], meta["h"])
    dims_bad = dict(zip(urls, side < 32))
    keep_map = {
        r["image_id"]: r["keeper_image_id"]
        for r in image_keeper_table(ds).to_pandas().to_dict("records")}
    for r in out.itertuples():
        if r.reason == "dims":
            assert dims_bad[r.image_id]
        elif r.reason == "dup":
            assert not dims_bad[r.image_id]
            assert keep_map[r.image_id] != r.image_id
        elif r.reason == "ok":
            assert not dims_bad[r.image_id]
            assert keep_map[r.image_id] == r.image_id

    # caption gate precedence: all corpus captions have 5+ tokens, so
    # raising the threshold fails every row as 'caption' first
    strict = curate_image_captions(ds, min_caption_tokens=99).to_pandas()
    assert (strict.reason == "caption").all() and (~strict.keep).all()


def test_funnel_depth_strict_after(ray_session):
    """Strictly-after funnel: a click AT the first view's timestamp
    does not count; steps can't be satisfied out of order."""
    import ray

    from frontera_ray.stages.relational import funnel_depth

    us = 1_000_000
    rows = [
        # user 1: view@1, click@1 (same ts -> not after), click@3,
        # purchase@2 (before click@3 -> no) => depth 2
        (1, 1, "view"), (1, 1, "click"), (1, 3, "click"),
        (1, 2, "purchase"),
        # user 2: purchase@1, click@2, view@3 => only view counts => 1
        (2, 1, "purchase"), (2, 2, "click"), (2, 3, "view"),
        # user 3: full ordered funnel => 3
        (3, 1, "view"), (3, 2, "click"), (3, 5, "purchase"),
        # user 4: no qualifying events => 0
        (4, 1, "error"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * us for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = funnel_depth(ds).to_pandas().sort_values("user_id")
    assert list(out.depth) == [2, 1, 3, 0]


def test_concat_groups_orders_chunks(ray_session):
    import ray

    from frontera_ray.stages.relational import concat_groups

    tbl = pa.table({
        "k": pa.array([1, 2, 1, 1, 2], pa.int64()),
        "i": pa.array([2, 1, 0, 1, 0], pa.int64()),
        "part": pa.array(["c", "y", "a", "b", "x"], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = concat_groups(ds, "k", "i", "part").to_pandas().sort_values("k")
    assert list(out.text) == ["abc", "xy"]


def test_triangle_count_known_graph(ray_session):
    """K4 plus a pendant vertex: C(4,3)=4 triangles; duplicate and
    cross-batch edges must not change the count (bitwise_or.at path)."""
    import ray

    from frontera_ray.stages.pagerank import dedup_edges, triangle_count

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    src, dst = zip(*(k4 + k4))  # multi-edges collapse in dedup
    tbl = pa.table({"src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64())})
    ds = dedup_edges(ray.data.from_arrow(tbl).repartition(3), n_nodes=8)
    res = triangle_count(ds.materialize(), n_nodes=8)
    assert res == {"n_nodes_seen": 5, "n_edges": 7, "n_triangles": 4}


def test_triangle_count_random_vs_brute(ray_session):
    """Erdos-Renyi graph vs an O(n^3) numpy brute count — exercises
    mask byte boundaries (n not a multiple of 8) and forward-count
    uniqueness (each triangle counted exactly once)."""
    import ray

    from frontera_ray.stages.pagerank import triangle_count

    rng = np.random.default_rng(11)
    n = 37
    m = np.triu(rng.random((n, n)) < 0.25, k=1)
    u, v = np.nonzero(m)
    adj = (m | m.T).astype(np.int64)
    brute = int(np.trace(adj @ adj @ adj)) // 6
    tbl = pa.table({"src": pa.array(u, pa.int64()),
                    "dst": pa.array(v, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(4).materialize()
    res = triangle_count(ds, n_nodes=n)
    assert res["n_triangles"] == brute
    assert res["n_edges"] == len(u)


def test_cooccurrence_edges_groups(ray_session):
    """Items sharing a group pair up (u<v, distinct), across blocks."""
    import ray

    from frontera_ray.stages.pagerank import cooccurrence_edges

    tbl = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "it": pa.array([5, 3, 5, 3, 7, 3, 9], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = cooccurrence_edges(ds, "g", "it", n_nodes=16).to_pandas()
    pairs = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert pairs == [(3, 5), (3, 7)]


def test_node_clustering_vs_brute(ray_session):
    """Per-node lcc matches the O(n^3) dense brute computation on a
    random graph (byte-boundary n, duplicate input edges)."""
    import ray

    from frontera_ray.stages.pagerank import node_clustering

    rng = np.random.default_rng(5)
    n = 21
    m = np.triu(rng.random((n, n)) < 0.3, k=1)
    u, v = np.nonzero(m)
    adj = (m | m.T).astype(np.int64)
    tbl = pa.table({"src": pa.array(np.concatenate((u, u)), pa.int64()),
                    "dst": pa.array(np.concatenate((v, v)), pa.int64())})
    out = node_clustering(
        ray.data.from_arrow(tbl).repartition(3).materialize(),
        n_nodes=n).to_pandas()
    deg = adj.sum(axis=1)
    tri_all = np.diag(adj @ adj @ adj) // 2  # per-node incident triangles
    keep = deg >= 2
    assert list(out["node"]) == list(np.flatnonzero(keep))
    assert (out["deg"].to_numpy() == deg[keep]).all()
    assert (out["tri"].to_numpy() == tri_all[keep]).all()
    expect_lcc = 2 * tri_all[keep] * 1_000_000 // (deg[keep] * (deg[keep] - 1))
    assert (out["lcc_ppm"].to_numpy() == expect_lcc).all()


def test_quantile_sketch_error_bound(ray_session):
    """One-pass sketch quantiles land within the analytic rank-error
    bound (1/(2k) per block summary, summed over blocks) of the exact
    order statistics, on a skewed unbounded domain."""
    import ray

    from frontera_ray.stages.sketches import quantile_sketch

    rng = np.random.default_rng(9)
    vals = np.concatenate([rng.lognormal(3, 2, 40_000),
                           rng.normal(1e6, 10, 1_000)])  # heavy tail
    n_blocks, k = 8, 256
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    ds = ds.repartition(n_blocks)
    got = quantile_sketch(ds, "x", [0.1, 0.5, 0.9, 0.99], k=k)
    s = np.sort(vals)
    n = len(s)
    # total rank slack: n/(2k) per block summary
    slack = int(np.ceil(n_blocks * (n / n_blocks) / (2 * k))) + n_blocks
    for q, est in got.items():
        target = int(q * n)
        lo = s[max(target - slack, 0)]
        hi = s[min(target + slack, n - 1)]
        assert lo <= est <= hi, (q, est, lo, hi)


def test_quantile_sketch_small_block_exact(ray_session):
    """Blocks smaller than k ship every value — the sketch is exact."""
    import ray

    from frontera_ray.stages.sketches import quantile_sketch

    vals = np.arange(1, 101, dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    got = quantile_sketch(ds, "x", [0.25, 0.5, 1.0], k=1024)
    # percentile_disc convention: element at 1-based rank ceil(q*n)
    assert got[0.25] == 25.0 and got[0.5] == 50.0 and got[1.0] == 100.0


def test_quantile_sketch_tree_merge(ray_session):
    """levels=2 inserts the weighted re-summarize pass; estimates stay
    within the (doubled) analytic rank bound of the exact values."""
    import ray

    from frontera_ray.stages.sketches import quantile_sketch

    rng = np.random.default_rng(13)
    vals = rng.exponential(10.0, 30_000)
    n_blocks, k = 16, 256
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    ds = ds.repartition(n_blocks)
    got = quantile_sketch(ds, "x", [0.5, 0.95], k=k, levels=2, fan_in=4)
    s = np.sort(vals)
    n = len(s)
    slack = 2 * (int(np.ceil(n / (2 * k))) + n_blocks)  # two levels
    for q, est in got.items():
        target = int(q * n)
        lo = s[max(target - slack, 0)]
        hi = s[min(target + slack, n - 1)]
        assert lo <= est <= hi, (q, est, lo, hi)


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_dense_rank_matches_pandas(ray_session, exchange):
    """per_key_dense_rank == pandas rank(method='dense', descending)
    on random keys/values with heavy ties."""
    import ray

    from frontera_ray.stages.relational import per_key_dense_rank

    rng = np.random.default_rng(17)
    n = 3000
    keys = rng.integers(0, 12, n)
    vals = rng.integers(0, 9, n)  # heavy ties
    ids = np.arange(n)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64()),
                  "id": pa.array(ids, pa.int64())})
    out = (per_key_dense_rank(ray.data.from_arrow(t).repartition(5),
                              "k", "v", exchange=exchange)
           .to_pandas().sort_values("id").reset_index(drop=True))
    import pandas as pd

    df = pd.DataFrame({"k": keys, "v": vals, "id": ids})
    want = df.groupby("k")["v"].rank(method="dense",
                                     ascending=False).astype(int)
    assert out["drank"].tolist() == want.tolist()


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_validity_intervals_match_pandas(ray_session, exchange):
    """per_key_validity_intervals == pandas groupby shift(-1) on
    random unique (key, ts)."""
    import ray

    from frontera_ray.stages.relational import per_key_validity_intervals

    rng = np.random.default_rng(23)
    n = 2000
    keys = rng.integers(0, 40, n)
    ts = rng.permutation(n * 10)[:n]  # unique timestamps
    ids = np.arange(n)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "id": pa.array(ids, pa.int64())})
    out = (per_key_validity_intervals(
        ray.data.from_arrow(t).repartition(4), "k", "ts", cols=["id"],
        exchange=exchange).to_pandas()
        .sort_values("id").reset_index(drop=True))
    import pandas as pd

    df = pd.DataFrame({"k": keys, "ts": ts, "id": ids}).sort_values(
        ["k", "ts"])
    df["valid_to"] = df.groupby("k")["ts"].shift(-1).fillna(-1).astype(int)
    df = df.sort_values("id").reset_index(drop=True)
    assert out["valid_from"].tolist() == df["ts"].tolist()
    assert out["valid_to"].tolist() == df["valid_to"].tolist()


def test_grouped_moments_exact_vs_numpy(ray_session):
    """grouped_moments numerators equal exact big-int arithmetic over
    the raw values (random keys, values spanning sign and magnitude)."""
    import ray

    from frontera_ray.stages.relational import grouped_moments

    rng = np.random.default_rng(29)
    n = 5000
    keys = rng.choice(list("abcd"), n)
    x = rng.integers(-50, 2000, n)
    y = rng.integers(0, 100, n)
    t = pa.table({"k": pa.array(keys), "x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    out = grouped_moments(ray.data.from_arrow(t).repartition(6),
                          "k", "x", "y").set_index("k")
    for k in "abcd":
        m = keys == k
        xs = [int(v) for v in x[m]]
        ys = [int(v) for v in y[m]]
        nn = len(xs)
        sx, sxx = sum(xs), sum(v * v for v in xs)
        sy, syy = sum(ys), sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        row = out.loc[k]
        assert row["n_rows"] == nn and row["sum_x"] == sx
        assert row["var_x_num"] == nn * sxx - sx * sx
        assert row["var_y_num"] == nn * syy - sy * sy
        assert row["cov_xy_num"] == nn * sxy - sx * sy
        assert row["var_x_ppm"] == (nn * sxx - sx * sx) * 10**6 \
            // (nn * (nn - 1))


def test_json_scalar_i64_edges():
    """Missing keys, malformed JSON and negatives: NULL where absent,
    found mask aligned, no exceptions on garbage rows."""
    from frontera_ray.stages.text import json_scalar_i64

    col = pa.chunked_array([pa.array([
        '{"k": 42}', '{"other": 1}', 'not json at all',
        '{"k": -7, "j": 1}', '', '{"k":  13}',
    ], pa.string())])
    vals, found = json_scalar_i64(col, "k")
    assert found.tolist() == [True, False, False, True, False, True]
    assert vals.to_pylist() == [42, None, None, -7, None, 13]


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_grouped_entropy_vs_scipy_formula(ray_session, exchange):
    """Entropy micro-nats match the direct per-key formula on both
    exchange paths; single-category keys give exactly 0."""
    import ray

    from frontera_ray.stages.relational import grouped_entropy

    rng = np.random.default_rng(7)
    users = rng.integers(0, 40, 3000)
    cats = np.array(list("abcde"))[rng.integers(0, 5, 3000)]
    # user 0: one category only -> entropy exactly 0
    cats[users == 0] = "a"
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(cats, pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    out = grouped_entropy(ds, "user_id", "event_type",
                          exchange=exchange).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    assert len(out) == len(np.unique(users))
    for _, row in out.iterrows():
        m = users == row["user_id"]
        _, cnt = np.unique(cats[m], return_counts=True)
        tot = cnt.sum()
        ent = np.log(tot) - (cnt * np.log(cnt)).sum() / tot
        assert row["n_events"] == tot
        assert row["entropy_micro"] == int(round(ent * 1e6))
    assert out.loc[out["user_id"] == 0, "entropy_micro"].iloc[0] == 0


def test_fixed_histogram_clamps_and_sums(ray_session):
    """Underflow/overflow clamp rows, exact counts, total preserved."""
    import ray

    from frontera_ray.stages.sketches import fixed_histogram

    vals = np.array([-5.0, 0.0, 24.999, 25.0, 49.9, 250.0, 499.9,
                     500.0, 1e9])
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.float64())})).repartition(3)
    out = fixed_histogram(ds, "v", lo=0.0, width=25.0,
                          n_bins=20).to_pandas()
    got = dict(zip(out["bin"], out["n"]))
    assert got == {-1: 1, 0: 2, 1: 2, 10: 1, 19: 1, 20: 2}
    assert out["n"].sum() == len(vals)
    lo = out.set_index("bin")["bin_lo"]
    assert lo.loc[0] == 0.0 and lo.loc[19] == 475.0 and lo.loc[-1] == -25.0


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_interval_overlap_join_vs_brute(ray_session, exchange):
    """Random intervals (some spanning many buckets) against a brute
    O(n^2) oracle: inclusive endpoints, owner-bucket rule emits each
    overlapping pair exactly once on both exchange paths."""
    import ray

    from frontera_ray.stages.relational import interval_overlap_join

    rng = np.random.default_rng(13)
    n = 400
    lo = rng.integers(0, 20_000, n)
    ln = rng.integers(0, 600, n)  # bucket_w=256 -> up to 3+ buckets
    hi = lo + ln
    side = np.where(rng.random(n) < 0.5, "click", "view")
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"event_id": pa.array(ids),
                  "event_type": pa.array(side.astype(object), pa.string()),
                  "lo": pa.array(lo.astype(np.int64)),
                  "hi": pa.array(hi.astype(np.int64))})
    ds = ray.data.from_arrow(t).repartition(5)
    out = interval_overlap_join(ds, "lo", "hi", "event_type",
                                "click", "view", bucket_w=256,
                                exchange=exchange).to_pandas()
    got = sorted(zip(out["a"], out["b"]))
    L = np.flatnonzero(side == "click")
    R = np.flatnonzero(side == "view")
    exp = sorted((int(ids[i]), int(ids[j])) for i in L for j in R
                 if lo[i] <= hi[j] and lo[j] <= hi[i])
    assert got == exp and len(got) == len(set(got))


def test_profile_columns_nulls_and_kinds(ray_session):
    """Null counting, per-kind transforms (value / char length /
    epoch seconds), all-null column gives NaN min/max."""
    import ray

    from frontera_ray.stages.sketches import profile_columns

    t = pa.table({
        "x": pa.array([1.5, None, -2.0, 8.0], pa.float64()),
        "s": pa.array(["ab", "", None, "abcd"], pa.string()),
        "ts": pa.array([1_700_000_000_500_000, None, None,
                        1_700_000_123_999_999], pa.timestamp("us")),
        "z": pa.array([None] * 4, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    out = profile_columns(ds, {"x": "num", "s": "str", "ts": "ts",
                               "z": "num"}).set_index("col")
    assert (out["n_rows"] == 4).all()
    assert out.loc["x", "n_null"] == 1
    assert out.loc["x", "min_v"] == -2.0 and out.loc["x", "max_v"] == 8.0
    assert out.loc["s", "min_v"] == 0 and out.loc["s", "max_v"] == 4
    assert out.loc["ts", "min_v"] == 1_700_000_000
    assert out.loc["ts", "max_v"] == 1_700_000_123
    assert out.loc["z", "n_null"] == 4
    assert np.isnan(out.loc["z", "min_v"])


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_range_sum_peer_ties_vs_duckdb(ray_session, exchange):
    """RANGE-frame peer semantics: ties at the current order value are
    all inside the frame regardless of physical position; random data
    with deliberate collisions matches DuckDB on both exchanges."""
    import duckdb
    import ray

    from frontera_ray.stages.relational import per_key_range_sum

    rng = np.random.default_rng(3)
    n = 600
    key = rng.integers(0, 12, n)
    o = rng.integers(0, 50, n)  # heavy ties
    v = rng.integers(-5, 20, n)
    t = pa.table({"k": pa.array(key, pa.int64()),
                  "o": pa.array(o, pa.int64()),
                  "v": pa.array(v, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)
    out = per_key_range_sum(ds, "k", "o", "v", window=7,
                            exchange=exchange).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute("""
        SELECT rid, sum(v) OVER (PARTITION BY k ORDER BY o
          RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS range_sum
        FROM t ORDER BY rid""").fetchdf()
    assert (out["range_sum"].to_numpy()
            == exp["range_sum"].to_numpy()).all()


def test_span_dedup_edges(ray_session):
    """Corpus span-dedup semantics: a span shared across docs is
    removed from BOTH; a span repeated only WITHIN one doc stays (both
    copies); a doc whose every span is boilerplate drops entirely."""
    import pyarrow as pa
    import ray

    from frontera_ray.stages.text import span_dedup

    w = 3
    boiler = "click here now"          # one 3-token span
    uniq_a = "alpha beta gamma"
    uniq_b = "delta epsilon zeta"
    rep = "eta theta iota"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            f"{uniq_a} {boiler}",          # doc 1: keeps uniq_a only
            f"{boiler} {uniq_b}",          # doc 2: keeps uniq_b only
            f"{rep} {rep}",                # doc 3: within-doc repeat, kept
            boiler,                        # doc 4: all boilerplate -> gone
        ], pa.string()),
    })
    out = span_dedup(ray.data.from_arrow(docs), w=w).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["text_clean"].tolist() == [uniq_a, uniq_b, f"{rep} {rep}"]
    assert out["n_kept"].tolist() == [1, 1, 2]
    assert out["n_dropped"].tolist() == [1, 1, 0]


def test_grouped_higher_moments_numpy_parity(ray_session):
    """The exact-integer skew/kurtosis numerators reduce to the
    textbook population formulas: compare against a direct numpy
    computation on small random groups (micro rounding tolerance 1)."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.relational import grouped_higher_moments

    rng = np.random.default_rng(7)
    keys = np.repeat(["a", "b", "c"], 400)
    vals = np.concatenate([
        rng.integers(1, 50, 400),        # ~uniform
        rng.integers(1, 10, 400) ** 2,   # right-skewed
        np.full(400, 7),                 # zero variance
    ]).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "x": pa.array(vals, pa.int64())})
    out = grouped_higher_moments(
        ray.data.from_arrow(t).repartition(5), "k", "x")
    for _, row in out.iterrows():
        x = vals[keys == row["k"]].astype(np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        if m2 == 0:
            assert row["skew_micro"] == 0 and row["kurt_micro"] == 0
            continue
        skew = ((x - x.mean()) ** 3).mean() / m2 ** 1.5
        kurt = ((x - x.mean()) ** 4).mean() / m2 ** 2 - 3.0
        assert abs(row["skew_micro"] - math.floor(skew * 1e6 + 0.5)) <= 1
        assert abs(row["kurt_micro"] - math.floor(kurt * 1e6 + 0.5)) <= 1


def test_bfs_levels_known_graph(ray_session):
    """Path 0-1-2-3-4-5 plus isolated 6: seeds {0}, max_depth=3 reaches
    exactly nodes 0..3 at their hop counts; a seed outside the graph
    still appears at level 0; multi-edges don't change levels."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.pagerank import bfs_levels

    edges = pa.table({
        "src": pa.array([0, 1, 2, 3, 4, 0], pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 5, 1], pa.int64()),  # 0-1 twice
    })
    ds = ray.data.from_arrow(edges).repartition(3)
    out = bfs_levels(ds, 8, seeds=[0, 7], max_depth=3).to_pandas()
    got = dict(zip(out["node"], out["lvl"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 7: 0}


def test_bfs_levels_matches_brute(ray_session):
    """Random sparse graph: levels equal a driver-side BFS."""
    from collections import deque

    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.pagerank import bfs_levels

    rng = np.random.default_rng(11)
    n = 60
    src = rng.integers(0, n, 150).astype(np.int64)
    dst = rng.integers(0, n, 150).astype(np.int64)
    seeds = [1, 17, 43]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())})).repartition(4)
    out = bfs_levels(ds, n, seeds, max_depth=4).to_pandas()
    got = dict(zip(out["node"], out["lvl"]))

    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
        adj[b].append(a)
    lvl = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if lvl[u] >= 4:
            continue
        for v in adj[u]:
            if v not in lvl:
                lvl[v] = lvl[u] + 1
                q.append(v)
    assert got == lvl


@pytest.mark.parametrize("exchange", ["groups", "hash"])
def test_pair_lift_matches_brute(ray_session, exchange):
    """pair_lift == a brute itertools pair count with exact integer
    support/lift, under both exchanges (combiner partials must merge)."""
    from collections import Counter
    from itertools import combinations

    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.itemsets import pair_lift

    rng = np.random.default_rng(5)
    g = rng.integers(0, 40, 400).astype(np.int64)
    it = rng.integers(0, 12, 400).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g, pa.int64()),
        "i": pa.array(it, pa.int64())})).repartition(5)
    out = pair_lift(ds, "g", "i", 12, min_pair=2,
                    exchange=exchange).to_pandas()

    baskets = {}
    for gg, ii in zip(g, it):
        baskets.setdefault(gg, set()).add(ii)
    nb = len(baskets)
    icnt = Counter(i for s in baskets.values() for i in s)
    pcnt = Counter(p for s in baskets.values()
                   for p in combinations(sorted(s), 2))
    exp = sorted((a, b, c, c * 1_000_000 // nb,
                  c * nb * 1_000_000 // (icnt[a] * icnt[b]))
                 for (a, b), c in pcnt.items() if c >= 2)
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == exp


def test_compaction_plan_matches_numpy(ray_session):
    """Bin assignment equals the driver-side cumsum rule; files sum to
    the corpus and every file except possibly the last reaches target."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.relational import compaction_plan

    rng = np.random.default_rng(3)
    ids = np.arange(500, dtype=np.int64)
    rng.shuffle(ids)
    sizes = rng.integers(10, 900, 500).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "sz": pa.array(sizes, pa.int64())})).repartition(7)
    out = compaction_plan(ds, "id", "sz", target=5000).to_pandas()

    order = np.argsort(ids, kind="stable")
    s = sizes[order]
    prev = np.cumsum(s) - s
    fid = prev // 5000
    exp_n = np.bincount(fid)
    exp_b = np.bincount(fid, weights=s).astype(np.int64)
    assert out["file_id"].tolist() == list(range(len(exp_n)))
    assert out["n_docs"].tolist() == exp_n.tolist()
    assert out["bytes"].tolist() == exp_b.tolist()
    assert out["bytes"].sum() == sizes.sum()
    # each full file reaches the target minus at most one item of
    # carry-over from the previous file's overshoot
    assert (out["bytes"].to_numpy()[:-1] >= 5000 - sizes.max()).all()


def test_zorder_cells_interleave_and_zonemap(ray_session):
    """Morton spread: known interleavings; zone map merges across
    blocks (min/max/count match a driver groupby)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.relational import _spread16, zorder_cells

    assert _spread16(np.array([0b1011], np.int64))[0] == 0b1000101
    x = np.array([0xFFFF], np.int64)
    assert _spread16(x)[0] == 0x55555555

    rng = np.random.default_rng(9)
    xs = rng.integers(0, 1 << 16, 300).astype(np.int64)
    ys = rng.integers(0, 1 << 16, 300).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(xs, pa.int64()),
        "y": pa.array(ys, pa.int64())})).repartition(6)
    out = zorder_cells(ds, "x", "y", cell_shift=26).to_pandas()

    z = _spread16(xs) | (_spread16(ys) << np.uint64(1))
    cell = (z >> np.uint64(26)).astype(np.int64)
    assert out["n"].sum() == 300
    for _, r in out.iterrows():
        m = cell == r["cell"]
        assert r["n"] == int(m.sum())
        assert r["min_x"] == xs[m].min() and r["max_x"] == xs[m].max()
        assert r["min_y"] == ys[m].min() and r["max_y"] == ys[m].max()


def test_largest_remainder_alloc_exact(ray_session):
    """Σalloc == budget exactly; every key gets floor or floor+1; the
    +1s go to the largest remainders (ties to the smaller key)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.relational import largest_remainder_alloc

    rng = np.random.default_rng(21)
    keys = np.arange(37, dtype=np.int64)
    w = rng.integers(1, 1000, 37).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "w": pa.array(w, pa.int64())})).repartition(4)
    out = largest_remainder_alloc(ds, "k", "w", budget=1234).to_pandas()

    W = int(w.sum())
    base = 1234 * w // W
    rem = (1234 * w) % W
    r = 1234 - int(base.sum())
    order = np.lexsort((keys, -rem))
    bonus = np.zeros(37, np.int64)
    bonus[order[:r]] = 1
    assert out["alloc"].sum() == 1234
    assert out["alloc"].tolist() == (base + bonus).tolist()


def test_min_label_prop_iteration_parity(ray_session):
    """On a 12-node path, 4 rounds must NOT converge: labels equal
    exactly 4 synchronous min-over-neighbors∪self steps (not the final
    component minimum) — iteration-count parity with the SQL oracle."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.pagerank import min_label_prop

    n = 12
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())})).repartition(3)
    out = min_label_prop(ds, n, iters=4).to_pandas()

    lbl = np.arange(n, dtype=np.int64)
    for _ in range(4):
        nxt = lbl.copy()
        for u, v in zip(src, dst):
            nxt[v] = min(nxt[v], lbl[u])
            nxt[u] = min(nxt[u], lbl[v])
        lbl = np.minimum(lbl, nxt)
    assert out["node"].tolist() == list(range(n))
    assert out["lbl"].tolist() == lbl.tolist()
    assert out["lbl"].nunique() > 1  # genuinely not converged at 4


def test_hits_tiny_graph_exact(ray_session):
    """HITS on a hand-checkable hub/authority graph matches the
    normalized recurrence computed directly; duplicate edges collapse."""
    import ray

    from frontera_ray.stages.pagerank import hits

    # 0->2, 0->3, 1->2 (node 0 the stronger hub; 2 the stronger
    # authority); duplicate 0->2 must not double-count
    tbl = pa.table({"src": pa.array([0, 0, 1, 0], pa.int64()),
                    "dst": pa.array([2, 3, 2, 2], pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = hits(ds, n_nodes=8, iters=4).to_pandas()
    assert list(out.node) == [0, 1, 2, 3]

    h = np.full(4, 1 / 4)
    a = np.zeros(4)
    adj = [(0, 2), (0, 3), (1, 2)]
    for _ in range(4):
        a = np.zeros(4)
        for s, d in adj:
            a[d] += h[s]
        a = a / a.sum()
        h = np.zeros(4)
        for s, d in adj:
            h[s] += a[d]
        h = h / h.sum()
    assert np.allclose(out["hub"].to_numpy(), h, atol=1e-12)
    assert np.allclose(out["authority"].to_numpy(), a, atol=1e-12)
    # hubs are sources, authorities are sinks
    assert out["hub"][0] > out["hub"][2]
    assert out["authority"][2] > out["authority"][0]


def test_degree_histogram_known(ray_session):
    import ray

    from frontera_ray.stages.pagerank import degree_histogram

    # out: node0 deg2, node1 deg1 -> (1,1),(2,1); in: 2 deg2, 3 deg1
    tbl = pa.table({"src": pa.array([0, 0, 1, 0], pa.int64()),
                    "dst": pa.array([2, 3, 2, 2], pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = degree_histogram(ds, n_nodes=8).to_pandas()
    got = {(r.side, r.deg): r.n_nodes for r in out.itertuples()}
    assert got == {("out", 1): 1, ("out", 2): 1,
                   ("in", 1): 1, ("in", 2): 1}


def test_ks_2sample_matches_brute(ray_session):
    """ks_2sample == the brute pooled-CDF max computed with numpy,
    including duplicate values and block splits."""
    import ray

    from frontera_ray.stages.relational import ks_2sample

    rng = np.random.default_rng(7)
    va = np.round(rng.normal(50, 10, 400), 2)
    vb = np.round(rng.normal(55, 12, 300), 2)
    tbl = pa.table({
        "value": pa.array(np.concatenate([va, vb]), pa.float64()),
        "side": pa.array([0] * 400 + [1] * 300, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = ks_2sample(ds, "value", "side", scale=100).to_pandas()

    ia = np.floor(va * 100 + 0.5).astype(np.int64)
    ib = np.floor(vb * 100 + 0.5).astype(np.int64)
    pooled = np.unique(np.concatenate([ia, ib]))
    ca = np.searchsorted(np.sort(ia), pooled, side="right")
    cb = np.searchsorted(np.sort(ib), pooled, side="right")
    num = int(np.abs(ca * len(ib) - cb * len(ia)).max())
    assert out["n_a"][0] == 400 and out["n_b"][0] == 300
    assert out["ks_num"][0] == num
    assert out["ks_den"][0] == 400 * 300


def test_kmv_jaccard_small_sets_exact(ray_session):
    """When every group's distinct gram count is under k, the KMV
    estimate IS the exact Jaccard (sketch == full set)."""
    import ray

    from frontera_ray.stages.dedup import word_shingles
    from frontera_ray.stages.sketches import kmv_jaccard_pairs

    doc_a = "alpha beta gamma delta epsilon zeta eta theta"
    doc_b = "alpha beta gamma delta epsilon zeta iota kappa"
    tbl = pa.table({
        "source": pa.array(["g1", "g1", "g2"], pa.string()),
        "text": pa.array([doc_a, doc_a, doc_b], pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = kmv_jaccard_pairs(ds, "source", k=128, shingle_k=3).to_pandas()
    assert len(out) == 1

    sa = set(word_shingles(doc_a, 3, strict=True).tolist())
    sb = set(word_shingles(doc_b, 3, strict=True).tolist())
    inter = len(sa & sb)
    union = len(sa | sb)
    row = out.iloc[0]
    assert row.k_eff == union and row.inter == inter
    assert row.jaccard_ppm == (1_000_000 * inter) // union


def test_unimax_epochs_walk_exact(ray_session):
    """unimax_epochs == the hand-computed size-ascending walk: small
    sources cap at max_epochs, leftovers roll to larger sources, and
    the budget is conserved."""
    import ray

    from frontera_ray.stages.sampling import unimax_epochs

    tbl = pa.table({
        "source": pa.array(["a"] * 2 + ["b"] * 2 + ["c"] * 2, pa.string()),
        "w": pa.array([5, 5, 50, 50, 500, 500], pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    # tokens: a=10, b=100, c=1000; budget=600, cap=2 epochs
    out = unimax_epochs(ds, "source", "w", budget=600, max_epochs=2) \
        .to_pandas().set_index("source")
    # walk asc: a: min(600//3, 20)=20; b: min(580//2, 200)=200;
    # c: min(380//1, 2000)=380
    assert out.loc["a", "alloc"] == 20
    assert out.loc["b", "alloc"] == 200
    assert out.loc["c", "alloc"] == 380
    assert out["alloc"].sum() == 600
    assert out.loc["a", "epochs_ppm"] == 2_000_000
    assert out.loc["c", "epochs_ppm"] == 380_000


def test_weighted_quantile_matches_brute(ray_session):
    """weighted_quantile_disc == the brute weighted-rank read-off,
    duplicates and block splits included."""
    import ray

    from frontera_ray.stages.relational import weighted_quantile_disc

    rng = np.random.default_rng(3)
    v = np.round(rng.normal(100, 25, 500), 2)
    w = rng.integers(1, 9, 500).astype(np.float64)
    tbl = pa.table({"val": pa.array(v, pa.float64()),
                    "wt": pa.array(w, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(7)
    out = weighted_quantile_disc(ds, "val", "wt", [250, 500, 900],
                                 scale=100).to_pandas()

    iv = np.floor(v * 100 + 0.5).astype(np.int64)
    iw = w.astype(np.int64)
    order = np.argsort(iv, kind="stable")
    sv, sw = iv[order], iw[order]
    # collapse duplicates
    uv = np.unique(sv)
    ws = np.array([sw[sv == x].sum() for x in uv], np.int64)
    cumw = np.cumsum(ws)
    tot = int(cumw[-1])
    for q, got in zip(out["q_ppt"], out["value"]):
        exp = int(uv[np.searchsorted(1000 * cumw, q * tot, side="left")])
        assert got == exp, (q, got, exp)


def test_kcore_clique_with_tendrils(ray_session):
    """A 4-clique with pendant tendrils: at k=3 only the clique
    survives peeling, each member with in-core degree 3."""
    import ray

    from frontera_ray.stages.pagerank import kcore

    clique = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    tendrils = [(3, 4), (4, 5), (1, 6)]
    src, dst = zip(*(clique + tendrils))
    tbl = pa.table({"src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64())})
    out = kcore(ray.data.from_arrow(tbl).repartition(3), n_nodes=8,
                k=3, rounds=4).to_pandas()
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["core_deg"].tolist() == [3, 3, 3, 3]


def test_kcore_chain_peels_empty(ray_session):
    import ray

    from frontera_ray.stages.pagerank import kcore

    tbl = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                    "dst": pa.array([1, 2, 3], pa.int64())})
    out = kcore(ray.data.from_arrow(tbl), n_nodes=8, k=2, rounds=4)
    assert out.num_rows == 0


def test_watermark_lateness_matches_brute(ray_session):
    """watermark_lateness == the brute exclusive-running-max rule,
    block splits included."""
    import ray

    from frontera_ray.stages.relational import watermark_lateness

    rng = np.random.default_rng(11)
    n = 600
    ids = np.arange(n, dtype=np.int64)
    base = np.cumsum(rng.integers(1, 1000, n)).astype(np.int64) * 1000
    jitter = rng.integers(-500_000, 500_000, n).astype(np.int64)
    ts = base + jitter
    tbl = pa.table({"event_id": pa.array(ids, pa.int64()),
                    "ts_us": pa.array(ts, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(9)
    L = 200_000
    out = watermark_lateness(ds, "event_id", "ts_us", lateness_us=L,
                             day_us=10_000_000).to_pandas()

    run = np.maximum.accumulate(ts)
    wm = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))
    late = (wm != np.iinfo(np.int64).min) & (ts < wm - L)
    day = ts // 10_000_000
    exp_total = {int(d): int((day == d).sum()) for d in np.unique(day)}
    exp_late = {int(d): int(late[day == d].sum()) for d in np.unique(day)}
    assert late.sum() > 0  # fixture actually has late rows
    for r in out.itertuples():
        assert exp_total[r.day] == r.n_total
        assert exp_late[r.day] == r.n_late


def test_assortativity_sums_star_graph(ray_session):
    """A star (hub 0 with 4 leaves) is maximally disassortative: the
    moment sums assemble to r = -1."""
    import ray

    from frontera_ray.stages.pagerank import assortativity_sums

    tbl = pa.table({"src": pa.array([0, 0, 0, 0], pa.int64()),
                    "dst": pa.array([1, 2, 3, 4], pa.int64())})
    out = assortativity_sums(ray.data.from_arrow(tbl).repartition(2),
                             n_nodes=8).to_pandas().iloc[0]
    # degrees: hub 4, leaves 1; ordered pairs: 4x(4,1) + 4x(1,4)
    assert out.m_pairs == 8
    assert out.s1 == 16 + 4        # hub 4 pairs x 4 ... = sum deg(u)^2
    assert out.sxx == 64 + 4       # sum over pairs of deg(u)^2 = deg^3
    assert out.sxy == 16 + 16      # every ordered pair has x*y = 4
    num = out.m_pairs * out.sxy - out.s1 * out.s1
    den = out.m_pairs * out.sxx - out.s1 * out.s1
    assert num / den == -1.0


def test_posting_sizes_varint_brute(ray_session):
    """posting_sizes == the brute per-token delta+varint byte count."""
    import ray

    from frontera_ray.stages.text import posting_sizes

    docs = [(0, "a b"), (5, "a c"), (200, "a b"), (300, "a")]
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = pa.concat_tables(list(
        posting_sizes(ds, min_df=1).iter_batches(
            batch_format="pyarrow", batch_size=None))).to_pandas() \
        .set_index("token")

    def varint(g):
        return 1 if g < 128 else 2 if g < 16384 else 3

    # token a: ids 0,5,200,300 -> gaps 1,5,195,100 -> 1+1+2+1 = 5
    assert out.loc["a", "df"] == 4 and out.loc["a", "bytes"] == \
        varint(1) + varint(5) + varint(195) + varint(100)
    # token b: ids 0,200 -> gaps 1,200 -> 1+2 = 3
    assert out.loc["b", "df"] == 2 and out.loc["b", "bytes"] == 3
    # token c: id 5 -> gap 6 -> 1
    assert out.loc["c", "df"] == 1 and out.loc["c", "bytes"] == 1


def test_grouped_ols_trend_matches_numpy(ray_session):
    """grouped_ols_trend's integer num/den assemble to the numpy
    least-squares slope per key."""
    import ray

    from frontera_ray.stages.relational import grouped_ols_trend

    rng = np.random.default_rng(2)
    keys = np.repeat(np.arange(5, dtype=np.int64), 40)
    t = np.tile(np.arange(40, dtype=np.int64), 5) * 3
    y = (keys * 10 + t * np.array([2, -1, 0, 5, 3])[keys]
         + rng.integers(-2, 3, 200)).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "t": pa.array(t, pa.int64()),
                    "y": pa.array(y, pa.int64())})
    out = grouped_ols_trend(
        ray.data.from_arrow(tbl).repartition(6), "k", "t", "y") \
        .set_index("k")
    for k in range(5):
        m = keys == k
        slope = np.polyfit(t[m].astype(float), y[m].astype(float), 1)[0]
        got = out.loc[k, "trend_num"] / out.loc[k, "trend_den"]
        assert abs(got - slope) < 1e-9, (k, got, slope)


def test_synth_image_family_kernels():
    """md5-derived image corpus kernels: planted phash cluster structure
    (within-group hammings exactly {0,1,2}, cross-group far), both
    codecs exercised by decode parity, and the decode round trip sums
    matching a direct pixel-generation sum for the lossless format."""
    import pyarrow as pa

    from frontera_ray.payload import _gen_pixels_group
    from frontera_ray.stages.images import (decode_parity_table, md5_u64,
                                            synth_image_meta,
                                            synth_phash_table)

    batch = pa.table({"doc_id": pa.array(np.arange(40), pa.int64())})
    ph = synth_phash_table(batch)["simhash"].to_numpy().view(np.uint64)
    ham = lambda a, b: bin(int(a ^ b)).count("1")
    # within group 0 (docs 0..3): member flips -> {0,1,2}
    assert ham(ph[1], ph[2]) == 0
    assert ham(ph[0], ph[1]) == 1 and ham(ph[0], ph[3]) == 1
    assert ham(ph[1], ph[3]) == 2
    # across groups: md5-uniform, far from any banding threshold
    assert ham(ph[0], ph[4]) > 10

    par = decode_parity_table(batch)
    fmts = set(par["fmt"].to_pylist())
    assert fmts == {"png", "qimg"}, fmts
    meta = synth_image_meta(batch)
    assert meta["w"].to_pylist() == par["w"].to_pylist()

    # lossless round trip == direct generation sum for one png row
    i = par["fmt"].to_pylist().index("png")
    doc = par["doc_id"][i].as_py()
    u = md5_u64([f"img:{doc}"])
    w, h = par["w"][i].as_py(), par["h"][i].as_py()
    direct = int(_gen_pixels_group(u, w, h).sum(dtype=np.int64))
    assert par["px_sum"][i].as_py() == direct


def test_image_gate_reason_order():
    """Fixed gate order: small side beats aspect beats caption; a short
    caption alone fails with reason 'caption' (the branch real corpus
    text never exercises)."""
    import pyarrow as pa

    from frontera_ray.stages.images import image_gate_table

    long_t = "tok " * 30
    batch = pa.table({
        "doc_id": pa.array(np.arange(200), pa.int64()),
        "text": pa.array(["hi there"] * 100 + [long_t] * 100, pa.string()),
    })
    out = image_gate_table(batch)
    reasons = set(out["reason"].to_pylist())
    assert "caption" in reasons and "ok" in reasons
    df = out.to_pandas()
    # every caption-fail row passed the two geometry gates first
    capfail = df[df.reason == "caption"]
    assert len(capfail) and (capfail.cap_tokens < 5).all()
    assert (np.minimum(capfail.w, capfail.h) >= 32).all()
    assert (~df[df.reason == "small"].keep).all()
    assert (df[df.reason == "ok"].keep).all()


def test_pareto_front_2d_brute(ray_session):
    """Distributed skyline == brute NOT-EXISTS scan, duplicates kept."""
    import ray as _ray

    from frontera_ray.stages.relational import pareto_front_2d

    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, 400)
    b = rng.integers(0, 50, 400)
    a[10], b[10] = a[11], b[11]  # identical duplicate pair
    ids = np.arange(400)
    ds = _ray.data.from_arrow(
        __import__("pyarrow").table({"doc_id": ids, "a": a, "b": b})
    ).repartition(7)
    got = pareto_front_2d(ds, "doc_id", "a", "b")
    brute = [i for i in ids
             if not any((a[j] >= a[i]) and (b[j] >= b[i])
                        and (a[j] > a[i] or b[j] > b[i]) for j in ids)]
    assert got["doc_id"].tolist() == sorted(brute)
    # both members of an identical duplicate front point survive or die together
    assert (10 in brute) == (11 in brute)


def test_poisson_bootstrap_weights_distribution():
    """Hash-derived Poisson(1) weights: mean ~1, variance ~1, exact
    pinned-threshold mapping at the boundaries."""
    from frontera_ray.stages.relational import (POISSON1_CDF_PPM,
                                                _bootstrap_mix_ppm)

    u32 = np.arange(200_000, dtype=np.uint64) * np.uint64(2654435761)
    u32 &= np.uint64(0xFFFFFFFF)
    ppm = _bootstrap_mix_ppm(u32, 3)
    w = np.searchsorted(POISSON1_CDF_PPM, ppm, side="right")
    assert abs(w.mean() - 1.0) < 0.02
    assert abs(w.var() - 1.0) < 0.05
    assert np.searchsorted(POISSON1_CDF_PPM, 367878, side="right") == 0
    assert np.searchsorted(POISSON1_CDF_PPM, 367879, side="right") == 1


def test_isqrt_exact_boundaries():
    from frontera_ray.stages.relational import isqrt_exact

    n = np.concatenate([np.arange(0, 2000),
                        np.array([k*k + d for k in (10**6, 3037000498)
                                  for d in (-1, 0, 1)])]).astype(np.int64)
    s = isqrt_exact(n)
    assert ((s * s <= n) & ((s + 1) * (s + 1) > n)).all()


def test_largest_remainder_alloc_skewed():
    from frontera_ray.stages.relational import hamilton_alloc

    w = np.array([1, 2, 3, 1000, 7], dtype=np.int64)
    alloc = hamilton_alloc(w, 100, np.arange(5))
    assert alloc.sum() == 100
    # proportionality within 1 unit (Hamilton's guarantee)
    exact = 100 * w / w.sum()
    assert (np.abs(alloc - exact) < 1).all()
    # deterministic ties: equal weights, leftover goes to earliest
    w2 = np.array([1, 1, 1], dtype=np.int64)
    a2 = hamilton_alloc(w2, 100, np.arange(3))
    assert a2.tolist() == [34, 33, 33]


def test_wasserstein1_brute(ray_session):
    """Integer W1 == scipy-style brute transport on a small sample."""
    import pyarrow as pa
    import ray as _ray

    from frontera_ray.stages.relational import wasserstein1_2sample

    rng = np.random.default_rng(3)
    va = rng.integers(0, 40, 300) / 4.0
    vb = rng.integers(5, 50, 200) / 4.0
    t = pa.table({
        "value": np.concatenate([va, vb]),
        "side": np.concatenate([np.zeros(300, np.int64),
                                np.ones(200, np.int64)])})
    got = wasserstein1_2sample(_ray.data.from_arrow(t).repartition(5),
                               "value", "side", scale=100)
    w1 = got["w1_micro"][0].as_py() / 1e6
    # brute: integral of |F1-F2| over the support (cents grid)
    grid = np.arange(0, 5001)
    f1 = np.searchsorted(np.sort(np.round(va*100)), grid, "right") / 300
    f2 = np.searchsorted(np.sort(np.round(vb*100)), grid, "right") / 200
    brute = float(np.abs(f1 - f2).sum())  # unit grid spacing
    assert abs(w1 - brute) < 2e-3, (w1, brute)


def test_otsu_threshold_bimodal(ray_session):
    """Otsu picks the valley of a clean bimodal mixture; smallest-t
    tie-break is deterministic."""
    import pyarrow as pa
    import ray as _ray

    from frontera_ray.stages.relational import otsu_threshold

    vals = np.concatenate([np.full(500, 10.0), np.full(500, 90.0),
                           np.array([10.5, 89.5])])
    ds = _ray.data.from_arrow(pa.table({"value": vals})).repartition(4)
    out = otsu_threshold(ds, "value", scale=100)
    # split must separate the two modes: threshold in [10.5*100, 89.5*100)
    t = int(out["t_cents"][0])
    assert 1050 <= t < 8950, t
    assert int(out["c0"][0]) + int(out["c1"][0]) == len(vals)


def test_sigma_breach_matches_numpy(ray_session):
    """Exact integer breach predicate == direct 2-sigma check."""
    import pyarrow as pa
    import ray as _ray

    from frontera_ray.stages.relational import sigma_breach_table

    rng = np.random.default_rng(11)
    v = np.concatenate([rng.normal(50, 5, 2000), [500.0, -400.0]])
    k = np.array(["a"] * len(v))
    ds = _ray.data.from_arrow(pa.table({"k": k, "value": v})) \
        .repartition(4)
    out = sigma_breach_table(ds, "k", "value", scale=100, z=2)
    c = np.floor(v * 100 + 0.5).astype(np.int64)
    n, s, ss = len(c), int(c.sum()), int((c * c).sum())
    d = n * c - s
    brute = int((d.astype(object) ** 2 * (n - 1)
                 > 4 * n * (n * ss - s * s)).sum())
    assert int(out["breaches"][0]) == brute
    assert brute >= 2  # the planted outliers breach


def test_per_key_drawdown_brute_and_hash_parity(ray_session):
    """per_key_drawdown == a per-key pandas cummax brute force on a
    random multi-key series, identical under both exchanges (the
    2^40 run-offset trick must not leak across runs)."""
    import pandas as pd
    import ray

    from frontera_ray.stages.relational import per_key_drawdown

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "value": rng.uniform(0, 500, n).round(2),
    })
    tbl = pa.Table.from_pandas(df, preserve_index=False).set_column(
        2, "ts", pa.Array.from_pandas(df["ts"]).cast(pa.timestamp("us")))
    ds = ray.data.from_arrow(tbl).repartition(5)

    b = df.copy()
    b["cents"] = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    b = b.sort_values(["user_id", "ts", "event_id"])
    b["peak"] = b.groupby("user_id")["cents"].cummax()
    brute = b.assign(dd=b["peak"] - b["cents"]).groupby(
        "user_id", as_index=False).agg(
        n_events=("cents", "size"), peak_cents=("cents", "max"),
        max_drawdown_cents=("dd", "max")).sort_values(
        "user_id").reset_index(drop=True)

    for exchange in ("groups", "hash"):
        got = per_key_drawdown(ds, exchange=exchange).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        for col in ["user_id", "n_events", "peak_cents",
                    "max_drawdown_cents"]:
            assert (got[col].to_numpy() == brute[col].to_numpy()).all(), \
                (exchange, col)


def test_pointer_double_resolve(ray_session):
    """Pointer doubling resolves a crafted 9-hop chain (needs 4
    doubling rounds), a 2-cycle-free fan-in, and self-terminal rows —
    final targets and hop counts exact."""
    import ray

    from frontera_ray.stages.relational import pointer_double_resolve

    # chain 9 -> 8 -> ... -> 0 (9 hops), plus 20 -> 0 fan-in, 21 terminal
    src = list(range(10)) + [20, 21]
    dst = [0] + list(range(9)) + [0, 21]
    hops = [0] + [1] * 9 + [1, 0]
    done = [True] + [False] * 9 + [False, True]
    # dst=0's row is terminal (dst==src) so done flags line up
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "hops": pa.array(hops, pa.int64()),
        "done": pa.array(done, pa.bool_())}))
    out = pointer_double_resolve(ds).to_pandas().set_index("src")
    assert bool(out["done"].all())
    assert (out["dst"] == 0).sum() == 11  # all of 0..9 and 20 end at 0
    assert int(out.loc[9, "hops"]) == 9
    assert int(out.loc[5, "hops"]) == 5
    assert int(out.loc[20, "hops"]) == 1
    assert int(out.loc[21, "hops"]) == 0 and int(out.loc[21, "dst"]) == 21


def test_pointer_double_cross_block_compression(ray_session):
    """Local compression resolves in-block chains shuffle-free; a
    chain spanning THREE separate blocks still resolves exactly via
    the global doubling rounds, and matches the compression-off run."""
    import ray

    from frontera_ray.stages.relational import pointer_double_resolve

    def tbl(rows):
        src, dst, hops, done = zip(*rows)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "hops": pa.array(hops, pa.int64()),
                         "done": pa.array(done, pa.bool_())})

    # block A: 30 -> 20 (cross-block) after local chain 32->31->30
    # block B: 20 -> 10 (cross-block) after local chain 22->21->20
    # block C: terminal 10 (done self-row) plus local chain 12->11->10
    blocks = [
        tbl([(32, 31, 1, False), (31, 30, 1, False), (30, 20, 1, False)]),
        tbl([(22, 21, 1, False), (21, 20, 1, False), (20, 10, 1, False)]),
        tbl([(12, 11, 1, False), (11, 10, 1, False), (10, 10, 0, True)]),
    ]
    ds = ray.data.from_arrow(blocks)
    for lc in (True, False):
        out = pointer_double_resolve(ds, local_compress=lc) \
            .to_pandas().set_index("src")
        assert bool(out["done"].all()), lc
        assert (out["dst"] == 10).all(), lc
        assert int(out.loc[32, "hops"]) == 4, lc
        assert int(out.loc[22, "hops"]) == 3, lc
        assert int(out.loc[12, "hops"]) == 2, lc
        assert int(out.loc[10, "hops"]) == 0, lc


def test_image_forensics_semantics():
    """Class-separation invariants of the new image forensic gates on
    the derived corpus: the qimg lattice (every value ≡ 4 mod 8) can
    never clip to 0/255 and is always sniffed back from pixels alone
    (fmt_match), and its 512×-coarser palette shows strictly more
    triple collisions (lower colors_ppm) than the lossless path."""
    from frontera_ray.stages.images import (clipping_table,
                                            color_forensics_table,
                                            palette_table)

    batch = pa.table({"doc_id": pa.array(range(200), pa.int64())})

    clip = clipping_table(batch).to_pandas()
    q = clip[clip["fmt"] == "qimg"]
    assert len(q) > 0 and (q["n_lo"] == 0).all() and (q["n_hi"] == 0).all()
    p = clip[clip["fmt"] == "png"]
    assert (p["n_lo"] + p["n_hi"] > 0).mean() > 0.9

    cf = color_forensics_table(batch).to_pandas()
    assert cf["fmt_match"].all()
    assert (cf.loc[cf["fmt"] == "qimg", "n_quant"]
            == cf.loc[cf["fmt"] == "qimg", "n_vals"]).all()

    pal = palette_table(batch).to_pandas()
    qmax = pal.loc[pal["fmt"] == "qimg", "colors_ppm"].max()
    pmin = pal.loc[pal["fmt"] == "png", "colors_ppm"].min()
    assert qmax < pmin  # the posterization gate separates the classes
    assert pal["posterized"].equals(pal["fmt"] == "qimg")


def test_grad_orientation_isotropy_bounds():
    """The noise-dominated corpus is near-isotropic: every anisotropy
    ratio is finite, positive, and the horizontal energy equals the
    sharpness kernel's gradient on the same rows."""
    from frontera_ray.stages.images import (grad_orientation_table,
                                            sharpness_table)

    batch = pa.table({"doc_id": pa.array(range(64), pa.int64())})
    go = grad_orientation_table(batch).to_pandas()
    sh = sharpness_table(batch).to_pandas()
    assert (go["aniso_milli"] > 0).all()
    assert (go["grad_h"] == sh["grad_sum"]).all()
    assert (go["n_h"] == sh["n_pairs"]).all()


def test_line_boilerplate_exchange_path_parity(ray_session, tmp_path):
    """The union-tag keyed-exchange mark path (broadcast_limit=0) must
    be byte-identical to the broadcast path on a corpus with real
    boilerplate, including docs with zero nonempty lines."""
    import pyarrow.parquet as pq
    import ray

    from frontera_ray.stages.text import line_boilerplate_profile

    boiler = "all rights reserved"
    docs = [
        (0, f"{boiler}\nbody zero\n{boiler}", "a"),
        (1, f"{boiler}\nbody one", "a"),
        (2, f"body two\n{boiler}", "a"),
        (3, f"{boiler}", "b"),          # other source: kept
        (4, "\n\n", "a"),               # zero nonempty lines
        (5, "body five", "a"),
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "source": pa.array([d[2] for d in docs], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"),
                   row_group_size=2)

    def reader():
        return ray.data.read_parquet(str(tmp_path / "documents.parquet"),
                                     override_num_blocks=3)

    a = line_boilerplate_profile(reader(), reader()) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = line_boilerplate_profile(reader(), reader(), broadcast_limit=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), (a, b)
    assert len(a) == 6                      # doc 4 present with zeros
    assert a.set_index("doc_id").loc[4, "n_lines"] == 0
    assert a.set_index("doc_id").loc[0, "n_boiler"] == 2
    assert a.set_index("doc_id").loc[3, "n_boiler"] == 0


def test_task_exchange_dtype_canonicalization(ray_session):
    """task_exchange must co-locate a key VALUE even when per-block
    numpy dtypes diverge: a null-carrying int64 block degrades to
    float64 under to_numpy, and pandas' hash_array hashes int64 5 and
    float64 5.0 differently — the exchange canonicalizes on the Arrow
    type BEFORE hashing, so key 5's rows land in ONE partition and the
    join matches the sort exchange exactly."""
    import ray

    from frontera_ray.stages.relational import equi_join

    # block 1 carries a NULL (numpy would degrade it to float64);
    # block 2 is pure int64 — key 5 appears in both.
    left = pa.table({"k": pa.array([5, None, 7], pa.int64()),
                     "lv": pa.array([1, 2, 3], pa.int64())})
    left2 = pa.table({"k": pa.array([5, 8], pa.int64()),
                      "lv": pa.array([4, 5], pa.int64())})
    right = pa.table({"k": pa.array([5, 7, 8], pa.int64()),
                      "rv": pa.array([50, 70, 80], pa.int64())})
    lds = ray.data.from_arrow(left).union(ray.data.from_arrow(left2))
    rds = ray.data.from_arrow(right)
    for how in ("inner", "left", "full"):
        got = (equi_join(lds, rds, "k", ["lv"], ["rv"],
                         how=how, exchange="tasks").to_pandas())
        want = (equi_join(lds, rds, "k", ["lv"], ["rv"],
                          how=how, exchange="hash").to_pandas())
        key = lambda df: sorted(  # noqa: E731
            (-1 if pd.isna(k) else int(k),
             -1 if pd.isna(l) else int(l),
             -1 if pd.isna(r) else int(r))
            for k, l, r in df.itertuples(index=False))
        assert key(got) == key(want), how


def test_task_exchange_randomized_parity(ray_session):
    """Randomized multi-block parity: equi_join / per_key_topk under
    exchange='tasks' == the sort exchange on 2k rows x 60 string keys
    spread over 7 + 5 blocks (keys scattered across every block)."""
    import ray

    from frontera_ray.stages.relational import equi_join, per_key_topk

    rng = np.random.default_rng(17)
    n_l, n_r = 2000, 900
    lk = [f"h{int(i):02d}.example.com" for i in rng.integers(0, 60, n_l)]
    rk = [f"h{int(i):02d}.example.com" for i in rng.integers(30, 90, n_r)]
    lds = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.string()),
        "lv": pa.array(rng.integers(0, 10**6, n_l), pa.int64()),
    })).repartition(7)
    rds = ray.data.from_arrow(pa.table({
        "k": pa.array(rk, pa.string()),
        "rv": pa.array(rng.integers(0, 10**6, n_r), pa.int64()),
    })).repartition(5)
    j_t = equi_join(lds, rds, "k", ["lv"], ["rv"],
                    exchange="tasks").to_pandas()
    j_g = equi_join(lds, rds, "k", ["lv"], ["rv"],
                    exchange="groups").to_pandas()
    canon = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]]  # noqa: E731
                                  .itertuples(index=False)))
    assert canon(j_t) == canon(j_g)
    t_t = per_key_topk(lds, "k", "lv", 3, tiebreak="lv",
                       exchange="tasks").to_pandas()
    t_g = per_key_topk(lds, "k", "lv", 3, tiebreak="lv",
                       exchange="groups").to_pandas()
    canon2 = lambda df: sorted(map(tuple, df[["k", "lv"]]  # noqa: E731
                                   .itertuples(index=False)))
    assert canon2(t_t) == canon2(t_g)


def test_task_exchange_tree_fanin(ray_session):
    """With fanin smaller than the block count, the tree-combine round
    kicks in and the result is unchanged (no task exceeds the fan-in
    bound by construction)."""
    import ray

    from frontera_ray.stages.relational import task_exchange

    t = pa.table({"k": pa.array(list(range(20)) * 10, pa.int64()),
                  "v": pa.array(list(range(200)), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(9)

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        import pandas as pd  # noqa: F811
        g = batch.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.table({"k": pa.array(g["k"], pa.int64()),
                         "s": pa.array(g["v"], pa.int64())})

    out = (task_exchange(ds, "k", kern, num_partitions=6, fanin=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (t.to_pandas().groupby("k", as_index=False)["v"].sum()
            .rename(columns={"v": "s"}))
    assert out["k"].tolist() == want["k"].tolist()
    assert out["s"].tolist() == want["s"].tolist()


def test_winnow_batch_parity_with_scalar():
    """winnow_fingerprints_batch is byte-identical to the scalar
    winnowing per doc across edge shapes (empty, <k tokens, n<=w grams,
    long docs, heavy repetition)."""
    import numpy as np

    from frontera_ray.stages.text import (winnow_fingerprints,
                                          winnow_fingerprints_batch)

    texts = [
        "", "a", "a b", "one two three four",
        "the quick brown fox jumps over the lazy dog",
        ("spam " * 40).strip(),
        " ".join(f"w{i % 7}" for i in range(100)),
        " ".join(f"tok{i}" for i in range(50)),
    ]
    for k, w in [(3, 4), (2, 3), (4, 2)]:
        di, fp = winnow_fingerprints_batch(texts, k, w)
        for d, text in enumerate(texts):
            exp = np.sort(winnow_fingerprints(text, k, w).view(np.int64))
            got = fp[di == d]
            assert got.tolist() == exp.tolist(), (k, w, d, text[:30])


def test_ktruss_matches_brute(ray_session):
    """Fixed-round 4-truss peeling equals a brute set-based reference
    (synchronous edge drops, final support over survivors) on random
    multigraphs with self-loops and parallel edges."""
    import ray

    from frontera_ray.stages.pagerank import ktruss

    def brute(pairs, n, k, rounds):
        E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        for _ in range(rounds):
            adj = {i: set() for i in range(n)}
            for a, b in E:
                adj[a].add(b)
                adj[b].add(a)
            keep = {e for e in E if len(adj[e[0]] & adj[e[1]]) >= k - 2}
            if keep == E:
                break
            E = keep
        adj = {i: set() for i in range(n)}
        for a, b in E:
            adj[a].add(b)
            adj[b].add(a)
        return sorted((a, b, len(adj[a] & adj[b])) for a, b in E)

    rng = np.random.default_rng(5)
    for _ in range(4):
        n = 40
        m = int(rng.integers(30, 120))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64())})).repartition(3)
        out = ktruss(ds, n, k=4, rounds=3).to_pandas()
        assert sorted(zip(out.u, out.v, out.sup)) == \
            brute(list(zip(src, dst)), n, 4, 3)
