"""Text-analysis operators over a documents table (doc_id, text, ...).

All kernels are vectorized ``pyarrow.compute`` regex/count ops (RE2 —
the same engine DuckDB uses, giving exact oracle parity) and run inside
``Dataset.map_batches`` with ``batch_format='pyarrow'``.

Operators: token counting, quality scoring (length/punct/upper/stopword
ratios), n-gram-heuristic language ID, content fingerprinting
(md5 exact-dup key + simhash64 near-dup sketch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fingerprint import md5_hex_batch

TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer classes (GPT-2-style, RE2-compatible — no
# lookarounds): letter runs, digit runs, non-alphanumeric-non-space
# runs. The same pattern string runs in DuckDB's regexp functions
# (also RE2), so counts are oracle-checkable.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
PUNCT_RE = r"[.!,;:?]"
UPPER_RE = r"[A-Z]"
DIGIT_RE = r"[0-9]"

# language-marker stopword patterns (word-boundary RE2, lowercased input);
# order fixes the argmax tie-break: first maximal language wins.
LANG_PATTERNS = [
    ("en", r"\b(the|and|of|to|in)\b"),
    ("de", r"\b(der|und|die|das|ein)\b"),
    ("fr", r"\b(le|la|les|des|une)\b"),
    ("es", r"\b(el|los|las|una|que)\b"),
    ("zh", r"\b(de|le|shi|bu|zai)\b"),
]


def token_count_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    n = pc.count_substring_regex(batch[text_col], TOKEN_RE).cast(pa.int64())
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})


def bpe_token_count_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace AND BPE-ish token counts per doc (one vectorized RE2
    pass each) — the pre-tokenization granularity an LLM-data pipeline
    budgets by."""
    ws = pc.count_substring_regex(batch[text_col], TOKEN_RE).cast(pa.int64())
    bpe = pc.count_substring_regex(
        batch[text_col], BPE_TOKEN_RE).cast(pa.int64())
    return pa.table({"doc_id": batch["doc_id"], "n_ws_tokens": ws,
                     "n_bpe_tokens": bpe})


def term_freq_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Explode docs into per-doc term frequencies (doc_id, token, tf):
    vectorized Arrow whitespace split + list_flatten, then one pandas
    groupby-size over the (doc, token) pairs. Documents live whole
    inside a batch, so every doc's terms stay in one output block."""
    toks = pc.utf8_split_whitespace(batch[text_col])
    parent = pc.list_parent_indices(toks)
    t = pa.table({"doc_id": batch["doc_id"].take(parent),
                  "token": pc.list_flatten(toks)})
    t = t.filter(pc.not_equal(t["token"], ""))
    df = (t.to_pandas().groupby(["doc_id", "token"], as_index=False)
          .size().rename(columns={"size": "tf"}))
    df["tf"] = df["tf"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def tfidf_top_terms(ds, n_docs: int, k: int = 3):
    """Per-document top-k TF-IDF terms.

    Distributed shape: one explode pass (``term_freq_table``) feeds
    BOTH sides — the document-frequency aggregate is a hash-shuffle
    ``groupby('token').count()`` (token is high-cardinality; each
    (doc, token) row is already per-doc distinct so the count IS df),
    whose result — vocabulary-sized, orders of magnitude smaller than
    the corpus — is broadcast back over the streaming tf rows with
    ``ray.put`` + a per-worker cached pandas index. Scores are emitted
    as integer micro-units (round(tf * ln(N/df) * 1e6)) so the SQL
    oracle hashes exactly; top-k per doc is a vectorized run-aware
    lexsort (docs are whole within blocks)."""
    import ray

    import pandas as pd

    # pin the exploded tf rows so the df aggregate and the scoring pass
    # share ONE explode execution (object-store blocks, spillable);
    # without this Ray re-runs the read+explode lineage for each consumer
    tf = ds.map_batches(term_freq_table, batch_format="pyarrow").materialize()
    df_tbl = pa.concat_tables(
        list(tf.groupby("token").count()
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    df_ref = ray.put(df_tbl)
    cache: dict = {}

    def score_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "score_micro": pa.array([], pa.int64())})
        key = df_ref.hex()
        if key not in cache:
            vocab = ray.get(df_ref)
            cache[key] = (pd.Index(vocab["token"].to_pandas()),
                          vocab["count()"].to_numpy())
        index, dfs = cache[key]
        pos = index.get_indexer(batch["token"].to_pandas())
        df = dfs[pos]  # every token exists in the vocab by construction
        tfv = batch["tf"].to_numpy()
        score = np.round(tfv * np.log(n_docs / df) * 1e6).astype(np.int64)
        doc = batch["doc_id"].to_numpy()
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        order = np.lexsort((toks, -score, doc))
        d_s = doc[order]
        new_run = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(new_run)
        rank = np.arange(len(d_s)) - starts[np.cumsum(new_run) - 1]
        keep = order[rank < k]
        return pa.table({
            "doc_id": pa.array(doc[keep], pa.int64()),
            "token": pa.array(toks[keep], pa.string()),
            "tf": pa.array(tfv[keep], pa.int64()),
            "df": pa.array(df[keep], pa.int64()),
            "score_micro": pa.array(score[keep], pa.int64()),
        })

    return tf.map_batches(score_topk, batch_format="pyarrow",
                          batch_size=None)


def quality_features_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality counters + a composite score in [0,1].

    score = 0.4*min(1, n_tokens/100) + 0.3*(1 - upper_ratio)
          + 0.3*min(1, 20*punct_ratio), rounded to 4 decimals
    (rounding keeps float output hash-stable vs the SQL oracle)."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text).cast(pa.float64()).to_numpy()
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).cast(pa.float64()).to_numpy()
    n_punct = pc.count_substring_regex(text, PUNCT_RE).cast(pa.float64()).to_numpy()
    n_upper = pc.count_substring_regex(text, UPPER_RE).cast(pa.float64()).to_numpy()
    denom = np.maximum(n_chars, 1.0)
    upper_ratio = n_upper / denom
    punct_ratio = n_punct / denom
    score = (
        0.4 * np.minimum(1.0, n_tokens / 100.0)
        + 0.3 * (1.0 - upper_ratio)
        + 0.3 * np.minimum(1.0, 20.0 * punct_ratio)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
            "n_punct": pa.array(n_punct.astype(np.int64), pa.int64()),
            "n_upper": pa.array(n_upper.astype(np.int64), pa.int64()),
            "quality_score": pa.array(np.round(score, 4), pa.float64()),
        }
    )


def langid_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID (n-gram heuristic). Deterministic
    tie-break: pattern order; all-zero votes -> 'und'."""
    lower = pc.utf8_lower(batch[text_col])
    counts = np.stack(
        [pc.count_substring_regex(lower, pat).to_numpy() for _, pat in LANG_PATTERNS]
    )
    best = counts.argmax(axis=0)  # first max wins (argmax semantics)
    total = counts.max(axis=0)
    langs = np.array([code for code, _ in LANG_PATTERNS], dtype=object)
    pred = langs[best]
    pred[total == 0] = "und"
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, pa.string())}
    )


def content_md5_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact-dup content key: hex md5 of the raw text (matches DuckDB
    md5())."""
    h = md5_hex_batch(batch[text_col].to_pylist())
    return batch.append_column("text_md5", pa.array(h, pa.string()))


# ---------------------------------------------------------------------------
# simhash document fingerprint
# ---------------------------------------------------------------------------

def curate_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One fused pass of the corpus-curation features: quality score,
    language prediction and exact-dup key per document (the three
    kernels share the batch, so text is read once per stage chain
    instead of three pipeline passes)."""
    q = quality_features_table(batch, text_col)
    l = langid_table(batch, text_col)
    m = content_md5_table(batch, text_col)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": q["n_tokens"],
        "quality_score": q["quality_score"],
        "lang_pred": l["lang_pred"],
        "text_md5": m["text_md5"],
    })


def _token_hash64(tok: str) -> int:
    """Top 64 bits of md5(token) — chosen over crc32 pairs because it
    is exactly SQL-expressible (DuckDB ``('0x' || substr(md5(tok), 1,
    16))::UBIGINT``), making the simhash column fully oracle-checkable
    while keeping uniform bit statistics."""
    import hashlib

    return int(hashlib.md5(tok.encode("utf8")).hexdigest()[:16], 16)


def _token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        out[i] = _token_hash64(t)
    return out


def simhash64(text: str) -> int:
    """Charikar simhash over whitespace tokens (64-bit)."""
    hs = _token_hashes(text)
    if len(hs) == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    v = 0
    for b in range(64):
        if votes[b] > 0:
            v |= 1 << b
    return v - (1 << 64) if v >= 1 << 63 else v


# per-worker token-hash memo: vocabularies are tiny relative to token
# streams, so crc32 runs once per distinct token per worker (bounded;
# cleared wholesale if a pathological vocabulary ever fills it)
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 2_000_000


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Batch simhash, byte-identical to ``simhash64`` per doc (asserted
    in tests). Tokens hash through a per-worker memo (crc32 once per
    distinct token); bit votes use 64 ``np.bincount`` segment sums over
    the flat token stream — majority bit b is set iff
    2 * ones(doc, b) > n_tokens(doc), identical to the +/-1 vote-sum
    sign — so peak memory is O(tokens), never O(tokens x 64) matrices.
    Per-doc Python is only str.split (its semantics ARE the
    fingerprint definition)."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    tok_lists = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.int64)
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    hs = np.empty(total, dtype=np.uint64)
    i = 0
    for toks in tok_lists:
        for tok in toks:
            h = cache.get(tok)
            if h is None:
                h = cache[tok] = _token_hash64(tok)
            hs[i] = h
            i += 1
    doc_idx = np.repeat(np.arange(n), lens)
    sign = np.empty((n, 64), dtype=bool)
    one = np.uint64(1)
    for b in range(64):
        ones = np.bincount(doc_idx, weights=(hs >> np.uint64(b)) & one,
                           minlength=n)
        sign[:, b] = 2 * ones > lens
    packed = np.packbits(sign, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view(np.uint64).ravel().view(np.int64)


def simhash_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = simhash64_batch(batch[text_col].to_pylist())
    return pa.table(
        {"doc_id": batch["doc_id"], "simhash": pa.array(sh, pa.int64())}
    )


def winnow_fingerprints(text: str, k: int = 3, w: int = 4) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the rolling-hash selection scheme): hash the ordered
    word k-grams (md5-top-64, same SQL-expressible hash as the rest of
    the text family), slide a window of ``w`` hashes, keep each
    window's MINIMUM, return the distinct selected values (the min
    VALUE per window is tie-insensitive, so the fingerprint set is
    deterministic). A doc with fewer than w grams contributes its
    single global minimum; no grams -> empty."""
    toks = text.split()
    if len(toks) < k:
        return np.zeros(0, dtype=np.uint64)
    n = len(toks) - k + 1
    hs = np.empty(n, dtype=np.uint64)
    for i in range(n):
        hs[i] = _token_hash64(" ".join(toks[i:i + k]))
    if n <= w:
        return np.array([hs.min()], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(hs, w).min(axis=1))


def winnow_fingerprints_batch(texts, k: int = 3, w: int = 4):
    """Batch winnowing, byte-identical to ``winnow_fingerprints`` per
    doc (asserted in tests) with the per-doc Python loop gone: gram
    strings come from ONE Arrow ``binary_join_element_wise`` over k
    shifted slices of the flat token stream (windows crossing a doc
    boundary masked out), md5 hashing runs once per DISTINCT gram
    (np.unique + the shared token-hash memo), and window minima are one
    global ``sliding_window_view(...).min`` plus ``minimum.reduceat``
    segment minima for short docs. Returns ``(doc_idx, fp)`` — row i of
    the explode belongs to ``texts[doc_idx[i]]`` — with fp the signed
    view, distinct + ascending within doc."""
    n = len(texts)
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    if n == 0:
        return empty
    tok_lists = [t.split() for t in texts]
    tlens = np.fromiter((len(t) for t in tok_lists), np.int64, count=n)
    if int(tlens.sum()) == 0:
        return empty
    flat_toks = pa.array(
        [tok for toks in tok_lists for tok in toks], pa.string())
    tok_doc = np.repeat(np.arange(n, dtype=np.int64), tlens)
    m = len(flat_toks) - k + 1
    if m <= 0:
        return empty
    valid = tok_doc[:m] == tok_doc[k - 1:k - 1 + m]
    if not valid.any():
        return empty
    import pyarrow.compute as pc

    grams = pc.binary_join_element_wise(
        *[flat_toks.slice(i, m) for i in range(k)], " ")
    grams = grams.filter(pa.array(valid))
    gram_doc = tok_doc[:m][valid]
    garr = grams.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(garr, return_inverse=True)
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    uh = np.empty(len(uniq), np.uint64)
    for i, g in enumerate(uniq):
        h = cache.get(g)
        if h is None:
            h = cache[g] = _token_hash64(g)
        uh[i] = h
    hs = uh[inv]
    g_per_doc = np.bincount(gram_doc, minlength=n)
    starts = np.cumsum(g_per_doc) - g_per_doc
    sel_doc_parts, sel_val_parts = [], []
    if len(hs) >= w:
        from numpy.lib.stride_tricks import sliding_window_view

        M = sliding_window_view(hs, w).min(axis=1)
        win_ok = gram_doc[:len(M)] == gram_doc[w - 1:w - 1 + len(M)]
        sel_doc_parts.append(gram_doc[:len(M)][win_ok])
        sel_val_parts.append(M[win_ok])
    nz = g_per_doc > 0
    seg_min = np.minimum.reduceat(hs, starts[nz]) if nz.any() else hs[:0]
    small = g_per_doc[nz] < w  # scalar path: n<=w docs emit one global min
    # (g == w docs already produce exactly that one window above)
    sel_doc_parts.append(np.flatnonzero(nz)[small].astype(np.int64))
    sel_val_parts.append(seg_min[small])
    sel_doc = np.concatenate(sel_doc_parts)
    sel_val = np.concatenate(sel_val_parts).view(np.int64)
    order = np.lexsort((sel_val, sel_doc))
    sel_doc, sel_val = sel_doc[order], sel_val[order]
    keep = np.concatenate(([True], (sel_doc[1:] != sel_doc[:-1])
                           | (sel_val[1:] != sel_val[:-1])))
    return sel_doc[keep], sel_val[keep]


def winnow_table(batch: pa.Table, text_col: str = "text",
                 k: int = 3, w: int = 4) -> pa.Table:
    """map_batches kernel: explode each doc into (doc_id, fp) rows,
    fp = signed-int64 view of the winnowed fingerprint (two's
    complement — matches the SQL oracle's signed cast), sorted by
    signed value within doc. Batch-vectorized via
    ``winnow_fingerprints_batch``."""
    doc_ids = batch["doc_id"].to_numpy()
    di, fp = winnow_fingerprints_batch(batch[text_col].to_pylist(), k, w)
    return pa.table({
        "doc_id": pa.array(doc_ids[di].astype(np.int64), pa.int64()),
        "fp": pa.array(fp, pa.int64()),
    })


def regex_redact_table(batch: pa.Table, col: str, pattern: str,
                       replacement: str = "#",
                       id_col: str = "doc_id") -> pa.Table:
    """PII-style regex scrubbing: replace every match of ``pattern``
    (RE2 — identical semantics to DuckDB regexp_replace(..., 'g'))
    with ``replacement`` and count the matches, in two vectorized
    Arrow kernels. Emits (id, redacted, n_matched). The pattern is a
    plain string captured in the closure upstream — RE2 compiles once
    per process inside Arrow's kernel cache, so there is no per-batch
    compile cost to hoist into an actor."""
    red = pc.replace_substring_regex(batch[col], pattern=pattern,
                                     replacement=replacement)
    n = pc.count_substring_regex(batch[col], pattern).cast(pa.int64())
    return pa.table({id_col: batch[id_col], "redacted": red,
                     "n_matched": n})


def repetition_table(batch: pa.Table, text_col: str = "text",
                     gram_k: int = 3) -> pa.Table:
    """Gopher-style repetition signals per doc: token count, distinct
    token count, windowed word-``gram_k``-gram count and distinct gram
    count — the numerators/denominators of the duplicate-token and
    duplicate-n-gram ratios a quality filter thresholds on. Emitted as
    integers so the SQL oracle hashes exactly.

    Vectorized shape: one Arrow whitespace split + one dictionary
    encode feed everything; distinct-token and distinct-gram counts
    are two ``np.unique(axis=0)`` passes over (doc, code...) integer
    rows — exact (no hashing), one reduction per BATCH instead of a
    Python loop per doc."""
    n = len(batch)
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "n_distinct_tokens": pa.array([], pa.int64()),
        "n_grams": pa.array([], pa.int64()),
        "n_distinct_grams": pa.array([], pa.int64()),
    })
    if n == 0:
        return empty
    toks = pc.utf8_split_whitespace(batch[text_col])
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    # vocab-code the batch's token stream once; drop the empty tokens
    # Arrow's splitter emits for leading/trailing whitespace
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = parent[nonempty].astype(np.int64)
    codes = pc.dictionary_encode(flat.combine_chunks()).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)[nonempty]
    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
    pairs = np.stack([parent, codes], axis=1) if len(parent) else \
        np.zeros((0, 2), np.int64)
    dist_doc = np.unique(pairs, axis=0)[:, 0] if len(pairs) else \
        np.zeros(0, np.int64)
    n_distinct = np.bincount(dist_doc, minlength=n).astype(np.int64)
    # windowed k-grams: positions whose whole window stays in one doc
    m = len(codes)
    n_grams = np.maximum(n_tokens - (gram_k - 1), 0)
    if m >= gram_k:
        starts = np.arange(m - gram_k + 1)
        in_doc = parent[starts] == parent[starts + gram_k - 1]
        gs = starts[in_doc]
        rows = np.stack([parent[gs]] + [codes[gs + j]
                                        for j in range(gram_k)], axis=1)
        uniq_doc = (np.unique(rows, axis=0)[:, 0] if len(gs)
                    else np.zeros(0, np.int64))
        n_dist_grams = np.bincount(uniq_doc, minlength=n).astype(np.int64)
    else:
        n_dist_grams = np.zeros(n, dtype=np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
        "n_grams": pa.array(n_grams, pa.int64()),
        "n_distinct_grams": pa.array(n_dist_grams, pa.int64()),
    })


def gram_count_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Explode docs into unigram AND adjacent-bigram counts in ONE
    pass: a gram is either ``tok`` (unigram) or ``'tok1 tok2'``
    (bigram — the embedded space distinguishes the two families;
    tokens are whitespace-free by the ``\\S+`` tokenizer). Vectorized
    Arrow whitespace split; bigram adjacency = consecutive flattened
    tokens sharing a parent doc; one pandas value_counts per block."""
    import pandas as pd

    toks = pc.utf8_split_whitespace(batch[text_col])
    parent = pc.list_parent_indices(toks).to_numpy()
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    tok = flat.to_numpy(zero_copy_only=False)[keep]
    par = parent[keep]
    grams = [tok]
    if len(tok) >= 2:
        adj = par[1:] == par[:-1]
        if adj.any():
            w1 = pd.Series(tok[:-1][adj], dtype=object)
            w2 = pd.Series(tok[1:][adj], dtype=object)
            grams.append((w1 + " " + w2).to_numpy())
    vc = pd.Series(np.concatenate(grams)).value_counts()
    return pa.table({"gram": pa.array(vc.index, pa.string()),
                     "n": pa.array(vc.to_numpy(), pa.int64())})


def token_pos_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Explode docs into ordered (doc_id, pos, token) rows — the
    position-preserving explode (``term_freq_table`` drops order).
    pos is 0-based within the doc; vectorized Arrow whitespace split,
    positions from one global arange rebased at parent-run starts."""
    toks = pc.utf8_split_whitespace(batch[text_col])
    parent = pc.list_parent_indices(toks).to_numpy()
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    tok = flat.to_numpy(zero_copy_only=False)[keep]
    par = parent[keep]
    if len(par):
        new_run = np.concatenate(([True], par[1:] != par[:-1]))
        starts = np.flatnonzero(new_run)
        pos = np.arange(len(par)) - starts[np.cumsum(new_run) - 1]
    else:
        pos = np.array([], np.int64)
    return pa.table({
        "doc_id": batch["doc_id"].take(pa.array(par)),
        "pos": pa.array(pos, pa.int64()),
        "token": pa.array(tok, pa.string())})


def tokenize_ids(ds, text_col: str = "text"):
    """Corpus tokenizer: build the vocabulary (ids by count desc, token
    asc ties — the frequency-ranked id assignment of a word-level
    tokenizer) and encode every document as (doc_id, pos, token_id)
    rows — the text → training-tensor bridge (long format; framing to
    list<int> per doc is a downstream ``concat_groups``-style fold).

    Distributed shape: ONE position-preserving explode
    (``token_pos_table``, pinned) feeds both the vocabulary count
    aggregate (``groupby('token')`` hash shuffle, vocabulary-sized
    result) and — broadcast back via ``ray.put`` + per-worker cached
    pandas index — the streaming encode pass. The ranking of the tiny
    vocab table is a driver-side lexsort. Returns a streaming Dataset
    (doc_id, pos, token_id)."""
    import ray

    import pandas as pd

    tp = ds.map_batches(token_pos_table, batch_format="pyarrow").materialize()
    cnt_tbl = pa.concat_tables(
        list(tp.groupby("token").count()
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    toks = cnt_tbl["token"].to_numpy(zero_copy_only=False)
    cnts = cnt_tbl["count()"].to_numpy().astype(np.int64)
    order = np.lexsort((toks, -cnts))
    tid = np.empty(len(order), np.int64)
    tid[order] = np.arange(len(order))
    vocab_ref = ray.put(pa.table({"token": pa.array(toks, pa.string()),
                                  "tid": pa.array(tid, pa.int64())}))
    cache: dict = {}

    def encode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "token_id": pa.array([], pa.int64())})
        key = vocab_ref.hex()
        if key not in cache:
            v = ray.get(vocab_ref)
            cache[key] = (pd.Index(v["token"].to_pandas()),
                          v["tid"].to_numpy())
        index, tids = cache[key]
        ids = tids[index.get_indexer(batch["token"].to_pandas())]
        return pa.table({"doc_id": batch["doc_id"],
                         "pos": batch["pos"],
                         "token_id": pa.array(ids, pa.int64())})

    return tp.map_batches(encode, batch_format="pyarrow")


def bpe_learn_merges(ds, rounds: int = 6, text_col: str = "text"):
    """Learn the first ``rounds`` BPE merge rules from the corpus —
    the tokenizer-TRAINING step (Sennrich et al. 2016, public method):
    each round counts adjacent symbol pairs over the distinct-word
    table (weighted by word frequency), picks the most frequent pair
    (count desc, pair asc ties), and merges it everywhere.

    Distributed shape: the corpus-scale work is ONE native
    ``groupby(word)`` count (the explode + hash aggregate); the
    iterations then run over the collected DISTINCT-WORD table —
    vocabulary-bounded (loud guard), orders of magnitude smaller than
    the corpus, exactly how production BPE trainers work (running 13
    dataset executions over a vocabulary-sized table costs pure
    scheduling overhead — measured 17.6 s -> ~2 s at sf0.1).

    Merge semantics: symbol sequences are space-joined strings padded
    with one space on each side, and a merge is ONE left-to-right
    non-overlapping ``str.replace`` of ``' a b '`` — the same scan
    rule as SQL ``replace()``, so the twin reproduces every round
    bit-for-bit (immediately-consecutive occurrences defer to a later
    round; deterministic on both sides).

    Returns pandas (round, left, right, pair_count)."""
    import pandas as pd

    def words(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch[text_col]))
        s = toks.to_pandas()
        s = s[s != ""]
        vc = s.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    vocab_t = pa.concat_tables(list(
        ds.map_batches(words, batch_format="pyarrow")
        .groupby("word").sum("cnt")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert len(vocab_t) < 50_000_000, (
        "bpe_learn_merges: vocabulary is not driver-bounded")
    wlist = vocab_t["word"].to_pylist()
    cnts = vocab_t["sum(cnt)"].to_numpy().astype(np.int64)
    seqs = [" " + " ".join(w) + " " for w in wlist]

    out = []
    for r in range(1, rounds + 1):
        acc: dict = {}
        for s, c in zip(seqs, cnts):
            syms = s.split()
            c = int(c)
            for a, b in zip(syms, syms[1:]):
                k = (a, b)
                acc[k] = acc.get(k, 0) + c
        if not acc:
            break
        (wa, wb), wc = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, wa, wb, wc))
        pat, rep = f" {wa} {wb} ", f" {wa}{wb} "
        seqs = [s.replace(pat, rep) for s in seqs]

    return pd.DataFrame(out, columns=["round", "left", "right",
                                      "pair_count"])


def bpe_encode_lengths(ds, merges, text_col: str = "text"):
    """Apply learned BPE merge rules and report each document's
    encoded length in symbols — the tokenize-with-a-trained-tokenizer
    step that pairs with ``bpe_learn_merges`` (packing budgets and
    costs are denominated in TOKENS, not words). The distinct-word ->
    symbol-count map is built once by replaying the merge list
    (vocabulary-bounded) and broadcast via ``ray.put``; documents
    stream through one vectorized word-count + lookup pass (the same
    explode-free split every text stage uses).

    Returns a streaming Dataset (doc_id, n_words, n_symbols)."""
    import ray

    import pandas as pd

    def words(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch[text_col]))
        s = toks.to_pandas()
        s = s[s != ""]
        vc = s.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    vocab_t = pa.concat_tables(list(
        ds.map_batches(words, batch_format="pyarrow")
        .groupby("word").sum("cnt")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    wlist = vocab_t["word"].to_pylist()
    seqs = [" " + " ".join(w) + " " for w in wlist]
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        seqs = [s.replace(pat, rep) for s in seqs]
    n_syms = np.array([len(s.split()) for s in seqs], np.int64)
    ref = ray.put((pd.Index(wlist), n_syms))
    cache: dict = {}

    def encode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64()),
                             "n_symbols": pa.array([], pa.int64())})
        key = ref.hex()
        if key not in cache:
            cache[key] = ray.get(ref)
        index, lens = cache[key]
        toks = pc.utf8_split_whitespace(batch[text_col])
        parent = pc.list_parent_indices(toks).to_numpy()
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tok = flat.to_numpy(zero_copy_only=False)[keep]
        par = parent[keep]
        sym = lens[index.get_indexer(pd.Series(tok, dtype=object))]
        nw = np.bincount(par, minlength=len(batch)).astype(np.int64)
        ns = np.zeros(len(batch), np.int64)
        np.add.at(ns, par, sym)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_words": pa.array(nw, pa.int64()),
                         "n_symbols": pa.array(ns, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")


def compress_ratio(ds, level: int = 6, text_col: str = "text"):
    """Per-doc zlib compression ratio (ppm of original size) — the
    classic compressibility quality gate (Gopher-era): machine-
    generated/templated text compresses far below natural prose, and
    near-random noise barely compresses at all. Deflate is a C-level
    per-doc call (the same budget class as the PNG encode stage);
    streaming map_batches, no shuffle. NOT SQL-expressible (no deflate
    in DuckDB) — pytest-oracled: monotone repetitive < natural <
    random, byte-exact determinism. Returns a streaming Dataset
    (doc_id, n_bytes, ratio_ppm)."""
    import zlib

    def kern(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        raw = np.array([len(t.encode("utf8")) for t in texts], np.int64)
        comp = np.array(
            [len(zlib.compress(t.encode("utf8"), level)) for t in texts],
            np.int64)
        nz = np.maximum(raw, 1)
        ppm = (comp * 1_000_000 // nz).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bytes": pa.array(raw, pa.int64()),
                         "ratio_ppm": pa.array(ppm, pa.int64())})

    return ds.map_batches(kern, batch_format="pyarrow")


def doc_entropy(ds, text_col: str = "text"):
    """Per-document token-distribution Shannon entropy (micro-nats) —
    the lexical-diversity quality signal (templated/spammy text has
    abnormally LOW entropy for its length; `repetition` measures
    duplicate mass, this measures distributional flatness).
    Shuffle-free: documents are whole within blocks after the
    ``term_freq_table`` explode, so H = ln(t) − Σ tf·ln(tf) / t
    finalizes with two reduceats per block (identical float expression
    to the SQL twin, micro-rounded like ``grouped_entropy``).
    Returns a streaming Dataset (doc_id, n_tokens, entropy_micro)."""

    def kern(batch: pa.Table) -> pa.Table:
        tf_t = term_freq_table(batch, text_col)
        if len(tf_t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "entropy_micro": pa.array([], pa.int64())})
        doc = tf_t["doc_id"].to_numpy()
        tf = tf_t["tf"].to_numpy().astype(np.float64)
        order = np.argsort(doc, kind="stable")
        d_s, f_s = doc[order], tf[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1])))
        tot = np.add.reduceat(f_s, starts)
        flnf = np.add.reduceat(f_s * np.log(f_s), starts)
        ent = np.log(tot) - flnf / tot
        return pa.table({
            "doc_id": pa.array(d_s[starts], pa.int64()),
            "n_tokens": pa.array(tot.astype(np.int64), pa.int64()),
            "entropy_micro": pa.array(np.round(ent * 1e6).astype(np.int64),
                                      pa.int64())})

    return ds.map_batches(kern, batch_format="pyarrow")


def hash_features(ds, d: int = 64, text_col: str = "text"):
    """Feature-hashing featurizer (the hashing trick, Weinberger et
    al. 2009, public method): each document becomes a sparse d-dim
    bag-of-words vector with NO vocabulary pass — dimension =
    md5-top-32(token) % d, sign = one extra md5 bit, weight =
    Σ sign·tf. The constant-memory featurizer in front of linear
    probes / cheap classifiers when a vocab table is unwanted.

    Streaming, shuffle-free: one explode (``term_freq_table``; docs
    are whole within blocks), vectorized md5 dims/signs, one pandas
    per-block (doc, dim) fold. Emits long-format
    (doc_id, dim, weight) rows for non-zero cells."""
    import pandas as pd

    from ..fingerprint import md5_hex_batch

    def featurize(batch: pa.Table) -> pa.Table:
        tf = term_freq_table(batch, text_col)
        if len(tf) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64())})
        hexes = md5_hex_batch(np.asarray(tf["token"].to_pylist(),
                                         dtype=object))
        top32 = np.array([int(h[:8], 16) for h in hexes], np.int64)
        sign_bit = np.array([int(h[8], 16) & 1 for h in hexes], np.int64)
        dim = top32 % d
        w = (2 * sign_bit - 1) * tf["tf"].to_numpy()
        df = (pd.DataFrame({"doc_id": tf["doc_id"].to_numpy(),
                            "dim": dim, "weight": w})
              .groupby(["doc_id", "dim"], as_index=False).sum())
        df = df[df["weight"] != 0]
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(),
                                            pa.int64()),
                         "dim": pa.array(df["dim"].to_numpy(), pa.int64()),
                         "weight": pa.array(df["weight"].to_numpy(),
                                            pa.int64())})

    return ds.map_batches(featurize, batch_format="pyarrow")


def gram_novelty(ds, k: int = 4, text_col: str = "text"):
    """Per-doc gram novelty: of a document's DISTINCT word-``k``-grams,
    how many appear nowhere else in the corpus (df == 1) — high
    novelty = unique content, low = boilerplate / near-copies; the
    inverse-memorization curation signal.

    Distributed shape — two NATIVE hash aggregates, zero per-key UDF
    calls (gram and doc cardinality are both corpus-scale, so a
    map_groups per key would be the 10^9-key wall): explode each doc
    into distinct (doc_id, gram) rows; ``groupby(gram)`` with
    (count, min(doc_id)) — rows are per-doc distinct so count IS df,
    and a df-1 gram's sole doc IS its min — yields one slim
    (doc_id, novel=1) row per unique gram; per-doc gram totals are
    per-block partials off the same explode; one union +
    ``groupby(doc_id).sum`` folds both into (n_grams, n_novel).
    Grams ride the exchange as md5-64 hashes (8 B/row; the SQL twin
    hashes with the identical expression, so the operator is exact
    by construction). Docs with < k tokens have no grams and are
    absent.

    Returns a streaming Dataset (doc_id, n_grams, n_novel)."""

    def explode(batch: pa.Table) -> pa.Table:
        # per-doc DISTINCT md5-64 gram hashes (memoized per worker):
        # 8 B/row through the exchange instead of ~25 B gram strings —
        # measured 13.1 s -> string payload dominated the groupby; the
        # SQL twin hashes with the identical md5 expression, so even a
        # (2^-64-scale) collision would land on BOTH sides equally and
        # the operator stays exact by construction
        from .dedup import word_shingles

        ids = batch["doc_id"].to_numpy()
        hs = [word_shingles(t, k, strict=True)
              for t in batch[text_col].to_pylist()]
        lens = np.array([len(x) for x in hs], np.int64)
        if lens.sum() == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.uint64())})
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            "gram": pa.array(np.concatenate(
                [x for x in hs if len(x)]), pa.uint64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()

    def novel_block(batch: pa.Table) -> pa.Table:
        # complete gram groups per block: one lexsort + run walk gives
        # (df, min_doc) per gram with ZERO per-key Python calls
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_grams": pa.array([], pa.int64()),
                          "n_novel": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        g = batch["gram"].to_numpy()
        d = batch["doc_id"].to_numpy()
        order = np.lexsort((d, g))
        g_s, d_s = g[order], d[order]
        new_run = np.concatenate(([True], g_s[1:] != g_s[:-1]))
        starts = np.flatnonzero(new_run)
        df = np.diff(np.append(starts, len(g_s)))
        sole = df == 1  # df-1 gram's sole doc is the run's only row
        docs = d_s[starts][sole]
        if not len(docs):
            return empty
        ud, cnt = np.unique(docs, return_counts=True)
        return pa.table({
            "doc_id": pa.array(ud, pa.int64()),
            "n_grams": pa.array(np.zeros(len(ud), np.int64), pa.int64()),
            "n_novel": pa.array(cnt.astype(np.int64), pa.int64())})

    from .relational import cluster_cpus, task_exchange

    if cluster_cpus() >= 16:
        # corpus-scale distinct grams hit Ray's native sort-aggregate
        # per-group overhead (measured 14.3 s for 210k groups at sf0.1
        # — the aggregate, not the exchange); the key-hash repartition
        # + whole-block kernel runs the same reduction in ~1 s
        novel = task_exchange(exploded, "gram", novel_block)
    else:
        from ray.data.aggregate import Count, Min

        def novel_rows(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch["count()"], pa.scalar(1, pa.int64()))
            kept = batch.filter(m)
            return pa.table({
                "doc_id": kept["min(doc_id)"].cast(pa.int64()),
                "n_grams": pa.array(np.zeros(len(kept), np.int64),
                                    pa.int64()),
                "n_novel": pa.array(np.ones(len(kept), np.int64),
                                    pa.int64())})

        novel = exploded.groupby("gram").aggregate(
            Count(), Min("doc_id")).map_batches(
            novel_rows, batch_format="pyarrow")

    def total_rows(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        order = np.argsort(doc, kind="stable")
        d_s = doc[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1]))) \
            if len(d_s) else np.array([], np.int64)
        cnt = np.diff(np.concatenate((starts, [len(d_s)]))) \
            if len(d_s) else np.array([], np.int64)
        return pa.table({
            "doc_id": pa.array(d_s[starts] if len(d_s) else [], pa.int64()),
            "n_grams": pa.array(cnt, pa.int64()),
            "n_novel": pa.array(np.zeros(len(cnt), np.int64), pa.int64())})

    totals = exploded.map_batches(total_rows, batch_format="pyarrow")
    unioned = totals.union(novel)
    if cluster_cpus() >= 16:
        # same key-hash + whole-block segment-sum shape as the gram
        # reduction above — the native sum on the hash-context-carrying
        # union measured 10-20 s of aggregator stall (COVERAGE.md's
        # hash-exchange-stall note), the explicit repartition ~1 s
        def sum_block(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_grams": pa.array([], pa.int64()),
                                 "n_novel": pa.array([], pa.int64())})
            d = batch["doc_id"].to_numpy()
            order = np.argsort(d, kind="stable")
            d_s = d[order]
            ng = batch["n_grams"].to_numpy()[order]
            nn = batch["n_novel"].to_numpy()[order]
            starts = np.flatnonzero(
                np.concatenate(([True], d_s[1:] != d_s[:-1])))
            return pa.table({
                "doc_id": pa.array(d_s[starts], pa.int64()),
                "n_grams": pa.array(
                    np.add.reduceat(ng, starts).astype(np.int64),
                    pa.int64()),
                "n_novel": pa.array(
                    np.add.reduceat(nn, starts).astype(np.int64),
                    pa.int64())})

        return task_exchange(unioned, "doc_id", sum_block)
    combined = unioned.groupby("doc_id").sum(["n_grams", "n_novel"])
    return combined.map_batches(lambda b: pa.table({
        "doc_id": b["doc_id"],
        "n_grams": b["sum(n_grams)"].cast(pa.int64()),
        "n_novel": b["sum(n_novel)"].cast(pa.int64())}),
        batch_format="pyarrow")


def doc_gram_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc unigram AND adjacent-bigram counts in ONE explode pass
    (doc_id, gram, tf) — ``gram_count_table`` with doc attribution
    kept, for per-doc LM scoring. A gram with an embedded space is a
    bigram (tokens are whitespace-free by the ``\\S+`` tokenizer)."""
    import pandas as pd

    toks = pc.utf8_split_whitespace(batch[text_col])
    parent = pc.list_parent_indices(toks).to_numpy()
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    tok = flat.to_numpy(zero_copy_only=False)[keep]
    par = parent[keep]
    doc_ids = batch["doc_id"].to_numpy()
    frames = [pd.DataFrame({"doc_id": doc_ids[par], "gram": tok})]
    if len(tok) >= 2:
        adj = par[1:] == par[:-1]
        if adj.any():
            w1 = pd.Series(tok[:-1][adj], dtype=object)
            w2 = pd.Series(tok[1:][adj], dtype=object)
            frames.append(pd.DataFrame(
                {"doc_id": doc_ids[par[:-1][adj]],
                 "gram": (w1 + " " + w2).to_numpy()}))
    df = (pd.concat(frames).groupby(["doc_id", "gram"], as_index=False)
          .size().rename(columns={"size": "tf"}))
    df["tf"] = df["tf"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def bigram_logprob(ds, cut_micro: int = -3_420_000):
    """Bigram-LM perplexity-style quality score: each document's sum of
    Laplace-smoothed conditional bigram log-probs under the corpus's
    OWN bigram LM — ``lp(w2|w1) = ln((c(w1 w2)+1) / (c(w1)+V))`` with
    V = unigram vocabulary size — plus a keep flag (mean bigram
    logprob >= cut_micro/1e6). The step up from ``unigram_logprob``
    toward the CCNet/Gopher perplexity filters: word-ORDER now matters
    (scrambled text scores far below natural text).

    Distributed shape: ONE explode pass (``doc_gram_table``, pinned)
    feeds both the corpus LM aggregate (``groupby('gram').sum`` — a
    vocab + distinct-bigram sized result, << corpus) and the scoring
    pass. Unigram counts broadcast once (vocabulary-bounded, the same
    class as ``pmi_top_bigrams``); per-bigram integer micro log-probs
    are computed streaming over the aggregate and broadcast
    (distinct-bigram-bounded); the scoring pass is a vectorized
    gram->lp lookup + run-aware reduceat per doc. Integer micro-units
    keep the doc score an order-free INTEGER sum (SQL-exact). Docs
    with < 2 tokens have no bigram evidence and are absent.

    Returns a streaming Dataset (doc_id, n_bigrams, logprob_micro,
    keep)."""
    import ray

    import pandas as pd

    dg = ds.map_batches(doc_gram_table, batch_format="pyarrow").materialize()
    counts = (dg.groupby("gram").sum("tf")
              .map_batches(lambda b: pa.table({
                  "gram": b["gram"],
                  "n": b["sum(tf)"].cast(pa.int64())}),
                  batch_format="pyarrow")
              .materialize())

    uni = pa.concat_tables(list(
        counts.map_batches(
            lambda b: b.filter(pc.invert(pc.match_substring(b["gram"], " "))),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    v_size = float(len(uni))
    uni_ref = ray.put(dict(zip(uni["gram"].to_pylist(),
                               uni["n"].to_pylist())))

    def bigram_lp(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.match_substring(batch["gram"], " "))
        if len(batch) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "lp": pa.array([], pa.int64())})
        umap = ray.get(uni_ref)
        c1 = np.array([umap[g.split(" ", 1)[0]]
                       for g in batch["gram"].to_pylist()], np.float64)
        n = batch["n"].to_numpy().astype(np.float64)
        # expression shape mirrors the SQL twin: one division, ln, *1e6
        micro = np.round(np.log((n + 1.0) / (c1 + v_size)) * 1e6) \
            .astype(np.int64)
        return pa.table({"gram": batch["gram"],
                         "lp": pa.array(micro, pa.int64())})

    lp_tbl = pa.concat_tables(list(
        counts.map_batches(bigram_lp, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    lp_ref = ray.put(lp_tbl)
    cache: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.match_substring(batch["gram"], " "))
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "logprob_micro": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.bool_())})
        key = lp_ref.hex()
        if key not in cache:
            t = ray.get(lp_ref)
            cache[key] = (pd.Index(t["gram"].to_pandas()),
                          t["lp"].to_numpy())
        index, lps = cache[key]
        lp = lps[index.get_indexer(batch["gram"].to_pandas())]
        tfv = batch["tf"].to_numpy()
        doc = batch["doc_id"].to_numpy()
        order = np.argsort(doc, kind="stable")
        d_s, tf_s, lp_s = doc[order], tfv[order], lp[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1])))
        n_bi = np.add.reduceat(tf_s, starts)
        lp_sum = np.add.reduceat(tf_s * lp_s, starts)
        return pa.table({
            "doc_id": pa.array(d_s[starts], pa.int64()),
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "logprob_micro": pa.array(lp_sum, pa.int64()),
            "keep": pa.array(lp_sum >= n_bi * cut_micro, pa.bool_()),
        })

    return dg.map_batches(score, batch_format="pyarrow", batch_size=None)


def pmi_top_bigrams(ds, k: int = 20, min_count: int = 5,
                    text_col: str = "text"):
    """Top-k bigram collocations by pointwise mutual information:
    pmi = ln(c_xy * N_uni^2 / (N_bi * c_x * c_y)), micro-rounded as
    floor(pmi * 1e6 + 0.5) for integer-exact oracle parity.

    Distributed shape: ONE explode pass emits unigram + bigram counts
    together (``gram_count_table``), ONE groupby exchange aggregates
    them, and the aggregate is pinned (vocab + distinct-bigram sized,
    << corpus) so the unigram collect, the N_bi sum and the scoring
    pass share it. Unigram counts broadcast once via ray.put (bounded
    by vocabulary — the same class of small-side broadcast as
    ``decontaminate``'s eval-gram set); scoring + the >= min_count
    support filter stream over bigram blocks with a per-block partial
    top-k and a tiny driver merge (``relational.global_topk``)."""
    import ray

    from .relational import global_topk

    counts = (ds.map_batches(gram_count_table, batch_format="pyarrow")
              .groupby("gram").sum("n")
              .map_batches(lambda b: pa.table({
                  "gram": b["gram"],
                  "n": b["sum(n)"].cast(pa.int64())}),
                  batch_format="pyarrow")
              .materialize())

    def unigrams_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.match_substring(b["gram"], " ")))

    uni = pa.concat_tables(list(
        counts.map_batches(unigrams_only, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    uni_map = dict(zip(uni["gram"].to_pylist(), uni["n"].to_pylist()))
    n_uni = float(sum(uni_map.values()))
    uni_ref = ray.put(uni_map)

    bi = counts.map_batches(
        lambda b: b.filter(pc.match_substring(b["gram"], " ")),
        batch_format="pyarrow")
    n_bi = float(bi.sum("n"))

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater_equal(batch["n"], pa.scalar(min_count, pa.int64())))
        umap = ray.get(uni_ref)
        grams = batch["gram"].to_pylist()
        pairs = [g.split(" ", 1) for g in grams]
        c1 = np.array([umap[p[0]] for p in pairs], np.float64)
        c2 = np.array([umap[p[1]] for p in pairs], np.float64)
        n = batch["n"].to_numpy().astype(np.float64)
        # expression shape mirrors the SQL twin exactly (left-assoc
        # products, one division, floor(x*1e6 + 0.5))
        x = (n * n_uni * n_uni) / (n_bi * c1 * c2)
        micro = np.floor(np.log(x) * 1e6 + 0.5).astype(np.int64)
        return pa.table({"gram": batch["gram"], "n": batch["n"],
                         "pmi_micro": pa.array(micro, pa.int64())})

    top = global_topk(bi.map_batches(score, batch_format="pyarrow"),
                      "pmi_micro", k, descending=True, tiebreak="gram")
    import pandas as pd
    df = top.to_pandas()
    split = df["gram"].str.split(" ", n=1, expand=True)
    out = pd.DataFrame({"w1": split[0], "w2": split[1],
                        "n": df["n"], "pmi_micro": df["pmi_micro"]})
    return (out.sort_values(["pmi_micro", "w1", "w2"],
                            ascending=[False, True, True])
            .reset_index(drop=True))


def heavy_hitters(ds, support_num: int, support_den: int,
                  text_col: str = "text"):
    """EXACT frequent tokens (count >= support_num/support_den of the
    total token stream) in two streaming passes and NO all-to-all —
    the heavy-hitter shape for vocabularies too large to groupby-shuffle:

    1. Candidates: per block, keep tokens whose BLOCK frequency meets
       the support threshold. Pigeonhole guarantee: a token at >= s of
       the global stream is at >= s of at least one block's stream
       (if it were below s everywhere, the sum would be below s), so
       the union over blocks is a superset of the answer, bounded by
       den/num entries per block. The same pass emits one sentinel row
       per block carrying the block's token total (token=NULL), so the
       global N needs no extra pass.
    2. Exact recount: broadcast the candidate array (tiny by the bound
       above), count ONLY candidates per block, merge the partial
       counts on the driver and apply the exact integer threshold
       cnt * den >= num * N.

    Returns a pandas DataFrame (token, cnt), exact. Counts use the
    same whitespace tokenization as the rest of the text family."""
    import ray

    import pandas as pd

    num, den = int(support_num), int(support_den)

    def block_counts(batch: pa.Table, only=None) -> "pd.Series":
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch[text_col]))
        s = toks.to_pandas()
        s = s[s != ""]
        if only is not None:
            s = s[s.isin(only)]
        return s.value_counts()

    def candidates(batch: pa.Table) -> pa.Table:
        vc = block_counts(batch)
        total = int(vc.sum())
        keep = vc[vc * den >= num * total]
        return pa.table({
            "token": pa.array(list(keep.index) + [None], pa.string()),
            "n": pa.array(list(keep.to_numpy()) + [total], pa.int64()),
        })

    parts = pa.concat_tables(list(
        ds.map_batches(candidates, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    mask = pc.is_valid(parts["token"]).to_numpy(zero_copy_only=False)
    n_total = int(parts["n"].to_numpy()[~mask].sum())
    cand = pd.unique(parts["token"].to_pandas()[mask])
    cand_ref = ray.put(set(cand))

    def recount(batch: pa.Table) -> pa.Table:
        vc = block_counts(batch, only=ray.get(cand_ref))
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    partials = pa.concat_tables(list(
        ds.map_batches(recount, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    merged = (partials.to_pandas().groupby("token", as_index=False)["cnt"]
              .sum())
    out = merged[merged["cnt"] * den >= num * n_total]
    return out.sort_values("token").reset_index(drop=True)


def collect_eval_gram_hashes(eval_ds, text_col: str = "text",
                             k: int = 5) -> np.ndarray:
    """Distinct md5-64 word-``k``-gram hashes of an EVAL/benchmark
    corpus, as one sorted uint64 array. Benchmarks are small by
    construction (MBs of text vs a 100-TB training corpus), so the
    right cluster shape is: reduce per-batch distinct hashes in
    parallel, union the per-batch sets on the driver, then ``ray.put``
    the array ONCE for every decontamination worker to binary-search —
    never a corpus-side shuffle."""
    from .dedup import word_shingles

    def grams(batch: pa.Table) -> pa.Table:
        hs = [word_shingles(t, k=k, strict=True)
              for t in batch[text_col].to_pylist()]
        flat = (np.unique(np.concatenate(hs)) if hs
                else np.zeros(0, np.uint64))
        return pa.table({"h": pa.array(flat.view(np.int64), pa.int64())})

    parts = [b["h"].to_numpy() for b in
             eval_ds.map_batches(grams, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if len(b)]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts)).view(np.uint64)


def decontaminate(train_ds, eval_hashes_ref, text_col: str = "text",
                  k: int = 5):
    """Benchmark decontamination flag: a training doc is contaminated
    iff it shares ANY word-``k``-gram with the eval corpus
    (``eval_hashes_ref`` = ray.put of ``collect_eval_gram_hashes``).
    Streaming map_batches — each worker fetches the broadcast hash set
    once (plasma-cached on the node) and runs one np.isin per batch.
    Emits (doc_id, contaminated 0/1). Windowed-gram semantics: a doc
    with fewer than k tokens has no grams and is never contaminated —
    mirrors the SQL oracle exactly."""
    from .dedup import word_shingles

    def flag(batch: pa.Table) -> pa.Table:
        import ray

        ev = ray.get(eval_hashes_ref)
        out = np.zeros(len(batch), dtype=np.int32)
        for i, t in enumerate(batch[text_col].to_pylist()):
            hs = word_shingles(t, k=k, strict=True)
            if len(hs) and np.isin(hs, ev, assume_unique=True).any():
                out[i] = 1
        return pa.table({"doc_id": batch["doc_id"],
                         "contaminated": pa.array(out, pa.int32())})

    return train_ds.map_batches(flag, batch_format="pyarrow")


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    # vectorized popcount via byte view
    bytes_ = x.view(np.uint8).reshape(len(x), 8) if len(x) else x.view(np.uint8)
    return np.unpackbits(bytes_, axis=1).sum(axis=1) if len(x) else np.zeros(0, int)


def unigram_logprob(ds, cut_micro: int = -3_405_000):
    """CCNet-style corpus-statistics quality scoring: each document's
    mean unigram log-probability under the corpus's OWN unigram LM,
    plus a keep flag (``mean token logprob >= cut_micro/1e6``) — the
    standard perplexity-bucket filter of LLM-data pipelines, with the
    corpus itself standing in for the external LM (no model files in
    this sandbox; swapping in pretrained counts is a broadcast-table
    change).

    Distributed shape (two streaming passes over ONE materialized
    explode, mirroring ``tfidf_top_terms``):

    - ``term_freq_table`` explode, pinned so the count aggregate and
      the scoring pass share one execution;
    - corpus term counts = ``groupby('token').sum('tf')`` (vocabulary-
      sized result), turned into integer micro-unit log-probs
      ``round(ln(count/total)*1e6)`` on the driver and broadcast with
      ``ray.put`` + a per-worker cached pandas index;
    - a streaming scoring pass: vectorized token->lp lookup, per-doc
      sums via run-aware ``np.add.reduceat`` (docs are whole within
      blocks by construction of the explode).

    Integer micro-units make the doc score an INTEGER sum — exactly
    reproducible in SQL regardless of float summation order; ln() is
    the only float op and it is per-VOCAB-ENTRY, not per-row. Docs
    with zero tokens have no unigram evidence and are absent from the
    output (both sides of the oracle scope to docs with >=1 token).

    Returns a streaming Dataset (doc_id, n_tokens, logprob_micro,
    keep)."""
    import ray

    import pandas as pd

    tf = ds.map_batches(term_freq_table, batch_format="pyarrow").materialize()
    cnt_tbl = pa.concat_tables(
        list(tf.groupby("token").sum("tf")
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    cnts = cnt_tbl["sum(tf)"].to_numpy().astype(np.int64)
    total = int(cnts.sum())
    lp_micro = np.round(np.log(cnts / total) * 1e6).astype(np.int64)
    vocab_ref = ray.put(pa.table({"token": cnt_tbl["token"],
                                  "lp": pa.array(lp_micro, pa.int64())}))
    cache: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "logprob_micro": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.bool_())})
        key = vocab_ref.hex()
        if key not in cache:
            vocab = ray.get(vocab_ref)
            cache[key] = (pd.Index(vocab["token"].to_pandas()),
                          vocab["lp"].to_numpy())
        index, lps = cache[key]
        lp = lps[index.get_indexer(batch["token"].to_pandas())]
        tfv = batch["tf"].to_numpy()
        doc = batch["doc_id"].to_numpy()
        order = np.argsort(doc, kind="stable")
        d_s, tf_s, lp_s = doc[order], tfv[order], lp[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1])))
        n_tok = np.add.reduceat(tf_s, starts)
        lp_sum = np.add.reduceat(tf_s * lp_s, starts)
        return pa.table({
            "doc_id": pa.array(d_s[starts], pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "logprob_micro": pa.array(lp_sum, pa.int64()),
            "keep": pa.array(lp_sum >= n_tok * cut_micro, pa.bool_()),
        })

    return tf.map_batches(score, batch_format="pyarrow", batch_size=None)


def chunk_table(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id", size: int = 256,
                stride: int = 192) -> pa.Table:
    """Overlapping fixed-window document chunking (the 1->N flat-map
    step ahead of tokenize/pack in a training pipeline): chunk i of a
    doc covers characters [i*stride, i*stride + size); a doc of n
    chars yields 1 + ceil(max(n - size, 0) / stride) chunks, so every
    character is covered and consecutive chunks overlap by
    size - stride. Counts/offsets are vectorized (np.repeat over
    per-doc chunk counts); the slice assembly is a C-level str-slice
    comprehension — overlapping substrings cannot share one Arrow
    buffer (offsets must be monotone), so a copy per chunk is the
    floor."""
    n = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    k = 1 + np.ceil(np.maximum(n - size, 0) / stride).astype(np.int64)
    rep = np.repeat(np.arange(len(n)), k)
    starts = (np.arange(len(rep))
              - np.repeat(np.concatenate(([0], np.cumsum(k)[:-1])), k))
    texts = batch[text_col].to_pylist()
    chunks = [texts[d][i * stride:i * stride + size]
              for d, i in zip(rep, starts)]
    return pa.table({
        id_col: batch[id_col].take(pa.array(rep)),
        "chunk_id": pa.array(starts, pa.int64()),
        "chunk": pa.array(chunks, pa.string()),
    })


def json_scalar_i64(col: pa.ChunkedArray | pa.Array, key: str):
    """Vectorized extraction of a FLAT integer field from a JSON-string
    column: one RE2 ``extract_regex`` pass over Arrow buffers — the
    semi-structured-telemetry fast path (no per-row json.loads). Rows
    without the key (or non-flat documents where the first match would
    be wrong) come back NULL; nested/escaped JSON should route to an
    actor-pool stage with a real parser instead — this kernel is for
    the flat ``{"k": 1, ...}`` event-props shape. Returns
    (values int64-with-nulls, found bool ndarray)."""
    import re

    pat = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)'
    m = pc.extract_regex(col, pat)
    s = pc.struct_field(m, "v")
    found = pc.is_valid(s).to_numpy(zero_copy_only=False)
    return pc.cast(s, pa.int64()), found


def grouped_heavy_hitters(ds, group_col: str, support_num: int,
                          support_den: int, text_col: str = "text"):
    """EXACT per-group frequent tokens (count >= num/den of the GROUP's
    token stream) — ``heavy_hitters`` with the pigeonhole argument
    applied per group: a token at >= s of group g's stream is at >= s
    of g's sub-stream in at least one block, so per-(block, group)
    candidates union to a superset (bounded by den/num entries per
    group per block). Same two streaming passes, NO all-to-all; the
    per-group token totals ride sentinel rows (token NULL). The
    per-language vocabulary profile a multilingual curation pass needs.
    Returns a pandas DataFrame (group, token, cnt) sorted."""
    import ray

    import pandas as pd

    num, den = int(support_num), int(support_den)

    def pair_counts(batch: pa.Table, only=None) -> "pd.DataFrame":
        toks = pc.utf8_split_whitespace(batch[text_col])
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        df = pd.DataFrame({
            "g": batch[group_col].to_pandas().iloc[
                parent.to_numpy()].to_numpy(),
            "token": flat.to_pandas().to_numpy(),
        })
        df = df[df["token"] != ""]
        if only is not None:
            df = df[df["token"].isin(only)]
        return df.groupby(["g", "token"], as_index=False).size()

    def candidates(batch: pa.Table) -> pa.Table:
        vc = pair_counts(batch)
        if len(vc) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        totals = vc.groupby("g")["size"].transform("sum")
        keep = vc[vc["size"] * den >= num * totals]
        sent = vc.groupby("g", as_index=False)["size"].sum()
        return pa.table({
            "g": pa.array(list(keep["g"]) + list(sent["g"]), pa.string()),
            "token": pa.array(list(keep["token"]) + [None] * len(sent),
                              pa.string()),
            "n": pa.array(list(keep["size"]) + list(sent["size"]),
                          pa.int64()),
        })

    parts = pa.concat_tables(list(
        ds.map_batches(candidates, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    pdf = parts.to_pandas()
    sent = pdf[pdf["token"].isna()]
    totals = sent.groupby("g")["n"].sum()  # exact per-group stream size
    cand = pdf[~pdf["token"].isna()][["g", "token"]].drop_duplicates()
    cand_ref = ray.put(set(cand["token"]))

    def recount(batch: pa.Table) -> pa.Table:
        vc = pair_counts(batch, only=ray.get(cand_ref))
        return pa.table({"g": pa.array(vc["g"], pa.string()),
                         "token": pa.array(vc["token"], pa.string()),
                         "cnt": pa.array(vc["size"], pa.int64())})

    partials = pa.concat_tables(list(
        ds.map_batches(recount, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    merged = (partials.to_pandas()
              .groupby(["g", "token"], as_index=False)["cnt"].sum())
    merged["total"] = merged["g"].map(totals).astype("int64")
    out = merged[merged["cnt"] * den >= num * merged["total"]]
    out = out[["g", "token", "cnt"]].rename(columns={"g": group_col})
    return out.sort_values([group_col, "token"]).reset_index(drop=True)


def bm25_topk(ds, query_tokens, k: int = 20, k1: float = 1.2,
              b: float = 0.75, text_col: str = "text"):
    """Distributed BM25 retrieval scoring (Robertson/Spärck Jones; the
    Lucene idf variant ln((N−df+0.5)/(df+0.5)+1)) for a FIXED query —
    the search / contamination-probe shape: score every document
    against ``query_tokens``, return the global top-k.

    Scale shape: ONE explode pass produces the compact per-doc
    feature row (doc_id, len, tf per query token — q+2 ints, tiny vs
    the corpus) which is materialized once and feeds BOTH the corpus
    statistics (a register combine: n_docs, Σlen, df per token — one
    row per block moves) and the scoring pass (streaming; per-block
    partial top-k, driver merges block winners, ``brute_force_topk``
    style). The query is bounded, so — unlike ``tfidf_top_terms`` —
    no vocabulary-sized broadcast exists at any scale.

    Floats: both sides of the oracle compute the IDENTICAL expression
    tree ((tf·(k1+1)) / (tf + k1·((1−b) + b·(len/avglen)))), so the
    micro-rounded scores hash-match SQL bit for bit (see
    oracle_sql()['bm25_topk'])."""
    import pandas as pd

    q = list(query_tokens)
    qidx = {t: i for i, t in enumerate(q)}
    nq = len(q)

    def doc_features(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": pa.array([], pa.int64()),
                "len": pa.array([], pa.int64())}
        cols.update({f"tf{i}": pa.array([], pa.int64())
                     for i in range(nq)})
        if len(batch) == 0:
            return pa.table(cols)
        toks = pc.utf8_split_whitespace(batch[text_col])
        # whitespace split of leading/trailing space yields '' tokens;
        # match the \S+ oracle by not counting them
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy()
        nonempty = pc.not_equal(flat, "")
        lens = np.zeros(len(batch), np.int64)
        np.add.at(lens, parent, nonempty.to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        tf = np.zeros((len(batch), nq), np.int64)
        svals = flat.to_pandas()
        qi = svals.map(qidx).to_numpy()
        hit = ~pd.isna(qi)
        hit &= nonempty.to_numpy(zero_copy_only=False)
        if hit.any():
            np.add.at(tf, (parent[hit], qi[hit].astype(np.int64)), 1)
        out = {"doc_id": batch["doc_id"],
               "len": pa.array(lens, pa.int64())}
        out.update({f"tf{i}": pa.array(tf[:, i], pa.int64())
                    for i in range(nq)})
        return pa.table(out)

    feats = ds.map_batches(doc_features, batch_format="pyarrow") \
        .materialize()

    # register combine: (n_docs, sum_len, df_0..df_{q-1}) per block
    def stats_partial(batch: pa.Table) -> pa.Table:
        row = [float(len(batch)),
               float(batch["len"].to_numpy().sum() if len(batch) else 0)]
        for i in range(nq):
            row.append(float((batch[f"tf{i}"].to_numpy() > 0).sum()
                             if len(batch) else 0))
        return pa.table({"r": pa.array(
            [np.asarray(row, np.float64)], pa.list_(pa.float64()))})

    acc = np.zeros(2 + nq, np.float64)
    for t in feats.map_batches(stats_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in t["r"].to_pylist():
            acc += np.asarray(row, np.float64)
    n_docs, sum_len = acc[0], acc[1]
    dfs = acc[2:]
    avglen = sum_len / n_docs
    idf = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)

    def score_partial_topk(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score_micro": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        lens = batch["len"].to_numpy().astype(np.float64)
        norm = k1 * ((1.0 - b) + b * (lens / avglen))
        # each TERM is micro-rounded before the integer sum, so the
        # score is independent of summation order and the SQL twin
        # (same expression tree per term) hash-matches bit for bit
        micro = np.zeros(len(batch), np.int64)
        for i in range(nq):  # bounded by |query|, not data
            tfv = batch[f"tf{i}"].to_numpy().astype(np.float64)
            term = idf[i] * ((tfv * (k1 + 1.0)) / (tfv + norm))
            micro += np.round(term * 1e6).astype(np.int64)
        doc = batch["doc_id"].to_numpy()
        pos = micro > 0  # no-hit docs are not retrieval candidates
        micro, doc = micro[pos], doc[pos]
        order = np.lexsort((doc, -micro))[:k]
        return pa.table({"doc_id": pa.array(doc[order], pa.int64()),
                         "score_micro": pa.array(micro[order],
                                                 pa.int64())})

    parts = [t for t in feats.map_batches(
        score_partial_topk, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None) if len(t)]
    import pandas as _pd

    if not parts:
        return _pd.DataFrame({"doc_id": _pd.Series([], dtype="int64"),
                              "score_micro": _pd.Series([], dtype="int64")})
    allp = pa.concat_tables(parts).to_pandas()
    return (allp.sort_values(["score_micro", "doc_id"],
                             ascending=[False, True])
            .head(k).reset_index(drop=True))


def span_explode_table(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", w: int = 10,
                       distinct: bool = True) -> pa.Table:
    """Explode each doc into its non-overlapping ``w``-token spans:
    (doc_id, span_no, span) rows. Spans are the "lines" of the
    corpus-level repeated-passage dedup (C4 / RefinedWeb remove
    duplicated lines & 3-sentence spans; this corpus has no newline
    structure, so fixed token windows stand in — the operator is
    separator-agnostic). Token split is SQL-exact ``text.split(' ')``
    (DuckDB string_split twin); span counts / ids / numbers are
    vectorized via np.repeat, the join per span is a C-level
    ``' '.join`` comprehension (same bounded budget as chunk_table —
    new strings cannot share the source Arrow buffer). With
    ``distinct=True`` a span repeated WITHIN one doc emits once, so a
    downstream count over these rows is a distinct-doc count."""
    texts = batch[text_col].to_pylist()
    tok_lists = [t.split(" ") for t in texts]
    k = np.array([(len(t) + w - 1) // w for t in tok_lists],
                 dtype=np.int64)
    rep = np.repeat(np.arange(len(k)), k)
    span_no = (np.arange(len(rep))
               - np.repeat(np.concatenate(([0], np.cumsum(k)[:-1])), k))
    spans = [" ".join(tok_lists[d][i * w:i * w + w])
             for d, i in zip(rep, span_no)]
    t = pa.table({
        id_col: batch[id_col].take(pa.array(rep)),
        "span_no": pa.array(span_no, pa.int64()),
        "span": pa.array(spans, pa.string()),
    })
    if distinct:
        df = t.to_pandas().drop_duplicates(subset=[id_col, "span"])
        t = pa.Table.from_pandas(df, preserve_index=False)
    return t


def span_dedup(docs, text_col: str = "text", id_col: str = "doc_id",
               w: int = 10, max_docs: int = 1, hot_cap: int = 2_000_000):
    """Corpus-level repeated-passage removal (the RefinedWeb /
    C4 "remove duplicated lines across documents" curation step):
    every ``w``-token span that appears in MORE than ``max_docs``
    distinct documents is removed from ALL documents; each doc is
    reassembled from its surviving spans in order. Returns a streaming
    Dataset of (doc_id, text_clean, n_kept, n_dropped) — docs whose
    every span was boilerplate drop out entirely.

    Scale shape: pass 1 explodes (per-doc-distinct) span rows and
    counts distinct docs per span through ONE hash-shuffle groupby —
    the exchange carries (span, doc) rows, bounded by corpus token
    count / w. Only the HOT spans (duplicated content — output-scale
    by construction, ``hot_cap``-asserted) come back to the driver and
    broadcast via ray.put; pass 2 re-derives each doc's spans
    block-locally and filters against the broadcast set with ONE
    vectorized pc.is_in — no second exchange, no corpus
    materialization. Comparison is on the exact span STRING (not a
    hash), so the result is collision-free and SQL-oracle-exact."""
    import ray

    spans = docs.map_batches(
        lambda b: span_explode_table(b, text_col, id_col, w),
        batch_format="pyarrow")
    counts = spans.groupby("span").count()
    hot_tbl = pa.concat_tables(list(
        counts.map_batches(
            lambda b: b.filter(pc.greater(b["count()"], max_docs))
                       .select(["span"]),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert hot_tbl.num_rows <= hot_cap, (
        f"hot-span set {hot_tbl.num_rows} exceeds broadcast cap "
        f"{hot_cap}; raise max_docs or shard the filter set")
    hot_ref = ray.put(hot_tbl["span"].combine_chunks())

    def rebuild(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "text_clean": pa.array([], pa.string()),
            "n_kept": pa.array([], pa.int64()),
            "n_dropped": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        hot = ray.get(hot_ref)
        ex = span_explode_table(batch, text_col, id_col, w,
                                distinct=False)
        if ex.num_rows == 0:
            return empty
        drop = pc.is_in(ex["span"], value_set=hot).to_numpy(
            zero_copy_only=False)
        ids = ex[id_col].to_numpy()
        # per-doc segment bounds over the ordered explode rows
        heads = np.flatnonzero(np.diff(ids, prepend=ids[0] - 1) != 0)
        n_spans = np.diff(np.append(heads, len(ids)))
        keep = ~drop
        n_kept = np.add.reduceat(keep.astype(np.int64), heads)
        kept_spans = ex["span"].to_pylist()
        bounds = np.append(heads, len(ids))
        rows_id, rows_text, rows_k, rows_d = [], [], [], []
        for seg, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            kk = int(n_kept[seg])
            if kk == 0:
                continue
            rows_id.append(int(ids[lo]))
            rows_text.append(" ".join(
                kept_spans[j] for j in range(lo, hi) if keep[j]))
            rows_k.append(kk)
            rows_d.append(int(n_spans[seg]) - kk)
        return pa.table({
            id_col: pa.array(rows_id, pa.int64()),
            "text_clean": pa.array(rows_text, pa.string()),
            "n_kept": pa.array(rows_k, pa.int64()),
            "n_dropped": pa.array(rows_d, pa.int64()),
        })

    return docs.map_batches(rebuild, batch_format="pyarrow")


def build_postings(ds, cap: int = 10, min_df: int = 20,
                   text_col: str = "text", exchange: str | None = None):
    """Capped inverted-index build: token -> (df, csv of the first
    ``cap`` doc ids) for tokens in >= ``min_df`` documents — the
    retrieval-index materialization step (what a BM25 serving layer
    stores; the postings CAP is the standard impact-ordered-index
    truncation so hot tokens don't produce corpus-sized rows).

    Scale shape: the vectorized per-block explode (Arrow
    split_whitespace + list_flatten, per-doc distinct) feeds ONE keyed
    exchange on the token; each token's run collapses to a single
    (token, df, postings) row — output is vocabulary-scale, df counting
    is exact (NOT capped), only the stored posting list truncates. The
    per-run join(str) is bounded by cap x vocabulary (the concat_groups
    budget)."""
    import pyarrow.compute as _pc

    from .relational import keyed_exchange

    def explode(batch: pa.Table) -> pa.Table:
        toks = _pc.utf8_split_whitespace(batch[text_col])
        parent = _pc.list_parent_indices(toks)
        flat = _pc.list_flatten(toks)
        t = pa.table({"token": flat,
                      "doc_id": batch["doc_id"].take(parent)})
        t = t.filter(_pc.not_equal(t["token"], ""))
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def runs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "postings": pa.array([], pa.string())})
        if len(batch) == 0:
            return empty
        tok = np.asarray(batch["token"].to_pylist(), dtype=object)
        doc = batch["doc_id"].to_numpy()
        order = np.lexsort((doc, tok))
        tok, doc = tok[order], doc[order]
        new = np.concatenate(([True], tok[1:] != tok[:-1]))
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(tok))
        dfc = (ends - starts).astype(np.int64)
        keep = dfc >= min_df
        starts, ends, dfc = starts[keep], ends[keep], dfc[keep]
        if len(starts) == 0:
            return empty
        posts = [",".join(str(int(d)) for d in doc[s:min(s + cap, e)])
                 for s, e in zip(starts, ends)]
        return pa.table({
            "token": pa.array(tok[starts].tolist(), pa.string()),
            "df": pa.array(dfc, pa.int64()),
            "postings": pa.array(posts, pa.string())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    out = keyed_exchange(exploded, "token", runs, exchange)
    tbl = pa.concat_tables(
        [t for t in out.iter_batches(batch_format="pyarrow",
                                     batch_size=None) if len(t)])
    if tbl.num_rows == 0:
        return tbl
    return tbl.sort_by("token")


def posting_sizes(ds, id_col: str = "doc_id", text_col: str = "text",
                  min_df: int = 10, exchange: str | None = None) -> "object":
    """Inverted-index SIZE estimation: per token, the exact document
    frequency and the delta+varint-encoded posting-list byte count
    (gap = doc_id − previous doc_id, first gap = doc_id + 1; varint =
    7-bit groups, the classic index compression layout) — the storage
    planner a retrieval-index build runs before committing layout.
    Vectorized explode (Arrow split + flatten), per-doc distinct, ONE
    keyed exchange on the token, vectorized gap/byte math per run.
    Returns a Dataset of (token, df, bytes) with df >= ``min_df``."""
    import pyarrow.compute as _pc

    from .relational import keyed_exchange

    def explode(batch: pa.Table) -> pa.Table:
        toks = _pc.utf8_split_whitespace(batch[text_col])
        parent = _pc.list_parent_indices(toks)
        flat = _pc.list_flatten(toks)
        t = pa.table({"token": flat,
                      id_col: batch[id_col].take(parent)})
        t = t.filter(_pc.not_equal(t["token"], ""))
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def size_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "bytes": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, toks))
        t_s, i_s = toks[order], ids[order]
        new_run = np.concatenate(([True], t_s[1:] != t_s[:-1]))
        gaps = np.empty(len(i_s), np.int64)
        gaps[1:] = i_s[1:] - i_s[:-1]
        gaps[new_run] = i_s[new_run] + 1  # first gap per run
        # varint bytes = ceil(bit_length(gap)/7), gap >= 1
        nbytes = np.ones(len(gaps), np.int64)
        for cut, width in ((1 << 7, 2), (1 << 14, 3),
                           (1 << 21, 4), (1 << 28, 5)):
            nbytes[gaps >= cut] = width
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(t_s))
        df = (ends - starts).astype(np.int64)
        tot = np.add.reduceat(nbytes, starts)
        keep = df >= min_df
        return pa.table({
            "token": pa.array(t_s[starts][keep].tolist(), pa.string()),
            "df": pa.array(df[keep], pa.int64()),
            "bytes": pa.array(tot[keep].astype(np.int64), pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return keyed_exchange(exploded, "token", size_block, exchange)


def ttr_table(ds, text_col: str = "text"):
    """Per-document type-token ratio (n_types / n_tokens, in ppm) —
    the classic lexical-richness gate beside ``doc_entropy``'s
    distributional flatness (boilerplate and keyword-stuffed pages sit
    at the extremes). Shuffle-free: documents are whole within blocks,
    so the ``term_freq_table`` explode finalizes with one reduceat per
    block. Docs with zero tokens emit no row (same as the SQL twin's
    unnest). ALL-INTEGER output (doc_id, n_tokens, n_types,
    ttr_ppm)."""

    def kern(batch: pa.Table) -> pa.Table:
        tf_t = term_freq_table(batch, text_col)
        if len(tf_t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_types": pa.array([], pa.int64()),
                             "ttr_ppm": pa.array([], pa.int64())})
        doc = tf_t["doc_id"].to_numpy()
        tf = tf_t["tf"].to_numpy().astype(np.int64)
        order = np.argsort(doc, kind="stable")
        d_s, f_s = doc[order], tf[order]
        new = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(f_s, starts)
        types = np.diff(np.append(starts, len(d_s)))
        return pa.table({
            "doc_id": pa.array(d_s[starts], pa.int64()),
            "n_tokens": pa.array(tot, pa.int64()),
            "n_types": pa.array(types.astype(np.int64), pa.int64()),
            "ttr_ppm": pa.array((1_000_000 * types.astype(np.int64))
                                // tot, pa.int64())})

    return ds.map_batches(kern, batch_format="pyarrow")


def readability_table(ds, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Flesch reading-ease per document, ALL-INTEGER in milli-units:

        flesch_milli = 206835 − (1015·words) // sents
                              − (84600·syll) // words

    with words = '\\S+' runs, sents = '[.!?]+' runs, syll =
    '[aeiouyAEIOUY]+' vowel-group runs (the standard regex syllable
    proxy), and sents/words floored at 1 — identical integer
    expression in the SQL twin, so the classic readability quality
    gate (Flesch 1948; low scores flag boilerplate/legalese) is exact
    with no float parity risk. One vectorized RE2 count stack per
    block; shuffle-free."""

    def kern(batch: pa.Table) -> pa.Table:
        w = pc.count_substring_regex(
            batch[text_col], r"\S+").to_numpy().astype(np.int64)
        s = pc.count_substring_regex(
            batch[text_col], r"[.!?]+").to_numpy().astype(np.int64)
        v = pc.count_substring_regex(
            batch[text_col], r"[aeiouyAEIOUY]+").to_numpy() \
            .astype(np.int64)
        w1 = np.maximum(w, 1)
        s1 = np.maximum(s, 1)
        flesch = 206_835 - (1015 * w) // s1 - (84_600 * v) // w1
        return pa.table({
            id_col: batch[id_col],
            "n_words": pa.array(w, pa.int64()),
            "n_sents": pa.array(s, pa.int64()),
            "n_syll": pa.array(v, pa.int64()),
            "flesch_milli": pa.array(flesch, pa.int64())})

    return ds.map_batches(kern, batch_format="pyarrow")


_LINE_SEP = "\x1f"


def _line_explode(b: pa.Table, distinct: bool) -> pa.Table:
    """(skey=source\\x1fline, doc_id, len) rows for nonempty lines —
    per-doc DISTINCT for the census (one vote per doc), per INSTANCE
    for the mark pass."""
    lines = pc.split_pattern(b["text"], "\n")
    parent = pc.list_parent_indices(lines)
    flat = pc.list_flatten(lines)
    t = pa.table({
        "skey": pc.binary_join_element_wise(
            b["source"].take(parent), flat, _LINE_SEP),
        "doc_id": b["doc_id"].take(parent),
        "len": pc.utf8_length(flat).cast(pa.int64()),
    })
    t = t.filter(pc.greater(t["len"], 0))
    if distinct:
        return t.select(["skey", "doc_id"]).group_by(
            ["skey", "doc_id"]).aggregate([])
    return t


def line_boilerplate_census(ds, min_docs: int = 3):
    """Distributed (source, line) boilerplate census: a nonempty line
    in >= ``min_docs`` DISTINCT docs of the same source. One key-hash
    repartition + per-partition C++ group_by (every skey's votes land
    whole in one block — exact, no sort aggregate). Returns a
    streaming Dataset of boiler ``skey`` rows."""
    from .relational import task_exchange

    def census(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"skey": pa.array([], pa.string())})
        g = b.group_by("skey").aggregate([("doc_id", "count")])
        return g.filter(pc.greater_equal(
            g["doc_id_count"], min_docs)).select(["skey"])

    exploded = ds.map_batches(lambda t: _line_explode(t, True),
                              batch_format="pyarrow")
    return task_exchange(exploded, "skey", census)


def line_boilerplate_profile(ds, ds2, min_docs: int = 3,
                             broadcast_limit: int = 1_000_000):
    """Per-doc line-level boilerplate profile (CCNet/RefinedWeb line
    dedup): (doc_id, n_lines, n_boiler, kept_chars, boiler_ppm,
    flagged).

    Two marking paths, identical output:
    - boiler set <= ``broadcast_limit``: collect once, ``ray.put``,
      one vectorized ``pc.is_in`` per batch (the small-side broadcast
      default).
    - larger: NO driver materialization — union-tag the instance rows
      with the boiler rows, ONE key-hash repartition co-locates every
      line with its verdict, per-partition ``pc.is_in`` marks, then a
      second doc_id-hash exchange folds per-partition partials into
      per-doc totals (both exchanges are the bounded-census shape, no
      sort aggregates).

    ``ds`` and ``ds2`` are two readers of the same documents table
    (the census and mark passes each stream the corpus once)."""
    import ray

    from .relational import task_exchange

    boiler = line_boilerplate_census(ds, min_docs=min_docs).materialize()
    n_boiler_keys = boiler.count()

    if n_boiler_keys <= broadcast_limit:
        parts = list(boiler.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
        keys = (pa.concat_tables(parts)["skey"].combine_chunks()
                if parts else pa.array([], pa.string()))
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ref = ray.put(keys)

        def mark(b: pa.Table) -> pa.Table:
            bset = ray.get(ref)
            lines = pc.split_pattern(b["text"], "\n")
            parent = pc.list_parent_indices(lines).to_numpy()
            flat = pc.list_flatten(lines)
            skey = pc.binary_join_element_wise(
                b["source"].take(pa.array(parent)), flat, _LINE_SEP)
            lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            nonempty = lens > 0
            isb = np.zeros(len(lens), bool)
            if len(bset):
                isb = pc.is_in(skey, value_set=bset) \
                    .to_numpy(zero_copy_only=False).astype(bool)
            isb &= nonempty
            n = len(b)
            n_lines = np.zeros(n, np.int64)
            n_boil = np.zeros(n, np.int64)
            kept = np.zeros(n, np.int64)
            np.add.at(n_lines, parent, nonempty.astype(np.int64))
            np.add.at(n_boil, parent, isb.astype(np.int64))
            np.add.at(kept, parent, np.where(nonempty & ~isb, lens, 0))
            return _line_profile_table(b["doc_id"], n_lines, n_boil,
                                       kept)

        return ds2.map_batches(mark, batch_format="pyarrow")

    # exchange path: tag 0 = line instance, tag 1 = boiler verdict
    inst = ds.map_batches(
        lambda t: _tag_rows(_line_explode(t, False), 0),
        batch_format="pyarrow")
    bo = boiler.map_batches(
        lambda t: _tag_rows(pa.table({
            "skey": t["skey"],
            "doc_id": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            "len": pa.array(np.zeros(len(t), np.int64), pa.int64()),
        }), 1), batch_format="pyarrow")

    def mark_part(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_lines": pa.array([], pa.int64()),
                          "n_boiler": pa.array([], pa.int64()),
                          "kept_chars": pa.array([], pa.int64())})
        if len(b) == 0:
            return empty
        d = b.filter(pc.equal(b["tag"], 0))
        if len(d) == 0:
            return empty
        bkeys = b.filter(pc.equal(b["tag"], 1))["skey"]
        if isinstance(bkeys, pa.ChunkedArray):
            bkeys = bkeys.combine_chunks()
        isb = (pc.is_in(d["skey"], value_set=bkeys)
               .to_numpy(zero_copy_only=False).astype(bool)
               if len(bkeys) else np.zeros(len(d), bool))
        ids, codes = np.unique(d["doc_id"].to_numpy(),
                               return_inverse=True)
        lens = d["len"].to_numpy()
        n_lines = np.zeros(len(ids), np.int64)
        n_boil = np.zeros(len(ids), np.int64)
        kept = np.zeros(len(ids), np.int64)
        np.add.at(n_lines, codes, 1)
        np.add.at(n_boil, codes, isb.astype(np.int64))
        np.add.at(kept, codes, np.where(~isb, lens, 0))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_lines": pa.array(n_lines, pa.int64()),
                         "n_boiler": pa.array(n_boil, pa.int64()),
                         "kept_chars": pa.array(kept, pa.int64())})

    marked = task_exchange(inst.union(bo), "skey", mark_part)
    # every doc appears in the final profile even with zero nonempty
    # lines: a shuffle-free zero-partial per doc
    zeros = ds2.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_lines": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            "n_boiler": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            "kept_chars": pa.array(np.zeros(len(t), np.int64),
                                   pa.int64()),
        }), batch_format="pyarrow")

    def fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _line_profile_table(
                pa.array([], pa.int64()), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
        g = b.group_by("doc_id").aggregate(
            [("n_lines", "sum"), ("n_boiler", "sum"),
             ("kept_chars", "sum")])
        return _line_profile_table(
            g["doc_id"],
            g["n_lines_sum"].to_numpy().astype(np.int64),
            g["n_boiler_sum"].to_numpy().astype(np.int64),
            g["kept_chars_sum"].to_numpy().astype(np.int64))

    return task_exchange(marked.union(zeros), "doc_id", fold)


def _tag_rows(t: pa.Table, tag: int) -> pa.Table:
    return t.append_column(
        "tag", pa.array(np.full(len(t), tag, np.int64), pa.int64()))


def _line_profile_table(doc_id, n_lines, n_boiler, kept) -> pa.Table:
    n_lines = np.asarray(n_lines, np.int64)
    n_boiler = np.asarray(n_boiler, np.int64)
    ppm = np.where(n_lines > 0,
                   1_000_000 * n_boiler // np.maximum(n_lines, 1), 0)
    return pa.table({
        "doc_id": doc_id,
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_boiler": pa.array(n_boiler, pa.int64()),
        "kept_chars": pa.array(np.asarray(kept, np.int64), pa.int64()),
        "boiler_ppm": pa.array(ppm, pa.int64()),
        "flagged": pa.array(ppm > 300_000, pa.bool_()),
    })


def hapax_share_by_source(ds, text_col: str = "text",
                          source_col: str = "source"):
    """Per-source hapax-legomenon share — the lexical-richness /
    OCR-noise screen beside TTR: for every source, how many of its
    distinct tokens occur exactly ONCE in the WHOLE corpus (a noisy
    scrape's garbled tokens are corpus-hapaxes; a templated source has
    almost none). Vectorized explode -> ONE token-hash exchange (all
    occurrences of a token land whole in one partition, so corpus
    totals and per-source membership are both partition-local) ->
    per-partition (source, n_distinct, n_hapax) partials -> combiner
    rollup. No driver-side token set; output is O(sources)."""
    import pandas as pd

    from .relational import partial_groupby_agg, task_exchange

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(batch[text_col])
        parent = pc.list_parent_indices(toks).to_numpy()
        t = pa.table({
            "token": pc.list_flatten(toks),
            "source": pc.take(batch[source_col], pa.array(parent)),
        })
        return t.filter(pc.not_equal(t["token"], ""))

    def census(batch: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "n_distinct": pa.array([], pa.int64()),
                          "n_hapax": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        df = pd.DataFrame({
            "token": batch["token"].to_numpy(zero_copy_only=False),
            "source": batch["source"].to_numpy(zero_copy_only=False)})
        tot = df.groupby("token").size()
        pairs = df.drop_duplicates(["source", "token"])
        hapax = pairs["token"].map(tot).eq(1)
        g = pairs.groupby("source").size()
        gh = pairs[hapax].groupby("source").size()
        out = pd.DataFrame({"n_distinct": g,
                            "n_hapax": gh.reindex(g.index, fill_value=0)})
        return pa.table({
            "source": pa.array(out.index.astype(object), pa.string()),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(np.int64)),
            "n_hapax": pa.array(out["n_hapax"].to_numpy(np.int64))})

    parts = task_exchange(
        ds.map_batches(explode, batch_format="pyarrow"), "token", census)
    out = partial_groupby_agg(parts, ["source"],
                              {"n_distinct": ("n_distinct", "sum"),
                               "n_hapax": ("n_hapax", "sum")})
    out["hapax_ppm"] = ((1_000_000 * out["n_hapax"])
                        // out["n_distinct"]).astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def dict_tag_census(ds, patterns, text_col: str = "text"):
    """Multi-pattern dictionary tagging census — the bounded-dictionary
    cousin of regex PII scanning (keyword blocklists, domain lexicons,
    contamination probes): for each pattern, how many docs contain it
    and how many total (non-overlapping) occurrences the corpus holds.

    Scale shape: the dictionary is a broadcast constant; each block
    runs ONE vectorized Arrow ``count_substring`` kernel per pattern
    (C++ substring scan, no per-row Python) and emits a
    dictionary-sized partial; the driver combines partials with one
    bounded groupby-sum. No shuffle — the reduction is dictionary-
    bounded, like an aggregate over a low-cardinality key.

    Returns pandas (pattern, n_docs, n_occurrences) sorted by pattern.
    Exact SQL twin: occurrences = (len(text) - len(replace(text, p,
    ''))) / len(p) — both sides count non-overlapping matches."""
    import pandas as pd
    import pyarrow.compute as pc

    pats = list(patterns)

    def kernel(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"pattern": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_occurrences": pa.array([], pa.int64())})
        col = batch[text_col]
        docs = np.empty(len(pats), np.int64)
        occ = np.empty(len(pats), np.int64)
        for i, p in enumerate(pats):
            c = pc.count_substring(col, pattern=p).to_numpy(
                zero_copy_only=False).astype(np.int64)
            docs[i] = int((c > 0).sum())
            occ[i] = int(c.sum())
        return pa.table({"pattern": pa.array(pats, pa.string()),
                         "n_docs": pa.array(docs, pa.int64()),
                         "n_occurrences": pa.array(occ, pa.int64())})

    parts = [t.to_pandas() for t in
             ds.select_columns([text_col])
               .map_batches(kernel, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None)]
    out = (pd.concat(parts).groupby("pattern", as_index=False)
           [["n_docs", "n_occurrences"]].sum())
    return out.sort_values("pattern").reset_index(drop=True)
