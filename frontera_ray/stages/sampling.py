"""Deterministic (hash-based) sampling stages for training-data
pipelines.

Random sampling at 100-TB scale must be reproducible and
driver-free: the keep/drop decision is a pure function of the row's
id (md5 of its decimal string, top 32 bits), so re-runs, retried
tasks and incremental reprocessing all agree without any shared RNG
state, and the rate can differ per stratum (e.g. keep 50% of English
documents but 10% of everything else). Everything runs as a
map_batches filter — no shuffle, no materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_U32 = 1 << 32


def hash_u32(ids, salt: str = "") -> np.ndarray:
    """Top 32 bits of md5(salt + str(id)) per id, as uint64.

    Matches the SQL twin ('0x' || substr(md5(id::VARCHAR), 1, 8)) so a
    DuckDB oracle reproduces the exact sample."""
    return np.fromiter(
        (int(hashlib.md5((salt + str(i)).encode("utf8")).hexdigest()[:8], 16)
         for i in ids),
        dtype=np.uint64, count=len(ids))


def stratified_hash_sample(ds, id_col: str, strata_col: str | None = None,
                           rates: dict | None = None,
                           default_rate: float = 0.1, salt: str = ""):
    """Deterministic Bernoulli sample: keep a row iff
    hash_u32(id) < rate * 2^32, with the rate chosen by the row's
    stratum (``rates[stratum]``, else ``default_rate``). With
    ``strata_col=None`` every row uses ``default_rate`` (plain hash
    sample). Streaming filter — rate thresholds are plain Python ints
    captured in the closure."""
    rates = rates or {}
    thresholds = {s: int(r * _U32) for s, r in rates.items()}
    default_thr = int(default_rate * _U32)

    def keep(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col].to_pylist(), salt)
        if strata_col is None:
            thr = np.full(len(batch), default_thr, dtype=np.uint64)
        else:
            strata = np.asarray(batch[strata_col].to_pylist(), dtype=object)
            thr = np.full(len(batch), default_thr, dtype=np.uint64)
            for s, t in thresholds.items():
                thr[strata == s] = t
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")
