"""Page sinks.

The graft's target sink is a Lance table of image+caption rows
(BASELINE.json input_hint). The ``lance`` library is not available in
this environment, so the writer is format-gated: ``parquet`` (default,
always available, identical schema) or ``lance`` behind an import-try.
Both write one directory per crawl round (resumable: a failed run skips
finished rounds and rewrites only the in-flight one).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def write_pages_fragment(table: pa.Table, directory: str, name: str,
                         fmt: str = "parquet") -> str:
    """Write one fragment of page rows. ``fmt='lance'`` appends to a
    Lance dataset when the library exists; otherwise raises with a clear
    message (the Ray-side plumbing — schema, per-round layout — is
    identical either way)."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    if fmt == "parquet":
        path = d / f"{name}.parquet"
        pq.write_table(table, path)
        return str(path)
    if fmt == "lance":
        if not lance_available():
            raise NotImplementedError(
                "lance is not installed in this environment; the sink "
                "falls back to parquet with the identical schema"
            )
        import lance

        lance.write_dataset(table, str(d / "pages.lance"), mode="append")
        return str(d / "pages.lance")
    raise ValueError(f"unknown sink format {fmt!r}")


def read_pages(root: str):
    """Read all round fragments back as one Dataset."""
    import ray

    return ray.data.read_parquet(root)


def write_partitioned(ds, root: str, partition_col: str,
                      resume: bool = True) -> set:
    """Resumable partitioned parquet sink: one hive directory per
    partition value (``<root>/<col>=<value>/``), written streaming by
    Ray's ``write_parquet`` — never one giant file. With
    ``resume=True``, partition values already present under ``root``
    are filtered out of the stream before writing, so a restarted job
    only produces the missing partitions. Returns the set of partition
    values that were skipped.

    Resume granularity is the whole partition: a partition left
    half-written by a crash must be deleted before resuming (the crawl
    sink gets this for free from its one-directory-per-round layout;
    for arbitrary keys, delete the newest partition dir)."""
    import numpy as np
    import ray.data  # noqa: F401 — ds is already a Dataset

    done: set = set()
    rootp = Path(root)
    if resume and rootp.is_dir():
        prefix = f"{partition_col}="
        done = {p.name[len(prefix):] for p in rootp.iterdir()
                if p.is_dir() and p.name.startswith(prefix)}
    if done:
        skip = done

        def keep(batch: pa.Table) -> pa.Table:
            vals = np.asarray(
                [str(v) for v in batch[partition_col].to_pylist()],
                dtype=object)
            return batch.filter(pa.array(~np.isin(vals, list(skip))))

        ds = ds.map_batches(keep, batch_format="pyarrow")
    ds.write_parquet(root, partition_cols=[partition_col])
    return done
