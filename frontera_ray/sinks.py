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
