"""Session-lifetime persist tracking (round-4 ADVICE fix).

Lazy query builders (``minhash_lsh_exact``, ``simhash_exact``,
``corpus_pipeline_q``) persist an intermediate that several downstream
consumers share. The builder cannot unpersist it — the returned
DataFrame still references the cached plan and the caller's terminal
action hasn't run yet — so without bookkeeping, repeated gate/bench
invocations accumulate cached blocks for the session lifetime.

``track_persist`` registers every such intermediate; harnesses call
``release_tracked()`` after each query's terminal action (the same
discipline ``neardup_clusters`` applies inline, generalized to the
lazy-builder case). tools/check_correctness.py, bench.py and the test
session teardown all release.

Scoping (ADVICE r4): ``_TRACKED`` is a process-global, which is correct
for the repo's single-threaded harnesses but would let one request's
``release_tracked()`` unpersist another's in-flight intermediate in a
concurrent service. A service should wrap each request in
``scoped_tracking()`` — a context manager that swaps in a private
tracking list and unpersists exactly its own registrations on exit.
"""

from __future__ import annotations

import atexit
import contextlib
import shutil
import tempfile
from collections.abc import Iterator

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def session_tmpdir(prefix: str) -> str:
    """``mkdtemp`` that is removed at interpreter exit (ADVICE r10:
    every gate/bench invocation of a scratch-dir query leaked one
    parquet/checkpoint directory in /tmp — the repo already tracks
    /tmp hygiene for big runs). The directory must outlive the
    RETURNED DataFrame's lazy reads, so cleanup is process-exit, not
    eager."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


@contextlib.contextmanager
def scoped_tracking() -> Iterator[list[DataFrame]]:
    """Confine ``track_persist`` registrations to this scope: on exit,
    unpersist exactly the intermediates registered inside it and
    restore the enclosing tracker — the per-request discipline a
    concurrent long-lived service needs (a global ``release_tracked``
    there would unpersist another request's in-flight intermediate)."""
    global _TRACKED
    outer, _TRACKED = _TRACKED, []
    try:
        yield _TRACKED
    finally:
        for df in _TRACKED:
            try:
                df.unpersist()
            except Exception:
                pass
        _TRACKED = outer


def release_tracked() -> None:
    """Unpersist every tracked intermediate (idempotent, error-tolerant —
    the owning session may already be stopped at teardown time)."""
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass
    _TRACKED.clear()
