"""Lexicon loading, broadcasting, and worker-side index caching.

The base dictionary is broadcast ONCE as a frozenset; each Python worker
builds its (first-letter, length)-bucketed ``LexIndex`` lazily and caches it
per broadcast id, so the index build cost is paid once per worker, not per
batch (SURVEY.md S11; BASELINE.json:6 'shipped as broadcast variables so no
per-row Python executes')."""

from __future__ import annotations

from ocr_proofreader_spark.functions.rules import LexIndex

_INDEX_CACHE: dict[int, LexIndex] = {}


def load_base_lexicon(path: str) -> frozenset:
    """Read the base dictionary; transparently handles paths that point
    inside a ``--py-files`` zip (spark-submit ships the engine as a zip,
    so ``__file__``-derived paths land inside the archive)."""
    import os
    import re
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            return frozenset(w.strip().lower() for w in fh if w.strip())
    m = re.match(r"(.*\.zip)[/\\](.*)", path)
    if m:
        import zipfile
        with zipfile.ZipFile(m.group(1)) as zf:
            text = zf.read(m.group(2).replace("\\", "/")).decode("utf-8")
        return frozenset(w.strip().lower() for w in text.splitlines()
                         if w.strip())
    raise FileNotFoundError(path)


def broadcast_lexicon(spark, base: frozenset):
    return spark.sparkContext.broadcast(base)


def get_index(bc) -> LexIndex:
    """Worker-side: LexIndex for a broadcast base lexicon, cached."""
    key = id(bc.value)
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        idx = LexIndex(bc.value)
        _INDEX_CACHE.clear()  # one live lexicon per worker is the norm
        _INDEX_CACHE[key] = idx
    return idx
