"""Run configuration for the proofreading engine."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class RunConfig:
    """Knobs for one proofreading run (SURVEY.md sections 3-4).

    Scale notes (100 TB / 10^12 docs): the hot path is shuffle-free
    (mapInPandas per doc); ``nsalt`` + ``repartitionByRange`` only
    rebalance input partitions; docs longer than ``chunk_threshold_spans``
    take the chunked skew path (distributed word_freq + per-chunk
    correction) instead of a single task.
    """

    run_id: str = "run-0"
    lexicon_path: str = field(default_factory=lambda: os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "lexicon_base.txt"))
    # lang -> dictionary path for multilingual corpora (must include a
    # 'default' entry); None = single-lexicon mode via lexicon_path
    lexicon_paths: dict[str, str] | None = None
    freq_k: int = 5                     # S11: book word freq >= K joins lexicon
    nsalt: int = 8                      # S4 salting fan-out
    rebalance_partitions: int | None = None  # None -> leave input partitioning
    # Docs above this take the skew path.  Measured on local[32]: a
    # 2000-span book (~1 MB text) is cheaper inline in the shuffle-free
    # fast path (~170 ms) than amortizing the skew path's two shuffles;
    # the chunked path pays off for genuinely giant books (>~2 MB text),
    # which is what it exists for at 10^12-doc scale.  None = the caller
    # guarantees no doc can reach any threshold (bounded derivations):
    # proofread() then skips the skew branch entirely instead of paying
    # its second input pass for a provably-empty union arm (r6).
    chunk_threshold_spans: int | None = 4096
    chunk_spans: int = 64               # spans per chunk on the skew path
    num_buckets: int = 16               # resumability unit (S2/S16)
    arrow_batch_docs: int = 1024        # spark.sql.execution.arrow.maxRecordsPerBatch
