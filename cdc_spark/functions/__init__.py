"""Training-data pipeline operators (dedup, text analysis, similarity,
multimodal plumbing) — first-class components alongside the CDC engine."""

from __future__ import annotations


def registry() -> dict:
    from . import (
        cleaning,
        cluster,
        corpus,
        dedupe,
        dedupe_index,
        emb_index,
        export,
        multimodal,
        packing,
        pipeline,
        pq,
        sampling,
        similarity,
        substring,
        temporal,
        text,
        versioning,
    )

    out: dict = {}
    for mod in (text, cleaning, corpus, dedupe, dedupe_index, cluster, similarity,
                multimodal, temporal, sampling, packing, pipeline, export,
                versioning, substring, emb_index, pq):
        out.update(mod.registry())
    return out
