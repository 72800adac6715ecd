"""End-to-end corpus curation: the canonical pre-training data pipeline
composed from this library's operators, each stage streaming (no full
materialization between stages — one lazy Dataset plan end to end):

    raw docs
      → PII scrub            (functions/text.py:redact_pii — vectorized
                              email/phone/IPv4 → typed placeholders)
      → LM quality filter    (functions/lm.py — char-trigram perplexity
                              against a model trained on a bounded clean
                              sample; drop docs above the cutoff)
      → exact dedup          (functions/dedup.py:exact_dedup — 128-bit
                              content-hash shuffle, text never moves;
                              survivors kept via broadcast semi-join)
      → tokenize             (functions/text.py — hash-vocab, or
                              functions/bpe.py for a trained BPE)
      → chunk                (functions/pack.py:chunk_documents —
                              overlapping context windows, flat-map)
      → pack                 (functions/pack.py:pack_sequences — fixed
                              context_len training rows)

Scale notes: the only all-to-all is dedup's 32 B/doc signature shuffle;
the LM and PII stages are embarrassingly parallel map_batches; the
survivor set ships as ONE broadcast (`ray.put`) — swap for the Bloom
prefilter (`functions/sketch.py`) when survivors outgrow driver memory,
the same escape hatch `ngram_verified_dedup` wires automatically.
"""

from __future__ import annotations

import ray.data as rd

from ..functions import lm as lmmod
from ..functions.dedup import exact_dedup
from ..functions.sketch import approx_quantiles
from ..functions.pack import chunk_documents, pack_sequences
from ..functions.text import redact_pii, tokenize
from ..stages.joins import semi_join_filter


def curate_corpus(
    docs: rd.Dataset,
    text_col: str = "text",
    key_col: str = "doc_id",
    ppl_cutoff: float | None = None,
    ppl_quantile: float = 0.9,
    lm_sample_n: int = 512,
    context_len: int = 256,
    overlap: int = 0,
    eod_token: int = 50256,
    html: bool = False,
) -> tuple[rd.Dataset, dict]:
    """→ (packed training sequences, stats). ``ppl_cutoff=None`` derives
    the cutoff as the ``ppl_quantile`` of the scored corpus (one extra
    pass over the tiny (key, ppl) projection, not the texts).
    ``html=True`` prepends HTML→text extraction (crawl payloads)."""
    if html:
        from ..functions.text import html_to_text

        docs = html_to_text(docs, text_col=text_col)
    n_raw = docs.count()

    scrubbed = redact_pii(docs, text_col=text_col, key_col=key_col)
    scrubbed = scrubbed.map_batches(
        lambda t: t.select([key_col, "redacted"]).rename_columns(
            [key_col, text_col]),
        batch_format="pyarrow")

    logp = lmmod.train_char_lm(scrubbed, text_col=text_col,
                               sample_n=lm_sample_n)
    # materialize ONLY the tiny (key, ppl) projection — texts stay lazy
    scored = lmmod.perplexity_score(
        scrubbed, logp, text_col=text_col, key_col=key_col
    ).select_columns([key_col, "ppl"]).materialize()
    if ppl_cutoff is None:  # histogram sketch, O(n_bins) driver state
        ppl_cutoff = approx_quantiles(
            scored, "ppl", {"cut": ppl_quantile})["cut"]
    cutoff = float(ppl_cutoff)
    keep_keys = [r[key_col] for r in scored.filter(
        lambda r: r["ppl"] <= cutoff).select_columns([key_col]).take_all()]
    clean = semi_join_filter(scrubbed, keep_keys, on=key_col)
    n_clean = len(keep_keys)

    survivors = exact_dedup(clean, content_col=text_col, key_col=key_col)
    surv_keys = [r[key_col] for r in
                 survivors.select_columns([key_col]).take_all()]
    unique = semi_join_filter(clean, surv_keys, on=key_col)
    n_unique = len(surv_keys)

    toks = tokenize(unique, text_col=text_col, key_col=key_col)
    chunked = chunk_documents(toks, context_len=context_len,
                              overlap=overlap, key_col=key_col)
    packed = pack_sequences(chunked, context_len=context_len,
                            key_col=key_col, eod_token=eod_token)
    stats = {"n_raw": n_raw, "n_clean": n_clean, "n_unique": n_unique,
             "ppl_cutoff": cutoff}
    return packed, stats
