"""End-to-end corpus curation: the canonical pre-training data pipeline
composed from this library's operators, each stage streaming (no full
materialization between stages — one lazy Dataset plan end to end):

    raw docs
      → PII scrub            (functions/text.py:redact_pii — vectorized
                              email/phone/IPv4 → typed placeholders)
      → LM quality filter    (functions/lm.py — char-trigram perplexity
                              against a model trained on a bounded clean
                              sample; the cutoff derives from a histogram
                              sketch over the tiny score projection, then
                              the gate RECOMPUTES the score inline per
                              row — no key set ever touches the driver)
      → exact dedup          (functions/dedup.py:duplicate_keys — 128-bit
                              content-hash shuffle enumerates LOSERS, the
                              text never moves; losers are removed with
                              stages/joins.py:anti_join_keys, which
                              auto-switches from an exact broadcast set to
                              a distributed Bloom + exact-rescue resolve
                              past ``dedup_broadcast_max`` ids)
      → tokenize             (functions/text.py — hash-vocab, or
                              functions/bpe.py for a trained BPE)
      → chunk                (functions/pack.py:chunk_documents —
                              overlapping context windows, flat-map)
      → pack                 (functions/pack.py:pack_sequences — fixed
                              context_len training rows)

Scale notes: the only payload-free all-to-all is dedup's 32 B/doc hash
shuffle; the LM and PII stages are embarrassingly parallel map_batches;
NOTHING corpus-proportional is ever collected on the driver — the quality
gate recomputes its per-row score instead of round-tripping survivor
keys, and the dedup anti join holds at most a fixed-size Bloom plus an
FP-rate-sized rescue set past the broadcast threshold (below it, an
exact loser-id set — losers are the duplicate fraction, not the corpus).
"""

from __future__ import annotations

import ray.data as rd

from ..functions import lm as lmmod
from ..functions.dedup import duplicate_keys
from ..functions.sketch import approx_quantiles
from ..functions.pack import chunk_documents, pack_sequences
from ..functions.text import redact_pii, tokenize
from ..stages.joins import anti_join_keys


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
    dedup_broadcast_max: int = 1_000_000,
    eval_filter: dict | None = None,
    eval_min_hits: int = 1,
    span_dedup_k: int | None = None,
) -> tuple[rd.Dataset, dict]:
    """→ (packed training sequences, stats). ``ppl_cutoff=None`` derives
    the cutoff as the ``ppl_quantile`` of the scored corpus (one extra
    pass over the tiny ppl projection, not the texts).
    ``html=True`` prepends HTML→text extraction (crawl payloads).
    ``dedup_broadcast_max`` is the loser-count threshold where the dedup
    anti join switches from an exact broadcast set to the distributed
    Bloom + rescue path (`stages/joins.py:anti_join_keys`).
    ``eval_filter`` (from ``functions/decontaminate.py:build_eval_filter``)
    inserts benchmark decontamination after the dedup stage — one extra
    broadcast-filter map pass inside the same lazy plan, still no
    shuffle. ``span_dedup_k`` adds exact-substring SPAN dedup
    (``functions/spandedup.py``) on the surviving text before
    tokenization — duplicated k-word windows are cut from all but their
    first occurrence (its count pass re-executes the upstream plan once,
    like every multi-consumer Dataset)."""
    import pyarrow as pa
    import pyarrow.compute as pc

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
    # materialize ONLY the tiny ppl projection (8 B/doc, object-store
    # resident, spillable) — it feeds the cutoff sketch and the n_clean
    # stat; keys never round-trip through the driver
    scored = lmmod.perplexity_score(
        scrubbed, logp, text_col=text_col, key_col=key_col
    ).select_columns(["ppl"]).materialize()
    if ppl_cutoff is None:  # histogram sketch, O(n_bins) driver state
        ppl_cutoff = approx_quantiles(
            scored, "ppl", {"cut": ppl_quantile})["cut"]
    cutoff = float(ppl_cutoff)
    # n_clean: per-block count partials over the materialized projection
    # (one small row per block to the driver; NaN ppl = empty doc = drop)
    n_clean = int(sum(
        r["n"] for r in scored.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(pc.sum(pc.less_equal(t["ppl"], cutoff)).as_py() or 0)],
                pa.int64())}),
            batch_format="pyarrow").take_all()))
    # the gate itself recomputes the cheap stateless score inline — the
    # scale-correct shape (a survivor-key semi join would materialize
    # O(corpus) keys on the driver)
    clean = lmmod.perplexity_filter(scrubbed, logp, cutoff,
                                    text_col=text_col)

    # exact dedup: enumerate LOSERS (id-only, distributed) and anti-join
    # them out; n_unique is arithmetic, not a key drain
    losers = duplicate_keys(clean, content_col=text_col,
                            key_col=key_col).materialize()
    n_losers = losers.count()
    unique = anti_join_keys(clean, losers, on=key_col,
                            max_broadcast=dedup_broadcast_max)
    n_unique = n_clean - n_losers

    if eval_filter is not None:
        # stays inside the one lazy plan: a broadcast-filter map pass, no
        # shuffle, no mid-plan count (counting here would re-execute the
        # whole upstream once extra)
        from ..functions.decontaminate import decontaminate

        unique = decontaminate(unique, eval_filter, text_col=text_col,
                               min_hits=eval_min_hits)

    if span_dedup_k is not None:
        from ..functions.spandedup import exact_substring_dedup

        unique = exact_substring_dedup(
            unique, text_col=text_col, key_col=key_col, k=span_dedup_k,
            max_broadcast=dedup_broadcast_max,
        ).map_batches(lambda t: t.drop_columns(["n_cut_words"]),
                      batch_format="pyarrow")

    toks = tokenize(unique, text_col=text_col, key_col=key_col)
    chunked = chunk_documents(toks, context_len=context_len,
                              overlap=overlap, key_col=key_col)
    packed = pack_sequences(chunked, context_len=context_len,
                            key_col=key_col, eod_token=eod_token)
    stats = {"n_raw": n_raw, "n_clean": n_clean, "n_unique": n_unique,
             "ppl_cutoff": cutoff}
    return packed, stats
