"""End-to-end curation pipeline: planted noise / duplicates / PII must be
scrubbed, filtered and deduplicated, and token conservation must hold
through tokenize → chunk → pack."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _corpus():
    words = ("the cat dog runs over green field home quick brown fox lazy "
             "reads sentence normal words data model training quality").split()
    # index prefix keeps every clean doc distinct
    clean = [f"doc {i} says " + " ".join(
        words[(i + j) % len(words)] for j in range(12)) + "."
        for i in range(80)]
    dups = [clean[i] for i in range(10)]            # 10 exact duplicates
    noise = ["zzq qjx vkz xqj zqv kxq jzv qxk zjq vqx"] * 10  # gibberish
    pii = [f"pii {i} reach me at user{i}@mail.com or (555)123-45{i:02d}"
           for i in range(5)]
    texts = clean + dups + noise + pii
    ids = [f"d{i:04d}" for i in range(len(texts))]
    return ids, texts, clean


def test_curate_corpus_end_to_end():
    from go_tfdata_ray.pipelines.curate import curate_corpus

    ids, texts, clean = _corpus()
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    packed, stats = curate_corpus(ds, ppl_quantile=0.88, context_len=64,
                                  lm_sample_n=80)
    assert stats["n_raw"] == 105
    # the 10 gibberish docs are the worst-scoring tail → filtered
    assert stats["n_clean"] <= 95
    # the 10 exact duplicates collapse to their originals
    assert stats["n_unique"] <= stats["n_clean"] - 10
    assert stats["n_unique"] >= 75  # distinct clean docs survive
    df = packed.to_pandas()
    assert len(df) > 0 and all(len(t) == 64 for t in df["tokens"])
    # every output row is a full context; content volume is plausible for
    # ~n_unique surviving ~15-token docs (loose sanity bound, exact
    # conservation is pinned by the tokenize→chunk→pack drive + pytests)
    content = int(round(float(np.sum(df["fill_ratio"])) * 64))
    assert stats["n_unique"] * 10 < content < stats["n_unique"] * 40


def test_curate_pii_never_reaches_output():
    from go_tfdata_ray.functions.text import redact_pii

    ids, texts, _ = _corpus()
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    red = redact_pii(ds).to_pandas()
    # after the scrub stage no email/phone survives anywhere
    assert not red["redacted"].str.contains("@mail.com").any()
    assert not red["redacted"].str.contains(r"\(555\)").any()
    assert (red[red["doc_id"] >= "d0100"][["n_email", "n_phone"]]
            .to_numpy().sum(axis=1) > 0).all()


def test_curate_corpus_large_dedup_path_matches_small():
    """Force the Bloom anti-join path (dedup_broadcast_max=0 puts every
    loser past the broadcast threshold) — stats and packed content must
    match the default exact-set path row for row."""
    from go_tfdata_ray.pipelines.curate import curate_corpus

    ids, texts, _ = _corpus()
    def mk():
        return rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                       "text": pa.array(texts)}))

    kw = dict(ppl_quantile=0.88, context_len=64, lm_sample_n=80)
    packed_a, stats_a = curate_corpus(mk(), **kw)
    packed_b, stats_b = curate_corpus(mk(), dedup_broadcast_max=0, **kw)
    assert stats_a == stats_b
    da, db = packed_a.to_pandas(), packed_b.to_pandas()
    # content multiset equality (pack order may differ across runs only
    # if inputs differ — they must not)
    ca = sorted(tuple(t) for t in da["tokens"])
    cb = sorted(tuple(t) for t in db["tokens"])
    assert ca == cb


def test_curate_corpus_decontaminates_against_eval_filter():
    from go_tfdata_ray.functions.decontaminate import build_eval_filter
    from go_tfdata_ray.pipelines.curate import curate_corpus

    ids, texts, clean = _corpus()
    # plant 5 benchmark docs VERBATIM into the training corpus under
    # vocabulary no other doc uses (the _corpus clean docs are rotations
    # of one word list, so generic n-grams legitimately repeat — the
    # planted twins must be the ONLY eval overlap)
    bench = [f"benchword{i}a benchword{i}b benchword{i}c benchword{i}d "
             f"benchword{i}e benchword{i}f benchword{i}g benchword{i}h "
             f"benchword{i}i benchword{i}j" for i in range(5)]
    for i in range(5):
        texts[20 + i] = bench[i]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    ev = rd.from_arrow(pa.table({"doc_id": pa.array([f"e{i}" for i in range(5)]),
                                 "text": pa.array(bench)}))
    filt = build_eval_filter(ev, n=8)
    base, _ = curate_corpus(ds, ppl_quantile=0.88, context_len=64,
                            lm_sample_n=80)
    decon, _ = curate_corpus(ds, ppl_quantile=0.88, context_len=64,
                             lm_sample_n=80, eval_filter=filt)
    # packed token volume drops by roughly the 5 removed docs' share, and
    # the removed content really is gone: the eval docs' distinctive word
    # run can't appear in any packed row (checked via doc ids upstream)
    n_base = int(base.count())
    n_decon = int(decon.count())
    assert n_decon <= n_base
    # flag check at the doc level: exactly the 5 eval twins are flagged
    from go_tfdata_ray.functions.decontaminate import flag_contamination

    flags = flag_contamination(ds, filt).to_pandas()
    hit_ids = sorted(flags[flags["contaminated"]]["doc_id"])
    assert hit_ids == [f"d{i:04d}" for i in range(20, 25)]


def test_curate_corpus_span_dedup_stage():
    """span_dedup_k cuts a repeated long run from all but one survivor:
    packed content volume drops vs the same pipeline without the stage,
    and the pipeline stays token-conserving (full contexts only)."""
    from go_tfdata_ray.pipelines.curate import curate_corpus

    ids, texts, clean = _corpus()
    # plant one distinctive 12-word run VERBATIM into 6 otherwise-distinct
    # clean docs (unique vocab — nothing else repeats 8-word windows)
    run = " ".join(f"spanword{j}x" for j in range(12))
    for i in range(6):
        texts[30 + i] = f"lead{i}a lead{i}b {run} tail{i}a tail{i}b"
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    kw = dict(ppl_quantile=0.88, context_len=64, lm_sample_n=80)
    base, _ = curate_corpus(ds, **kw)
    cutp, _ = curate_corpus(ds, span_dedup_k=8, **kw)
    vol = lambda p: int(round(float(np.sum(
        p.to_pandas()["fill_ratio"])) * 64))
    # 5 of the 6 runs (12 words each) are cut — ≥40 tokens of content gone
    assert vol(cutp) <= vol(base) - 40
    df = cutp.to_pandas()
    assert len(df) > 0 and all(len(t) == 64 for t in df["tokens"])
