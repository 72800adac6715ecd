"""Trainable NB quality classifier: separable-corpus accuracy, two-level
fold parity, margin gating, determinism, contract errors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from go_tfdata_ray.functions import classify


def _labeled(n_per=60, seed=3):
    rng = np.random.default_rng(seed)
    good_v = ("theorem proof lemma analysis derivation integral matrix "
              "vector gradient convergence bound estimate").split()
    bad_v = ("click buy cheap winner prize casino jackpot free offer "
             "discount deal limited").split()
    rows = []
    for i in range(n_per):
        rows.append((f"g{i}", " ".join(rng.choice(good_v, 12)), "good"))
        rows.append((f"b{i}", " ".join(rng.choice(bad_v, 12)), "bad"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_train_and_score_separable_corpus():
    df = _labeled()
    ds = rd.from_pandas(df).repartition(6)
    model = classify.train_nb_classifier(ds, ["good", "bad"])
    assert model["n_docs"] == 120
    scored = classify.score_nb(
        rd.from_pandas(df), model).to_pandas().set_index("doc_id")
    acc = (scored["pred"] == df.set_index("doc_id")["label"]).mean()
    assert acc == 1.0  # fully separable vocabularies
    assert (scored["margin"] > 0).all()


def test_two_level_fold_matches_single_fold():
    df = _labeled(n_per=30)
    ds = rd.from_pandas(df).repartition(8)
    m1 = classify.train_nb_classifier(ds, ["good", "bad"], n_features=1 << 12)
    m2 = classify.train_nb_classifier(ds, ["good", "bad"], n_features=1 << 12,
                                      max_fold_rows=2)  # force two-level
    assert np.array_equal(m1["log_prob"], m2["log_prob"])
    assert np.allclose(m1["log_prior"], m2["log_prior"])


def test_filter_by_classifier_margin_gate():
    df = _labeled()
    model = classify.train_nb_classifier(rd.from_pandas(df), ["good", "bad"])
    mixed = pd.DataFrame({
        "doc_id": ["k1", "k2", "k3"],
        "text": ["theorem proof lemma integral bound",
                 "click buy cheap casino prize",
                 "theorem click proof buy lemma cheap"],  # genuine toss-up
    })
    kept = classify.filter_by_classifier(
        rd.from_pandas(mixed), model, keep="good",
        min_margin=1.0).to_pandas()["doc_id"].tolist()
    assert "k1" in kept and "k2" not in kept
    # at margin 0 the toss-up goes to whichever side edges out; at a real
    # margin the ambiguous doc is dropped too
    assert "k3" not in kept


def test_determinism_across_processes_shape():
    df = _labeled(n_per=10)
    m1 = classify.train_nb_classifier(rd.from_pandas(df), ["good", "bad"])
    m2 = classify.train_nb_classifier(rd.from_pandas(df), ["good", "bad"])
    assert np.array_equal(m1["log_prob"], m2["log_prob"])


def test_unknown_label_is_loud():
    df = _labeled(n_per=4)
    df.loc[0, "label"] = "meh"
    with pytest.raises(Exception, match="not in declared classes"):
        classify.train_nb_classifier(rd.from_pandas(df), ["good", "bad"])


def test_missing_class_is_loud():
    df = _labeled(n_per=4)
    df = df[df["label"] == "good"]
    with pytest.raises(Exception, match="no training docs"):
        classify.train_nb_classifier(rd.from_pandas(df), ["good", "bad"])
