"""RunInference with a REAL model (SURVEY §2.10) — evidence beyond parity.

The oracle-parity sweep already hash-matches q_run_inference against DuckDB
at the test SF; these tests pin what parity can't see:

- the artifact is genuinely TRAINED and retraining reproduces it (no
  hand-set weights, no hidden randomness);
- the model has real skill: 100% on the held-out corpus split AND on fresh
  sentences written for this test (never seen by the trainer);
- the Python featurizer and its generated SQL twin agree bit-exactly on
  adversarial inputs (empty, null-ish, accents, CJK, overlap patterns);
- the ModelHandler load is cached per process (the Beam shared-model
  contract).
"""

from __future__ import annotations

import json

import duckdb
import numpy as np
import pytest

pytestmark = pytest.mark.driver  # fast-gate tier: newest-round evidence

from apachebeam_python_spark.models import train_lid
from apachebeam_python_spark.models.lid_corpus import CORPUS, split
from apachebeam_python_spark.operators import inference as inf


def _predict(model, texts):
    X = train_lid.featurize(texts)
    scores = inf.score_matrix(model, X)
    return [model["classes"][k] for k in scores.argmax(axis=1)]


def test_artifact_is_reproducible_by_training():
    """Retraining from the committed corpus reproduces the committed weights
    — the artifact is the output of train_lid.py, not handed-set numbers.
    Tolerance 1e-6 absorbs BLAS summation-order differences across hosts;
    structure and metadata must match exactly."""
    committed = json.loads(train_lid.ARTIFACT.read_text())
    rebuilt = train_lid.build_model()
    assert rebuilt["classes"] == committed["classes"]
    assert rebuilt["feature_chars"] == committed["feature_chars"]
    assert rebuilt["feature_substrings"] == committed["feature_substrings"]
    assert rebuilt["train_config"] == committed["train_config"]
    for cls in committed["classes"]:
        np.testing.assert_allclose(
            rebuilt["weights"][cls], committed["weights"][cls], atol=1e-6
        )
        assert abs(rebuilt["bias"][cls] - committed["bias"][cls]) < 1e-6


def test_holdout_accuracy_pinned():
    """Every 5th corpus sentence per language is excluded from training; the
    committed model must classify ≥ 95% of them (currently 100%)."""
    model = inf.load_lid_model()
    texts, labels = [], []
    for lang in model["classes"]:
        _, ho = split(lang)
        texts += ho
        labels += [lang] * len(ho)
    pred = _predict(model, texts)
    acc = sum(p == t for p, t in zip(pred, labels)) / len(labels)
    assert acc >= 0.95, f"holdout accuracy {acc:.3f}"
    assert json.loads(train_lid.ARTIFACT.read_text())["holdout_accuracy"] == acc


FRESH = {
    "en": [
        "The quick report shows where the slow stage hides.",
        "We shipped the fix after the tests turned green again.",
    ],
    "de": [
        "Die schnelle Übersicht zeigt, wo sich die langsame Stufe versteckt.",
        "Wir haben die Korrektur ausgeliefert, nachdem die Tests wieder grün waren.",
    ],
    "fr": [
        "Le rapport rapide montre où se cache l'étape lente.",
        "Nous avons livré le correctif après que les tests sont redevenus verts.",
    ],
    "es": [
        "El informe rápido muestra dónde se esconde la etapa lenta.",
        "Enviamos la corrección después de que las pruebas volvieran a estar en verde.",
    ],
    "zh": ["这份快速报告显示了缓慢阶段藏在哪里。", "测试重新变绿之后，我们发布了修复。"],
}


def test_generalizes_to_fresh_sentences():
    """Sentences absent from the training corpus — real skill, not recall."""
    model = inf.load_lid_model()
    for lang, texts in FRESH.items():
        for t in texts:
            assert all(t not in s for s in CORPUS[lang]), "fresh sentence leaked"
        assert _predict(model, texts) == [lang] * len(texts), lang


TRICKY = [
    "",
    " ",
    "the quick brown fox",
    "ÉLÈVE ÇA — ÜBUNG macht den Meister",
    "aaa",  # overlap: str.count('aa') == replace-count == 1
    "中文和english混合 mixed 文本",
    "l'l'l'",
    "¿qué pasó? ¡nada!",
    "x" * 1,
]


def test_featurizer_matches_sql_twin_bit_exactly():
    """The generated DuckDB feature expressions must reproduce featurize()
    bit-for-bit — this is the foundation of the oracle hash match."""
    con = duckdb.connect()
    con.execute("CREATE TABLE txts (i INTEGER, text VARCHAR)")
    for i, t in enumerate(TRICKY):
        con.execute("INSERT INTO txts VALUES (?, ?)", [i, t])
    exprs = inf.lid_feature_sql_exprs()
    sql = (
        "WITH t1 AS (SELECT i, lower(coalesce(text,'')) AS t FROM txts), "
        "t2 AS (SELECT i, t, CAST(greatest(length(t),1) AS DOUBLE) AS dlen FROM t1) "
        "SELECT i, " + ", ".join(f"{e} AS f{j}" for j, e in enumerate(exprs)) + " "
        "FROM t2 ORDER BY i"
    )
    got = con.execute(sql).fetchnumpy()
    want = train_lid.featurize(TRICKY)
    for j in range(train_lid.N_FEATURES):
        np.testing.assert_array_equal(
            got[f"f{j}"], want[:, j], err_msg=f"feature {j} diverges from SQL twin"
        )


def test_oracle_sql_end_to_end_on_multilingual_text():
    """The fixture corpus is ASCII word soup, so the sf parity sweep never
    exercises the accent/CJK feature arms of the GENERATED oracle. Run the
    full oracle SQL over real multilingual text in DuckDB alone: scores must
    match the Python handler to float tolerance, and pred_lang must equal
    the fixed-order argmax over DuckDB's own rounded scores — and be the
    RIGHT language for every fresh sentence."""
    model = inf.load_lid_model()
    classes = model["classes"]
    texts, langs = [], []
    for lang, ts in FRESH.items():
        texts += ts
        langs += [lang] * len(ts)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    out = con.execute(
        inf.lid_oracle_sql() + " ORDER BY doc_id"
    ).df()
    raw = inf.score_matrix(model, train_lid.featurize(texts))
    for ki, cls in enumerate(classes):
        np.testing.assert_allclose(
            out[f"s_{cls}"].to_numpy(), raw[:, ki], atol=1e-6,
            err_msg=f"DuckDB score s_{cls} diverges from the Python handler",
        )
    duck_scores = np.stack([out[f"s_{c}"].to_numpy() for c in classes], axis=1)
    expect_pred = [classes[k] for k in duck_scores.argmax(axis=1)]
    assert list(out["pred_lang"]) == expect_pred, "CASE argmax ≠ fixed-order argmax"
    assert list(out["pred_lang"]) == langs, "oracle misclassifies fresh text"


# fuzz alphabet = the domain the featurizer contract covers: ASCII, the
# feature accents (upper+lower), CJK, common punctuation. Exotic Unicode
# (combining sequences, surrogates, locale-sensitive case like 'İ') is
# deliberately OUT of contract — Python str.lower/len and SQL lower/length
# may legitimately disagree there, and neither the corpus nor the fixtures
# contain it.
_FUZZ_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t.,;:!?¿¡'\"()-_/%$€#@"
    "áàâäçéèêëíîïñóôöúùûüßÁÀÂÄÇÉÈÊËÍÎÏÑÓÔÖÚÙÛÜ"
    "一中文火车咖啡数据流水线鿿"
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.text(alphabet=_FUZZ_ALPHABET, max_size=300), min_size=1, max_size=8
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_featurizer_sql_twin_fuzz(texts):
        """Property: featurize() ≡ the generated SQL feature expressions,
        bit-for-bit, for ANY in-contract text — not just the fixtures."""
        con = duckdb.connect()
        con.execute("CREATE TABLE txts (i INTEGER, text VARCHAR)")
        for i, t in enumerate(texts):
            con.execute("INSERT INTO txts VALUES (?, ?)", [i, t])
        exprs = inf.lid_feature_sql_exprs()
        sql = (
            "WITH t1 AS (SELECT i, lower(coalesce(text,'')) AS t FROM txts), "
            "t2 AS (SELECT i, t, CAST(greatest(length(t),1) AS DOUBLE) AS dlen "
            "FROM t1) SELECT i, "
            + ", ".join(f"{e} AS f{j}" for j, e in enumerate(exprs))
            + " FROM t2 ORDER BY i"
        )
        got = con.execute(sql).fetchnumpy()
        want = train_lid.featurize(texts)
        for j in range(train_lid.N_FEATURES):
            np.testing.assert_array_equal(got[f"f{j}"], want[:, j])

except ImportError:  # pragma: no cover - hypothesis is baked into the image
    pass


def test_model_load_is_cached_per_process():
    """Beam shared-model contract: repeat loads return the same object."""
    a = inf.LidModelHandler().load_model()
    b = inf.LidModelHandler().load_model()
    assert a is b


def test_scores_accumulate_sequentially():
    """score_matrix must equal the explicit left-to-right fold (NOT np.dot,
    whose pairwise/BLAS order would break bit-parity with the SQL chain)."""
    model = inf.load_lid_model()
    X = train_lid.featurize(["the cat sat", "der hund lief", "中文文本"])
    got = inf.score_matrix(model, X)
    for ki, cls in enumerate(model["classes"]):
        for i in range(X.shape[0]):
            acc = model["bias"][cls]
            for j, w in enumerate(model["weights"][cls]):
                acc = acc + w * X[i, j]
            assert got[i, ki] == acc, (cls, i)
