"""Committed model artifacts for the RunInference path (SURVEY §2.10).

The sandbox has no network and no ML frameworks, so "a real model" here
means: a model genuinely TRAINED (not hand-set) on a committed training
corpus, with learned weights serialized to a versioned artifact that the
inference operator loads per worker — the Beam ``RunInference`` /
``ModelHandler`` lifecycle — and a held-out accuracy pinned in pytest.

Contents:
- ``lid_corpus.py``     — original multilingual sentences (the training set)
- ``train_lid.py``      — deterministic trainer (numpy softmax regression)
- ``lid_model_v1.json`` — the committed artifact ``train_lid.py`` produces
"""
