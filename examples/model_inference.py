#!/usr/bin/env python
"""Example 12 — RunInference with a real model (SURVEY §2.10).

The Beam migration story for ``RunInference(model_handler)``: a trained
language-ID artifact (models/lid_model_v1.json — softmax regression the
repo trains itself, holdout accuracy pinned in tests) is loaded once per
Python worker through the ModelHandler lifecycle and applied to the
documents corpus in Arrow batches. Map-only plan: pruned 2-column scan,
no shuffle.

Run: python examples/model_inference.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import functions as F

from apachebeam_python_spark.operators import inference as inf
from apachebeam_python_spark.session import get_spark, table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-inference")
    spark.sparkContext.setLogLevel("ERROR")

    model = inf.load_lid_model()
    classes = model["classes"]
    print(
        f"model: {model['task']} v{model['version']} — "
        f"{len(model['feature_chars']) + len(model['feature_substrings']) + 1} "
        f"features, holdout accuracy {model['holdout_accuracy']:.2f}"
    )

    # 1) batch inference over the corpus (the production shape)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, " + ", ".join(f"s_{c} double" for c in classes)
    scored = inf.run_inference(docs, inf.LidModelHandler(keep=("doc_id",)), schema)
    # fixed-order argmax (ties go to the first class in sorted order)
    best = F.greatest(*[F.col(f"s_{c}") for c in classes])
    pred = F.coalesce(
        *[F.when(F.col(f"s_{c}") == best, F.lit(c)) for c in classes]
    )
    hist = (
        scored.withColumn("pred_lang", pred)
        .groupBy("pred_lang")
        .count()
        .orderBy("pred_lang")
    )
    print("predicted-language histogram over the corpus:")
    for r in hist.collect():
        print(f"  {r['pred_lang']}: {r['count']}")

    # 2) the same handler on real multilingual text — model skill, not just
    # plumbing (these sentences are not in the training corpus)
    samples = [
        Row(doc_id=0, text="The pipeline finished before the coffee went cold."),
        Row(doc_id=1, text="Die Pipeline war fertig, bevor der Kaffee kalt wurde."),
        Row(doc_id=2, text="La chaîne s'est terminée avant que le café ne refroidisse."),
        Row(doc_id=3, text="La tubería terminó antes de que el café se enfriara."),
        Row(doc_id=4, text="咖啡还没凉，流水线就跑完了。"),
    ]
    sdf = spark.createDataFrame(samples)
    out = inf.run_inference(sdf, inf.LidModelHandler(keep=("doc_id",)), schema)
    out = out.withColumn("pred_lang", pred).orderBy("doc_id")
    for r, s in zip(out.collect(), samples):
        print(f"  {r['pred_lang']}  <- {s.text[:50]}")


if __name__ == "__main__":
    main()
