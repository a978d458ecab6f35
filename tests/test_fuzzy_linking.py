"""LSH-blocked fuzzy name linking inside the pipeline."""
import datetime as dt

from pyspark.sql import functions as F

from information_extraction_t5_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)

T0 = dt.datetime(2025, 3, 1, tzinfo=dt.timezone.utc)


def _conv(cid, name, cpf):
    lines = [
        "Dados Básicos do Titular",
        "CPF",
        cpf,
        f"Nome Completo {name}",
        "Cidadania BRASILEIRA",
    ]
    return [
        (cid, i, "user" if i % 2 == 0 else "assistant", ln, None,
         T0 + dt.timedelta(seconds=i))
        for i, ln in enumerate(lines)
    ]


def test_typo_names_merge_without_shared_cpf(spark):
    rows = (
        _conv("c_a", "ANA MADALENA SILVEIRA ALVES", "111.222.333-44")
        + _conv("c_b", "ANA MADALENA SILVEIRA ALVEZ", "555.666.777-88")
        + _conv("c_c", "BRUNO VINICIUS FERREIRA", "999.888.777-66")
    )
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    triples = run_pipeline(spark, t, PipelineConfig(fuzzy_link=True))
    subj = {r["conv_id"]: r["subj"]
            for r in triples.select("conv_id", "subj").distinct().collect()}
    # one-char typo, different CPFs: LSH blocking + levenshtein rerank
    # still merges the two mentions
    assert subj["c_a"] == subj["c_b"]
    assert subj["c_c"] != subj["c_a"]

    # and with fuzzy linking off they stay separate
    triples_off = run_pipeline(spark, t, PipelineConfig(fuzzy_link=False))
    subj_off = {
        r["conv_id"]: r["subj"]
        for r in triples_off.select("conv_id", "subj").distinct().collect()
    }
    assert subj_off["c_a"] != subj_off["c_b"]
