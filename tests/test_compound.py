"""Compound explode + group keys vs the reference doctest
(postprocess.py:106-127, adapted to this registry's type map)."""
from information_extraction_t5_spark.core import compound


def test_explode_row_doctest_shape():
    labels = "[SENT1] [Logradouro]: Rua Abert [SENT1] [Bairro]: Cidade Universitária"
    preds = ("[SENT1] [Logradouro]: Rua 41bert [SENT1] [Bairro]: Cidade "
             "Universitaria [SENT1] [Cidade]: Campinas")
    rows = compound.explode_row(labels, preds, "doc_1", "form.endereco",
                                0.98, "1 1")
    assert [r["example_id"] for r in rows] == [
        "form.endereco",
        "form.endereco~logradouro",
        "form.endereco~logradouro*",
        "form.endereco~bairro",
        "form.endereco~bairro*",
    ]
    assert [r["prob"] for r in rows] == [0.98, 0.0, 0.0, 0.0, 0.0]
    assert rows[0]["window_ids"] == [1, 1]
    assert all(r["window_ids"] == [1] for r in rows[1:])
    assert rows[0]["is_original"] and not any(
        r["is_original"] for r in rows[1:]
    )
    assert [r["disjoint_class"] for r in rows] == [
        None, None, "form", None, "form"
    ]
    # first-occurrence matching: label typename picks FIRST matching pred
    assert rows[1]["prediction"] == "[SENT1] [logradouro]: Rua 41bert"
    # star rows strip SENT tokens
    assert rows[2]["label"] == "[logradouro]: Rua Abert"
    assert rows[2]["sent_ids"] == [1]
    # extra predicted typename (Cidade) is ignored entirely
    assert not any("cidade" in r["example_id"] for r in rows)


def test_explode_row_missing_typename_gives_empty_pred():
    labels = "[SENT1] [Logradouro]: A [SENT2] [Bairro]: B"
    preds = "[SENT1] [Logradouro]: A"
    rows = compound.explode_row(labels, preds, "d", "form.endereco", 0.5, "0 0")
    bairro = [r for r in rows if r["example_id"] == "form.endereco~bairro"][0]
    assert bairro["prediction"] == ""


def test_explode_row_simple_answer():
    rows = compound.explode_row(
        "[SENT1] [Agência]: 123", "[SENT2] [Agência]: 124",
        "d", "form.agencia", 0.7, "2",
    )
    assert [r["example_id"] for r in rows] == ["form.agencia", "form.agencia*"]
    assert rows[1]["label"] == "[agencia]: 123"
    assert rows[1]["prediction"] == "[agencia]: 124"
    assert rows[1]["sent_ids"] == [2]
    assert rows[1]["prob"] == 0.7


def test_explode_row_complement_raw_text():
    rows = compound.explode_row(
        "[SENT1] [No do Documento]: 88975",
        "[SENT1] [No do Documento]: 88975 [aparece no texto] 88.975",
        "d", "form.n_doc_serie", 0.9, "0",
    )
    star = rows[1]
    assert star["raw_text"] == "88.975"
    assert star["prediction"] == "[n_doc_serie]: 88975"


def test_group_keys():
    # reference group_qas semantics (postprocess.py:16-70)
    assert compound.group_keys("form.agencia") == ["form", "form.agencia"]
    assert compound.group_keys("form.endereco~estado") == [
        "form.endereco~estado"
    ]
    assert compound.group_keys("form.nome_2") == [
        "form", "form.nome_2", "form.nome"
    ]
    assert compound.group_keys("form.nome_2*") == [
        "form", "form.nome_2*", "form.nome*"
    ]
    assert compound.group_keys("form.x_2~tn") == ["form.x_2~tn", "form.x~tn"]
    assert compound.group_keys("form.agencia", group_by_typenames=False) == [
        "form.agencia"
    ]


def test_group_keys_expr_matches_kernel(spark):
    """The pure-expression group keys (postprocess.group_keys_expr) must
    equal core/compound.group_keys on every id shape, duplicates and order
    included."""
    from pyspark.sql import functions as F

    from information_extraction_t5_spark.operators.postprocess import (
        group_keys_expr,
    )

    ids = [
        "form", "form.agencia", "form.endereco~estado", "form.nome_2",
        "form.nome_2*", "form.x_2~tn", "form.x_2~tn*", "seg.building_10",
        "a_b_3", "x_", "x_*", "_5", "form.nome_02", "a~", "a_1~",
        "form.endereco~logradouro*", "p.q_0", "p.q_0*", "p.q_0~cep",
        "p.q_0~cep*", "no_dot_7", "trailing_star*",
    ]
    df = spark.createDataFrame([(i,) for i in ids], "ex string")
    got = {
        r["ex"]: list(r["keys"])
        for r in df.select(
            "ex", group_keys_expr(F.col("ex")).alias("keys")
        ).collect()
    }
    for i in ids:
        assert got[i] == compound.group_keys(i), i

    got_off = {
        r["ex"]: list(r["keys"])
        for r in df.select(
            "ex",
            group_keys_expr(F.col("ex"), group_by_typenames=False)
            .alias("keys"),
        ).collect()
    }
    for i in ids:
        assert got_off[i] == compound.group_keys(
            i, group_by_typenames=False
        ), i


def test_group_keys_expr_property(spark):
    """Property check: expression form == kernel on arbitrary ids drawn
    from the id alphabet (dots, underscores, tildes, stars, digits, signs,
    spaces) — duplicates and ordering included."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from information_extraction_t5_spark.operators.postprocess import (
        group_keys_expr,
    )

    ids_strategy = st.lists(
        st.text(alphabet="abz019._~* +-", min_size=0, max_size=24),
        min_size=1, max_size=60,
    )

    @given(ids_strategy)
    @settings(max_examples=12, deadline=None)
    def check(ids):
        df = spark.createDataFrame([(i,) for i in ids], "ex string")
        got = [
            (r["ex"], list(r["keys"]))
            for r in df.select(
                "ex", group_keys_expr(F.col("ex")).alias("keys")
            ).collect()
        ]
        for ex, keys in got:
            assert keys == compound.group_keys(ex), repr(ex)

    check()
