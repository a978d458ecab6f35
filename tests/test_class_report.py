"""Per-document-class sheet artifact (reference Excel sink,
qa_model.py:388-436): the pivoted frames materialize to files and read
back equal to the in-engine pivot."""
import os

from information_extraction_t5_spark.sources.report import (
    pivoted_class_frame,
    write_class_report,
    write_frame_csv,
)


def _preds(spark):
    rows = [
        ("d1", "matriculas.cpf", "[CPF/CNPJ]: 111", "[CPF/CNPJ]: 111", 0.9),
        ("d1", "matriculas.nome", "[Nome]: Ana", "[Nome]: Ana Maria", 0.8),
        ("d2", "matriculas.cpf", "[CPF/CNPJ]: 222", "[CPF/CNPJ]: 999", 0.7),
        ("d2", "matriculas.nome", "[Nome]: Bia", "[Nome]: Bia", 0.95),
        ("d3", "certidoes.data", "[Data de Emissão]: 01/02/2020",
         "[Data de Emissão]: 01/02/2020", 0.99),
    ]
    return spark.createDataFrame(
        rows,
        "document_id string, example_id string, label string, "
        "prediction string, prob double",
    )


def test_pivoted_class_frame_values(spark):
    pdf = pivoted_class_frame(_preds(spark), "matriculas").toPandas()
    assert list(pdf["document_id"]) == ["d1", "d2"]
    row = pdf.set_index("document_id")
    assert row.loc["d1", "cpf_exact"] == 1
    assert row.loc["d1", "nome_exact"] == 0
    assert row.loc["d2", "cpf_exact"] == 0
    assert row.loc["d2", "nome_exact"] == 1
    assert abs(row.loc["d2", "nome_f1"] - 1.0) < 1e-9
    assert row.loc["d1", "cpf_prob"] == 0.9


def test_write_class_report_round_trip(spark, tmp_path):
    out = write_class_report(_preds(spark), str(tmp_path / "report"),
                             fmt="csv")
    assert set(out) == {"matriculas", "certidoes"}
    for cls, path in out.items():
        assert os.path.exists(path)
        back = spark.read.option("header", True).csv(path)
        frame = pivoted_class_frame(_preds(spark), cls)
        assert back.count() == frame.count()
        assert back.columns == frame.columns
    # spot-check a value survives the round trip
    back = (
        spark.read.option("header", True)
        .csv(out["matriculas"])
        .toPandas()
        .set_index("document_id")
    )
    assert back.loc["d2", "nome_prediction"] == "[Nome]: Bia"
    assert back.loc["d1", "cpf_exact"] == "1"


def test_write_frame_csv_single_file(spark, tmp_path):
    df = spark.range(10).toDF("id")
    path = str(tmp_path / "one.csv")
    write_frame_csv(df, path)
    assert os.path.isfile(path)
    assert spark.read.option("header", True).csv(path).count() == 10


def test_pivot_duplicate_rows_deterministic(spark):
    """Duplicate (document, typename) rows (multiple windows or
    choose_question='all' replication) must reduce deterministically to
    the highest-prob row, regardless of partitioning (ADVICE r2)."""
    rows = [
        ("d1", "matriculas.cpf", "[CPF/CNPJ]: 111", "[CPF/CNPJ]: 111", 0.9),
        ("d1", "matriculas.cpf", "[CPF/CNPJ]: 111", "[CPF/CNPJ]: bad", 0.2),
        ("d1", "matriculas.cpf", "[CPF/CNPJ]: 111", "[CPF/CNPJ]: 111", 0.9),
    ]
    preds = spark.createDataFrame(
        rows,
        "document_id string, example_id string, label string, "
        "prediction string, prob double",
    )
    for parts in (1, 7):
        pdf = pivoted_class_frame(
            preds.repartition(parts), "matriculas"
        ).toPandas().set_index("document_id")
        assert pdf.loc["d1", "cpf_prediction"] == "[CPF/CNPJ]: 111"
        assert pdf.loc["d1", "cpf_prob"] == 0.9


def test_pivot_typename_keeps_inner_dots(spark):
    """Dotted qa_ids keep everything after the FIRST dot as the typename,
    so 'form.endereco.estado' cannot collide with another '*.estado'."""
    rows = [
        ("d1", "form.endereco.estado", "[UF]: SP", "[UF]: SP", 0.9),
        ("d1", "form.estado", "[UF]: RJ", "[UF]: RJ", 0.8),
    ]
    preds = spark.createDataFrame(
        rows,
        "document_id string, example_id string, label string, "
        "prediction string, prob double",
    )
    pdf = pivoted_class_frame(preds, "form").toPandas()
    cols = set(pdf.columns)
    assert "endereco.estado_prediction" in cols
    assert "estado_prediction" in cols
    got = pdf.set_index("document_id")
    assert got.loc["d1", "endereco.estado_prediction"] == "[UF]: SP"
    assert got.loc["d1", "estado_prediction"] == "[UF]: RJ"


def test_xlsx_writer_round_trip_unit():
    """Stdlib OOXML writer (sources/xlsx.py, r6): types, None cells,
    escaping, sheet-name sanitization survive a write->read cycle."""
    from information_extraction_t5_spark.sources.xlsx import (
        col_letter,
        read_workbook,
        sanitize_sheet_name,
        write_workbook,
    )
    import tempfile

    assert [col_letter(i) for i in (1, 26, 27, 52, 703)] == [
        "A", "Z", "AA", "AZ", "AAA"]
    taken = set()
    assert sanitize_sheet_name("a/b:c*d", taken) == "a_b_c_d"
    assert sanitize_sheet_name("x" * 40, taken) == "x" * 31
    assert sanitize_sheet_name("x" * 40, taken) == "x" * 29 + "~1"

    with tempfile.NamedTemporaryFile(suffix=".xlsx") as f:
        write_workbook(f.name, {
            "s1": (["a", "b", "c"],
                   [[1, None, "x & <y>"], [2.5, "ok", None],
                    [True, -3, ""]]),
            "s2": (["only"], [["linha com acentuação"]]),
        })
        back = read_workbook(f.name)
    cols, rows = back["s1"]
    assert cols == ["a", "b", "c"]
    assert rows[0] == [1, None, "x & <y>"]
    assert rows[1] == [2.5, "ok", None]
    assert rows[2] == [True, -3, ""]
    assert back["s2"][1] == [["linha com acentuação"]]


def test_write_class_report_xlsx_default(spark, tmp_path):
    """Default fmt writes ONE real workbook with a sheet per class —
    no openpyxl in this sandbox, so this exercises the stdlib writer
    end-to-end and reads the cells back."""
    from information_extraction_t5_spark.sources.xlsx import read_workbook

    out = write_class_report(_preds(spark), str(tmp_path / "report"))
    paths = set(out.values())
    assert len(paths) == 1
    path = paths.pop()
    assert path.endswith("outputs_sheet.xlsx") and os.path.exists(path)
    book = read_workbook(path)
    assert set(book) == {"matriculas", "certidoes"}
    cols, rows = book["matriculas"]
    frame = pivoted_class_frame(_preds(spark), "matriculas")
    assert cols == frame.columns
    byid = {r[0]: dict(zip(cols, r)) for r in rows}
    assert byid["d2"]["nome_prediction"] == "[Nome]: Bia"
    assert byid["d1"]["cpf_exact"] == 1
    assert byid["d2"]["cpf_exact"] == 0


def test_write_class_report_bad_fmt_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_class_report(_preds(spark), str(tmp_path / "r"), fmt="ods")
