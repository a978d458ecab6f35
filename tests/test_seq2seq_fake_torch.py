"""Execute Seq2SeqExtractor's tensor path against fake torch/transformers.

The real-model path (operators/extraction.py:309-385 — batched tokenize,
beam generate, teacher-forced scoring forward, reference
qa_model.py:99-171,327-342) is environment-gated: this sandbox has no
torch.  These tests inject numpy-backed fakes (tests/fake_torch.py) that
implement exactly the API surface the extractor touches, so the previously
unexecuted code — padding, pad->-100 masking, loss reduction, the CPU int8
quantization branch (reference predict.py:44-47) — runs and is checked
against independently computed expectations.

No Spark needed: the extractor is plain pandas-in/pandas-out (that is the
mapInPandas contract), so driver-side execution covers the same code the
workers would run.
"""
import importlib
import math
import sys

import pandas as pd
import pytest

import tests.fake_torch as ft


@pytest.fixture
def fake_torch(monkeypatch):
    torch_mod, tf_mod, record = ft.build_fake_modules(cuda_available=False)
    monkeypatch.setitem(sys.modules, "torch", torch_mod)
    monkeypatch.setitem(sys.modules, "transformers", tf_mod)
    return record


@pytest.fixture
def fake_torch_cuda(monkeypatch):
    torch_mod, tf_mod, record = ft.build_fake_modules(cuda_available=True)
    monkeypatch.setitem(sys.modules, "torch", torch_mod)
    monkeypatch.setitem(sys.modules, "transformers", tf_mod)
    return record


def _extractor():
    mod = importlib.import_module(
        "information_extraction_t5_spark.operators.extraction"
    )
    return mod


def test_cpu_path_quantizes_dynamic_int8(fake_torch):
    ex = _extractor().Seq2SeqExtractor("fake-t5")
    assert ex.quantized is True
    calls = fake_torch["quantize_calls"]
    assert len(calls) == 1
    # the reference quantizes exactly {nn.Linear} to qint8 (predict.py:44-47)
    assert calls[0]["dtype"] == "qint8"
    layers = calls[0]["layers"]
    assert layers == {sys.modules["torch"].nn.Linear}


def test_gpu_path_skips_quantization(fake_torch_cuda):
    ex = _extractor().Seq2SeqExtractor("fake-t5")
    assert ex.quantized is False
    assert fake_torch_cuda["quantize_calls"] == []


def test_predict_end_to_end_predictions_and_probs(fake_torch):
    mod = _extractor()
    ex = mod.Seq2SeqExtractor("fake-t5", num_beams=5, max_length=200)

    pdf = pd.DataFrame({
        "question": ["Qual o nome?", "Qual o nome?", "Qual a cidade?"],
        "window_text": [
            "nome JOAO SILVA SANTOS fim",   # 2-word answer (answer_words=2)
            "nome MARIA fim",               # different content -> diff loss
            "",                             # empty context -> empty decode
        ],
    })
    out = ex.predict(pdf)

    # the fake model answers with the first 2 words after 'context:'
    assert list(out["prediction"]) == ["nome JOAO", "nome MARIA", ""]
    # generate got the reference decoding params (qa_model.py generate call)
    gk = fake_torch["model"].generate_kwargs
    assert gk["num_beams"] == 5
    assert gk["max_length"] == 200
    assert gk["early_stopping"] is True

    # expected probs computed INDEPENDENTLY from the fake's documented
    # logits rule: per-token loss depends on the token id, rows sum only
    # their REAL (non-pad) label tokens — any pad-masking mistake in the
    # extractor would double-count the shorter row
    tok = fake_torch["tokenizer"]

    def row_loss(words):
        ids = [tok.vocab[w] for w in words]
        return sum(ft.token_loss(i) for i in ids), len(ids)

    l0, n0 = row_loss(["nome", "JOAO"])
    l1, n1 = row_loss(["nome", "MARIA"])
    expected = mod.probs_from_losses([l0, l1, 0.0], [n0, n1, 0])
    assert list(out["prob"]) == expected
    # empty decode: loss 0 over clamped len 1 -> probability 1.0
    assert out["prob"].iloc[2] == 1.0
    # rows with different token content must score differently (the fake
    # peaks vary by id) — guards against a fake that can't distinguish
    assert out["prob"].iloc[0] != out["prob"].iloc[1]


def test_predict_windows_runs_registry_expansion(fake_torch):
    mod = _extractor()
    ex = mod.Seq2SeqExtractor("fake-t5")
    spec = [
        ("qa.nome", "nome", ("Qual o nome?", "Nome?"), ()),
        ("qa.cidade", "cidade", ("Qual a cidade?",), ()),
    ]
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c2"],
        "window_id": [0, 0],
        "window_offset": [0, 0],
        "window_text": ["nome ANA LIMA fim", "nome BOB REIS fim"],
    })
    out = ex.predict_windows(pdf, spec, choose="all", seed=13)
    # 2 windows x (2 + 1) question variants
    assert len(out) == 6
    assert set(out.columns) == {"conv_id", "window_id", "window_offset",
                                "qa_id", "prediction", "prob"}
    # every row answered from ITS OWN window payload
    byconv = out.groupby("conv_id")["prediction"].unique()
    assert list(byconv["c1"]) == ["nome ANA"]
    assert list(byconv["c2"]) == ["nome BOB"]
    assert ((out["prob"] > 0) & (out["prob"] <= 1)).all()
