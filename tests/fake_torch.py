"""Minimal numpy-backed ``torch``/``transformers`` fakes.

Implements EXACTLY the API surface Seq2SeqExtractor touches
(operators/extraction.py: __init__, predict) so the tensor path — batched
tokenize with padding, beam generate, teacher-forced scoring forward,
pad-masked per-row loss reduction — executes in environments without torch
(reference behavior anchor: qa_model.py:99-171,327-342, predict.py:44-47).

The fakes are deliberately deterministic and analytically tractable:

- FakeTokenizer: whitespace vocabulary, pad id 0, right-padding.
- FakeModel.generate: "answers" with the first ``answer_words`` words after
  the literal token ``context:`` in each input row — a stand-in whose
  output the test can compute independently.
- FakeModel forward: logits[b, t, v] = PEAK if v == label else 0, with
  PEAK = 1.0 + (label_id % 3).  Per-token cross-entropy is then
  log(exp(PEAK) + V - 1) - PEAK, varying by token id, so per-row summed
  losses (and hence exp(-loss/len) probabilities) differ across rows and
  any pad-masking mistake shifts them detectably.

Nothing here imports the real torch; inject via sys.modules (see
test_seq2seq_fake_torch.py).
"""
from __future__ import annotations

import math
import types

import numpy as np

VOCAB_SIZE = 50_000  # fixed fake vocab width for the logits tensor


class FakeTensor:
    """The thin tensor slice of torch the extractor's code path touches."""

    def __init__(self, arr):
        self.arr = np.asarray(arr)

    # --- shape/layout ---
    def transpose(self, a, b):
        return FakeTensor(np.swapaxes(self.arr, a, b))

    # --- elementwise ---
    def clamp(self, min=None):  # noqa: A002 - torch kwarg name
        return FakeTensor(np.maximum(self.arr, min))

    def __eq__(self, other):  # type: ignore[override]
        return FakeTensor(self.arr == other)

    def __ne__(self, other):  # type: ignore[override]
        return FakeTensor(self.arr != other)

    def __mul__(self, other):
        o = other.arr if isinstance(other, FakeTensor) else other
        return FakeTensor(self.arr * o)

    # --- reductions ---
    def sum(self, dim=None):
        return FakeTensor(self.arr.sum(axis=dim))

    # --- mutation (labels[labels == pad] = -100) ---
    def __setitem__(self, mask, value):
        m = mask.arr if isinstance(mask, FakeTensor) else mask
        self.arr[m] = value

    def tolist(self):
        return self.arr.tolist()

    @property
    def shape(self):
        return self.arr.shape


class _Enc(dict):
    """Tokenizer output: dict for ``model(**enc)`` + attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover - attribute typo guard
            raise AttributeError(k) from e


class FakeTokenizer:
    pad_token_id = 0

    def __init__(self):
        self.vocab = {"<pad>": 0}
        self.words = ["<pad>"]

    def _id(self, w: str) -> int:
        if w not in self.vocab:
            self.vocab[w] = len(self.words)
            self.words.append(w)
        return self.vocab[w]

    def __call__(self, texts, padding=True, truncation=False,
                 max_length=None, return_tensors="pt") -> _Enc:
        rows = [[self._id(w) for w in t.split()] for t in texts]
        if truncation and max_length:
            rows = [r[:max_length] for r in rows]
        width = max((len(r) for r in rows), default=1) if padding else None
        ids = np.zeros((len(rows), width or 1), dtype=np.int64)
        mask = np.zeros_like(ids)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return _Enc(input_ids=FakeTensor(ids),
                    attention_mask=FakeTensor(mask))

    def batch_decode(self, ids, skip_special_tokens=True):
        out = []
        for row in ids.arr:
            ws = [self.words[i] for i in row
                  if not (skip_special_tokens and i == self.pad_token_id)]
            out.append(" ".join(ws))
        return out


def token_loss(label_id: int) -> float:
    """Per-token cross-entropy the fake forward produces for ``label_id``
    (uniform logits except a PEAK at the label — see module docstring).
    Exposed so tests compute expected losses independently."""
    peak = 1.0 + (label_id % 3)
    return math.log(math.exp(peak) + (VOCAB_SIZE - 1)) - peak


class FakeModel:
    """generate + teacher-forced forward over the FakeTokenizer vocab."""

    def __init__(self, tokenizer: FakeTokenizer, answer_words: int = 2):
        self.tokenizer = tokenizer
        self.answer_words = answer_words
        self.generate_kwargs = None

    def eval(self):
        return self

    def generate(self, input_ids=None, attention_mask=None, **kwargs):
        self.generate_kwargs = kwargs
        ctx_id = self.tokenizer.vocab.get("context:")
        out = []
        for row in input_ids.arr:
            toks = [t for t in row if t != 0]
            ans = []
            if ctx_id in toks:
                after = toks[toks.index(ctx_id) + 1:]
                ans = after[: self.answer_words]
            out.append(ans)
        width = max((len(r) for r in out), default=1)
        ids = np.zeros((len(out), width), dtype=np.int64)
        for i, r in enumerate(out):
            ids[i, : len(r)] = r
        return FakeTensor(ids)

    def __call__(self, input_ids=None, attention_mask=None, labels=None):
        b, t = labels.arr.shape
        logits = np.zeros((b, t, VOCAB_SIZE), dtype=np.float64)
        lab = np.maximum(labels.arr, 0)  # extractor clamps -100 -> 0 itself;
        # the fake only uses labels to place peaks, like a real LM head
        # conditioned on teacher forcing
        for i in range(b):
            for j in range(t):
                v = lab[i, j]
                logits[i, j, v] = 1.0 + (v % 3)
        return types.SimpleNamespace(logits=FakeTensor(logits))


def _cross_entropy(logits, target, reduction="none"):
    assert reduction == "none"
    lg = logits.arr  # (B, V, T) — extractor transposes before the call
    tg = target.arr  # (B, T)
    b, v, t = lg.shape
    out = np.empty((b, t), dtype=np.float64)
    for i in range(b):
        for j in range(t):
            row = lg[i, :, j]
            m = row.max()
            lse = m + math.log(np.exp(row - m).sum())
            out[i, j] = lse - row[tg[i, j]]
    return FakeTensor(out)


class _NoGrad:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def build_fake_modules(cuda_available: bool = False):
    """(torch_mod, transformers_mod, record) ready for sys.modules.

    ``record`` captures quantize_dynamic calls so tests assert the CPU
    int8 branch fires exactly when torch reports no CUDA."""
    record = {"quantize_calls": [], "tokenizer": None, "model": None}

    class Linear:  # the quantize target set {nn.Linear}
        pass

    torch_mod = types.ModuleType("torch")
    torch_mod.qint8 = "qint8"
    torch_mod.set_num_threads = lambda n: None
    torch_mod.no_grad = _NoGrad
    torch_mod.cuda = types.SimpleNamespace(
        is_available=lambda: cuda_available
    )

    def quantize_dynamic(model, layer_set, dtype=None):
        record["quantize_calls"].append(
            {"layers": layer_set, "dtype": dtype}
        )
        return model  # identity: the fake model has no Linear weights

    torch_mod.quantization = types.SimpleNamespace(
        quantize_dynamic=quantize_dynamic
    )
    torch_mod.nn = types.SimpleNamespace(
        Linear=Linear,
        functional=types.SimpleNamespace(cross_entropy=_cross_entropy),
    )

    tf_mod = types.ModuleType("transformers")

    class AutoTokenizer:
        @staticmethod
        def from_pretrained(name):
            record["tokenizer"] = FakeTokenizer()
            return record["tokenizer"]

    class AutoModelForSeq2SeqLM:
        @staticmethod
        def from_pretrained(name):
            record["model"] = FakeModel(record["tokenizer"])
            return record["model"]

    tf_mod.AutoTokenizer = AutoTokenizer
    tf_mod.AutoModelForSeq2SeqLM = AutoModelForSeq2SeqLM
    return torch_mod, tf_mod, record
