"""fastText supervised-model binary format: writer + pure-numpy loader.

The production langid hook (``scrub.fasttext_nl_lang_col``) prefers the
real ``fasttext`` package; this module makes the BINARY FORMAT itself a
tested code path even where the package is absent (VERDICT r03 item 7):
``save_supervised_model`` emits a spec-conformant ``.bin`` that real
fastText loads, and ``load_model`` reads any unquantized supervised
``.bin`` with numpy only, exposing the same ``predict(text, k)`` surface
the hook's UDF calls.

Layout follows the PUBLIC fastText file format (facebookresearch/fastText,
``src/fasttext.cc::signModel/loadModel``, ``src/args.cc::save/load``,
``src/dictionary.cc::save/load``, ``src/densematrix.cc::save/load``),
re-derived here — all little-endian:

  int32 magic = 793712314            # FASTTEXT_FILEFORMAT_MAGIC_INT32
  int32 version = 12                 # FASTTEXT_VERSION
  Args: 12x int32 (dim ws epoch minCount neg wordNgrams loss model
        bucket minn maxn lrUpdateRate) + 1x float64 (t)
  Dictionary: int32 size, int32 nwords, int32 nlabels, int64 ntokens,
        int64 pruneidx_size; then `size` entries of
        (NUL-terminated utf-8 word, int64 count, int8 entry_type
        [0=word, 1=label]); then pruneidx_size x (int32, int32)
  int8  quant_input (0 = dense)
  DenseMatrix input: int64 rows, int64 cols, float32[rows*cols]
        (rows = nwords + bucket; labels have no input vectors)
  int8  qout (0 = dense)
  DenseMatrix output: int64 rows=nlabels, int64 cols=dim, float32[...]

Supervised inference (``model=sup``, ``loss=softmax``): whitespace-split
tokens -> dictionary word ids -> hidden = mean of their input rows ->
scores = output @ hidden -> softmax -> top-k labels. The loader supports
exactly that path and fails loud on anything it would silently mis-score
(quantized matrices, subword ngrams, word-ngram buckets, non-softmax
loss).
"""

from __future__ import annotations

import struct

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

_LOSS_SOFTMAX = 3
_MODEL_SUP = 3
_ENTRY_WORD = 0
_ENTRY_LABEL = 1

# whitespace per fastText's Dictionary::readWord
_WS = " \n\t\v\f\r\x00"


def save_supervised_model(
    path: str,
    words: list[str],
    labels: list[str],
    input_mat: np.ndarray,
    output_mat: np.ndarray,
) -> None:
    """Write a dense supervised model. ``input_mat`` is (len(words), dim)
    word vectors; ``output_mat`` is (len(labels), dim); labels should carry
    the conventional ``__label__`` prefix (the loader does not add it)."""
    input_mat = np.asarray(input_mat, dtype=np.float32)
    output_mat = np.asarray(output_mat, dtype=np.float32)
    if input_mat.shape[0] != len(words) or output_mat.shape[0] != len(labels):
        raise ValueError("matrix row counts must match words/labels")
    if input_mat.shape[1] != output_mat.shape[1]:
        raise ValueError("input/output dims differ")
    dim = input_mat.shape[1]
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        # dim ws epoch minCount neg wordNgrams loss model bucket minn maxn
        # lrUpdateRate, then t
        f.write(
            struct.pack(
                "<12i",
                dim, 5, 5, 1, 5, 1, _LOSS_SOFTMAX, _MODEL_SUP, 0, 0, 0, 100,
            )
        )
        f.write(struct.pack("<d", 1e-4))
        f.write(
            struct.pack(
                "<iiiqq", len(words) + len(labels), len(words), len(labels),
                len(words) + len(labels), -1,
            )
        )
        for w in words:
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 1, _ENTRY_WORD))
        for lab in labels:
            f.write(lab.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 1, _ENTRY_LABEL))
        f.write(struct.pack("<b", 0))  # quant_input: dense
        f.write(struct.pack("<qq", input_mat.shape[0], dim))
        f.write(input_mat.tobytes())
        f.write(struct.pack("<b", 0))  # qout: dense
        f.write(struct.pack("<qq", output_mat.shape[0], dim))
        f.write(output_mat.tobytes())


def is_fasttext_bin(path: str) -> bool:
    """True iff ``path`` exists and starts with the fastText magic."""
    try:
        with open(path, "rb") as f:
            head = f.read(8)
    except OSError:
        return False
    if len(head) < 8:
        return False
    magic, _version = struct.unpack("<ii", head)
    return magic == FASTTEXT_MAGIC


class FastTextBinModel:
    """Numpy reimplementation of supervised-model inference over a parsed
    ``.bin`` — ``predict`` mirrors the fasttext Python API: returns
    ``(labels_tuple, probs_array)``, empty when no token is in-vocabulary
    (exactly the package's behavior on OOV-only input)."""

    def __init__(self, word_ids: dict[str, int], labels: list[str],
                 input_mat: np.ndarray, output_mat: np.ndarray):
        self._word_ids = word_ids
        self._labels = labels
        self._input = input_mat
        self._output = output_mat

    # Read-only views for operators that recast inference as DataFrame
    # algebra (operators/model_filter.py) rather than per-row predict().
    @property
    def word_ids(self) -> dict[str, int]:
        return self._word_ids

    @property
    def labels(self) -> list[str]:
        return self._labels

    @property
    def input_matrix(self) -> np.ndarray:
        return self._input

    @property
    def output_matrix(self) -> np.ndarray:
        return self._output

    def predict(self, text: str, k: int = 1):
        ids = [
            self._word_ids[t]
            for t in text.split()
            if t in self._word_ids
        ]
        if not ids:
            return (), np.array([], dtype=np.float64)
        hidden = self._input[ids].mean(axis=0)
        scores = self._output @ hidden
        scores -= scores.max()
        probs = np.exp(scores, dtype=np.float64)
        probs /= probs.sum()
        top = np.argsort(-probs, kind="stable")[:k]
        return tuple(self._labels[i] for i in top), probs[top]


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise ValueError("truncated fastText model file")
    return b


def load_model(path: str) -> FastTextBinModel:
    """Parse an unquantized supervised ``.bin``. Raises ``ValueError`` on a
    wrong magic/version or any feature this inference path doesn't cover
    (quantization, subword or word ngrams, non-softmax loss) rather than
    returning silently wrong predictions."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", _read_exact(f, 8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"not a fastText model (magic {magic})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        (dim, _ws, _epoch, _minc, _neg, wordngrams, loss, model, bucket,
         minn, maxn, _lr) = struct.unpack("<12i", _read_exact(f, 48))
        (_t,) = struct.unpack("<d", _read_exact(f, 8))
        if model != _MODEL_SUP:
            raise ValueError("only supervised models are supported")
        if loss != _LOSS_SOFTMAX:
            raise ValueError("only softmax loss is supported")
        if wordngrams > 1 or bucket > 0 or minn > 0 or maxn > 0:
            raise ValueError("ngram/subword models are not supported")
        size, nwords, nlabels, _ntokens, pruneidx_size = struct.unpack(
            "<iiiqq", _read_exact(f, 28)
        )
        words: list[str] = []
        labels: list[str] = []
        for _ in range(size):
            raw = bytearray()
            while (c := _read_exact(f, 1)) != b"\x00":
                raw += c
            _count, etype = struct.unpack("<qb", _read_exact(f, 9))
            (labels if etype == _ENTRY_LABEL else words).append(
                raw.decode("utf-8")
            )
        if pruneidx_size > 0:
            _read_exact(f, 8 * pruneidx_size)

        def dense(expect_rows: int | None) -> np.ndarray:
            (quant,) = struct.unpack("<b", _read_exact(f, 1))
            if quant:
                raise ValueError("quantized matrices are not supported")
            rows, cols = struct.unpack("<qq", _read_exact(f, 16))
            if cols != dim or (expect_rows is not None and rows != expect_rows):
                raise ValueError(f"matrix shape ({rows},{cols}) != expected")
            return np.frombuffer(
                _read_exact(f, 4 * rows * cols), dtype="<f4"
            ).reshape(rows, cols)

        input_mat = dense(nwords)  # bucket==0 -> rows == nwords
        output_mat = dense(nlabels)
    return FastTextBinModel(
        {w: i for i, w in enumerate(words)}, labels, input_mat, output_mat
    )
