"""
Neural grapheme-to-phoneme option (trained-model parity with the reference's
``PretrainedPhonemizer``, reference phonemizer.py:15-50, which loads a
DeepPhonemizer checkpoint).

No pretrained checkpoint can be assumed offline, so this ships the full
capability instead of the asset: a compact JAX sequence model (character
encoder + learned-query phone decoder, non-autoregressive), a distillation
trainer (``scripts/train_neural_g2p.py``) that learns from the golden lexicon
plus the rule engine's silver labels over the bundled wordlist, and an ``.npz``
checkpoint format so a converted DeepPhonemizer asset drops in via
``HEYBUDDY_G2P_WEIGHTS``. Select with ``HEYBUDDY_PHONEMIZER=neural``.

TPU notes: every shape is static (words pad to ``max_word`` characters,
outputs to ``max_phones`` positions), the whole batch scores in one fused
program, and inference over a text is a single jitted call over its unique
words — no per-character Python loop.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ARPABET",
    "NeuralG2P",
    "NeuralPhonemizer",
    "encode_word",
    "encode_phones",
]

# Full stress-free ARPAbet inventory (reference phonemizer.py maps IPA onto
# this same set). Index 0 is reserved for PAD ("no phone at this position").
ARPABET: List[str] = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z",
    "ZH",
]
_PHONE_TO_ID = {p: i + 1 for i, p in enumerate(ARPABET)}
_CHARS = "abcdefghijklmnopqrstuvwxyz'"
_CHAR_TO_ID = {c: i + 1 for i, c in enumerate(_CHARS)}

Params = Dict[str, Any]


def encode_word(word: str, max_word: int) -> np.ndarray:
    """Word -> padded int32 char ids (unknown characters drop out)."""
    ids = [_CHAR_TO_ID[c] for c in word.lower() if c in _CHAR_TO_ID][:max_word]
    return np.array(ids + [0] * (max_word - len(ids)), dtype=np.int32)


def encode_phones(phones: Sequence[str], max_phones: int) -> np.ndarray:
    """Phone list -> padded int32 phone ids (PAD=0 beyond the sequence)."""
    ids = [_PHONE_TO_ID[p] for p in phones if p in _PHONE_TO_ID][:max_phones]
    return np.array(ids + [0] * (max_phones - len(ids)), dtype=np.int32)


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Params:
    scale = float(np.sqrt(1.0 / fan_in))
    return {
        "w": jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -scale, scale),
        "b": jnp.zeros((fan_out,), jnp.float32),
    }


def _linear(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def _layernorm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _attention(q: jax.Array, k: jax.Array, v: jax.Array,
               mask: jax.Array, heads: int) -> jax.Array:
    """Multi-head attention; ``mask`` is [batch, kv_len] validity."""
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // heads
    qh = q.reshape(b, lq, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, heads, dh).transpose(0, 2, 1, 3)
    logits = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(dh)
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    out = jax.nn.softmax(logits, axis=-1) @ vh
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


# Pure-numpy mirror of the forward pass. Deployment inference goes through
# this rather than JAX because phonemization happens inside TTS *producer
# threads*, and device compute from non-main threads hangs on the axon
# tunnel (see CLAUDE.md); a ~500k-param forward over a few words is
# microseconds in numpy and thread-safe everywhere.

def _np_linear(p: Params, x: np.ndarray) -> np.ndarray:
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def _np_layernorm(x: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def _np_attention(q: np.ndarray, k: np.ndarray, v: np.ndarray,
                  mask: np.ndarray, heads: int) -> np.ndarray:
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // heads
    qh = q.reshape(b, lq, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, heads, dh).transpose(0, 2, 1, 3)
    logits = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(dh)
    logits = np.where(mask[:, None, None, :], logits, -1e9)
    logits = logits - logits.max(axis=-1, keepdims=True)
    weights = np.exp(logits)
    weights = weights / weights.sum(axis=-1, keepdims=True)
    out = weights @ vh
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


class NeuralG2P:
    """Character encoder + learned-query phone decoder.

    Encoder: char/position embeddings + ``layers`` pre-LN self-attention
    blocks over the (masked) character sequence. Decoder: ``max_phones``
    learned query vectors cross-attend to the encoded characters once and
    emit per-position phone logits (PAD past the sequence end) — the
    non-autoregressive layout keeps the whole word batch one fused XLA
    program with no scan over decode steps (words are <= ~16 phones, so
    conditioning between output positions is carried by the shared queries
    and encoder context rather than left-to-right feedback).
    """

    def __init__(self, dim: int = 128, heads: int = 4, layers: int = 2,
                 max_word: int = 16, max_phones: int = 16) -> None:
        self.dim = dim
        self.heads = heads
        self.layers = layers
        self.max_word = max_word
        self.max_phones = max_phones
        self.n_phones = len(ARPABET) + 1
        self.n_chars = len(_CHARS) + 1
        self._apply = jax.jit(self.apply)

    @property
    def config(self) -> Dict[str, Any]:
        return {
            "dim": self.dim, "heads": self.heads, "layers": self.layers,
            "max_word": self.max_word, "max_phones": self.max_phones,
        }

    def init_params(self, key: jax.Array) -> Params:
        ks = iter(jax.random.split(key, 8 + 6 * self.layers))
        d = self.dim
        params: Params = {
            "char_emb": jax.random.normal(next(ks), (self.n_chars, d)) * 0.02,
            "pos_emb": jax.random.normal(next(ks), (self.max_word, d)) * 0.02,
            "queries": jax.random.normal(next(ks), (self.max_phones, d)) * 0.02,
            "blocks": [],
            "xq": _linear_init(next(ks), d, d),
            "xk": _linear_init(next(ks), d, d),
            "xv": _linear_init(next(ks), d, d),
            "xo": _linear_init(next(ks), d, d),
            "out": _linear_init(next(ks), d, self.n_phones),
        }
        for _ in range(self.layers):
            params["blocks"].append({
                "q": _linear_init(next(ks), d, d),
                "k": _linear_init(next(ks), d, d),
                "v": _linear_init(next(ks), d, d),
                "o": _linear_init(next(ks), d, d),
                "up": _linear_init(next(ks), d, 4 * d),
                "down": _linear_init(next(ks), 4 * d, d),
            })
        return params

    def apply(self, params: Params, chars: jax.Array) -> jax.Array:
        """[batch, max_word] int char ids -> [batch, max_phones, n_phones]."""
        mask = chars > 0
        x = params["char_emb"][chars] + params["pos_emb"][None, :, :]
        x = jnp.where(mask[..., None], x, 0.0)
        for blk in params["blocks"]:
            h = _layernorm(x)
            x = x + _linear(blk["o"], _attention(
                _linear(blk["q"], h), _linear(blk["k"], h),
                _linear(blk["v"], h), mask, self.heads,
            ))
            h = _layernorm(x)
            x = x + _linear(blk["down"], jax.nn.gelu(_linear(blk["up"], h)))
        q = jnp.broadcast_to(
            params["queries"][None], (chars.shape[0],) + params["queries"].shape
        )
        dec = q + _linear(params["xo"], _attention(
            _linear(params["xq"], q), _linear(params["xk"], _layernorm(x)),
            _linear(params["xv"], _layernorm(x)), mask, self.heads,
        ))
        return _linear(params["out"], _layernorm(dec))

    def loss(self, params: Params, chars: jax.Array,
             targets: jax.Array) -> jax.Array:
        """Mean CE over all positions — PAD targets included, so the model
        learns sequence length (decode strips PAD)."""
        logits = self.apply(params, chars)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], -1))

    def apply_np(self, params: Params, chars: np.ndarray) -> np.ndarray:
        """Numpy mirror of :meth:`apply` (kept in lockstep; parity-tested)."""
        mask = chars > 0
        x = np.asarray(params["char_emb"])[chars] + np.asarray(params["pos_emb"])[None]
        x = np.where(mask[..., None], x, 0.0)
        for blk in params["blocks"]:
            h = _np_layernorm(x)
            x = x + _np_linear(blk["o"], _np_attention(
                _np_linear(blk["q"], h), _np_linear(blk["k"], h),
                _np_linear(blk["v"], h), mask, self.heads,
            ))
            h = _np_layernorm(x)
            up = _np_linear(blk["up"], h)
            gelu = 0.5 * up * (1.0 + np.tanh(
                np.sqrt(2.0 / np.pi) * (up + 0.044715 * up ** 3)))
            x = x + _np_linear(blk["down"], gelu)
        q = np.broadcast_to(
            np.asarray(params["queries"])[None],
            (chars.shape[0],) + np.asarray(params["queries"]).shape,
        )
        dec = q + _np_linear(params["xo"], _np_attention(
            _np_linear(params["xq"], q), _np_linear(params["xk"], _np_layernorm(x)),
            _np_linear(params["xv"], _np_layernorm(x)), mask, self.heads,
        ))
        return _np_linear(params["out"], _np_layernorm(dec))

    def decode(self, params: Params, words: Sequence[str],
               numpy: bool = False) -> List[List[str]]:
        """Batch of words -> phone lists (argmax per position, PAD stripped).

        ``numpy=True`` runs the thread-safe host forward pass (no device
        dispatch) — the deployment path for :class:`NeuralPhonemizer`.
        """
        if not words:
            return []
        chars = np.stack([encode_word(w, self.max_word) for w in words])
        if numpy:
            ids = np.argmax(self.apply_np(params, chars), -1)
        else:
            ids = np.asarray(
                jnp.argmax(self._apply(params, jnp.asarray(chars)), -1))
        out: List[List[str]] = []
        for row in ids:
            out.append([ARPABET[i - 1] for i in row if i > 0])
        return out

    def save(self, params: Params, path: str) -> None:
        flat = {"__config__": np.frombuffer(
            json.dumps(self.config).encode(), dtype=np.uint8)}
        for k, v in params.items():
            if k == "blocks":
                for i, blk in enumerate(v):
                    for n, lin in blk.items():
                        for wn, arr in lin.items():
                            flat[f"blocks/{i}/{n}/{wn}"] = np.asarray(arr)
            elif isinstance(v, dict):
                for wn, arr in v.items():
                    flat[f"{k}/{wn}"] = np.asarray(arr)
            else:
                flat[k] = np.asarray(v)
        np.savez(path, **flat)

    @classmethod
    def load(cls, path: str) -> Tuple["NeuralG2P", Params]:
        data = np.load(path)
        cfg = json.loads(bytes(data["__config__"]).decode())
        model = cls(**cfg)
        params: Params = {"blocks": [dict() for _ in range(cfg["layers"])]}
        for k in data.files:
            if k == "__config__":
                continue
            parts = k.split("/")
            # Load as HOST numpy: the deployment forward (NeuralPhonemizer)
            # is numpy-only and may be instantiated lazily inside a TTS
            # producer thread, where device transfers on the remote-TPU
            # tunnel hang (CLAUDE.md thread gotcha). Training/jit callers
            # get device placement for free when jnp ops consume these.
            if parts[0] == "blocks":
                blk = params["blocks"][int(parts[1])]
                blk.setdefault(parts[2], {})[parts[3]] = np.asarray(data[k])
            elif len(parts) == 2:
                params.setdefault(parts[0], {})[parts[1]] = np.asarray(data[k])
            else:
                params[k] = np.asarray(data[k])
        return model, params


def train_neural_g2p(
    table: Dict[str, List[str]],
    steps: int = 4000,
    lr: float = 3e-4,
    seed: int = 0,
    model: Optional[NeuralG2P] = None,
    log_every: int = 0,
) -> Tuple[NeuralG2P, Params]:
    """Fit a :class:`NeuralG2P` to ``word -> phone list`` pairs (full-batch
    Adam with cosine decay; the distillation tables are ~1.5k words, so one
    batch is the whole dataset and each step is a single fused program)."""
    import optax

    model = model or NeuralG2P()
    words = sorted(w for w in table if w)
    chars = jnp.asarray(np.stack([encode_word(w, model.max_word) for w in words]))
    targets = jnp.asarray(np.stack(
        [encode_phones(table[w], model.max_phones) for w in words]))
    params = model.init_params(jax.random.PRNGKey(seed))
    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1)))
    opt_state = tx.init(params)

    @jax.jit
    def step(p: Params, s: Any) -> Tuple[Params, Any, jax.Array]:
        loss, grads = jax.value_and_grad(model.loss)(p, chars, targets)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if log_every and (i % log_every == 0 or i == steps - 1):
            from heybuddy_tpu.utils.log import logger
            logger.info(f"neural-g2p step {i}/{steps}: loss={float(loss):.4f}")
    return model, params


class NeuralPhonemizer:
    """Drop-in phonemizer backed by a :class:`NeuralG2P` checkpoint.

    Same contract as ``SimplePhonemizer`` (reference phonemizer.py:52-160
    output format): ``word_phones("hello") -> ["HH","AH","L","OW"]``,
    ``__call__`` brackets per word. Inference is the pure-numpy forward
    (``decode(..., numpy=True)``) so TTS producer threads can phonemize
    without device dispatch; word results are memoized.
    """

    name = "neural"

    def __init__(self, weights: Optional[str] = None) -> None:
        bundled = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets", "g2p-neural.npz",
        )
        path = weights or os.environ.get("HEYBUDDY_G2P_WEIGHTS", "") or (
            bundled if os.path.exists(bundled) else ""
        )
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "NeuralPhonemizer needs a checkpoint: set HEYBUDDY_G2P_WEIGHTS "
                "or train one with scripts/train_neural_g2p.py"
            )
        self.model, params = NeuralG2P.load(path)
        # numpy-resident weights: no device memory, safe from any thread
        self.params = jax.tree_util.tree_map(np.asarray, params)
        self._cache: Dict[str, List[str]] = {}

    def word_phones(self, word: str) -> List[str]:
        word = word.lower().strip()
        if word not in self._cache:
            self._cache[word] = self.model.decode(
                self.params, [word], numpy=True)[0]
        return self._cache[word]

    def __call__(self, text: str) -> str:
        words = re.findall(r"[a-z']+", text.lower())
        missing = sorted({w for w in words if w not in self._cache})
        if missing:
            for w, phones in zip(
                    missing, self.model.decode(self.params, missing, numpy=True)):
                self._cache[w] = phones
        out = []
        for w in words:
            phones = self._cache[w]
            if phones:
                out.append("".join(f"[{p}]" for p in phones))
        return " ".join(out)
