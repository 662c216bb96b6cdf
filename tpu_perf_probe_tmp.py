"""Stage timing probe on the real chip: mel precisions, pooling paths."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.utils.downloads import get_cache_dir

jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heybuddy_tpu.constants import CLIP_SAMPLES
from heybuddy_tpu.models import embedding_net
from heybuddy_tpu.models.featurizer import featurize_batch
from heybuddy_tpu.ops.melspec import mel_spectrogram

BATCH = 2048
ITERS = 10
params = embedding_net.default_params()
rng = np.random.default_rng(0)
audio = jax.device_put(rng.normal(0.0, 1000.0, (BATCH, CLIP_SAMPLES)).astype(np.float32))
spec_host = rng.normal(1.5, 0.8, (BATCH, 141, 32)).astype(np.float32)
spec = jax.device_put(spec_host)
from heybuddy_tpu.ops.windows import embedding_window_starts
starts = embedding_window_starts(CLIP_SAMPLES)


def fetch(x):
    return float(np.asarray(x[(0,) * x.ndim]))


def bench(name, fn, *args):
    t0 = time.perf_counter()
    fetch(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        fetch(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(json.dumps({"name": name, "ms_per_batch": round(ms, 3),
                      "clips_per_s": round(BATCH / (best / ITERS), 0),
                      "compile_s": round(compile_s, 1)}), flush=True)


P = jax.lax.Precision

bench("mel_HIGH", jax.jit(lambda a: mel_spectrogram(a, precision=P.HIGH)), audio)
bench("mel_DEFAULT", jax.jit(lambda a: mel_spectrogram(a, precision=P.DEFAULT)), audio)
bench("mel_HIGHEST", jax.jit(lambda a: mel_spectrogram(a, precision=P.HIGHEST)), audio)
bench(
    "emb_banded_on_spec",
    jax.jit(lambda p, s: embedding_net.apply_spectrogram_banded(p, s, starts)),
    params, spec,
)
bench(
    "emb_gather_on_spec",
    jax.jit(lambda p, s: embedding_net.apply_spectrogram(p, s, starts)),
    params, spec,
)
bench("full_banded", jax.jit(lambda p, a: featurize_batch(p, a, pooling="banded")), params, audio)
bench("full_gather", jax.jit(lambda p, a: featurize_batch(p, a, pooling="gather")), params, audio)
print("DONE", flush=True)
