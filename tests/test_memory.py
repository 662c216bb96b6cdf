"""Resource regression bounds (reference tests/test_feature_generator.py:14-29)."""

import resource

import numpy as np

from heybuddy_tpu.models.featurizer import SpeechEmbeddings


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def test_featurization_host_memory_bounded():
    """
    Featurizing a large clip stream must not grow host RSS unboundedly
    (the reference asserts < 1 GB growth for 10k clips on GPU; we stream
    1024 clips in 128-clip batches on the test backend with the same bound).
    """
    se = SpeechEmbeddings()
    rng = np.random.default_rng(0)
    # warmup (compilation + buffers allocated)
    se(rng.normal(0, 0.1, (128, 23040)).astype(np.float32))
    before = _rss_mb()
    for _ in range(8):
        batch = rng.normal(0, 0.1, (128, 23040)).astype(np.float32)
        out = se(batch)
        assert out.shape == (128, 16, 96)
    growth = _rss_mb() - before
    assert growth < 1024, f"host RSS grew {growth:.0f} MB during streaming featurization"


def test_feature_store_append_memory_bounded(tmp_path):
    """Appending many shards to the store must stream, not accumulate."""
    from heybuddy_tpu.utils.npy import AppendableNpyFile

    store = AppendableNpyFile(str(tmp_path / "big.npy"))
    rng = np.random.default_rng(1)
    store.append(rng.normal(size=(256, 16, 96)).astype(np.float32))
    before = _rss_mb()
    for _ in range(20):
        store.append(rng.normal(size=(256, 16, 96)).astype(np.float32))
    growth = _rss_mb() - before
    assert growth < 256, f"store append grew RSS {growth:.0f} MB"
    assert len(store) == 21 * 256
