"""
Training-features orchestrator: TTS -> augment -> featurize -> cached shards.

Capability parity with reference ``dataset/features.py``
(TrainingFeaturesGenerator): generates (phrase, count) feature sets on demand,
caches them as ``.npy`` keyed by ``safe_name(phrase)`` with top-up generation
(existing counts are extended, never regenerated, features.py:683-747), and
produces pad-only (non-augmented) validation features (features.py:413-427).

TPU-shaped differences: the reference isolates each 25k-clip batch in a
subprocess to cap GPU/host memory (features.py:522-532); here the augment and
featurize stages are bounded-size jitted device calls over streaming batches,
so host RSS stays flat without process isolation. Batches flow
TTS (host) -> augment (device) -> featurize (device) with the appendable-npy
store absorbing output incrementally.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

from heybuddy_tpu.constants import DEFAULT_FEATURE_BATCH_SIZE
from heybuddy_tpu.data.augmented import AugmentedAudioGenerator, NoiseProvider
from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator, get_default_dataset_dir
from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator
from heybuddy_tpu.ops.augment import AugmentConfig
from heybuddy_tpu.utils.log import logger
from heybuddy_tpu.utils.npy import AppendableNpyFile
from heybuddy_tpu.utils.strings import safe_name

__all__ = ["TrainingFeaturesGenerator"]

# Disjoint seed-offset block per cache kind (train=0 / testing=1, partial=2/3,
# clean-offset=4/5, negative-speech=6, validation=7 / testing-validation=8,
# reverb-positive=9/10). Must exceed any realistic generated cache size so
# `existing + written` can never cross into another kind's block and reuse
# its TTS/augment seeds.
_SEED_NAMESPACE = 10_000_000


def _texts_sidecar_path(npy_path: str) -> str:
    return os.path.splitext(npy_path)[0] + ".texts.json"


def _merge_texts_sidecar(npy_path: str, texts: List[str]) -> None:
    """Record the EXACT adversarial text pool rendered into a cache.

    The pool depends on the chunk seed (``seed + existing + namespace``), so
    a cache grown across runs can span several 60-text pools; diagnostics
    that claim to score "the held-out pool's texts" (far_attribution) must
    read this record rather than re-deriving one pool from the base seed —
    measured drift was 44/60 texts before this existed. Union-merged so
    top-ups extend rather than overwrite."""
    import json

    path = _texts_sidecar_path(npy_path)
    merged = set(texts)
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged |= set(json.load(f))
        except (OSError, ValueError):
            pass
    with open(path, "w") as f:
        json.dump(sorted(merged), f)


def _remove_cache(npy_path: str) -> None:
    """Remove a stale cache .npy together with its texts sidecar (the space
    sidecar is overwritten unconditionally by the caller)."""
    os.remove(npy_path)
    sidecar = _texts_sidecar_path(npy_path)
    if os.path.exists(sidecar):
        os.remove(sidecar)


def autoconfigure_batch_sizes() -> Dict[str, int]:
    """
    Resource-tiered batch sizes (equivalent of reference features.py:171-218,
    which tiers by VRAM/RAM): host RAM bounds the augment/TTS staging buffers,
    device HBM bounds the featurization batch.
    """
    ram_gib = 16.0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    ram_gib = int(line.split()[1]) / (1024 ** 2)
                    break
    except OSError:
        pass

    hbm_gib = 16.0
    hbm_measured = False
    is_tpu = False
    try:
        import jax

        device = jax.devices()[0]
        is_tpu = device.platform not in ("cpu", "gpu")
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            hbm_gib = stats["bytes_limit"] / (1024 ** 3)
            hbm_measured = True
    except Exception:
        pass

    if ram_gib < 8:
        host_tier = {"tts_batch_size": 4, "augment_batch_size": 32}
    elif ram_gib < 16:
        host_tier = {"tts_batch_size": 8, "augment_batch_size": 64}
    else:
        host_tier = {"tts_batch_size": 8, "augment_batch_size": 128}

    # Each jitted featurize call pays a fixed dispatch round trip (~3.3 ms on
    # the remote axon tunnel — PERF.md "dispatch tax"), so the device batch
    # should be as large as HBM and host staging RAM allow: measured 512 ->
    # ~120k clips/s effective vs 8192 -> ~410k on v5e. Staging buffers hold
    # ~2 batches of 92 KB/clip on the host, so the big tiers also need RAM.
    if hbm_gib < 8:
        embed = 512
    elif hbm_gib < 12 or ram_gib < 8:
        embed = 2048
    elif ram_gib < 16:
        embed = 4096
    elif ram_gib < 24:
        embed = 8192
    elif (hbm_gib >= 15.0 if hbm_measured else is_tpu):
        # Measured scaling (PERF.md): 8192 -> 414k, 16384 -> 468k clips/s.
        # A 16384-clip batch stages ~1.5 GB on device and ~3 GB of host
        # buffers, so it needs both the full 16 GB HBM and headroom RAM.
        # CPU backends report no bytes_limit — they stay on the 8192 tier
        # rather than inheriting the TPU default.
        embed = 16384
    else:
        embed = 8192
    return {**host_tier, "embed_batch_size": embed}


class TrainingFeaturesGenerator:
    """Generate-and-cache classifier features for a wake phrase."""

    def __init__(
        self,
        phrase: Union[str, List[str]],
        directory: Optional[str] = None,
        augment_config: AugmentConfig = AugmentConfig(),
        embed_batch_size: Optional[int] = None,
        tts_batch_size: Optional[int] = None,
        augment_batch_size: Optional[int] = None,
        use_cache: bool = True,
        seed: int = 0,
        tts_backend: Optional[str] = None,
        **generator_kwargs: Any,
    ) -> None:
        auto = autoconfigure_batch_sizes()
        embed_batch_size = embed_batch_size or auto["embed_batch_size"]
        # The host-tier TTS batch sizes assume the slow host renderer; the
        # device backend amortizes one jitted render per batch, so feed it
        # full device batches (models/formant_device.py bucket sizes).
        resolved_backend = tts_backend or os.environ.get("HEYBUDDY_TTS_BACKEND")
        if tts_batch_size is None and resolved_backend in ("formant-device", "device"):
            tts_batch_size = 128
        tts_batch_size = tts_batch_size or auto["tts_batch_size"]
        augment_batch_size = augment_batch_size or auto["augment_batch_size"]
        self.phrase = phrase
        self.phrase_key = phrase if isinstance(phrase, str) else " ".join(phrase)
        self.directory = directory or get_default_dataset_dir()
        self.augment_config = augment_config
        self.embed_batch_size = embed_batch_size
        self.tts_batch_size = tts_batch_size
        self.augment_batch_size = augment_batch_size
        self.use_cache = use_cache
        self.seed = seed
        self.tts_backend = tts_backend
        self.generator_kwargs = generator_kwargs
        self._noise_provider: Optional[NoiseProvider] = None

    @property
    def noise_provider(self) -> NoiseProvider:
        if self._noise_provider is None:
            self._noise_provider = NoiseProvider(
                seed=self.seed,
                use_remote=(
                    self.augment_config.background_noise_prob > 0
                    or self.augment_config.reverb_prob > 0
                ),
            )
        return self._noise_provider

    def _cache_name(
        self, adversarial: bool, testing: bool, validation: bool, partial: bool = False
    ) -> str:
        name = safe_name(self.phrase_key)
        if adversarial:
            name += "-adversarial"
        if partial:
            name += "-partial"
        if testing:
            name += "-testing"
        if validation:
            name += "-validation"
        return name

    def _featurize_stream(
        self,
        samples: Iterator[Dict[str, Any]],
        pad_only: bool,
        store: AppendableNpyFile,
        limit: int,
        seed_offset: int = 0,
        config: Optional[AugmentConfig] = None,
    ) -> int:
        """Augment + embed a sample stream into ``store``; returns rows written."""
        from heybuddy_tpu.models.featurizer import get_speech_embeddings

        augmenter = AugmentedAudioGenerator(
            samples,
            config=config or self.augment_config,
            batch_size=self.augment_batch_size,
            noise_provider=self.noise_provider,
            pad_only=pad_only,
            seed=self.seed + seed_offset,
        )
        embeddings = get_speech_embeddings()
        written = 0
        batch: List[np.ndarray] = []
        # Double-buffered ingestion: dispatch featurization of batch i, then
        # materialize batch i-1's result while i computes on device — TTS/host
        # work overlaps with HBM-resident featurization (BASELINE.json north
        # star; replaces the reference's per-batch subprocess serialization).
        pending: Optional[Any] = None

        def drain(p: Any) -> int:
            device_arr, n_real = p
            take = min(n_real, limit - written)
            if take <= 0:
                return 0
            feats = np.asarray(device_arr)[:take]
            if np.isnan(feats).any():
                from heybuddy_tpu.models.featurizer import SpeechEmbeddings

                feats = SpeechEmbeddings._repair_nan(feats)
            store.append(feats.astype(np.float32))
            return take

        for sample in augmenter():
            batch.append(sample["audio"]["array"])
            if len(batch) >= self.embed_batch_size:
                dispatched = embeddings.featurize_device(np.stack(batch))
                batch = []
                if pending is not None:
                    written += drain(pending)
                pending = dispatched
                if written >= limit:
                    pending = None
                    return written
        if batch:
            if pending is not None:
                written += drain(pending)
                pending = None
            if written < limit:
                written += drain(embeddings.featurize_device(np.stack(batch)))
        elif pending is not None:
            written += drain(pending)
        return written

    def _fused_banks(self):
        """HBM-resident noise/impulse banks for the fused device pipeline,
        built once: per-batch host noise synthesis + upload is what caps the
        classic pipeline's throughput on a slow host link."""
        if not hasattr(self, "_fused_bank_arrays"):
            import jax

            bank = int(os.environ.get("HEYBUDDY_NOISE_BANK", "512"))
            if self.augment_config.background_noise_prob > 0:
                noise = self.noise_provider.noise_batch(
                    bank, self.augment_config.target_samples)
            else:
                noise = np.zeros((1, self.augment_config.target_samples), np.float32)
            if self.augment_config.reverb_prob > 0:
                impulse = self.noise_provider.impulse_batch(bank)
            else:
                impulse = np.zeros((1, 256), np.float32)
            self._fused_bank_arrays = (
                jax.device_put(noise), jax.device_put(impulse))
        return self._fused_bank_arrays

    def _featurize_plan_stream(
        self,
        samples: Iterator[Dict[str, Any]],
        pad_only: bool,
        store: AppendableNpyFile,
        limit: int,
        seed_offset: int = 0,
        config: Optional[AugmentConfig] = None,
    ) -> int:
        """Fused device path: ClipPlan samples render+augment+featurize in one
        compiled program per batch; audio never round-trips the host (the
        host streams ~18 KB of decimated tracks per clip and reads back
        6 KB of features). Host-rendered fallback samples (clips the device
        cannot express) are batched through the classic path at the end.
        """
        import jax

        from heybuddy_tpu.models.featurizer import get_speech_embeddings
        from heybuddy_tpu.models.formant_device import fused_features_batch
        from heybuddy_tpu.models.tts import get_tts_model

        embeddings = get_speech_embeddings()
        tts = get_tts_model(backend=self.tts_backend)
        noise_bank, impulse_bank = self._fused_banks()
        cfg = config or self.augment_config
        # Disjoint from the classic augmenter's fold_in(seed, batch_index)
        # namespace so mixed fused/fallback runs never reuse augment draws.
        base_key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed + seed_offset), 777)
        # The fused path stages only ~18 KB of plan tracks per clip on the
        # host, so its dispatch batch is not bound by the host-RAM tier that
        # sizes augment_batch_size. Bigger batches amortize the ~3.3 ms
        # dispatch tax AND the ~0.2 s device->host drain latency per batch
        # (PERF.md) — the measured production-pipeline bottleneck.
        batch_size = int(os.environ.get("HEYBUDDY_FUSED_TTS_BATCH", "0")) or max(
            self.augment_batch_size, 512
        )
        written = 0
        batch_index = 0
        plans: List[Any] = []
        fallback: List[Dict[str, Any]] = []
        pending: Optional[Any] = None

        def drain(p: Any) -> int:
            nonlocal written
            device_arr, n_real = p
            take = min(n_real, limit - written)
            if take <= 0:
                return 0
            feats = np.asarray(device_arr)[:take]
            if np.isnan(feats).any():
                from heybuddy_tpu.models.featurizer import SpeechEmbeddings

                feats = SpeechEmbeddings._repair_nan(feats)
            store.append(feats.astype(np.float32))
            return take

        def dispatch(batch_plans: List[Any], index: int) -> Any:
            # tail batches bucket to the next power of two instead of padding
            # all the way to batch_size: a 5-plan tail padded to 512 would
            # render 100x junk (and on the CPU test mesh, take 100x longer)
            bucket = 1
            while bucket < len(batch_plans):
                bucket *= 2
            return fused_features_batch(
                batch_plans,
                embeddings.params,
                jax.random.fold_in(base_key, index),
                noise_bank,
                impulse_bank,
                cfg,
                pad_only=pad_only,
                l_max=tts.planner.max_samples,
                harmonics=tts.harmonics,
                clip_samples=cfg.target_samples,
                pad_to=min(batch_size, bucket),
            )

        for sample in samples:
            if "plan" in sample:
                plans.append(sample["plan"])
            else:
                fallback.append(sample)
            if len(plans) >= batch_size:
                dispatched = dispatch(plans, batch_index)
                plans = []
                batch_index += 1
                if pending is not None:
                    written += drain(pending)
                pending = dispatched
                if written >= limit:
                    pending = None
                    break
        if plans and (pending is None or written < limit):
            if pending is not None:
                written += drain(pending)
                pending = None
            if written < limit:
                written += drain(dispatch(plans, batch_index))
        elif pending is not None:
            written += drain(pending)
        if fallback and written < limit:
            written += self._featurize_stream(
                iter(fallback), pad_only=pad_only, store=store,
                limit=limit - written, seed_offset=seed_offset, config=config,
            )
        return written

    def _use_fused_pipeline(self) -> bool:
        """Fused plans->features path: device TTS backend + native embedding
        (the imported-ONNX featurizer uses a different apply path)."""
        if os.environ.get("HEYBUDDY_FUSED_TTS", "1") == "0":
            return False
        resolved = self.tts_backend or os.environ.get("HEYBUDDY_TTS_BACKEND")
        if resolved not in ("formant-device", "device"):
            return False
        from heybuddy_tpu.models.featurizer import get_speech_embeddings

        return get_speech_embeddings().backend == "trunkpool"

    def generate(
        self,
        num_samples: int,
        adversarial: bool = False,
        pad_only: bool = False,
        store: Optional[AppendableNpyFile] = None,
        adversarial_phrases: Optional[int] = None,
        seed_offset: int = 0,
    ) -> int:
        """Generate ``num_samples`` features into ``store`` (features.py:360-490)."""
        generator_kwargs = dict(self.generator_kwargs)
        if adversarial_phrases is not None:
            generator_kwargs["num_adversarial_texts"] = adversarial_phrases
        speech = SpeechSampleGenerator(
            self.phrase,
            adversarial=adversarial,
            batch_size=self.tts_batch_size,
            seed=self.seed + seed_offset,
            tts_backend=self.tts_backend,
            **generator_kwargs,
        )
        assert store is not None
        if adversarial:
            _merge_texts_sidecar(store.path, speech.get_adversarial_texts())
        if self._use_fused_pipeline():
            return self._featurize_plan_stream(
                speech(num_samples, yield_plans=True), pad_only=pad_only,
                store=store, limit=num_samples, seed_offset=seed_offset,
            )
        return self._featurize_stream(
            speech(num_samples), pad_only=pad_only, store=store, limit=num_samples,
            seed_offset=seed_offset,
        )

    def _get_features(
        self,
        num_samples: int,
        adversarial: bool,
        testing: bool,
        validation: bool,
        adversarial_phrases: Optional[int] = None,
    ) -> PrecalculatedDatasetIterator:
        name = self._cache_name(adversarial, testing, validation)
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (not self.use_cache or not check_cache_space(path, self.tts_backend)):
            _remove_cache(path)

        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            missing = num_samples - existing
            logger.info(
                f"Generating {missing} features for '{name}' "
                f"({existing} cached of {num_samples} requested)"
            )
            # Seed offset keys off the existing count so top-ups differ from
            # the original batches. Each cache kind gets a disjoint
            # _SEED_NAMESPACE block so a training cache grown to any size can
            # never reuse the TTS/augment seeds of its held-out counterpart
            # (an additive +1000 was reachable by existing+written and leaked
            # train rows into testing sets). Validation caches get their OWN
            # blocks (7/8): sharing block 1 with the augmented testing caches
            # fed the trainer's negative-weight controller the same TTS
            # renderings later reported as held-out testing metrics.
            if validation:
                block = 8 if testing else 7
            else:
                block = 1 if testing else 0
            written = 0
            batch_quota = DEFAULT_FEATURE_BATCH_SIZE
            while written < missing:
                chunk = min(batch_quota, missing - written)
                written += self.generate(
                    chunk,
                    adversarial=adversarial,
                    pad_only=validation,
                    store=store,
                    adversarial_phrases=adversarial_phrases,
                    seed_offset=existing + written + _SEED_NAMESPACE * block,
                )
        else:
            logger.info(f"Using {num_samples} cached features for '{name}'")

        return PrecalculatedDatasetIterator(name, directory=self.directory, seed=self.seed)

    def get_training_features(
        self,
        num_samples: int,
        adversarial: bool = False,
        adversarial_phrases: Optional[int] = None,
        testing: bool = False,
    ) -> PrecalculatedDatasetIterator:
        """Augmented training (or testing) features (features.py:627-837)."""
        return self._get_features(
            num_samples,
            adversarial=adversarial,
            testing=testing,
            validation=False,
            adversarial_phrases=adversarial_phrases,
        )

    def get_validation_features(
        self, num_samples: int, testing: bool = False
    ) -> PrecalculatedDatasetIterator:
        """Pad-only positive validation features (features.py:839-907).

        ``testing=True`` draws from a disjoint cache (fresh TTS seeds) so a
        clean held-out set stays uncontaminated when the plain validation
        cache is also used as clean-positive TRAINING coverage.
        """
        return self._get_features(
            num_samples, adversarial=False, testing=testing, validation=True
        )

    def adversarial_texts(
        self,
        testing: bool = False,
        validation: bool = False,
        partial: bool = False,
        adversarial_phrases: Optional[int] = None,
    ) -> List[str]:
        """The EXACT adversarial text pool rendered into a cache kind.

        Reads the ``.texts.json`` sidecar recorded at generation time (the
        pool depends on the chunk seed, so re-deriving it from the base seed
        diverges once a cache was grown across runs — measured 44/60 drift in
        far_attribution before this existed). Falls back to deriving the
        first chunk's pool for pre-sidecar caches, which is exact whenever
        the cache was built in one run (every cache under
        DEFAULT_FEATURE_BATCH_SIZE rows)."""
        import json

        name = self._cache_name(True, testing, validation, partial=partial)
        path = os.path.join(self.directory, f"{name}.npy")
        sidecar = _texts_sidecar_path(path)
        if os.path.exists(sidecar):
            try:
                with open(sidecar) as f:
                    return list(json.load(f))
            except (OSError, ValueError):
                pass
        if validation:
            block = 8 if testing else 7
        elif partial:
            block = 3 if testing else 2
        else:
            block = 1 if testing else 0
        generator_kwargs = dict(self.generator_kwargs)
        if adversarial_phrases is not None:
            generator_kwargs["num_adversarial_texts"] = adversarial_phrases
        speech = SpeechSampleGenerator(
            self.phrase,
            adversarial=True,
            batch_size=self.tts_batch_size,
            seed=self.seed + _SEED_NAMESPACE * block,
            tts_backend=self.tts_backend,
            **generator_kwargs,
        )
        return speech.get_adversarial_texts()

    def get_partial_phrase_features(
        self,
        num_samples: int,
        adversarial: bool = False,
        testing: bool = False,
        min_visible: Optional[float] = None,
        max_visible: Optional[float] = None,
        adversarial_phrases: Optional[int] = None,
    ) -> PrecalculatedDatasetIterator:
        """
        Sliding-offset partial views, cached as ``{phrase}[-adversarial]-
        partial.npy`` and used as hard NEGATIVES: the clip straddles a window
        edge so only a head/tail fraction is visible — exactly what the
        runtime's sliding window sees mid-phrase. Two sources:

        * ``adversarial=False``: the wake phrase itself — teaches "don't fire
          until the phrase is fully inside the window".
        * ``adversarial=True``: phonetic near-collisions — a partial view of
          "hay bunny" can sit CLOSER to the full wake phrase in feature space
          than the full adversary does, so full-view adversarial training
          alone leaves sliding offsets uncovered (measured: full "hay bunny"
          rejected at 0.00 while its sliding max scored 1.00).

        No reference equivalent (its placement always keeps clips fully
        inside the window, augmented.py:200-232).
        """
        from heybuddy_tpu.constants import (
            DEFAULT_PARTIAL_MAX_VISIBLE,
            DEFAULT_PARTIAL_MIN_VISIBLE,
        )

        name = self._cache_name(adversarial, testing, False, partial=True)
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (not self.use_cache or not check_cache_space(path, self.tts_backend)):
            _remove_cache(path)
        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            missing = num_samples - existing
            logger.info(f"Generating {missing} partial-view features for '{name}'")
            config = self.augment_config._replace(
                placement="edge",
                edge_min_visible=(
                    DEFAULT_PARTIAL_MIN_VISIBLE if min_visible is None else min_visible
                ),
                edge_max_visible=(
                    DEFAULT_PARTIAL_MAX_VISIBLE if max_visible is None else max_visible
                ),
            )
            generator_kwargs = dict(self.generator_kwargs)
            if adversarial_phrases is not None:
                generator_kwargs["num_adversarial_texts"] = adversarial_phrases
            if not adversarial:
                generator_kwargs.pop("custom_adversarial_texts", None)
                generator_kwargs.pop("num_adversarial_texts", None)
            # No "{phrase}. {word}" augmentation: the trailing word would fill
            # the hidden region and dilute the partial-view signal.
            generator_kwargs["phrase_augment_prob"] = 0.0
            speech = SpeechSampleGenerator(
                self.phrase,
                adversarial=adversarial,
                batch_size=self.tts_batch_size,
                seed=self.seed + existing + _SEED_NAMESPACE * (3 if testing else 2),
                tts_backend=self.tts_backend,
                **generator_kwargs,
            )
            if adversarial:
                _merge_texts_sidecar(path, speech.get_adversarial_texts())
            featurize = (
                self._featurize_plan_stream
                if self._use_fused_pipeline()
                else self._featurize_stream
            )
            featurize(
                speech(missing, yield_plans=self._use_fused_pipeline()),
                pad_only=False,
                store=store,
                limit=missing,
                seed_offset=existing + _SEED_NAMESPACE * (3 if testing else 2),
                config=config,
            )
        else:
            logger.info(f"Using {num_samples} cached partial-view features for '{name}'")
        return PrecalculatedDatasetIterator(name, directory=self.directory, seed=self.seed)

    def get_clean_offset_features(
        self,
        num_samples: int,
        adversarial: bool = False,
        testing: bool = False,
        adversarial_phrases: Optional[int] = None,
    ) -> PrecalculatedDatasetIterator:
        """
        CLEAN clips at RANDOM window offsets: no augmentation at all, but the
        clip is placed at a uniformly random (fully-visible) offset inside
        the 1.44 s window — the runtime's sliding-window alignment.

        ``adversarial=False`` (positives) closes a measured coverage gap:
        pad-only clean positives are CENTERED (data/augmented.py pad_only
        path), augmented positives are random-offset but degraded, so "clean
        audio at an arbitrary offset" — exactly what a quiet room gives the
        deployed sliding runtime — sits between the two trained modes
        (sliding clean recall dropped to 0.67 while centered clean FRR was
        0.00 under heavy mining).

        ``adversarial=True`` (hard negatives) is the symmetric fix for the
        symmetric failure: once clean-offset POSITIVES are trained, clean
        near-collisions at odd offsets generalize INTO the positive class
        (measured: full-view "hay bunny" rejected at 0.00 while its clean
        sliding view fired the consecutive-window gate 2/3 of the time).

        No reference equivalent (its validation set is pad-only too,
        features.py:839-907).
        """
        name = self._cache_name(adversarial, testing, False) + "-clean-offset"
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (not self.use_cache or not check_cache_space(path, self.tts_backend)):
            _remove_cache(path)
        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            missing = num_samples - existing
            logger.info(f"Generating {missing} clean-offset features for '{name}'")
            config = self.augment_config._replace(
                seven_band_prob=0.0,
                tanh_distortion_prob=0.0,
                pitch_shift_prob=0.0,
                band_stop_prob=0.0,
                colored_noise_prob=0.0,
                background_noise_prob=0.0,
                gain_prob=0.0,
                reverb_prob=0.0,
                placement="random",
            )
            generator_kwargs = dict(self.generator_kwargs)
            if adversarial_phrases is not None:
                generator_kwargs["num_adversarial_texts"] = adversarial_phrases
            if not adversarial:
                generator_kwargs.pop("custom_adversarial_texts", None)
                generator_kwargs.pop("num_adversarial_texts", None)
            generator_kwargs["phrase_augment_prob"] = 0.0
            speech = SpeechSampleGenerator(
                self.phrase,
                adversarial=adversarial,
                batch_size=self.tts_batch_size,
                seed=self.seed + existing + _SEED_NAMESPACE * (5 if testing else 4),
                tts_backend=self.tts_backend,
                **generator_kwargs,
            )
            if adversarial:
                _merge_texts_sidecar(path, speech.get_adversarial_texts())
            if self._use_fused_pipeline():
                self._featurize_plan_stream(
                    speech(missing, yield_plans=True),
                    pad_only=False,
                    store=store,
                    limit=missing,
                    seed_offset=existing + _SEED_NAMESPACE * (5 if testing else 4),
                    config=config,
                )
            else:
                self._featurize_stream(
                    speech(missing),
                    pad_only=False,
                    store=store,
                    limit=missing,
                    seed_offset=existing + _SEED_NAMESPACE * (5 if testing else 4),
                    config=config,
                )
        else:
            logger.info(f"Using {num_samples} cached clean-offset features for '{name}'")
        return PrecalculatedDatasetIterator(name, directory=self.directory, seed=self.seed)

    def get_reverb_positive_features(
        self,
        num_samples: int,
        testing: bool = False,
    ) -> PrecalculatedDatasetIterator:
        """
        REVERB-ONLY positives: guaranteed reverb + mid-SNR background noise
        ([0, 15] dB) with every other distortion disabled, at random
        placement — exactly the distribution of the measured FRR-by-SNR
        reverb buckets (scripts/quality_eval.py frr_by_snr_buckets).

        The default augment chain already draws reverb at p=0.75, but a
        reverb draw there stacks with pitch/EQ/distortion/deep-SNR draws, so
        "reverberated but otherwise clear phrase" — the bucket sitting at
        0.21-0.31 FRR in round 4 — is a coverage MODE the chain rarely
        emits in isolation, the same gap shape clean-offset positives fixed
        for quiet-room audio (measured there: sliding clean recall 0.67
        before dedicated coverage).

        No reference equivalent (its chain has no per-mode positive sets,
        reference dataset/augmented.py:200-232).
        """
        name = self._cache_name(False, testing, False) + "-reverb"
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (not self.use_cache or not check_cache_space(path, self.tts_backend)):
            _remove_cache(path)
        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            missing = num_samples - existing
            logger.info(f"Generating {missing} reverb-positive features for '{name}'")
            config = self.augment_config._replace(
                seven_band_prob=0.0,
                tanh_distortion_prob=0.0,
                pitch_shift_prob=0.0,
                band_stop_prob=0.0,
                colored_noise_prob=0.0,
                gain_prob=0.0,
                background_noise_prob=1.0,
                background_noise_min_snr_db=0.0,
                background_noise_max_snr_db=15.0,
                reverb_prob=1.0,
                placement="random",
            )
            generator_kwargs = dict(self.generator_kwargs)
            generator_kwargs.pop("custom_adversarial_texts", None)
            generator_kwargs.pop("num_adversarial_texts", None)
            speech = SpeechSampleGenerator(
                self.phrase,
                adversarial=False,
                batch_size=self.tts_batch_size,
                seed=self.seed + existing + _SEED_NAMESPACE * (10 if testing else 9),
                tts_backend=self.tts_backend,
                **generator_kwargs,
            )
            featurize = (
                self._featurize_plan_stream
                if self._use_fused_pipeline()
                else self._featurize_stream
            )
            featurize(
                speech(missing, yield_plans=self._use_fused_pipeline()),
                pad_only=False,
                store=store,
                limit=missing,
                seed_offset=existing + _SEED_NAMESPACE * (10 if testing else 9),
                config=config,
            )
        else:
            logger.info(f"Using {num_samples} cached reverb-positive features for '{name}'")
        return PrecalculatedDatasetIterator(name, directory=self.directory, seed=self.seed)

    def get_reverb_collision_features(
        self,
        num_samples: int,
        texts: List[str],
        testing: bool = False,
    ) -> PrecalculatedDatasetIterator:
        """
        REVERB-ONLY collision NEGATIVES: the given swap-collision texts
        rendered with guaranteed reverb + mid-SNR background noise ([0, 15]
        dB) and every other distortion disabled — the mirror of
        :meth:`get_reverb_positive_features` for the negative class.

        Motivation (QUALITY.md round 5 cont., the shipped-v26 FAR-by-SNR
        table): the shipped model rejects the unseen swap family PERFECTLY
        at every positive SNR without reverb (FAR 0.000) but fires at
        0.10-0.23 under reverb at ALL SNRs — room smearing of the
        discriminating consonants is the entire remaining FAR_adv residual.
        The default chain renders collision negatives with reverb only at
        p=0.75 stacked under deep-SNR/pitch/EQ draws, so
        "reverberated-but-otherwise-clear collision" is exactly the coverage
        mode it rarely emits — the same gap shape reverb positives fixed for
        the FRR reverb buckets.

        ``texts`` is the emphasis pool (callers exclude held-out strings,
        quality_eval collision-negatives contract). Cache lives in its own
        seed-namespace blocks (11/12) and is keyed adversarial+"-reverb".

        No reference equivalent (its chain has no per-mode negative sets,
        reference dataset/augmented.py:200-232).
        """
        name = self._cache_name(True, testing, False) + "-reverb"
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (not self.use_cache or not check_cache_space(path, self.tts_backend)):
            _remove_cache(path)
        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            missing = num_samples - existing
            logger.info(f"Generating {missing} reverb-collision features for '{name}'")
            config = self.augment_config._replace(
                seven_band_prob=0.0,
                tanh_distortion_prob=0.0,
                pitch_shift_prob=0.0,
                band_stop_prob=0.0,
                colored_noise_prob=0.0,
                gain_prob=0.0,
                background_noise_prob=1.0,
                background_noise_min_snr_db=0.0,
                background_noise_max_snr_db=15.0,
                reverb_prob=1.0,
                placement="random",
            )
            generator_kwargs = dict(self.generator_kwargs)
            generator_kwargs["custom_adversarial_texts"] = list(texts)
            generator_kwargs["num_adversarial_texts"] = 0
            speech = SpeechSampleGenerator(
                self.phrase,
                adversarial=True,
                batch_size=self.tts_batch_size,
                seed=self.seed + existing + _SEED_NAMESPACE * (12 if testing else 11),
                tts_backend=self.tts_backend,
                **generator_kwargs,
            )
            featurize = (
                self._featurize_plan_stream
                if self._use_fused_pipeline()
                else self._featurize_stream
            )
            featurize(
                speech(missing, yield_plans=self._use_fused_pipeline()),
                pad_only=False,
                store=store,
                limit=missing,
                seed_offset=existing + _SEED_NAMESPACE * (12 if testing else 11),
                config=config,
            )
        else:
            logger.info(f"Using {num_samples} cached reverb-collision features for '{name}'")
        return PrecalculatedDatasetIterator(name, directory=self.directory, seed=self.seed)

    def get_stream_window_features(
        self,
        num_samples: int,
        adversarial: bool = False,
        seed: Optional[int] = None,
        collision: bool = False,
    ) -> PrecalculatedDatasetIterator:
        """
        Sliding-window NEGATIVES from a continuous speech stream: every
        runtime window position (1.44 s window, 0.12 s stride) of synthesized
        ordinary speech (``adversarial=False``, wake-phrase words excluded) or
        of phonetic near-collisions (``adversarial=True``).

        This is the distribution the deployed runtime actually scores — clip
        negatives under-represent it (a model passing held-out clip FAR can
        still false-fire hundreds of times per hour on streams because stream
        windows straddle phrase boundaries at every offset). Windows are
        featurized EXACTLY as the runtime sees them: no re-augmentation, the
        stream already carries gain variation, gaps, and background noise
        (data/streams.py). No reference equivalent (it relies on hosted
        real-speech negative sets for this role).
        """
        from heybuddy_tpu.data.streams import (
            RUNTIME_WINDOW_STRIDE,
            stream_window_count,
            synth_adversarial_stream,
            synth_speech_stream,
        )
        from heybuddy_tpu.models.featurizer import get_speech_embeddings

        if collision and adversarial:
            raise ValueError("collision and adversarial are mutually exclusive")
        seed = self.seed if seed is None else seed
        if collision:
            kind = "collision-stream"
        elif adversarial:
            kind = "adversarial-stream"
        else:
            kind = "speech-stream"
        phrase_slug = safe_name(self.phrase_key)
        name = (
            f"{phrase_slug}-{kind}-{seed}"
            if (adversarial or collision)
            else f"negative-{kind}-{seed}-x{phrase_slug}"
        )
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.constants import CLIP_SAMPLES
        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (not self.use_cache or not check_cache_space(path, self.tts_backend)):
            _remove_cache(path)
        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            missing = num_samples - existing
            logger.info(f"Generating {missing} {kind} window features for '{name}'")
            from heybuddy_tpu.models.featurizer import STREAM_SEGMENT_WINDOWS

            embeddings = get_speech_embeddings()
            stride = RUNTIME_WINDOW_STRIDE
            written = 0
            pending: Optional[Tuple[Any, int]] = None
            while written < missing or pending is not None:
                # Bounded segments keep host memory flat (~2 min of stream per
                # featurization pass). Seeding by the absolute row offset keeps
                # top-ups reproducible. The segment uploads ONCE and is
                # windowed on device (featurize_stream_device) — sending every
                # overlapping window cost 12x the bytes on the ~15 MB/s
                # host->device link. Double-buffered: the next segment
                # synthesizes on the host while the device featurizes the
                # previous one.
                dispatched = None
                if written < missing:
                    seg_windows = min(missing - written, STREAM_SEGMENT_WINDOWS)
                    seg_seconds = (seg_windows * stride + CLIP_SAMPLES) / 16000.0
                    seg_seed = seed + 7919 * (existing + written)
                    if collision:
                        from heybuddy_tpu.data.streams import (
                            synth_collision_salad_stream,
                        )

                        stream = synth_collision_salad_stream(
                            self.phrase, seg_seconds / 60.0, seg_seed,
                            tts_backend=self.tts_backend,
                        )
                    elif adversarial:
                        stream = synth_adversarial_stream(
                            self.phrase, seg_seconds / 60.0, seg_seed,
                            tts_backend=self.tts_backend,
                        )
                    else:
                        stream = synth_speech_stream(
                            seg_seconds / 60.0, seg_seed, exclude_phrase=self.phrase,
                            tts_backend=self.tts_backend,
                        )
                    n = min(stream_window_count(stream), seg_windows)
                    device_arr, n_real = embeddings.featurize_stream_device(
                        stream, n, stride
                    )
                    dispatched = (device_arr, n_real)
                    written += n_real
                if pending is not None:
                    device_arr, n_real = pending
                    store.append(np.asarray(device_arr)[:n_real].astype(np.float32))
                pending = dispatched
        else:
            logger.info(f"Using {num_samples} cached {kind} window features for '{name}'")
        iterator = PrecalculatedDatasetIterator(name, directory=self.directory, seed=seed)
        # Rows are stored in temporal order at the runtime stride: mark the
        # source so gate-aware consumers (trainer validation) can count fires
        # per true stream hour instead of per overlapping-window "clip".
        iterator.stream_stride_seconds = RUNTIME_WINDOW_STRIDE / 16000.0
        return iterator

    def get_negative_speech_features(
        self,
        num_samples: int,
        num_texts: int = 400,
        seed: Optional[int] = None,
    ) -> PrecalculatedDatasetIterator:
        """
        Ordinary-speech negatives synthesized from random phrases (wake-phrase
        words excluded). Fills the role of the hosted precalculated negative
        sets (reference precalculated.py:621-649) in air-gapped deployments:
        without speech negatives the classifier only separates the wake phrase
        from its phonetic adversaries and false-accepts arbitrary speech.

        Cached independently of the wake phrase (shared across models).
        """
        seed = self.seed if seed is None else seed
        name = f"negative-speech-{num_texts}-{seed}"
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"{name}.npy")

        from heybuddy_tpu.data.space import active_space, check_cache_space, write_space_sidecar

        if os.path.exists(path) and (
            not self.use_cache or not check_cache_space(path, self.tts_backend)
        ):
            _remove_cache(path)
        store = AppendableNpyFile(path)
        write_space_sidecar(path, active_space(self.tts_backend))
        existing = len(store)
        if existing < num_samples:
            from heybuddy_tpu.data.tts_generator import SpeechSampleGenerator
            from heybuddy_tpu.text.wordlist import WORDS

            rng = np.random.default_rng(seed + 101)
            wake_words = set(self.phrase_key.lower().split())
            vocabulary = sorted(set(WORDS) - wake_words)
            texts: List[str] = []
            for _ in range(num_texts):
                n = int(rng.integers(1, 5))
                texts.append(" ".join(rng.choice(vocabulary, size=n, replace=False)))

            missing = num_samples - existing
            logger.info(f"Generating {missing} negative-speech features for '{name}'")
            speech = SpeechSampleGenerator(
                texts[0],
                additional_phrases=texts[1:],
                batch_size=self.tts_batch_size,
                seed=seed + existing,
                tts_backend=self.tts_backend,
                **{
                    k: v
                    for k, v in self.generator_kwargs.items()
                    if k not in ("custom_adversarial_texts", "num_adversarial_texts")
                },
            )
            if self._use_fused_pipeline():
                self._featurize_plan_stream(
                    speech(missing, yield_plans=True), pad_only=False,
                    store=store, limit=missing,
                    seed_offset=existing + _SEED_NAMESPACE * 6,
                )
            else:
                self._featurize_stream(
                    speech(missing), pad_only=False, store=store, limit=missing,
                    seed_offset=existing + _SEED_NAMESPACE * 6,
                )
        return PrecalculatedDatasetIterator(name, directory=self.directory, seed=seed)
