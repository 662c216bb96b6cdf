"""
Self-supervised pre-training for the frozen speech-embedding network.

The reference downloads Google's pretrained speech-embedding weights
(embeddings.py:29-30) and freezes them; this framework cannot assume that
artifact, so it provides what the reference cannot: a way to *train* the
embedding space from the framework's own synthesis + augmentation pipeline.

Contrastive objective (NT-Xent): two views of the same utterance — different
speaker rendering and independent augmentation draws (noise, reverb, EQ,
placement) — must map to nearby embeddings, while other utterances in the
batch repel. This bakes exactly the invariances wake-word training needs
(speaker, gain, noise, room) into the frozen feature space.

Everything after clip synthesis is one jitted TPU step: augment both views ->
mel -> trunk -> window pooling -> clip embedding -> NT-Xent -> Adam update.

Usage: ``heybuddy pretrain-embedding -o embedding.npz`` then set
``HEYBUDDY_EMBEDDING_WEIGHTS=embedding.npz`` (regenerate any cached feature
shards afterwards — the feature space changes).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from heybuddy_tpu.constants import CLIP_SAMPLES
from heybuddy_tpu.models import embedding_net
from heybuddy_tpu.ops.augment import AugmentConfig, augment_batch
from heybuddy_tpu.ops.melspec import mel_spectrogram
from heybuddy_tpu.ops.windows import embedding_window_starts
from heybuddy_tpu.utils.log import logger

__all__ = ["EmbeddingPretrainer", "nt_xent_loss"]


def nt_xent_loss(z1: jax.Array, z2: jax.Array, temperature: float = 0.1) -> jax.Array:
    """Normalized-temperature cross-entropy over both views (SimCLR)."""
    z1 = z1 / (jnp.linalg.norm(z1, axis=-1, keepdims=True) + 1e-8)
    z2 = z2 / (jnp.linalg.norm(z2, axis=-1, keepdims=True) + 1e-8)
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)  # (2b, d)
    logits = (z @ z.T) / temperature
    logits = logits - 1e9 * jnp.eye(2 * b)  # mask self-similarity
    labels = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    return jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1)
    )


def hard_pair_margin_loss(
    z1: jax.Array, z2: jax.Array, pair_mask: jax.Array, margin: float = 0.4
) -> jax.Array:
    """Cosine-margin repulsion on rendered phonetic-neighbor pairs.

    ``pair_mask`` is a (b, b) boolean: True where texts i and j are DIFFERENT
    members of the same phonetic-neighbor cluster ("hey buddy" / "hey bunny").
    Any view combination of such a pair must sit below ``margin`` cosine
    similarity; NT-Xent alone only repels them with the same gentle force as
    easy negatives, which round 2 measured as insufficient — the minimal pair
    stayed inseparable at the production gate (VERDICT r2 weak #1).
    """
    z1 = z1 / (jnp.linalg.norm(z1, axis=-1, keepdims=True) + 1e-8)
    z2 = z2 / (jnp.linalg.norm(z2, axis=-1, keepdims=True) + 1e-8)
    z = jnp.concatenate([z1, z2], axis=0)  # (2b, d)
    sims = z @ z.T
    mask4 = jnp.tile(pair_mask, (2, 2))  # the pair repels in all 4 view quadrants
    viol = jnp.where(mask4, jnp.maximum(sims - margin, 0.0), 0.0)
    return jnp.sum(viol * viol) / jnp.maximum(jnp.sum(mask4), 1.0)


class EmbeddingPretrainer:
    """Contrastive pre-training driver for the embedding network."""

    def __init__(
        self,
        texts: Optional[Sequence[str]] = None,
        num_texts: int = 512,
        speakers_per_text: int = 4,
        batch_size: int = 64,
        temperature: float = 0.1,
        learning_rate: float = 1e-3,
        augment_config: Optional[AugmentConfig] = None,
        tts_backend: Optional[str] = None,
        seed: int = 0,
        config: Optional[embedding_net.EmbeddingNetConfig] = None,
        init_weights: Optional[str] = None,
        adversarial_fraction: float = 0.0,
        focus_phrase: Optional[str] = None,
        focus_swap_depth: int = 0,
        focus_swap_max_swaps: int = 1,
        hard_pair_margin: float = 0.4,
        hard_pair_weight: float = 1.0,
        cluster_slots_fraction: float = 0.25,
        mesh: Optional[Any] = None,
    ) -> None:
        if texts is not None:
            self.texts = list(texts)
            self.cluster_ids = np.full(len(self.texts), -1, dtype=np.int64)
        else:
            self.texts, self.cluster_ids = self._default_texts(
                num_texts, seed, adversarial_fraction, focus_phrase,
                focus_swap_depth, focus_swap_max_swaps,
            )
        self.focus_phrase = focus_phrase
        self.hard_pair_margin = hard_pair_margin
        self.hard_pair_weight = hard_pair_weight
        self.cluster_slots_fraction = cluster_slots_fraction
        self.mesh = mesh
        if mesh is not None and batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size ({batch_size}) must divide evenly over the mesh "
                f"data axis ({mesh.shape['data']} devices)"
            )
        if batch_size > len(self.texts):
            # Fail before the expensive clip-pool synthesis: train()'s
            # replace=False text sampling would raise at step 0 otherwise.
            raise ValueError(
                f"batch_size ({batch_size}) exceeds the text pool "
                f"({len(self.texts)}); pass more texts or a smaller batch"
            )
        self.speakers_per_text = speakers_per_text
        self.batch_size = batch_size
        self.temperature = temperature
        self.config = config or embedding_net.EmbeddingNetConfig()
        # Moderate augmentation for view generation: keep SNRs gentler than the
        # training chain so positives stay learnable early on.
        self.augment_config = augment_config or AugmentConfig(
            background_noise_min_snr_db=0.0,
            background_noise_max_snr_db=20.0,
            reverb_prob=0.5,
        )
        self.tts_backend = tts_backend
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        if init_weights is not None:
            self.params = embedding_net.load_params(init_weights)
            logger.info(f"Warm-starting pretraining from {init_weights}")
        else:
            self.params = embedding_net.init_params(jax.random.PRNGKey(seed), self.config)
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self._pool: Optional[np.ndarray] = None
        self._pool_lengths: Optional[np.ndarray] = None
        self._step_fn = None

    @staticmethod
    def _default_texts(
        num_texts: int,
        seed: int,
        adversarial_fraction: float = 0.0,
        focus_phrase: Optional[str] = None,
        focus_swap_depth: int = 0,
        focus_swap_max_swaps: int = 1,
    ) -> "tuple[List[str], np.ndarray]":
        """Random 1-3 word phrases from the bundled lexicon.

        ``adversarial_fraction > 0`` replaces that fraction of the pool with
        PHONETIC-NEIGHBOR CLUSTERS: a base phrase plus 3 near-collisions from
        the adversarial generator (text/adversarial.py). Random texts are
        phonetically easy in-batch negatives; clusters make NT-Xent separate
        exactly the near-collisions wake-word discrimination hinges on.
        Returns (texts, cluster_ids) — cluster_ids[i] >= 0 marks text i as a
        member of that phonetic-neighbor cluster (-1 = random filler); the
        batch sampler guarantees cluster co-occurrence and the margin loss
        repels same-cluster rendered pairs (round 2 relied on chance
        co-occurrence, ~12 pairs per 256-batch at 8k texts).

        ``focus_phrase`` additionally builds cluster 0 — the wake phrase plus
        a deep pool of its OWN near-collisions — which the sampler puts in
        EVERY batch: a per-deployment discriminative fine-tune of the
        embedding space around the phrase that matters (the TPU-native
        substitute for the reference's frozen Google embedding earning its
        keep on "hey bunny"-class separations, reference embeddings.py:29-30).

        ``focus_swap_depth > 0`` extends cluster 0 with that many SINGLE-SWAP
        collision texts (exactly one word of the phrase replaced by a
        phonetic neighbor, text/adversarial.py single_swap_collision_texts).
        The generic generator swaps words independently, so the
        maximal-overlap class the round-4 FAR attribution named ("hate
        buddy", "hey buddies", "hey duty") is under-represented in the
        default focus pool; this puts it in every batch under the margin
        loss. Default 0 keeps the bundled v7 embedding byte-reproducible.
        ``focus_swap_max_swaps=2`` interleaves DOUBLE swaps into that pool —
        the class the v25 attribution moved the residual to once single
        swaps were head-trained ("hate buddies" 0.583, "hate bully" 0.542,
        QUALITY.md round 5).
        """
        from heybuddy_tpu.text.wordlist import WORDS

        rng = np.random.default_rng(seed + 7)
        words = sorted(set(WORDS))
        cluster_size = 4  # base + 3 neighbors
        n_cluster_texts = int(num_texts * adversarial_fraction)
        n_clusters = n_cluster_texts // cluster_size
        texts: List[str] = []
        cluster_of: List[int] = []
        seen: set = set()

        def add(text: str, cluster: int = -1) -> bool:
            # Deduplicate: duplicate phrases occupy distinct pool indices and
            # can land in one batch as NT-Xent NEGATIVES of each other —
            # pushing identical utterances apart fights the objective. At 8k
            # texts over a 1.4k-word lexicon, 1-word duplicates are
            # guaranteed by pigeonhole without this.
            if text and text not in seen:
                seen.add(text)
                texts.append(text)
                cluster_of.append(cluster)
                return True
            return False

        def add_random(max_words: int = 3, cluster: int = -1) -> None:
            for _ in range(100):
                n = int(rng.integers(1, max_words + 1))
                if add(" ".join(rng.choice(words, size=n, replace=False)), cluster):
                    return

        next_cluster = 0
        if focus_phrase:
            from heybuddy_tpu.text.adversarial import get_adversarial_text_generator

            adv = get_adversarial_text_generator()
            focus_size = 12  # phrase + deep near-collision pool
            add(focus_phrase, cluster=0)
            for neighbor in adv(focus_phrase, num_samples=focus_size - 1,
                                seed=seed + 997):
                add(neighbor, cluster=0)
            if focus_swap_depth > 0:
                from heybuddy_tpu.text.adversarial import (
                    single_swap_collision_texts,
                )

                for t in single_swap_collision_texts(
                    focus_phrase, num_samples=focus_swap_depth,
                    seed=seed + 991, max_swaps=focus_swap_max_swaps,
                ):
                    add(t, cluster=0)
            next_cluster = 1

        for _ in range(num_texts - n_clusters * cluster_size - len(texts)):
            add_random()
        if n_clusters > 0:
            from heybuddy_tpu.text.adversarial import get_adversarial_text_generator

            adv = get_adversarial_text_generator()
            for c in range(n_clusters):
                cid = next_cluster + c
                before = len(texts)
                for _ in range(100):
                    n = int(rng.integers(1, 3))
                    base = " ".join(rng.choice(words, size=n, replace=False))
                    if base not in seen:
                        break
                add(base, cid)
                for neighbor in adv(base, num_samples=cluster_size - 1, seed=seed + 31 * c):
                    add(neighbor, cid)
                # Top up if the generator found fewer (or duplicate) neighbors.
                for _ in range(4 * cluster_size):
                    if len(texts) >= before + cluster_size:
                        break
                    add_random(cluster=cid)
        return texts, np.asarray(cluster_of, dtype=np.int64)

    def build_clip_pool(self) -> None:
        """Synthesize speakers_per_text renderings of every text (host side).

        Speakers and prosody settings are explicitly randomized PER RENDERING
        rather than going through the batched ``BaseTTS.__call__`` contract:
        that contract restarts its speaker/settings iterators on every call,
        so a one-batch call always yields speaker pairs (0,0),(0,1),... at
        the first settings tuple — with the formant backend every rendering
        of every text collapsed to speaker 0 at one fixed prosody, the
        contrastive views differed only by synthesis noise, and the speaker
        invariance this pool exists to teach was never trained.
        """
        from heybuddy_tpu.constants import (
            DEFAULT_TTS_LENGTH_SCALES,
            DEFAULT_TTS_NOISE_SCALE_WEIGHTS,
            DEFAULT_TTS_NOISE_SCALES,
            DEFAULT_TTS_SLERP_WEIGHTS,
            SAMPLE_RATE,
        )
        from heybuddy_tpu.models.tts import get_tts_model
        from heybuddy_tpu.utils.audio_io import resample_audio

        tts = get_tts_model(backend=self.tts_backend)
        n_texts = len(self.texts)
        n_speakers = tts.num_speakers
        pool = np.zeros((n_texts, self.speakers_per_text, CLIP_SAMPLES), dtype=np.float32)
        lengths = np.zeros((n_texts, self.speakers_per_text), dtype=np.int32)
        logger.info(
            f"Synthesizing clip pool: {n_texts} texts x {self.speakers_per_text} speakers "
            f"(random speaker + prosody per rendering, {n_speakers} voices)"
        )
        rng = np.random.default_rng(self.seed + 104729)
        # Draw ALL per-rendering randomness first (same nested order as the
        # serial path below, so the two execution strategies see identical
        # draws), then render — the device backend amortizes one compiled
        # render per 256-plan batch instead of one dispatch per clip.
        tasks = []
        for i, text in enumerate(self.texts):
            for j in range(self.speakers_per_text):
                s_pair = (int(rng.integers(n_speakers)), int(rng.integers(n_speakers)))
                tasks.append((
                    i, j, text, s_pair,
                    float(rng.choice(DEFAULT_TTS_SLERP_WEIGHTS)),
                    float(rng.choice(DEFAULT_TTS_LENGTH_SCALES)),
                    float(rng.choice(DEFAULT_TTS_NOISE_SCALES)),
                    float(rng.choice(DEFAULT_TTS_NOISE_SCALE_WEIGHTS)),
                    self.seed + i * 131 + j,
                ))

        def store(i: int, j: int, clip: np.ndarray) -> None:
            if tts.sample_rate != SAMPLE_RATE:
                clip = resample_audio(clip, tts.sample_rate, SAMPLE_RATE)
            # Same post-processing as BaseTTS.__call__: peak-normalized
            # int16 round-trip with zero-trimmed edges.
            peak = max(0.01, float(np.abs(clip).max()))
            pcm = np.clip(clip * (32767.0 / peak), -32768, 32767).astype(np.int16)
            pcm = np.trim_zeros(pcm)
            clip = pcm.astype(np.float32) / 32768.0
            n = min(len(clip), CLIP_SAMPLES)
            pool[i, j, :n] = clip[:n]
            lengths[i, j] = n

        if tts.supports_plans:
            from heybuddy_tpu.models.formant_device import render_batch
            from heybuddy_tpu.models.tts import _blend_speaker_params

            chunk = 256
            for c0 in range(0, len(tasks), chunk):
                group = tasks[c0:c0 + chunk]
                plans, meta = [], []
                for (i, j, text, (s1, s2), slerp, ls, ns, _nsw, seed) in group:
                    # clip seed matches synthesize_batch's derivation for a
                    # one-clip batch (seed * 31 + j with j = 0)
                    plan = tts.planner.plan(
                        text, speaker=s1 * 104729 + s2,
                        speaker_params=_blend_speaker_params(tts._host, s1, s2, slerp),
                        length_scale=ls, noise_scale=ns, seed=seed * 31)
                    if plan is None:
                        store(i, j, tts._host.synthesize(
                            text, speaker=s1 * 104729 + s2,
                            speaker_params=_blend_speaker_params(tts._host, s1, s2, slerp),
                            length_scale=ls, noise_scale=ns, seed=seed * 31))
                    else:
                        plans.append(plan)
                        meta.append((i, j))
                rendered = render_batch(
                    plans, l_max=tts.planner.max_samples,
                    harmonics=tts.harmonics, pad_to=chunk)
                for (i, j), clip in zip(meta, rendered):
                    store(i, j, clip)
        else:
            for (i, j, text, s_pair, slerp, ls, ns, nsw, seed) in tasks:
                clips = tts.synthesize_batch(
                    [text], [s_pair], slerp_weight=slerp, length_scale=ls,
                    noise_scale=ns, noise_scale_w=nsw, seed=seed,
                )
                store(i, j, np.asarray(clips[0], dtype=np.float32))
        self._pool = pool
        self._pool_lengths = lengths

    def _build_step(self):
        starts = embedding_window_starts(CLIP_SAMPLES)
        cfg = self.config
        aug_cfg = self.augment_config
        temperature = self.temperature
        tx = self.tx

        def clip_embedding(params: Dict[str, Any], audio: jax.Array) -> jax.Array:
            spec = mel_spectrogram(audio * 32767.0)
            windows = embedding_net.apply_spectrogram(params, spec, starts, config=cfg)
            return jnp.mean(windows, axis=1)  # (b, 96) clip-level embedding

        # The clip pool and noise/impulse banks stay HBM-RESIDENT across steps;
        # the host sends only this step's INDICES (a few KB). Shipping gathered
        # clip batches per step (~47 MB) over the remote-device tunnel made the
        # step host-transfer-bound (~3 s); on-device gather removes it.
        margin = self.hard_pair_margin
        hard_weight = self.hard_pair_weight

        def step(params, opt_state, key, pool, pool_lengths, noise_bank, impulse_bank,
                 text_idx, spk_idx, noise_idx, imp_idx, pair_mask):
            k1, k2 = jax.random.split(key)
            clips1 = pool[text_idx, spk_idx[:, 0]]
            clips2 = pool[text_idx, spk_idx[:, 1]]
            lengths1 = pool_lengths[text_idx, spk_idx[:, 0]]
            lengths2 = pool_lengths[text_idx, spk_idx[:, 1]]
            noise = noise_bank[noise_idx]
            impulse = impulse_bank[imp_idx]

            def loss_fn(p):
                v1 = augment_batch(k1, clips1, lengths1, noise[0], impulse[0], aug_cfg)
                v2 = augment_batch(k2, clips2, lengths2, noise[1], impulse[1], aug_cfg)
                z1 = clip_embedding(p, v1)
                z2 = clip_embedding(p, v2)
                base = nt_xent_loss(z1, z2, temperature)
                hard = hard_pair_margin_loss(z1, z2, pair_mask, margin)
                return base + hard_weight * hard, (base, hard)

            (loss, (base, hard)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt_state, loss, base, hard

        # One dispatch runs ``steps_per_call`` steps under lax.scan: each
        # jitted call through the remote tunnel costs a fixed ~3.3 ms
        # (PERF.md "dispatch tax"), ~16% of a 20 ms pretrain step when
        # dispatched one step at a time. Host-sampled indices arrive stacked
        # with a leading scan axis; metrics come back (k, 3).
        def multi_step(params, opt_state, pool, pool_lengths, noise_bank,
                       impulse_bank, keys, text_idx, spk_idx, noise_idx,
                       imp_idx, pair_mask):
            def body(carry, xs):
                p, o = carry
                key, ti, si, ni, ii, pm = xs
                p, o, loss, base, hard = step(
                    p, o, key, pool, pool_lengths, noise_bank, impulse_bank,
                    ti, si, ni, ii, pm,
                )
                return (p, o), jnp.stack([loss, base, hard])

            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state),
                (keys, text_idx, spk_idx, noise_idx, imp_idx, pair_mask),
            )
            return params, opt_state, metrics

        if self.mesh is None:
            return jax.jit(multi_step, donate_argnums=(0, 1))

        # Mesh-sharded pretraining: the HBM-resident clip pool shards over
        # the data axis (its texts dimension) so pool memory scales down
        # per-chip, and the batch's gather/augment/embed work shards over
        # the same axis; params/opt/banks replicate. XLA inserts the
        # collectives for the cross-device pool gather and the (2b, 2b)
        # NT-Xent similarity matrix.
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        pool_sh = NamedSharding(self.mesh, P("data"))
        # stacked (k, ...) index arrays: the scan axis leads, the batch axis
        # shards over "data" exactly as in the single-step layout
        batch_sh = NamedSharding(self.mesh, P(None, "data"))
        batch2_sh = NamedSharding(self.mesh, P(None, None, "data"))
        return jax.jit(
            multi_step,
            donate_argnums=(0, 1),
            in_shardings=(
                repl, repl, pool_sh, pool_sh, repl, repl, repl,
                batch_sh, batch_sh, batch2_sh, batch2_sh, batch_sh,
            ),
            out_shardings=(repl, repl, repl),
        )

    def _sample_batch(
        self, cluster_members: Dict[int, np.ndarray], n_texts: int
    ) -> np.ndarray:
        """Batch indices with guaranteed phonetic-cluster co-occurrence.

        A ``cluster_slots_fraction`` share of the batch is filled with WHOLE
        clusters (so every margin pair actually lands in-batch); the focus
        cluster (id 0, the wake phrase + its near-collisions) joins every
        batch when present. The rest is uniform without replacement.
        """
        if not cluster_members or self.cluster_slots_fraction <= 0:
            return self.rng.choice(n_texts, size=self.batch_size, replace=False)
        chosen: List[np.ndarray] = []
        if self.focus_phrase is not None and 0 in cluster_members:
            chosen.append(cluster_members[0][: self.batch_size // 2])
        other = [cid for cid in cluster_members if not (
            self.focus_phrase is not None and cid == 0)]
        budget = int(self.batch_size * self.cluster_slots_fraction)
        used = 0
        for cid in self.rng.permutation(other):
            members = cluster_members[int(cid)]
            if used + len(members) > budget:
                continue  # a smaller cluster may still fit
            chosen.append(members)
            used += len(members)
            if used >= budget:
                break
        taken = np.concatenate(chosen) if chosen else np.empty(0, np.int64)
        remaining = self.batch_size - len(taken)
        mask = np.ones(n_texts, dtype=bool)
        mask[taken] = False
        filler = self.rng.choice(np.flatnonzero(mask), size=remaining, replace=False)
        batch = np.concatenate([taken, filler])
        return self.rng.permutation(batch)

    def train(
        self, steps: int = 1000, log_every: int = 50, steps_per_call: int = 8
    ) -> Dict[str, Any]:
        """Run contrastive training; returns the trained parameter pytree.

        ``steps_per_call`` steps run per device dispatch (lax.scan) to
        amortize the fixed ~3.3 ms per-call cost of the remote tunnel
        (PERF.md); it is lowered to the largest divisor of ``steps`` so a
        single program shape compiles.
        """
        if self._pool is None:
            self.build_clip_pool()
        if self._step_fn is None:
            self._step_fn = self._build_step()
        assert self._pool is not None and self._pool_lengths is not None

        from heybuddy_tpu.data.augmented import NoiseProvider

        noise_provider = NoiseProvider(
            seed=self.seed,
            use_remote=self.augment_config.background_noise_prob > 0,
        )
        # Pre-built banks: per-step synthetic-noise generation would otherwise
        # dominate host time; sampling rows from fixed banks is free. The pool
        # and banks are transferred to HBM ONCE — steps send only indices.
        pool_np, pool_lengths_np = self._pool, self._pool_lengths
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = self.mesh.shape["data"]
            pad = (-len(pool_np)) % n_dev
            if pad:
                # zero rows so the text axis shards evenly; the sampler only
                # ever gathers real text indices
                pool_np = np.concatenate([pool_np, np.zeros_like(pool_np[:pad])])
                pool_lengths_np = np.concatenate(
                    [pool_lengths_np, np.ones_like(pool_lengths_np[:pad])]
                )
            repl = NamedSharding(self.mesh, P())
            pool_sh = NamedSharding(self.mesh, P("data"))
            noise_bank = jax.device_put(noise_provider.noise_batch(256), repl)
            impulse_bank = jax.device_put(noise_provider.impulse_batch(64), repl)
            pool = jax.device_put(pool_np, pool_sh)
            pool_lengths = jax.device_put(pool_lengths_np, pool_sh)
        else:
            noise_bank = jax.device_put(noise_provider.noise_batch(256))
            impulse_bank = jax.device_put(noise_provider.impulse_batch(64))
            pool = jax.device_put(pool_np)
            pool_lengths = jax.device_put(pool_lengths_np)

        n_texts, n_spk, _ = self._pool.shape
        params, opt_state = self.params, self.opt_state
        losses: List[float] = []
        # cluster id -> member text indices, for guaranteed co-occurrence
        cluster_members: Dict[int, np.ndarray] = {}
        for cid in np.unique(self.cluster_ids):
            if cid >= 0:
                cluster_members[int(cid)] = np.flatnonzero(self.cluster_ids == cid)
        k = max(1, min(int(steps_per_call), steps))
        while steps % k:
            k -= 1
        base_key = jax.random.PRNGKey(self.seed + 13)
        for chunk_start in range(0, steps, k):
            text_b, spk_b, noise_b, imp_b, mask_b = [], [], [], [], []
            for i in range(k):
                text_idx = self._sample_batch(cluster_members, n_texts)
                ids = self.cluster_ids[text_idx]
                pair_mask = (ids[:, None] == ids[None, :]) & (ids[:, None] >= 0)
                np.fill_diagonal(pair_mask, False)
                spk = np.stack([
                    self.rng.choice(n_spk, size=2, replace=n_spk < 2)
                    for _ in range(self.batch_size)
                ])
                text_b.append(text_idx.astype(np.int32))
                spk_b.append(spk.astype(np.int32))
                noise_b.append(self.rng.integers(0, 256, (2, self.batch_size)).astype(np.int32))
                imp_b.append(self.rng.integers(0, 64, (2, self.batch_size)).astype(np.int32))
                mask_b.append(pair_mask)
            keys = jnp.stack([
                jax.random.fold_in(base_key, chunk_start + i) for i in range(k)
            ])
            params, opt_state, metrics = self._step_fn(
                params, opt_state, pool, pool_lengths, noise_bank, impulse_bank,
                keys, np.stack(text_b), np.stack(spk_b), np.stack(noise_b),
                np.stack(imp_b), np.stack(mask_b),
            )
            log_rows = [
                i for i in range(k)
                if (chunk_start + i) % log_every == 0
                or chunk_start + i == steps - 1
            ]
            if log_rows:
                # materializing metrics blocks on the chunk; skip entirely
                # for chunks with nothing to log so dispatches stay queued
                m = np.asarray(metrics)
                for i in log_rows:
                    step_idx = chunk_start + i
                    losses.append(float(m[i, 0]))
                    logger.info(
                        f"pretrain step {step_idx}/{steps}: loss {m[i, 0]:.4f} "
                        f"(nt-xent {m[i, 1]:.4f}, hard-pair {m[i, 2]:.4f})"
                    )

        self.params = jax.device_get(params)
        self.opt_state = opt_state
        return self.params

    def save(self, path: str) -> None:
        embedding_net.save_params(self.params, path)
        logger.info(f"Saved pretrained embedding weights to {path}")
