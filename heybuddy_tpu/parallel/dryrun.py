"""
Multi-chip dry run: the driver-facing validation that the FULL training path
(featurize -> classify -> weighted-BCE -> Adam update, plus eval and
checkpoint) compiles and executes over an ``n_devices`` mesh.

Run as a module in a FRESH interpreter::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m heybuddy_tpu.parallel.dryrun 8

``__graft_entry__.dryrun_multichip`` launches exactly that as a subprocess so
the parent process's already-initialized backend (e.g. the single-chip axon
tunnel) can never leak into the dry run.
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import Any, Tuple


def run(n_devices: int) -> None:
    """Build an n-device mesh and run train + eval + checkpoint on it."""
    import jax

    # The environment may pin JAX_PLATFORMS to a hardware plugin via
    # sitecustomize (which overrides env vars); force the virtual CPU mesh
    # unconditionally, before any device use.
    jax.config.update("jax_platforms", "cpu")

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"dryrun_multichip needs {n_devices} devices but found {len(devices)} "
            f"on platform {devices[0].platform!r}. Launch in a fresh process with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} set "
            f"before interpreter start (the flag is read at backend init)."
        )

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from heybuddy_tpu.constants import CLIP_SAMPLES
    from heybuddy_tpu.models import embedding_net
    from heybuddy_tpu.models.featurizer import featurize_batch
    from heybuddy_tpu.models.wakeword import WakeWordMLPModel
    from heybuddy_tpu.parallel.mesh import get_mesh
    from heybuddy_tpu.training.trainer import WakeWordTrainer

    mesh = get_mesh(data=n_devices, model=1)
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)

    # --- 1. audio -> features -> loss -> update, sharded over the data axis ---
    model = WakeWordMLPModel(num_layers=1)
    emb_params = jax.device_put(embedding_net.default_params(), replicated)
    params = jax.device_put(model.params, replicated)
    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(params), replicated)

    def train_step(p: Any, s: Any, audio: jax.Array, y: jax.Array) -> Tuple[Any, Any, jax.Array]:
        def loss_fn(pp: Any) -> jax.Array:
            feats = featurize_batch(emb_params, audio)
            preds = jnp.clip(model.apply(pp, feats, train=False)[:, 0], 1e-7, 1 - 1e-7)
            bce = -(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds))
            return jnp.mean(bce)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, new_s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), new_s, loss

    jitted = jax.jit(
        train_step,
        in_shardings=(replicated, replicated, batch_sharding, batch_sharding),
        out_shardings=(replicated, replicated, replicated),
    )
    batch = 2 * n_devices
    audio = jax.device_put(
        rng.normal(0, 1000.0, (batch, CLIP_SAMPLES)).astype(np.float32), batch_sharding
    )
    labels = jax.device_put((np.arange(batch) % 2).astype(np.float32), batch_sharding)
    new_params, _, loss = jitted(params, opt_state, audio, labels)
    jax.block_until_ready(new_params)
    print(f"[dryrun] fused featurize+train step over {n_devices} devices OK, loss={float(loss):.5f}")

    # --- 2. the PRODUCTION trainer under the mesh: train + eval + checkpoint ---
    with tempfile.TemporaryDirectory() as ckpt_dir:
        trainer = WakeWordTrainer(
            checkpoint_dir=ckpt_dir, num_layers=1, mesh=mesh, seed=0
        )
        n_train = 3  # deliberately NOT a multiple of n_devices: exercises padding
        feats = rng.normal(0, 1, (4, n_devices * 2 + n_train, 16, 96)).astype(np.float32)
        ys = (rng.random((4, n_devices * 2 + n_train)) < 0.5).astype(np.float32)
        training = list(zip(feats, ys))
        validation = [(feats[0], np.zeros_like(ys[0]))]
        history = trainer.train_epoch(
            training,
            validation=validation,
            num_steps=4,
            validation_steps=2,
            checkpoint_steps=2,
            name="dryrun",
            description="Dryrun",
        )
        ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith(".npz")]
        if not ckpts:
            raise RuntimeError("dryrun: trainer did not write a checkpoint under the mesh")
        if not np.isfinite(history["loss"]).all():
            raise RuntimeError(f"dryrun: non-finite training loss: {history['loss']}")
    print(
        f"[dryrun] production trainer over {n_devices}-device mesh OK "
        f"(train + padded eval + checkpoint), final loss={history['loss'][-1]:.5f}"
    )

    # --- 3. contrastive embedding pretraining sharded over the mesh ---
    # The heaviest real workload: HBM-resident clip pool sharded over the
    # data axis, NT-Xent + hard-pair margin step jitted with mesh shardings.
    os.environ.setdefault("HEYBUDDY_OFFLINE", "1")
    from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer

    n_texts = 4 * n_devices + 1  # NOT divisible: exercises pool padding
    pretrainer = EmbeddingPretrainer(
        texts=[f"dryrun text {i}" for i in range(n_texts)],
        speakers_per_text=2,
        batch_size=n_devices,
        mesh=mesh,
        seed=0,
    )
    # synthetic pool: TTS is host work, irrelevant to the sharding under test
    pretrainer._pool = rng.normal(0, 0.1, (n_texts, 2, CLIP_SAMPLES)).astype(np.float32)
    pretrainer._pool_lengths = np.full((n_texts, 2), CLIP_SAMPLES, dtype=np.int32)
    pretrainer.train(steps=2, log_every=1)
    emb_after = pretrainer.params
    for leaf in jax.tree_util.tree_leaves(emb_after):
        if not np.isfinite(np.asarray(leaf)).all():
            raise RuntimeError("dryrun: non-finite embedding params after sharded pretrain")
    print(f"[dryrun] sharded contrastive pretrain step over {n_devices} devices OK")
    print(f"dryrun_multichip({n_devices}): OK")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    run(n)


if __name__ == "__main__":
    main()
