"""Mesh/sharding: multi-device featurization and training parity with single-device."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from heybuddy_tpu.models import embedding_net
from heybuddy_tpu.models.featurizer import featurize_batch
from heybuddy_tpu.parallel.mesh import batch_sharding, get_mesh, pad_batch_to_multiple, replicated


def test_mesh_has_eight_devices(cpu_mesh):
    assert cpu_mesh.shape["data"] == 8
    assert cpu_mesh.shape["model"] == 1


def test_sharded_featurize_matches_unsharded(cpu_mesh):
    params = embedding_net.default_params()
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 1000.0, (16, 23040)).astype(np.float32)

    unsharded = np.asarray(jax.jit(featurize_batch)(params, jnp.asarray(audio)))

    sharded_fn = jax.jit(
        featurize_batch,
        in_shardings=(replicated(cpu_mesh), batch_sharding(cpu_mesh)),
        out_shardings=batch_sharding(cpu_mesh),
    )
    params_r = jax.device_put(params, replicated(cpu_mesh))
    audio_s = jax.device_put(audio, batch_sharding(cpu_mesh))
    sharded = np.asarray(sharded_fn(params_r, audio_s))

    np.testing.assert_allclose(unsharded, sharded, atol=2e-2, rtol=2e-2)


def test_pad_batch_to_multiple():
    batch = np.ones((5, 3), dtype=np.float32)
    padded, n = pad_batch_to_multiple(batch, 8)
    assert padded.shape == (8, 3)
    assert n == 5
    assert (padded[5:] == 0).all()
    same, n2 = pad_batch_to_multiple(np.ones((8, 3), dtype=np.float32), 8)
    assert same.shape == (8, 3) and n2 == 8


def test_trainer_with_mesh_converges(tmp_path, cpu_mesh):
    from heybuddy_tpu.training.trainer import WakeWordTrainer
    from tests.test_trainer import ToyIterator

    trainer = WakeWordTrainer(checkpoint_dir=str(tmp_path), num_layers=1, mesh=cpu_mesh)
    history = trainer.train_epoch(
        ToyIterator(bs=20),  # 40-sample batches pad to 5 per device
        num_steps=60,
        validation_steps=100,
        checkpoint_steps=1000,
        learning_rate=2e-3,
    )
    assert history["loss"][-1] < history["loss"][0]
    assert max(history["recall"][-10:]) > 0.8


def test_dryrun_multichip_in_process():
    """The driver-facing dryrun payload passes on the virtual 8-device mesh."""
    from heybuddy_tpu.parallel.dryrun import run

    run(8)
