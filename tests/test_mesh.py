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


def test_speech_embeddings_mesh_matches_single(cpu_mesh):
    """SpeechEmbeddings(mesh=...) shards the clip batch over the data axis and
    produces exactly the single-device embeddings (extract --mesh path)."""
    from heybuddy_tpu.models.featurizer import SpeechEmbeddings

    rng = np.random.default_rng(0)
    audio = (rng.normal(0, 0.1, (5, 23040)) * 32767).astype(np.float32) / 32767.0
    plain = SpeechEmbeddings()
    sharded = SpeechEmbeddings(mesh=cpu_mesh)
    out_plain = plain(audio)
    out_sharded = sharded(audio)
    assert out_sharded.shape == out_plain.shape == (5, 16, 96)
    np.testing.assert_allclose(out_sharded, out_plain, atol=1e-5)


def test_extract_mesh_matches_single(tmp_path, cpu_mesh):
    """LabeledFeatureExtractor(mesh=...) writes byte-identical shards."""
    from heybuddy_tpu.data.extract import LabeledFeatureExtractor

    rng = np.random.default_rng(1)
    source = [
        {"array": rng.normal(0, 0.05, 30000).astype(np.float32),
         "sampling_rate": 16000, "transcript": "hello world"}
        for _ in range(3)
    ]
    plain = LabeledFeatureExtractor(str(tmp_path / "plain"), "neg", process_batch_size=4)
    meshy = LabeledFeatureExtractor(
        str(tmp_path / "mesh"), "neg", process_batch_size=4, mesh=cpu_mesh
    )
    p_paths = plain(list(source))
    m_paths = meshy(list(source))
    assert len(p_paths) == len(m_paths) == 1
    a, b = np.load(p_paths[0]), np.load(m_paths[0])
    assert a.shape == b.shape and a.shape[1:] == (17, 96)
    # different padded batch shapes (4 vs 8 rows) change XLA fusion tiling;
    # bf16 compute may round one ulp (2^-8) differently per element
    np.testing.assert_allclose(a, b, atol=2 * 2.0 ** -8)
