"""
Multi-process distributed smoke: one SPMD train step across N processes.

The reference has no distributed layer (SURVEY.md §2.3); this framework's
multi-host story is ``distributed_init`` + ``get_mesh`` + sharded jit. A pod
isn't available in CI, so this module exercises the REAL multi-process code
path on localhost: each process owns a slice of virtual CPU devices, gloo
carries the cross-process collectives, and one production-shaped train step
(classifier forward -> weighted BCE -> grad -> adam update) runs jitted over
the global mesh with the batch sharded across processes.

Run one process (the test launcher spawns ``num_processes`` of these)::

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python -m heybuddy_tpu.parallel.distributed_smoke \
        <process_id> <num_processes> <coordinator host:port>

Prints ``DISTRIBUTED-SMOKE-OK pid=<i> loss=<f> gsum=<f> digest=<hex>`` on
success. ``gsum`` is a cross-process data-dependent reduction (each process
contributes different batch rows), and ``digest`` hashes the updated
parameters — the launcher asserts both are identical across processes, which
they can only be if the gradient psum actually crossed the process boundary.
"""

from __future__ import annotations

import hashlib
import sys
from typing import Any


def run(process_id: int, num_processes: int, coordinator: str) -> None:
    import jax

    # The sitecustomize plugin pins JAX_PLATFORMS to the hardware tunnel and
    # overrides the env var; force the virtual CPU mesh before any device use.
    jax.config.update("jax_platforms", "cpu")

    from heybuddy_tpu.parallel.mesh import distributed_init, get_mesh, shard_batch

    distributed_init(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from heybuddy_tpu.models.wakeword import WakeWordMLPModel

    mesh = get_mesh()  # all global devices, data axis spans both processes
    replicated = NamedSharding(mesh, P())

    model = WakeWordMLPModel(num_layers=1)
    # Replicated arrays in multi-process SPMD: every process supplies the full
    # (identical, seeded) value for its addressable shards.
    rep = lambda x: jax.make_array_from_process_local_data(replicated, np.asarray(x))
    params = jax.tree_util.tree_map(rep, model.params)
    tx = optax.adam(1e-3)
    opt_state = jax.tree_util.tree_map(
        lambda x: rep(x) if hasattr(x, "shape") else x, tx.init(model.params)
    )

    def train_step(p: Any, s: Any, x: jax.Array, y: jax.Array):
        def loss_fn(pp: Any) -> jax.Array:
            preds = jnp.clip(model.apply(pp, x, train=False)[:, 0], 1e-7, 1 - 1e-7)
            return -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, new_s = tx.update(grads, s, p)
        # A second, explicitly data-dependent global reduction for the
        # launcher to check: sums every batch row across all processes.
        gsum = jnp.sum(x) + jnp.sum(y)
        return optax.apply_updates(p, updates), new_s, loss, gsum

    batch_sh = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        train_step,
        in_shardings=(replicated, replicated, batch_sh, batch_sh),
        out_shardings=(replicated, replicated, replicated, replicated),
    )

    # DIFFERENT rows per process: the global batch concatenates both halves,
    # so matching results across processes proves the collectives ran.
    rng = np.random.default_rng(100 + process_id)
    local_rows = 2 * jax.local_device_count()
    x_local = rng.normal(0, 1, (local_rows, 16, 96)).astype(np.float32)
    y_local = (np.arange(local_rows) % 2).astype(np.float32)
    x = shard_batch(x_local, mesh)
    y = shard_batch(y_local, mesh)
    assert x.shape[0] == local_rows * num_processes, x.shape

    new_params, _, loss, gsum = jitted(params, opt_state, x, y)
    jax.block_until_ready(new_params)

    digest = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(new_params):
        digest.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    print(
        f"DISTRIBUTED-SMOKE-OK pid={process_id} loss={float(loss):.6f} "
        f"gsum={float(gsum):.3f} digest={digest.hexdigest()[:16]}",
        flush=True,
    )


if __name__ == "__main__":
    run(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
