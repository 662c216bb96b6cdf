"""
Wake-word trainer: a single jitted train step + the three-stage driver.

Semantics parity with reference ``trainer.py`` (WakeWordTrainer), re-formulated
for XLA's static-shape world:

* **High-loss example mining** (reference trainer.py:408-424): instead of
  boolean-indexing a dynamic subset, hard examples are selected with a mask
  and the weighted BCE is averaged over the masked count. Identical math,
  fixed shapes.
* **Hard-example accumulation to >=128 before stepping** (trainer.py:443-485):
  the accumulated-count / accumulation-steps counters and the metric
  sufficient statistics (tp/fn/fp/negatives over the accumulated hard set,
  including the reference's overwrite-on-big-batch quirk) live in a small
  scalar carry; the optimizer update fires under ``lax.cond``.
* **Cosine LR with warmup + hold** (trainer.py:127-156) computed host-side and
  injected into Adam via ``optax.inject_hyperparams``.
* **Dynamic negative-weight controller** (trainer.py:531-536): validation
  FP/hour measured every ``validation_steps``; negative weight x2 / /2 toward
  the target rate, host-side, with a hold band [target/2, target] the
  reference lacks (see ``adjust_negative_weight``).
* **Three-stage schedule** (trainer.py:848-926): per stage LR x0.5, steps x2,
  batch x0.5.

Improvements over the reference: checkpoints include step/stage/negative-weight
state (the reference restores only weights+optimizer, trainer.py:54-118), and
the train step is sharded over the mesh's data axis for multi-chip scale.
"""

from __future__ import annotations

import json
import os
import pickle
import time
import weakref
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from heybuddy_tpu.constants import (
    DEFAULT_ACCUMULATION_TARGET,
    DEFAULT_ACTIVATION_THRESHOLD,
    DEFAULT_ARCHITECTURE,
    DEFAULT_BATCH_SIZE_ADJUST_RATIO,
    DEFAULT_CHECKPOINT_STEPS,
    DEFAULT_DYNAMIC_NEGATIVE_WEIGHT,
    DEFAULT_HEADS,
    DEFAULT_HIGH_LOSS_THRESHOLD,
    DEFAULT_LAYER_DIM,
    DEFAULT_LAYERS,
    DEFAULT_LEARNING_RATE,
    DEFAULT_LEARNING_RATE_ADJUST_RATIO,
    DEFAULT_LOGGING_STEPS,
    DEFAULT_NEGATIVE_WEIGHT,
    DEFAULT_NEGATIVE_WEIGHT_ADJUST_RATIO,
    DEFAULT_STAGES,
    DEFAULT_STEP_ADJUST_RATIO,
    DEFAULT_STEPS,
    DEFAULT_TARGET_FALSE_POSITIVE_RATE,
    DEFAULT_USE_GATING,
    DEFAULT_USE_HALF_LAYERS,
    DEFAULT_VALIDATION_STEPS,
    CLIP_SECONDS,
)
from heybuddy_tpu.models.wakeword import (
    WakeWordMLPModel,
    WakeWordTransformerModel,
    load_model,
    save_model,
)
from heybuddy_tpu.utils.log import logger
from heybuddy_tpu.utils.strings import human_duration

__all__ = ["WakeWordTrainer", "get_learning_rate"]

Params = Dict[str, Any]
DatasetType = Any  # anything iterable of (x, y) numpy batches


def get_learning_rate(
    step: int,
    warmup_steps: int = 0,
    hold_steps: int = 0,
    total_steps: int = 0,
    target_learning_rate: float = DEFAULT_LEARNING_RATE,
) -> float:
    """Cosine decay with warmup and hold (reference trainer.py:127-156)."""
    denom = max(float(total_steps - warmup_steps - hold_steps), 1.0)
    lr = 0.5 * target_learning_rate * (
        1.0 + np.cos(np.pi * (step - warmup_steps - hold_steps) / denom)
    )
    warmup_lr = target_learning_rate * (step / warmup_steps) if warmup_steps > 0 else 0.0
    if hold_steps > 0 and step <= warmup_steps + hold_steps:
        lr = target_learning_rate
    return float(warmup_lr if step < warmup_steps else lr)


_CACHE_MISS = object()  # sentinel: None is a legitimate cached plan value


def adjust_negative_weight(
    current: float, fp_per_hour: float, target: float, ratio: float
) -> float:
    """One step of the dynamic negative-weight controller, with a hold band.

    The validation fp/hr is quantized to multiples of 1/negative-hours, so a
    single residual fire often lands EXACTLY on the target rate. The
    reference lowers the weight whenever the rate is at-or-under target
    (reference trainer.py:531-536); under that rule the at-target plateau
    reads as headroom every validation, the weight decays to its floor, and
    held-out adversarial FAR measurably regresses (0.030 -> 0.090,
    reports/quality-v16.json). Deviation: raise above target, lower only
    below target/2 (real headroom), hold in between.
    """
    if fp_per_hour > target:
        return current * ratio
    if fp_per_hour < 0.5 * target:
        return max(1.0, current / ratio)
    return current


def _init_carry() -> Dict[str, jax.Array]:
    return {
        "accum_samples": jnp.zeros((), jnp.int32),
        "accum_steps": jnp.ones((), jnp.int32),
        "tp": jnp.zeros((), jnp.float32),
        "fn": jnp.zeros((), jnp.float32),
        "fp": jnp.zeros((), jnp.float32),
        "n_neg": jnp.zeros((), jnp.float32),
    }


class WakeWordTrainer:
    """Three-stage wake-word training driver (reference trainer.py:210-1007)."""

    def __init__(
        self,
        checkpoint_dir: str = "./checkpoints",
        learning_rate: float = DEFAULT_LEARNING_RATE,
        input_shape: Tuple[int, int] = (16, 96),
        num_layers: int = DEFAULT_LAYERS,
        layer_dim: int = DEFAULT_LAYER_DIM,
        num_heads: int = DEFAULT_HEADS,
        architecture: str = DEFAULT_ARCHITECTURE,
        use_gating: bool = DEFAULT_USE_GATING,
        use_half_layers: bool = DEFAULT_USE_HALF_LAYERS,
        seed: int = 0,
        mesh: Optional[Any] = None,
        checkpoint_backend: str = "npz",
        **model_kwargs: Any,
    ) -> None:
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        self.checkpoint_backend = checkpoint_backend
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.learning_rate = learning_rate
        self.architecture = architecture
        self.layer_dim = layer_dim
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.seed = seed
        self.mesh = mesh

        if architecture == "perceptron":
            self.model: Union[WakeWordMLPModel, WakeWordTransformerModel] = WakeWordMLPModel(
                input_shape=input_shape,
                num_layers=num_layers,
                layer_dim=layer_dim,
                use_gating=use_gating,
                use_half_layers=use_half_layers,
                seed=seed,
                **model_kwargs,
            )
        elif architecture == "transformer":
            self.model = WakeWordTransformerModel(
                input_shape=input_shape,
                dim=layer_dim,
                num_layers=num_layers,
                num_heads=num_heads,
                seed=seed,
                **model_kwargs,
            )
        else:
            raise ValueError(f"Invalid architecture: {architecture}")

        # Adam with per-step host-injected LR: scale_by_adam produces the
        # direction, the traced lr scalar scales it inside the jitted step.
        self.tx = optax.scale_by_adam()
        self.opt_state = self.tx.init(self.model.params)
        self.start_stage = 0
        self.start_step = 0
        self.resumed_negative_weight: Optional[float] = None
        self._train_step_fn: Optional[Callable[..., Any]] = None
        self._eval_fn: Optional[Callable[..., Any]] = None
        self._preds_fn: Optional[Callable[..., Any]] = None
        self._step_cache_key: Optional[Tuple[float, float]] = None
        self._resident_step_fn: Optional[Callable[..., Any]] = None
        # HBM-resident training data: device pools keyed by source identity
        # (reused across stages, weakref-validated — see _cache_get) and
        # cached padded label vectors per counts.
        self._device_pools: Dict[int, Tuple[Any, Any]] = {}
        self._device_plans: Dict[int, Tuple[Any, Any]] = {}
        self._resident_y: Dict[Tuple[int, ...], jax.Array] = {}
        # label vectors for HBM-resident eval pools, keyed (rows, label)
        self._eval_labels: Dict[Tuple[int, float], jax.Array] = {}

    @staticmethod
    def _cache_get(cache: Dict[int, Tuple[Any, Any]], obj: Any) -> Any:
        entry = cache.get(id(obj))
        if entry is not None and entry[0]() is obj:
            return entry[1]
        return _CACHE_MISS

    @staticmethod
    def _cache_put(cache: Dict[int, Tuple[Any, Any]], obj: Any, value: Any) -> None:
        key = id(obj)
        cache[key] = (weakref.ref(obj, lambda _: cache.pop(key, None)), value)

    # --- jitted step construction ------------------------------------------------

    def _build_train_step(
        self,
        high_loss_threshold: float,
        activation_threshold: float,
        accumulation_target: int = DEFAULT_ACCUMULATION_TARGET,
    ) -> Callable[..., Any]:
        apply_fn = self.model.apply

        def step(
            params: Params,
            opt_state: Any,
            carry: Dict[str, jax.Array],
            x: jax.Array,
            y: jax.Array,
            base_rng: jax.Array,
            step_idx: jax.Array,
            lr: jax.Array,
            neg_weight: jax.Array,
        ) -> Tuple[Params, Any, Dict[str, jax.Array], Dict[str, jax.Array]]:
            batch = x.shape[0]
            # folded INSIDE the jitted step: an eager host-side fold_in is its
            # own device dispatch, ~3.3 ms through the remote tunnel (PERF.md)
            rng = jax.random.fold_in(base_rng, step_idx)

            def loss_fn(p: Params) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
                preds = apply_fn(p, x, train=True, rng=rng)[:, 0]
                preds = jnp.clip(preds, 1e-7, 1.0 - 1e-7)
                hard_neg = (y == 0) & (preds >= high_loss_threshold)
                hard_pos = (y == 1) & (preds < 1.0 - high_loss_threshold)
                mask = (hard_neg | hard_pos).astype(jnp.float32)
                n_hard = jnp.sum(mask)
                weights = jnp.where(y == 1, 1.0, neg_weight) * mask
                bce = -(y * jnp.log(preds) + (1.0 - y) * jnp.log(1.0 - preds))
                masked_loss = jnp.sum(weights * bce) / jnp.maximum(n_hard, 1.0)
                loss = masked_loss / carry["accum_steps"].astype(jnp.float32)
                return loss, (preds, hard_neg, hard_pos, n_hard)

            (loss, (preds, hard_neg, hard_pos, n_hard)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)

            n_hard_i = n_hard.astype(jnp.int32)
            total = carry["accum_samples"] + n_hard_i
            will_step = (total >= accumulation_target) & (n_hard_i > 0)

            # Per-batch metric sufficient statistics over the hard subset.
            b_tp = jnp.sum(hard_pos & (preds > activation_threshold)).astype(jnp.float32)
            b_fn = jnp.sum(hard_pos & (preds <= activation_threshold)).astype(jnp.float32)
            b_fp = jnp.sum(hard_neg & (preds >= activation_threshold)).astype(jnp.float32)
            b_nneg = jnp.sum(hard_neg).astype(jnp.float32)

            big_batch = n_hard_i >= accumulation_target
            # Reference quirk (trainer.py:443-462): a >=128-hard batch replaces
            # the accumulated prediction set; otherwise metrics come from what
            # was accumulated before this step.
            stat_tp = jnp.where(big_batch, b_tp, carry["tp"])
            stat_fn = jnp.where(big_batch, b_fn, carry["fn"])
            stat_fp = jnp.where(big_batch, b_fp, carry["fp"])
            stat_nneg = jnp.where(big_batch, b_nneg, carry["n_neg"])

            def do_update(args: Tuple[Params, Any]) -> Tuple[Params, Any]:
                p, s = args
                direction, new_s = self.tx.update(grads, s, p)
                updates = jax.tree.map(lambda u: -lr * u, direction)
                return optax.apply_updates(p, updates), new_s

            new_params, new_opt_state = jax.lax.cond(
                will_step, do_update, lambda args: args, (params, opt_state)
            )

            new_carry = {
                "accum_samples": jnp.where(will_step, 0, total),
                "accum_steps": jnp.where(
                    will_step, 1, carry["accum_steps"] + (n_hard_i > 0).astype(jnp.int32)
                ),
                "tp": jnp.where(will_step, 0.0, stat_tp + jnp.where(big_batch, 0.0, b_tp)),
                "fn": jnp.where(will_step, 0.0, stat_fn + jnp.where(big_batch, 0.0, b_fn)),
                "fp": jnp.where(will_step, 0.0, stat_fp + jnp.where(big_batch, 0.0, b_fp)),
                "n_neg": jnp.where(will_step, 0.0, stat_nneg + jnp.where(big_batch, 0.0, b_nneg)),
            }

            recall = stat_tp / jnp.maximum(stat_tp + stat_fn, 1.0)
            fp_rate = stat_fp / jnp.maximum(stat_nneg, 1.0)
            # Packed as ONE array so the host fetches one buffer per step
            # (scalar-by-scalar fetches are expensive on remote-tunneled
            # devices): [loss, high_loss_rate, recall, fp_rate, did_step, n_hard]
            metrics = jnp.stack(
                [
                    loss,
                    n_hard / batch,
                    recall,
                    fp_rate,
                    will_step.astype(jnp.float32),
                    n_hard,
                ]
            )
            return new_params, new_opt_state, new_carry, metrics

        # HBM-resident variant: batches arrive as per-source row indices into
        # device-resident feature pools instead of host-assembled arrays —
        # the per-step host batch transfer (~6.8 MB at the reference default
        # composition) through the remote tunnel was the trainer's measured
        # bottleneck (PERF.md). y arrives pre-padded (mesh rows -1); x pads
        # with zero rows to match.
        def resident_step(params, opt_state, carry, pools, idxs, y, base_rng,
                          step_idx, lr, neg_weight):
            parts = [pool[idx] for pool, idx in zip(pools, idxs)]
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
            pad = y.shape[0] - x.shape[0]
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            if self.mesh is not None:
                from heybuddy_tpu.parallel.mesh import batch_sharding

                x = jax.lax.with_sharding_constraint(x, batch_sharding(self.mesh))
            return step(params, opt_state, carry, x, y, base_rng, step_idx, lr, neg_weight)

        self._resident_step_fn = jax.jit(resident_step, donate_argnums=(0, 1, 2))
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_preds(self) -> Callable[..., Any]:
        """Jitted per-row scores for whole-pool, in-order evaluation (the
        gate-aware stream validation path)."""
        apply_fn = self.model.apply

        def predict(params: Params, x: jax.Array) -> jax.Array:
            return apply_fn(params, x, train=False)[:, 0]

        return jax.jit(predict)

    def _build_eval(self, activation_threshold: float) -> Callable[..., Any]:
        apply_fn = self.model.apply

        def evaluate(params: Params, x: jax.Array, y: jax.Array) -> Dict[str, jax.Array]:
            preds = apply_fn(params, x, train=False)[:, 0]
            # Mesh padding fills labels with -1; count FPs only over true
            # negatives (y == 0) so padded rows never inflate fp_per_hour and
            # trip the dynamic negative-weight controller.
            fp = jnp.sum((y == 0) & (preds >= activation_threshold)).astype(jnp.float32)
            tp = jnp.sum((y == 1) & (preds > activation_threshold)).astype(jnp.float32)
            fn = jnp.sum((y == 1) & (preds <= activation_threshold)).astype(jnp.float32)
            tn = jnp.sum((y == 0) & (preds < activation_threshold)).astype(jnp.float32)
            n_neg = jnp.sum(y == 0).astype(jnp.float32)
            return {"fp": fp, "tp": tp, "fn": fn, "tn": tn, "n_neg": n_neg}

        return jax.jit(evaluate)

    # --- HBM-resident training data ------------------------------------------------

    def _device_data_budget(self) -> int:
        env = os.environ.get("HEYBUDDY_DEVICE_DATA_BYTES")
        if env:
            return int(env)
        try:
            stats = jax.devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                # leave most of HBM to activations/params/feature pipeline
                return int(stats["bytes_limit"] * 0.35)
        except Exception:
            pass
        return 4 * 1024 ** 3

    def _device_plan_for(self, training: Any) -> Optional[Tuple[Any, Tuple[jax.Array, ...]]]:
        """(plan, device pools) when the training data can live in HBM.

        Each jitted call through the remote tunnel costs ~3.3 ms and each
        host-assembled batch ~6.8 MB of host->device transfer (PERF.md) —
        HBM-resident pools reduce a step's host traffic to a few KB of row
        indices. Disable with HEYBUDDY_DEVICE_DATA=0.
        """
        if os.environ.get("HEYBUDDY_DEVICE_DATA", "1") == "0":
            return None
        plan_fn = getattr(training, "device_plan", None)
        if plan_fn is None:
            return None
        # cache per iterator: __call__ consults this before starting producer
        # threads and train_epoch runs per stage — pools materialize once.
        # id()-keyed entries validate against a weakref (a dead object's id
        # can be reused by a NEW iterator — returning its predecessor's plan
        # would silently train on the wrong data) and self-evict on gc so
        # their HBM pools free.
        plan = self._cache_get(self._device_plans, training)
        if plan is _CACHE_MISS:
            try:
                plan = plan_fn(self._device_data_budget())
            except Exception as ex:  # never fail training over the fast path
                logger.warning(f"device-resident training unavailable: {ex}")
                plan = None
            self._cache_put(self._device_plans, training, plan)
        if plan is None:
            return None
        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(self.mesh, PartitionSpec())  # replicate
        pools: List[jax.Array] = []
        total = 0
        for (ds, _), pool in zip(plan.sources, plan.pools):
            dev = self._cache_get(self._device_pools, ds)
            if dev is _CACHE_MISS:
                dev = (
                    jax.device_put(pool, sharding) if sharding is not None
                    else jax.device_put(pool)
                )
                self._cache_put(self._device_pools, ds, dev)
                total += pool.nbytes
            pools.append(dev)
        if total:
            logger.info(
                f"training data HBM-resident: {len(plan.sources)} sources, "
                f"{total / 1e6:.1f} MB uploaded once; steps send indices only"
            )
        return plan, tuple(pools)

    def _resident_labels(self, counts: Tuple[int, ...], labels: Tuple[float, ...]) -> jax.Array:
        """Padded label vector for a per-source batch composition (cached)."""
        key = counts
        if key not in self._resident_y:
            y = np.concatenate(
                [np.full(n, label, np.float32) for n, label in zip(counts, labels)]
            ) if counts else np.zeros(0, np.float32)
            if self.mesh is not None:
                from heybuddy_tpu.parallel.mesh import batch_sharding

                n_dev = self.mesh.shape["data"]
                pad = (-len(y)) % n_dev
                if pad:
                    # -1 rows are neither positive nor negative: never mined
                    y = np.concatenate([y, -np.ones(pad, np.float32)])
                self._resident_y[key] = jax.device_put(y, batch_sharding(self.mesh))
            else:
                self._resident_y[key] = jnp.asarray(y)
        return self._resident_y[key]

    def _device_put_batch(self, x: np.ndarray, y: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        if self.mesh is not None:
            from heybuddy_tpu.parallel.mesh import batch_sharding, pad_batch_to_multiple

            n_dev = self.mesh.shape["data"]
            x, _ = pad_batch_to_multiple(x.astype(np.float32), n_dev)
            # Pad labels with -1 so padded rows are neither positive nor negative
            # and never become hard examples.
            pad = x.shape[0] - y.shape[0]
            if pad:
                y = np.concatenate([y, -np.ones(pad, dtype=np.float32)])
            y = y.astype(np.float32)
            sharding = batch_sharding(self.mesh)
            if jax.process_count() > 1:
                # Multi-host: each process holds its local slice of the global
                # batch (producer threads are per-host); assemble the global
                # sharded array without cross-host data movement.
                x_arr = jax.make_array_from_process_local_data(sharding, x)
                y_arr = jax.make_array_from_process_local_data(sharding, y)
                return x_arr, y_arr
            return jax.device_put(x, sharding), jax.device_put(y, sharding)
        return jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)

    # --- checkpointing ------------------------------------------------------------

    def save_checkpoint(
        self, name: str, optimizer: bool = True, step: Optional[int] = None
    ) -> None:
        """
        Model npz + optimizer pickle + trainer-state json (reference
        trainer.py:186-198). When the trainer was built with
        ``checkpoint_backend="orbax"``, an Orbax checkpoint directory is
        written as well — the multi-host-safe production format.

        ``step`` records the in-progress step of the current stage so resume
        can fast-forward; when omitted the resumed/initial step is kept.
        ``self.start_step`` is deliberately NOT mutated here: it is consumed
        (and cleared) once at train_epoch start, and a mid-stage checkpoint
        that set it would make the NEXT stage skip that many steps as a
        phantom resume.
        """
        recorded_step = self.start_step if step is None else step
        model_path = os.path.join(self.checkpoint_dir, f"{name}.npz")
        save_model(self.model, model_path)
        if optimizer:
            leaves = jax.tree_util.tree_leaves(self.opt_state)
            with open(os.path.join(self.checkpoint_dir, f"{name}_optimizer.pkl"), "wb") as f:
                pickle.dump([np.asarray(leaf) for leaf in leaves], f)
        state = {
            "stage": self.start_stage,
            "step": recorded_step,
            "negative_weight": self.resumed_negative_weight,
        }
        with open(os.path.join(self.checkpoint_dir, f"{name}_state.json"), "w") as f:
            json.dump(state, f)
        if self.checkpoint_backend == "orbax":
            self._save_orbax(name)

    def _save_orbax(self, name: str) -> None:
        try:
            import orbax.checkpoint as ocp

            path = os.path.join(self.checkpoint_dir, f"{name}_orbax")
            checkpointer = ocp.StandardCheckpointer()
            payload = {
                "params": jax.device_get(self.model.params),
                "opt_state": jax.device_get(self.opt_state),
            }
            checkpointer.save(os.path.abspath(path), payload, force=True)
            checkpointer.wait_until_finished()
        except Exception as ex:
            logger.warning(f"Orbax checkpoint failed ({ex}); npz checkpoint still written")

    def resume_orbax(self, name: str) -> None:
        """Restore params + optimizer state from an Orbax checkpoint directory."""
        import orbax.checkpoint as ocp

        path = os.path.join(self.checkpoint_dir, f"{name}_orbax")
        checkpointer = ocp.StandardCheckpointer()
        template = {
            "params": jax.device_get(self.model.params),
            "opt_state": jax.device_get(self.opt_state),
        }
        restored = checkpointer.restore(os.path.abspath(path), template)
        self.model.params = restored["params"]
        self.opt_state = restored["opt_state"]

    def resume(self, name: str) -> None:
        """
        Resume from the newest model/optimizer checkpoint pair whose mtimes are
        within 2 s (reference trainer.py:54-118), additionally restoring
        stage/step/negative-weight from the state json when present.
        """
        files = os.listdir(self.checkpoint_dir)
        models = [
            f
            for f in files
            if f.startswith(name) and f.endswith(".npz") and not f.endswith("_optimizer.npz")
        ]
        optimizers = [f for f in files if f.startswith(name) and f.endswith("_optimizer.pkl")]
        if not models:
            raise FileNotFoundError(f"Checkpoint {name} not found.")

        def mtime(f: str) -> float:
            return os.path.getmtime(os.path.join(self.checkpoint_dir, f))

        models.sort(key=mtime, reverse=True)
        optimizers.sort(key=mtime, reverse=True)
        model_file = models[0]
        opt_file = next((o for o in optimizers if abs(mtime(o) - mtime(model_file)) < 2), None)

        logger.info(f"Resuming training from {model_file}" + (f" and {opt_file}" if opt_file else ""))
        loaded = load_model(os.path.join(self.checkpoint_dir, model_file))
        self.model.params = loaded.params
        self.opt_state = self.tx.init(self.model.params)
        if opt_file is not None:
            with open(os.path.join(self.checkpoint_dir, opt_file), "rb") as f:
                leaves = pickle.load(f)
            treedef = jax.tree_util.tree_structure(self.opt_state)
            self.opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(leaf) for leaf in leaves]
            )
        state_file = os.path.join(
            self.checkpoint_dir, model_file.replace(".npz", "_state.json")
        )
        if os.path.exists(state_file):
            with open(state_file) as f:
                state = json.load(f)
            self.start_stage = state.get("stage", 0) or 0
            self.start_step = state.get("step", 0) or 0
            self.resumed_negative_weight = state.get("negative_weight")

    # --- single-epoch loop ----------------------------------------------------------

    def train_epoch(
        self,
        training: DatasetType,
        validation: Optional[DatasetType] = None,
        testing: Optional[DatasetType] = None,
        num_steps: int = DEFAULT_STEPS,
        warmup_steps: Optional[int] = None,
        hold_steps: Optional[int] = None,
        negative_weight_schedule: Union[float, List[float]] = DEFAULT_NEGATIVE_WEIGHT,
        negative_weight_adjust_ratio: Optional[float] = None,
        target_false_positive_rate: float = DEFAULT_TARGET_FALSE_POSITIVE_RATE,
        validation_gate_consecutive: int = 1,
        validation_gate_debounce_windows: int = 16,
        validation_steps: int = DEFAULT_VALIDATION_STEPS,
        checkpoint_steps: int = DEFAULT_CHECKPOINT_STEPS,
        logging_steps: int = DEFAULT_LOGGING_STEPS,
        learning_rate: float = DEFAULT_LEARNING_RATE,
        high_loss_threshold: float = DEFAULT_HIGH_LOSS_THRESHOLD,
        activation_threshold: float = DEFAULT_ACTIVATION_THRESHOLD,
        description: str = "Training",
        name: str = "heybuddy",
        log_callback: Optional[Callable[[int, Dict[str, float]], None]] = None,
    ) -> Dict[str, Any]:
        """One stage of training; returns metric histories (numpy arrays)."""
        if warmup_steps is None:
            warmup_steps = num_steps // 5
        if hold_steps is None:
            hold_steps = num_steps // 3

        # Reuse the jitted step/eval across stages: rebuilding creates fresh
        # closures with empty jit caches, and on remote-compile backends each
        # stage would pay the full compile again even for identical shapes.
        cache_key = (high_loss_threshold, activation_threshold)
        if self._train_step_fn is None or self._step_cache_key != cache_key:
            self._train_step_fn = self._build_train_step(
                high_loss_threshold, activation_threshold
            )
            self._eval_fn = self._build_eval(activation_threshold)
            self._step_cache_key = cache_key
        train_step = self._train_step_fn
        eval_fn = self._eval_fn

        params = self.model.params
        opt_state = self.opt_state
        carry = _init_carry()
        base_rng = jax.random.PRNGKey(self.seed + 1)
        quantum_warned = False

        history: Dict[str, List[float]] = {
            k: []
            for k in (
                "learning_rate",
                "negative_weight",
                "loss",
                "high_loss_rate",
                "recall",
                "false_positive_rate",
                "validation_false_positive_per_hour",
                "validation_recall",
                "testing_accuracy",
                "testing_recall",
                "testing_false_positive_rate",
            )
        }
        has_validation = validation is not None
        has_testing = testing is not None
        log_every = max(1, num_steps // 20)
        epoch_start = time.perf_counter()

        # Resume mid-stage: continue the step counter (and thus LR schedule)
        # where the restored checkpoint left off, then clear it so subsequent
        # stages start from 0.
        first_step = self.start_step
        self.start_step = 0
        if first_step:
            logger.info(f"Resuming stage at step {first_step}/{num_steps}")

        # HBM-resident fast path: pools uploaded once, steps send row indices
        # only, and metric fetches batch up to the next log/eval/checkpoint
        # boundary so queued dispatches stay queued (each host round trip
        # through the remote tunnel costs ~3.3 ms — PERF.md).
        device_plan = self._device_plan_for(training)
        if device_plan is not None:
            plan, device_pools = device_plan
            resident_step = self._resident_step_fn
            step_source: Any = ((s, None) for s in range(first_step, num_steps))
        else:
            step_source = enumerate(training, start=first_step)

        pending: List[Tuple[float, float, Any]] = []
        last_m = np.zeros(6, np.float32)

        def flush_pending() -> None:
            nonlocal last_m
            if not pending:
                return
            # ONE device stack + ONE fetch for the whole window: fetching the
            # per-step metric arrays individually measured ~22 ms each through
            # the remote tunnel (88% of resident-path step time, profiled)
            if len(pending) == 1:
                stacked = np.asarray(pending[0][2])[None]
            else:
                stacked = np.asarray(jnp.stack([p[2] for p in pending]))
            for (p_lr, p_nw, _), m in zip(pending, stacked):
                last_m = m
                history["learning_rate"].append(p_lr)
                history["negative_weight"].append(p_nw)
                did_step = bool(m[4] > 0)
                if did_step or not history["loss"]:
                    history["loss"].append(float(m[0]))
                    history["recall"].append(float(m[2]))
                    history["false_positive_rate"].append(float(m[3]))
                else:
                    history["loss"].append(history["loss"][-1])
                    history["recall"].append(history["recall"][-1])
                    history["false_positive_rate"].append(history["false_positive_rate"][-1])
                history["high_loss_rate"].append(float(m[1]))
            pending.clear()

        for step, host_batch in step_source:
            if step >= num_steps:
                break
            lr = get_learning_rate(
                step,
                warmup_steps=warmup_steps,
                hold_steps=hold_steps,
                total_steps=num_steps,
                target_learning_rate=learning_rate,
            )
            if isinstance(negative_weight_schedule, (float, int)):
                neg_weight = float(negative_weight_schedule)
            elif step < len(negative_weight_schedule):
                neg_weight = float(negative_weight_schedule[step])
            else:
                neg_weight = float(negative_weight_schedule[-1])

            # numpy scalars ride along with the step dispatch; eager jnp
            # conversions or a host-side fold_in would each be their own
            # ~3.3 ms device round trip (PERF.md dispatch tax)
            step_np = np.int32(step)
            lr_np = np.float32(lr)
            nw_np = np.float32(neg_weight)
            if device_plan is None:
                x, y = self._device_put_batch(*host_batch)
                params, opt_state, carry, metrics = train_step(
                    params, opt_state, carry, x, y, base_rng, step_np, lr_np, nw_np
                )
            else:
                idxs = plan.sample()
                y = self._resident_labels(plan.counts(), plan.labels)
                params, opt_state, carry, metrics = resident_step(
                    params, opt_state, carry, device_pools, idxs, y, base_rng,
                    step_np, lr_np, nw_np,
                )
            pending.append((lr, neg_weight, metrics))

            ran_eval = step > 0 and step % validation_steps == 0
            boundary = (
                device_plan is None
                or ran_eval
                or step % log_every == 0
                or step == num_steps - 1
                or (step > 0 and step % checkpoint_steps == 0)
                or (
                    log_callback is not None
                    and (step == 0 or step % logging_steps == 0)
                )
            )
            if boundary:
                flush_pending()
            m = last_m
            if ran_eval and has_validation:
                val = self._run_eval(
                    eval_fn,
                    params,
                    validation,
                    gate_consecutive=validation_gate_consecutive,
                    gate_debounce_windows=validation_gate_debounce_windows,
                    gate_threshold=activation_threshold,
                )
                # Pooled false accepts per hour of negative audio: per-clip
                # FPs over disjoint-clip hours PLUS deployment-gated fire
                # events over true stream hours (see _run_eval).
                hours = val["n_neg"] * CLIP_SECONDS / 3600.0 + val["stream_hours"]
                fp_per_hour = (val["fp"] + val["gated_fp"]) / max(hours, 1e-9)
                val_recall = val["tp"] / max(val["tp"] + val["fn"], 1.0)
                if (
                    negative_weight_adjust_ratio is not None
                    and not quantum_warned
                    and hours > 0
                    and 1.0 / hours > target_false_positive_rate
                ):
                    quantum_warned = True
                    need_hours = 1.0 / target_false_positive_rate
                    logger.warning(
                        f"validation set spans {hours:.2f} negative-hours, so ONE "
                        f"false accept already measures "
                        f"{1.0 / hours:.2f} fp/hr > the {target_false_positive_rate} "
                        f"target: the negative-weight controller can only settle at "
                        f"ZERO validation FPs, which over-weights negatives and "
                        f"raises FRR. Provide >= {need_hours:.2f} negative-hours "
                        f"({int(need_hours * 3600.0 / CLIP_SECONDS) + 1} disjoint "
                        f"clips, or the stream-window equivalent at the runtime "
                        f"stride) to resolve the target."
                    )
                history["validation_false_positive_per_hour"].append(fp_per_hour)
                history["validation_recall"].append(val_recall)
                if negative_weight_adjust_ratio is not None:
                    assert isinstance(negative_weight_schedule, (float, int)), (
                        "Dynamic negative weight requires a scalar schedule"
                    )
                    negative_weight_schedule = adjust_negative_weight(
                        float(negative_weight_schedule),
                        fp_per_hour,
                        target_false_positive_rate,
                        negative_weight_adjust_ratio,
                    )
            elif has_validation and history["validation_false_positive_per_hour"]:
                history["validation_false_positive_per_hour"].append(
                    history["validation_false_positive_per_hour"][-1]
                )
                history["validation_recall"].append(history["validation_recall"][-1])
            elif has_validation:
                history["validation_false_positive_per_hour"].append(0.0)
                history["validation_recall"].append(0.0)

            if ran_eval and has_testing:
                test = self._run_eval(
                    eval_fn,
                    params,
                    testing,
                    gate_consecutive=validation_gate_consecutive,
                    gate_debounce_windows=validation_gate_debounce_windows,
                    gate_threshold=activation_threshold,
                )
                total = test["tp"] + test["fn"] + test["fp"] + test["tn"]
                history["testing_accuracy"].append((test["tp"] + test["tn"]) / max(total, 1.0))
                history["testing_recall"].append(test["tp"] / max(test["tp"] + test["fn"], 1.0))
                history["testing_false_positive_rate"].append(test["fp"] / max(test["n_neg"], 1.0))
            elif has_testing and history["testing_accuracy"]:
                for k in ("testing_accuracy", "testing_recall", "testing_false_positive_rate"):
                    history[k].append(history[k][-1])
            elif has_testing:
                for k in ("testing_accuracy", "testing_recall", "testing_false_positive_rate"):
                    history[k].append(0.0)

            if step > 0 and step % checkpoint_steps == 0:
                self.model.params = jax.device_get(params)
                # device_get: train_step donates its opt_state argument, so a
                # live device reference stored here is deleted on the next
                # step — an exception after that would make save_checkpoint
                # fail on deleted arrays.
                self.opt_state = jax.device_get(opt_state)
                self.save_checkpoint(f"{name}_{step}", step=step)

            if log_callback is not None and (
                step == 0 or step % logging_steps == 0 or ran_eval or step == num_steps - 1
            ):
                log_callback(step, {k: v[-1] for k, v in history.items() if v})

            if step % log_every == 0:
                logger.info(
                    f"{description} step {step}/{num_steps}: loss={history['loss'][-1]:.5f} "
                    f"recall={history['recall'][-1]:.3f} fp={history['false_positive_rate'][-1]:.4f} "
                    f"hard={float(m[1]):.3f} lr={lr:.2e} nw={neg_weight:g}"
                )

        flush_pending()
        self.model.params = jax.device_get(params)
        self.opt_state = jax.device_get(opt_state)
        logger.info(f"{description} finished in {human_duration(time.perf_counter() - epoch_start)}")
        return {k: np.asarray(v, dtype=np.float64) for k, v in history.items()}

    def _run_eval(
        self,
        eval_fn: Callable[..., Any],
        params: Params,
        dataset: DatasetType,
        gate_consecutive: int = 1,
        gate_debounce_windows: int = 16,
        gate_threshold: float = 0.5,
    ) -> Dict[str, float]:
        """Aggregate eval counts over a validation/testing dataset.

        Clip sources (independent 1.44 s negatives/positives) contribute the
        usual confusion counts. Negative sources tagged with
        ``stream_stride_seconds`` (temporally-ordered sliding windows of a
        continuous stream — ``features.get_stream_window_features``) are
        instead scored IN ORDER and gated exactly like the deployed runtime
        (``runtime/detection.ConsecutiveGate``): they contribute
        ``gated_fp`` fire events and ``stream_hours`` of true stream time,
        not per-window clip counts — 7,500 overlapping windows at the 0.12 s
        runtime stride are 15 minutes of audio, not 3 hours of clips, and a
        sustained false accept is ONE deployed false wake, not 12 window hits.
        Gate-aware counting requires the HBM-resident plan (pools preserve
        row order); the streamed fallback shuffles sources together and keeps
        per-clip semantics for everything.
        """
        totals = {
            "fp": 0.0, "tp": 0.0, "fn": 0.0, "tn": 0.0, "n_neg": 0.0,
            "gated_fp": 0.0, "stream_hours": 0.0,
        }
        resident = self._device_plan_for(dataset)
        if resident is not None:
            # HBM-resident eval: score each source pool exactly once per eval
            # in ONE dispatch per source. The streamed path below hauls the
            # whole set through host-assembled batches every eval (~6.5 MB and
            # a dispatch per batch; at the reference default validation scale
            # that is 500+ batches ≈ 4 min per eval through the remote tunnel
            # — it dominated end-to-end training wall-clock 60x over the
            # steps themselves). Exact single-pass counts also remove the
            # wraparound resampling noise from fp_per_hour's denominator.
            plan, pools = resident
            from heybuddy_tpu.runtime.detection import count_detections

            for (ds, label), pool in zip(plan.sources, pools):
                stride = getattr(ds, "stream_stride_seconds", None)
                if stride and label == 0.0:
                    if self._preds_fn is None:
                        self._preds_fn = self._build_preds()
                    preds = np.asarray(self._preds_fn(params, pool))
                    totals["gated_fp"] += float(
                        count_detections(
                            preds,
                            gate_threshold,
                            consecutive=gate_consecutive,
                            debounce_windows=gate_debounce_windows,
                        )
                    )
                    totals["stream_hours"] += pool.shape[0] * stride / 3600.0
                    continue
                key = (int(pool.shape[0]), float(label))
                y = self._eval_labels.get(key)
                if y is None:
                    y = jnp.full((pool.shape[0],), label, dtype=jnp.float32)
                    self._eval_labels[key] = y
                out = jax.device_get(eval_fn(params, pool, y))
                for k in ("fp", "tp", "fn", "tn", "n_neg"):
                    totals[k] += float(out[k])
            return totals
        for x_np, y_np in dataset:
            x, y = self._device_put_batch(x_np, y_np)
            out = eval_fn(params, x, y)
            for k in ("fp", "tp", "fn", "tn", "n_neg"):
                totals[k] += float(out[k])
        return totals

    # --- multi-stage driver -----------------------------------------------------------

    def __call__(
        self,
        training: DatasetType,
        validation: Optional[DatasetType] = None,
        testing: Optional[DatasetType] = None,
        num_steps: int = DEFAULT_STEPS,
        num_stages: int = DEFAULT_STAGES,
        max_negative_weight: float = DEFAULT_NEGATIVE_WEIGHT,
        logging_steps: int = DEFAULT_LOGGING_STEPS,
        validation_steps: int = DEFAULT_VALIDATION_STEPS,
        checkpoint_steps: int = DEFAULT_CHECKPOINT_STEPS,
        target_false_positive_rate: float = DEFAULT_TARGET_FALSE_POSITIVE_RATE,
        validation_gate_consecutive: int = 1,
        validation_gate_debounce_windows: int = 16,
        negative_weight_adjust_ratio: float = DEFAULT_NEGATIVE_WEIGHT_ADJUST_RATIO,
        dynamic_negative_weight: bool = DEFAULT_DYNAMIC_NEGATIVE_WEIGHT,
        batch_size_adjust_ratio: float = DEFAULT_BATCH_SIZE_ADJUST_RATIO,
        learning_rate_adjust_ratio: float = DEFAULT_LEARNING_RATE_ADJUST_RATIO,
        step_adjust_ratio: float = DEFAULT_STEP_ADJUST_RATIO,
        learning_rate: float = DEFAULT_LEARNING_RATE,
        high_loss_threshold: float = DEFAULT_HIGH_LOSS_THRESHOLD,
        activation_threshold: float = DEFAULT_ACTIVATION_THRESHOLD,
        wandb_entity: Optional[str] = None,
        name: str = "heybuddy",
        graph_dir: Optional[str] = None,
    ) -> Dict[str, np.ndarray]:
        start_time = time.perf_counter()
        overall: Dict[str, List[np.ndarray]] = {}

        for ds in (training, validation, testing):
            if ds is None or not hasattr(ds, "start"):
                continue
            if self._device_plan_for(ds) is not None:
                # HBM-resident data: steps/evals gather rows on device, so the
                # producer threads (and their ~100-batch host queue) would
                # only burn RAM assembling batches nobody consumes
                continue
            ds.start()

        wandb_run = self._maybe_init_wandb(wandb_entity, name, locals())
        log_callback = None
        if wandb_run is not None:
            log_callback = lambda step, details: wandb_run.log(details)  # noqa: E731

        if self.resumed_negative_weight:
            max_negative_weight = self.resumed_negative_weight

        if self.start_stage and hasattr(training, "multiply_batch_size"):
            # Resuming at stage N: the completed stages' batch-size halvings
            # happened in the previous process, so re-apply them — LR/steps
            # are recomputed per stage below, but batch size is cumulative
            # dataset state and would otherwise stay at the stage-0 size.
            training.multiply_batch_size(batch_size_adjust_ratio ** self.start_stage)

        for stage in range(self.start_stage, num_stages):
            stage_learning_rate = learning_rate * (learning_rate_adjust_ratio ** stage)
            stage_steps = num_steps
            for _ in range(stage):
                stage_steps = max(validation_steps, int(stage_steps * step_adjust_ratio))
            if dynamic_negative_weight:
                weights: Union[float, List[float]] = max_negative_weight
                adjust: Optional[float] = negative_weight_adjust_ratio
            else:
                weights = np.linspace(1, max_negative_weight, stage_steps).tolist()
                adjust = None

            logger.info(
                f"=== Stage {stage + 1}/{num_stages}: {stage_steps} steps, "
                f"lr={stage_learning_rate:.2e}, negative_weight={max_negative_weight:g} ==="
            )
            history = self.train_epoch(
                training,
                validation=validation,
                testing=testing,
                num_steps=stage_steps,
                negative_weight_schedule=weights,
                negative_weight_adjust_ratio=adjust,
                target_false_positive_rate=target_false_positive_rate,
                validation_gate_consecutive=validation_gate_consecutive,
                validation_gate_debounce_windows=validation_gate_debounce_windows,
                learning_rate=stage_learning_rate,
                warmup_steps=stage_steps // 5,
                hold_steps=stage_steps // 3,
                logging_steps=logging_steps,
                validation_steps=validation_steps,
                checkpoint_steps=checkpoint_steps,
                description=f"Training Stage {stage + 1}",
                high_loss_threshold=high_loss_threshold,
                activation_threshold=activation_threshold,
                name=f"{name}_{stage}",
                log_callback=log_callback,
            )
            for key, series in history.items():
                overall.setdefault(key, []).append(series)

            if dynamic_negative_weight and history["negative_weight"].size:
                max_negative_weight = float(history["negative_weight"][-1])
            if hasattr(training, "multiply_batch_size"):
                training.multiply_batch_size(batch_size_adjust_ratio)
            self.start_stage = stage + 1
            self.resumed_negative_weight = max_negative_weight

        merged = {k: np.concatenate(v) if v else np.array([]) for k, v in overall.items()}
        total_duration = time.perf_counter() - start_time
        logger.info(f"Training overall duration: {human_duration(total_duration)}")
        self.log_metrics(merged, description="Training Overall")
        self.graph_metrics(merged, name=name, directory=graph_dir or self.checkpoint_dir)
        self.save_checkpoint(f"{name}_final")
        if wandb_run is not None:
            wandb_run.finish()

        for ds in (training, validation, testing):
            if ds is not None and hasattr(ds, "stop"):
                ds.stop()
        return merged

    # --- logging / graphs --------------------------------------------------------------

    @staticmethod
    def _maybe_init_wandb(entity: Optional[str], name: str, config: Dict[str, Any]) -> Any:
        if entity is None:
            return None
        try:
            import wandb  # type: ignore[import-not-found]
        except ImportError:
            logger.warning("wandb requested but not installed; skipping")
            return None
        safe_config = {
            k: v
            for k, v in config.items()
            if isinstance(v, (int, float, str, bool, type(None)))
        }
        return wandb.init(project=f"hey-buddy-{name}", entity=entity, config=safe_config)

    def log_metrics(self, metrics: Dict[str, np.ndarray], description: str = "Training") -> None:
        for key, series in metrics.items():
            if series.size == 0:
                continue
            logger.info(
                f"{description} {key}: start={series[0]:.5f} end={series[-1]:.5f} "
                f"min={series.min():.5f} max={series.max():.5f} mean={series.mean():.5f}"
            )

    def graph_metrics(
        self, metrics: Dict[str, np.ndarray], name: str, directory: str
    ) -> Optional[str]:
        """Multi-panel metric summary PNG (reference trainer.py:648-762)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            logger.warning("matplotlib unavailable; skipping metric graphs")
            return None
        panels = [(k, v) for k, v in metrics.items() if v.size > 0]
        if not panels:
            return None
        cols = 3
        rows = (len(panels) + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3 * rows), squeeze=False)
        for i, (key, series) in enumerate(panels):
            ax = axes[i // cols][i % cols]
            ax.plot(series, linewidth=0.8)
            ax.set_title(key.replace("_", " "))
            ax.grid(True, alpha=0.3)
        for j in range(len(panels), rows * cols):
            axes[j // cols][j % cols].axis("off")
        fig.tight_layout()
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"{name}_metrics.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        logger.info(f"Saved metric graphs to {path}")
        return path
