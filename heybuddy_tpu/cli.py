"""
The ``heybuddy`` command-line interface.

Surface parity with reference ``__main__.py``: ``heybuddy {extract, combine,
train, predict, listen, convert}`` with the same argument/option names for the
core workflow. Implementation is TPU-native throughout (jitted featurization,
device augmentation, mesh-sharded training).
"""

from __future__ import annotations

import glob
import os
from typing import Any, List, Optional, Tuple

import click
import numpy as np

from heybuddy_tpu.constants import *  # noqa: F401,F403
from heybuddy_tpu.utils.log import debug_logger, logger

from heybuddy_tpu.constants import (
    DEFAULT_ACTIVATION_THRESHOLD,
    DEFAULT_ADVERSARIAL_BATCH_SIZE,
    DEFAULT_ADVERSARIAL_PHRASES,
    DEFAULT_ADVERSARIAL_SAMPLES,
    DEFAULT_ARCHITECTURE,
    DEFAULT_AUGMENT_BACKGROUND_NOISE_MAX_SNR_DB,
    DEFAULT_AUGMENT_BACKGROUND_NOISE_MIN_SNR_DB,
    DEFAULT_AUGMENT_BACKGROUND_NOISE_PROB,
    DEFAULT_AUGMENT_BAND_STOP_PROB,
    DEFAULT_AUGMENT_COLORED_NOISE_MAX_F_DECAY,
    DEFAULT_AUGMENT_COLORED_NOISE_MAX_SNR_DB,
    DEFAULT_AUGMENT_COLORED_NOISE_MIN_F_DECAY,
    DEFAULT_AUGMENT_COLORED_NOISE_MIN_SNR_DB,
    DEFAULT_AUGMENT_COLORED_NOISE_PROB,
    DEFAULT_AUGMENT_GAIN_PROB,
    DEFAULT_AUGMENT_PHRASE_PROB,
    DEFAULT_AUGMENT_PITCH_SHIFT_PROB,
    DEFAULT_AUGMENT_PITCH_SHIFT_SEMITONES,
    DEFAULT_AUGMENT_REVERB_PROB,
    DEFAULT_AUGMENT_SEVEN_BAND_GAIN_DB,
    DEFAULT_AUGMENT_SEVEN_BAND_PROB,
    DEFAULT_AUGMENT_TANH_DISTORTION_PROB,
    DEFAULT_AUGMENT_TANH_MAX_DISTORTION,
    DEFAULT_AUGMENT_TANH_MIN_DISTORTION,
    DEFAULT_BATCH_THREADS,
    DEFAULT_CHECKPOINT_STEPS,
    DEFAULT_HEADS,
    DEFAULT_HIGH_LOSS_THRESHOLD,
    DEFAULT_LAYER_DIM,
    DEFAULT_LAYERS,
    DEFAULT_LEARNING_RATE,
    DEFAULT_LISTEN_BUFFER_SIZE,
    DEFAULT_LOGGING_STEPS,
    DEFAULT_NEGATIVE_BATCH_SIZE,
    DEFAULT_NEGATIVE_WEIGHT,
    DEFAULT_POSITIVE_BATCH_SIZE,
    DEFAULT_POSITIVE_SAMPLES,
    DEFAULT_STAGES,
    DEFAULT_STEPS,
    DEFAULT_TARGET_FALSE_POSITIVE_RATE,
    DEFAULT_TESTING_ADVERSARIAL_SAMPLES,
    DEFAULT_TESTING_POSITIVE_SAMPLES,
    DEFAULT_USE_GATING,
    DEFAULT_USE_HALF_LAYERS,
    DEFAULT_VALIDATION_NEGATIVE_BATCH_SIZE,
    DEFAULT_VALIDATION_POSITIVE_BATCH_SIZE,
    DEFAULT_VALIDATION_SAMPLES,
    DEFAULT_VALIDATION_STEPS,
    SAMPLE_RATE,
)


def _pin_platform() -> None:
    """HEYBUDDY_PLATFORM=cpu pins the backend before first device use.

    Needed where a site plugin overrides the JAX_PLATFORMS env var (e.g. to
    a single remote TPU tunnel another process may hold). Must not be
    best-effort: silently falling through to the contended backend is the
    exact failure this exists to avoid, so a failed pin warns loudly.
    """
    platform = os.environ.get("HEYBUDDY_PLATFORM")
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except Exception as ex:
        from heybuddy_tpu.utils.log import logger

        logger.warning(
            f"HEYBUDDY_PLATFORM={platform} could not be applied ({ex}); "
            "the process will use the default JAX backend."
        )


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations (first TPU compile of
    the featurizer/train step can take minutes on remote-compile backends).
    Best-effort: a missing/readonly cache dir only costs compile time."""
    try:
        import jax

        from heybuddy_tpu.utils.downloads import get_cache_dir

        jax.config.update("jax_compilation_cache_dir", get_cache_dir("xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@click.group(name="heybuddy")
def main() -> None:
    """heybuddy-tpu: TPU-native wake-word training and deployment."""
    _pin_platform()
    _enable_compilation_cache()


# --------------------------------------------------------------------- extract


@main.command()
@click.argument("name", type=str, nargs=1)
@click.argument("repo_id", type=str, nargs=1)
@click.option("--directory", default=None, help="Directory to save the embeddings to.")
@click.option("--config", type=str, default=None, help="Dataset configuration name.")
@click.option("--split", type=str, default="train", show_default=True)
@click.option("--audio-key", type=str, default="audio", show_default=True)
@click.option("--audio-array-key", type=str, default="array", show_default=True)
@click.option("--audio-sample-rate-key", type=str, default="sampling_rate", show_default=True)
@click.option("--transcript-key", type=str, default="transcript", show_default=True)
@click.option("--streaming/--no-streaming", default=True, is_flag=True, show_default=True)
@click.option("--trust-remote-code/--no-trust-remote-code", default=False, is_flag=True)
@click.option("--hours", type=float, default=1000.0, show_default=True)
@click.option("--samples-per-file", type=int, default=10000, show_default=True)
@click.option("--process-batch-size", default=100, show_default=True)
@click.option("--tokenizer-max-length", default=96, show_default=True)
@click.option("--local-files", is_flag=True, default=False,
              help="Treat REPO_ID as a glob of local wav files instead of a HF dataset.")
@click.option("--mesh/--no-mesh", "use_mesh", default=False, is_flag=True, show_default=True,
              help="Shard featurization batches over the full device mesh "
                   "(data parallel); single-device runs are unaffected.")
@click.option("--debug/--no-debug", default=False, is_flag=True)
def extract(
    name: str,
    repo_id: str,
    directory: Optional[str],
    config: Optional[str],
    split: str,
    audio_key: str,
    audio_array_key: str,
    audio_sample_rate_key: str,
    transcript_key: str,
    streaming: bool,
    trust_remote_code: bool,
    hours: float,
    samples_per_file: int,
    process_batch_size: int,
    tokenizer_max_length: int,
    local_files: bool,
    use_mesh: bool,
    debug: bool,
) -> None:
    """Extract labeled negative-feature shards from an audio dataset."""
    from heybuddy_tpu.data.extract import LabeledFeatureExtractor, iter_hf_dataset, iter_wav_files
    from heybuddy_tpu.data.precalculated import get_default_dataset_dir

    with _debug(debug):
        mesh = None
        if use_mesh:
            from heybuddy_tpu.parallel.mesh import get_mesh

            mesh = get_mesh()
            logger.info(f"Extracting over mesh: {mesh}")
        extractor = LabeledFeatureExtractor(
            directory=directory or get_default_dataset_dir(),
            name=name,
            samples_per_file=samples_per_file,
            process_batch_size=process_batch_size,
            tokenizer_max_length=tokenizer_max_length,
            mesh=mesh,
        )
        if local_files:
            source = iter_wav_files(sorted(glob.glob(repo_id)))
        else:
            source = iter_hf_dataset(
                repo_id,
                config=config,
                split=split,
                streaming=streaming,
                audio_key=audio_key,
                audio_array_key=audio_array_key,
                audio_sample_rate_key=audio_sample_rate_key,
                transcript_key=transcript_key,
                trust_remote_code=trust_remote_code,
            )
        paths = extractor(source, max_hours=hours)
        click.echo(f"Wrote {len(paths)} shard(s):")
        for path in paths:
            click.echo(f"  {path}")


# --------------------------------------------------------------------- combine


@main.command()
@click.argument("source", type=str, nargs=-1)
@click.argument("target", type=str, nargs=1)
@click.option("--directory", default=None, help="Directory containing the shards.")
@click.option("--reset/--no-reset", default=True, is_flag=True)
@click.option("--half/--no-half", default=False, is_flag=True, show_default=True)
@click.option("--delete/--no-delete", default=False, is_flag=True)
@click.option("--batch-size", default=10000, show_default=True,
              help="Rows copied per append.")
@click.option("--debug/--no-debug", default=False, is_flag=True)
def combine(
    source: Tuple[str, ...],
    target: str,
    directory: Optional[str],
    reset: bool,
    half: bool,
    delete: bool,
    batch_size: int,
    debug: bool,
) -> None:
    """Merge feature shards into one appendable .npy (reference __main__.py:121-169)."""
    from heybuddy_tpu.data.precalculated import get_default_dataset_dir
    from heybuddy_tpu.utils.npy import AppendableNpyFile

    with _debug(debug):
        directory = directory or get_default_dataset_dir()
        target_path = target if target.endswith(".npy") else os.path.join(directory, f"{target}.npy")
        if reset and os.path.exists(target_path):
            os.remove(target_path)
        store = AppendableNpyFile(target_path)
        sources: List[str] = []
        for pattern in source:
            if os.path.exists(pattern):
                sources.append(pattern)
            else:
                sources.extend(sorted(glob.glob(pattern)))
                sources.extend(sorted(glob.glob(os.path.join(directory, pattern))))
        if not sources:
            raise click.ClickException("No source shards found")
        total = 0
        for path in sources:
            shard = np.load(path, mmap_mode="r")
            for start in range(0, shard.shape[0], batch_size):
                rows = np.asarray(shard[start : start + batch_size])
                if half:
                    rows = rows.astype(np.float16)
                store.append(rows)
                total += rows.shape[0]
            if delete:
                os.remove(path)
        click.echo(f"Combined {total} rows from {len(sources)} shard(s) into {target_path}")


# ----------------------------------------------------------------------- train


@main.command()
@click.argument("phrase", type=str, nargs=1)
@click.option("--additional-phrase", type=str, default=None, multiple=True)
@click.option("--wandb-entity", type=str, default=None)
@click.option("--perceptron", "architecture", flag_value="perceptron",
              default=True)
@click.option("--transformer", "architecture", flag_value="transformer")
@click.option("--use-half-layers/--no-use-half-layers", default=DEFAULT_USE_HALF_LAYERS, is_flag=True)
@click.option("--use-gating/--no-use-gating", default=DEFAULT_USE_GATING, is_flag=True)
@click.option("--layer-dim", type=int, default=DEFAULT_LAYER_DIM, show_default=True)
@click.option("--num-layers", type=int, default=DEFAULT_LAYERS, show_default=True)
@click.option("--num-heads", type=int, default=DEFAULT_HEADS, show_default=True)
@click.option("--steps", type=int, default=DEFAULT_STEPS, show_default=True)
@click.option("--stages", type=int, default=DEFAULT_STAGES, show_default=True)
@click.option("--threshold", type=float, default=DEFAULT_ACTIVATION_THRESHOLD, show_default=True)
@click.option("--learning-rate", type=float, default=DEFAULT_LEARNING_RATE, show_default=True)
@click.option("--high-loss-threshold", type=float, default=DEFAULT_HIGH_LOSS_THRESHOLD, show_default=True)
@click.option("--target-false-positive-rate", type=float,
              default=DEFAULT_TARGET_FALSE_POSITIVE_RATE, show_default=True)
@click.option("--validation-gate-consecutive", type=int, default=1, show_default=True,
              help="Gate stream-window validation negatives like the deployed "
                   "runtime: count a false accept only after this many "
                   "consecutive windows score above threshold (1 = the "
                   "reference's single-window firing). Applies to validation "
                   "sources tagged as ordered stream windows.")
@click.option("--dynamic-negative-weight/--no-dynamic-negative-weight", default=True, is_flag=True)
@click.option("--negative-weight", type=float, default=DEFAULT_NEGATIVE_WEIGHT, show_default=True)
@click.option("--training-large-default-dataset", "training_default_size", flag_value="large")
@click.option("--training-medium-default-dataset", "training_default_size", flag_value="medium",
              default=True)
@click.option("--training-no-default-dataset", "training_default_size", flag_value="none")
@click.option("--training-dataset", type=click.Path(exists=True, dir_okay=False), default=None)
@click.option("--augment-phrase-prob", type=float, default=DEFAULT_AUGMENT_PHRASE_PROB)
@click.option("--augmentation-seven-band-prob", type=float, default=DEFAULT_AUGMENT_SEVEN_BAND_PROB)
@click.option("--augmentation-seven-band-gain-db", type=float, default=DEFAULT_AUGMENT_SEVEN_BAND_GAIN_DB)
@click.option("--augmentation-tanh-distortion-prob", type=float, default=DEFAULT_AUGMENT_TANH_DISTORTION_PROB)
@click.option("--augmentation-tanh-distortion-min", type=float, default=DEFAULT_AUGMENT_TANH_MIN_DISTORTION)
@click.option("--augmentation-tanh-distortion-max", type=float, default=DEFAULT_AUGMENT_TANH_MAX_DISTORTION)
@click.option("--augmentation-pitch-shift-prob", type=float, default=DEFAULT_AUGMENT_PITCH_SHIFT_PROB)
@click.option("--augmentation-pitch-shift-semitones", type=int, default=DEFAULT_AUGMENT_PITCH_SHIFT_SEMITONES)
@click.option("--augmentation-band-stop-prob", type=float, default=DEFAULT_AUGMENT_BAND_STOP_PROB)
@click.option("--augmentation-colored-noise-prob", type=float, default=DEFAULT_AUGMENT_COLORED_NOISE_PROB)
@click.option("--augmentation-colored-noise-min-snr-db", type=float, default=DEFAULT_AUGMENT_COLORED_NOISE_MIN_SNR_DB)
@click.option("--augmentation-colored-noise-max-snr-db", type=float, default=DEFAULT_AUGMENT_COLORED_NOISE_MAX_SNR_DB)
@click.option("--augmentation-colored-noise-min-f-decay", type=float, default=DEFAULT_AUGMENT_COLORED_NOISE_MIN_F_DECAY)
@click.option("--augmentation-colored-noise-max-f-decay", type=float, default=DEFAULT_AUGMENT_COLORED_NOISE_MAX_F_DECAY)
@click.option("--augmentation-background-noise-prob", type=float, default=DEFAULT_AUGMENT_BACKGROUND_NOISE_PROB)
@click.option("--augmentation-background-noise-min-snr-db", type=float, default=DEFAULT_AUGMENT_BACKGROUND_NOISE_MIN_SNR_DB)
@click.option("--augmentation-background-noise-max-snr-db", type=float, default=DEFAULT_AUGMENT_BACKGROUND_NOISE_MAX_SNR_DB)
@click.option("--augmentation-gain-prob", type=float, default=DEFAULT_AUGMENT_GAIN_PROB)
@click.option("--augmentation-reverb-prob", type=float, default=DEFAULT_AUGMENT_REVERB_PROB)
@click.option("--logging-steps", type=int, default=DEFAULT_LOGGING_STEPS)
@click.option("--validation-steps", type=int, default=DEFAULT_VALIDATION_STEPS)
@click.option("--checkpoint-steps", type=int, default=DEFAULT_CHECKPOINT_STEPS)
@click.option("--positive-samples", type=int, default=DEFAULT_POSITIVE_SAMPLES)
@click.option("--adversarial-samples", type=int, default=DEFAULT_ADVERSARIAL_SAMPLES)
@click.option("--adversarial-phrases", type=int, default=DEFAULT_ADVERSARIAL_PHRASES)
@click.option("--adversarial-phrase-custom", type=str, default=None, multiple=True)
@click.option("--prefix-negative-phrases", type=int, default=0, show_default=True,
              help="Auto-derive this many PREFIX-negative texts (the wake phrase's "
                   "exact onset continuing into non-target words, e.g. 'hey budget "
                   "...' for 'hey buddy') and add them to the adversarial text pool. "
                   "A causal sliding window hears the onset before the completion; "
                   "these teach it not to fire on the prefix alone.")
@click.option("--collision-swap-phrases", type=int, default=0, show_default=True,
              help="Auto-derive this many SINGLE-SWAP collision texts (exactly one "
                   "word of the wake phrase replaced by a phonetic neighbor: 'hate "
                   "buddy', 'hey buddies') and add them to the adversarial text "
                   "pool. The generic generator swaps words independently, so this "
                   "maximal-overlap class — where measured false-accept mass "
                   "concentrates — is otherwise under-represented.")
@click.option("--collision-swap-depth", type=int, default=1, show_default=True,
              help="Maximum words swapped per collision text. 2 interleaves DOUBLE "
                   "swaps ('hate buddies', 'hate bully') with the singles — the "
                   "class measured false-accept mass moves to once single swaps "
                   "are trained.")
@click.option("--positive-batch-size", type=int, default=DEFAULT_POSITIVE_BATCH_SIZE)
@click.option("--negative-batch-size", type=int, default=DEFAULT_NEGATIVE_BATCH_SIZE)
@click.option("--synthetic-negative-samples", type=int, default=0, show_default=True,
              help="Synthesize this many ordinary-speech negatives (offline substitute "
                   "for the hosted precalculated negative sets).")
@click.option("--partial-samples", type=int, default=0, show_default=True,
              help="Generate this many sliding-offset PARTIAL views of the wake phrase "
                   "as hard negatives (teaches the window-edge behavior the runtime's "
                   "sliding window sees; fixes partial-phrase false accepts).")
@click.option("--partial-batch-size", type=int, default=DEFAULT_PARTIAL_BATCH_SIZE)
@click.option("--stream-negative-samples", type=int, default=0, show_default=True,
              help="Generate this many sliding-window negatives from continuous "
                   "speech/adversarial streams (the distribution the deployed runtime "
                   "scores; cuts false wakes per hour).")
@click.option("--collision-negative-samples", type=int, default=0, show_default=True,
              help="Generate this many sliding-window negatives from collision-salad "
                   "streams (near-collision words inside word salads - the measured "
                   "residual stream false-positive surface).")
@click.option("--clean-positive-samples", type=int, default=0, show_default=True,
              help="Add this many UNAUGMENTED positives (centered and at random "
                   "window offsets) — quiet-room recall coverage the augment "
                   "chain cannot provide.")
@click.option("--reverb-positive-samples", type=int, default=0, show_default=True,
              help="Add this many REVERB-ONLY positives (guaranteed reverb + "
                   "mid-SNR noise, no other distortion) — dedicated coverage for "
                   "the reverberated-but-otherwise-clear mode the stacked augment "
                   "chain rarely emits in isolation.")
@click.option("--adversarial-batch-size", type=int, default=DEFAULT_ADVERSARIAL_BATCH_SIZE)
@click.option("--num-batch-threads", type=int, default=DEFAULT_BATCH_THREADS)
@click.option("--validation-positive-batch-size", type=int, default=DEFAULT_VALIDATION_POSITIVE_BATCH_SIZE)
@click.option("--validation-negative-batch-size", type=int, default=DEFAULT_VALIDATION_NEGATIVE_BATCH_SIZE)
@click.option("--validation-samples", type=int, default=DEFAULT_VALIDATION_SAMPLES)
@click.option("--validation-stream-negative-samples", type=int, default=0, show_default=True,
              help="Generate this many sliding-window stream negatives for the "
                   "validation set (disjoint seeds from the training stream). "
                   "Without hosted negative sets, validation otherwise has NO "
                   "negatives and the dynamic fp-per-hour controller never "
                   "engages in air-gapped runs.")
@click.option("--testing-positive-samples", type=int, default=DEFAULT_TESTING_POSITIVE_SAMPLES)
@click.option("--testing-adversarial-samples", type=int, default=DEFAULT_TESTING_ADVERSARIAL_SAMPLES)
@click.option("--checkpoint-dir", type=str, default="./checkpoints", show_default=True)
@click.option("--tts-backend", type=click.Choice(["vits", "formant", "formant-device"]), default=None,
              help="TTS backend override (default: vits when a checkpoint is configured).")
@click.option("--mesh/--no-mesh", "use_mesh", default=True, is_flag=True,
              help="Shard training batches across all visible accelerator chips.")
@click.option("--resume/--no-resume", default=False, is_flag=True)
@click.option("--debug/--no-debug", default=False, is_flag=True)
def train(phrase: str, **kwargs: Any) -> None:
    """Train a wake-word model for PHRASE end-to-end."""
    from heybuddy_tpu.data.precalculated import PrecalculatedDatasetIterator
    from heybuddy_tpu.data.training import WakeWordTrainingDatasetIterator
    from heybuddy_tpu.ops.augment import AugmentConfig
    from heybuddy_tpu.training.trainer import WakeWordTrainer

    debug = kwargs.pop("debug")
    with _debug(debug):
        augment_config = AugmentConfig(
            seven_band_prob=kwargs.pop("augmentation_seven_band_prob"),
            seven_band_gain_db=kwargs.pop("augmentation_seven_band_gain_db"),
            tanh_distortion_prob=kwargs.pop("augmentation_tanh_distortion_prob"),
            tanh_min_distortion=kwargs.pop("augmentation_tanh_distortion_min"),
            tanh_max_distortion=kwargs.pop("augmentation_tanh_distortion_max"),
            pitch_shift_prob=kwargs.pop("augmentation_pitch_shift_prob"),
            pitch_shift_semitones=kwargs.pop("augmentation_pitch_shift_semitones"),
            band_stop_prob=kwargs.pop("augmentation_band_stop_prob"),
            colored_noise_prob=kwargs.pop("augmentation_colored_noise_prob"),
            colored_noise_min_snr_db=kwargs.pop("augmentation_colored_noise_min_snr_db"),
            colored_noise_max_snr_db=kwargs.pop("augmentation_colored_noise_max_snr_db"),
            colored_noise_min_f_decay=kwargs.pop("augmentation_colored_noise_min_f_decay"),
            colored_noise_max_f_decay=kwargs.pop("augmentation_colored_noise_max_f_decay"),
            background_noise_prob=kwargs.pop("augmentation_background_noise_prob"),
            background_noise_min_snr_db=kwargs.pop("augmentation_background_noise_min_snr_db"),
            background_noise_max_snr_db=kwargs.pop("augmentation_background_noise_max_snr_db"),
            gain_prob=kwargs.pop("augmentation_gain_prob"),
            reverb_prob=kwargs.pop("augmentation_reverb_prob"),
        )

        phrases = [phrase] + list(kwargs.pop("additional_phrase") or [])
        phrase_arg: Any = phrases if len(phrases) > 1 else phrase

        custom_texts = list(kwargs.pop("adversarial_phrase_custom") or [])
        num_prefix_negatives = kwargs.pop("prefix_negative_phrases")
        if num_prefix_negatives:
            from heybuddy_tpu.text.adversarial import prefix_negative_texts

            prefix_texts = prefix_negative_texts(phrase, num_samples=num_prefix_negatives)
            logger.info(
                f"Prefix-negative pool: {len(prefix_texts)} texts "
                f"(e.g. {prefix_texts[:3]})"
            )
            custom_texts.extend(prefix_texts)
        num_collision_swaps = kwargs.pop("collision_swap_phrases")
        collision_swap_depth = kwargs.pop("collision_swap_depth")
        if num_collision_swaps:
            from heybuddy_tpu.text.adversarial import single_swap_collision_texts

            swap_texts = single_swap_collision_texts(
                phrase, num_samples=num_collision_swaps,
                max_swaps=collision_swap_depth,
            )
            logger.info(
                f"Swap-collision pool (depth<={collision_swap_depth}): "
                f"{len(swap_texts)} texts (e.g. {swap_texts[:3]})"
            )
            custom_texts.extend(swap_texts)

        feature_kwargs = dict(
            augment_config=augment_config,
            phrase_augment_prob=kwargs.pop("augment_phrase_prob"),
            custom_adversarial_texts=custom_texts or None,
            tts_backend=kwargs.pop("tts_backend"),
        )

        training_default_size = kwargs.pop("training_default_size") or "medium"
        training_dataset_path = kwargs.pop("training_dataset")
        negative_batch_size = kwargs.pop("negative_batch_size")
        if training_default_size == "none":
            # No hosted negative set at all — even when a custom
            # --training-dataset is supplied (it is appended separately below).
            negative_batch_size = 0

        training = WakeWordTrainingDatasetIterator.default(
            phrase_arg,
            positive_samples=kwargs.pop("positive_samples"),
            adversarial_samples=kwargs.pop("adversarial_samples"),
            adversarial_phrases=kwargs.pop("adversarial_phrases"),
            positive_batch_size=kwargs.pop("positive_batch_size"),
            adversarial_batch_size=kwargs.pop("adversarial_batch_size"),
            negative_batch_size=negative_batch_size,
            partial_samples=kwargs.pop("partial_samples"),
            partial_batch_size=kwargs.pop("partial_batch_size"),
            stream_negative_samples=kwargs.pop("stream_negative_samples"),
            collision_negative_samples=kwargs.pop("collision_negative_samples"),
            clean_positive_samples=kwargs.pop("clean_positive_samples"),
            reverb_positive_samples=kwargs.pop("reverb_positive_samples"),
            num_batch_threads=kwargs.pop("num_batch_threads"),
            large_negative_dataset=training_default_size in ("large", "full"),
            synthetic_negative_samples=kwargs.pop("synthetic_negative_samples"),
            **feature_kwargs,
        )
        if training_dataset_path is not None:
            custom = PrecalculatedDatasetIterator(
                os.path.splitext(os.path.basename(training_dataset_path))[0],
                directory=os.path.dirname(os.path.abspath(training_dataset_path)),
                labeled=np.load(training_dataset_path, mmap_mode="r").shape[1] == 17,
                exclude_phrase=phrase,
            )
            training.negative.append((custom, DEFAULT_NEGATIVE_BATCH_SIZE))

        validation_samples = kwargs.pop("validation_samples")
        validation_stream_negatives = kwargs.pop("validation_stream_negative_samples")
        validation = None
        if validation_samples > 0:
            validation = WakeWordTrainingDatasetIterator.validation(
                phrase_arg,
                validation_samples=validation_samples,
                positive_batch_size=kwargs.pop("validation_positive_batch_size"),
                negative_batch_size=kwargs.pop("validation_negative_batch_size"),
                stream_negative_samples=validation_stream_negatives,
                **feature_kwargs,
            )
        else:
            kwargs.pop("validation_positive_batch_size")
            kwargs.pop("validation_negative_batch_size")

        testing_positive = kwargs.pop("testing_positive_samples")
        testing_adversarial = kwargs.pop("testing_adversarial_samples")
        testing = None
        if testing_positive > 0 or testing_adversarial > 0:
            testing = WakeWordTrainingDatasetIterator.testing(
                phrase_arg,
                positive_samples=testing_positive,
                adversarial_samples=testing_adversarial,
                **feature_kwargs,
            )

        mesh = None
        if kwargs.pop("use_mesh"):
            import jax

            if jax.device_count() > 1:
                from heybuddy_tpu.parallel.mesh import get_mesh

                mesh = get_mesh()
                logger.info(f"Training over mesh: {mesh}")

        trainer = WakeWordTrainer(
            checkpoint_dir=kwargs.pop("checkpoint_dir"),
            learning_rate=kwargs["learning_rate"],
            architecture=kwargs.pop("architecture"),
            layer_dim=kwargs.pop("layer_dim"),
            num_layers=kwargs.pop("num_layers"),
            num_heads=kwargs.pop("num_heads"),
            use_gating=kwargs.pop("use_gating"),
            use_half_layers=kwargs.pop("use_half_layers"),
            mesh=mesh,
        )
        name = "-".join(phrase.split())
        if kwargs.pop("resume"):
            trainer.resume(name)

        trainer(
            training,
            validation=validation,
            testing=testing,
            num_steps=kwargs.pop("steps"),
            num_stages=kwargs.pop("stages"),
            max_negative_weight=kwargs.pop("negative_weight"),
            logging_steps=kwargs.pop("logging_steps"),
            validation_steps=kwargs.pop("validation_steps"),
            checkpoint_steps=kwargs.pop("checkpoint_steps"),
            target_false_positive_rate=kwargs.pop("target_false_positive_rate"),
            validation_gate_consecutive=kwargs.pop("validation_gate_consecutive"),
            dynamic_negative_weight=kwargs.pop("dynamic_negative_weight"),
            learning_rate=kwargs.pop("learning_rate"),
            high_loss_threshold=kwargs.pop("high_loss_threshold"),
            activation_threshold=kwargs.pop("threshold"),
            wandb_entity=kwargs.pop("wandb_entity"),
            name=name,
        )
        click.echo(f"Training complete; final checkpoint: {trainer.checkpoint_dir}/{name}_final.npz")


# --------------------------------------------------------------------- predict


@main.command()
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False), nargs=1)
@click.argument("audio", type=click.Path(exists=True, dir_okay=False), nargs=1)
@click.option("--threshold", type=float, default=DEFAULT_ACTIVATION_THRESHOLD, show_default=True)
@click.option("--debug/--no-debug", default=False, is_flag=True)
def predict(checkpoint: str, audio: str, threshold: float, debug: bool) -> None:
    """Print wake-word timecodes found in AUDIO (reference __main__.py:431-464)."""
    with _debug(debug):
        model = _load_any_model(checkpoint)
        times = model.predict_timecodes(audio, threshold=threshold)
        if not times:
            click.echo("No wake words detected.")
        else:
            for t in times:
                click.echo(f"Wake word detected at {t:.1f}s")


# ---------------------------------------------------------------------- listen


@main.command()
@click.argument("checkpoints", type=click.Path(exists=True, dir_okay=False), nargs=-1)
@click.option("--threshold", type=float, default=DEFAULT_ACTIVATION_THRESHOLD, show_default=True)
@click.option("--buffer-size", type=int, default=DEFAULT_LISTEN_BUFFER_SIZE, show_default=True)
@click.option("--input-wav", type=click.Path(exists=True, dir_okay=False), default=None,
              help="Stream a wav file instead of the microphone (for testing).")
@click.option("--vad/--no-vad", "use_vad", default=False, is_flag=True,
              help="Gate inference on VAD hysteresis (skip silent chunks), "
                   "like the browser runtime.")
@click.option("--consecutive", type=int, default=1, show_default=True,
              help="Require this many consecutive above-threshold chunks "
                   "before recording a detection (false-positive smoothing).")
@click.option("--debug/--no-debug", default=False, is_flag=True)
def listen(
    checkpoints: Tuple[str, ...],
    threshold: float,
    buffer_size: int,
    input_wav: Optional[str],
    use_vad: bool,
    consecutive: int,
    debug: bool,
) -> None:
    """Listen on the microphone and print live wake-word scores."""
    from heybuddy_tpu.runtime.listen import run_listen

    with _debug(debug):
        if not checkpoints:
            raise click.ClickException("Provide at least one checkpoint")
        run_listen(
            list(checkpoints),
            threshold=threshold,
            buffer_size=buffer_size,
            input_wav=input_wav,
            use_vad=use_vad,
            consecutive=consecutive,
        )


# --------------------------------------------------------------------- convert


@main.command()
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False), nargs=1)
@click.argument("output", type=click.Path(dir_okay=False), required=False, default=None)
@click.option("--opset-version", type=int, default=19, show_default=True)
@click.option("--debug/--no-debug", default=False, is_flag=True)
def convert(checkpoint: str, output: Optional[str], opset_version: int, debug: bool) -> None:
    """Convert a checkpoint to ONNX for the browser runtime (reference :599-625)."""
    with _debug(debug):
        model = _load_any_model(checkpoint)
        if output is None:
            output = os.path.splitext(checkpoint)[0] + ".onnx"
        model.save_onnx(output, opset_version=opset_version)
        click.echo(f"Wrote {output}")


# ----------------------------------------------------------- pretrain-embedding


@main.command("pretrain-embedding")
@click.option("--output", "-o", type=click.Path(dir_okay=False), default="embedding-pretrained.npz",
              show_default=True)
@click.option("--num-texts", type=int, default=512, show_default=True)
@click.option("--speakers-per-text", type=int, default=4, show_default=True)
@click.option("--steps", type=int, default=1000, show_default=True)
@click.option("--batch-size", type=int, default=64, show_default=True)
@click.option("--learning-rate", type=float, default=1e-3, show_default=True)
@click.option("--temperature", type=float, default=0.1, show_default=True)
@click.option("--tts-backend", type=click.Choice(["vits", "formant", "formant-device"]), default=None)
@click.option("--adversarial-fraction", type=float, default=0.0, show_default=True,
              help="Fraction of the text pool built as phonetic-neighbor "
                   "clusters (base phrase + 3 near-collisions) so in-batch "
                   "negatives include the separations wake-word "
                   "discrimination needs.")
@click.option("--focus-phrase", type=str, default=None,
              help="Wake phrase to build a deep near-collision cluster for; "
                   "it joins every batch and its rendered pairs are driven "
                   "apart by the margin loss (per-deployment discriminative "
                   "fine-tune of the embedding space).")
@click.option("--focus-swap-depth", type=int, default=0, show_default=True,
              help="Extend the focus cluster with this many SINGLE-SWAP "
                   "collision texts (exactly one phrase word replaced by a "
                   "phonetic neighbor) — the maximal-overlap class the "
                   "round-4 FAR attribution put the failure mass on. 0 "
                   "keeps the bundled v7 embedding reproducible.")
@click.option("--focus-swap-max-swaps", type=int, default=1, show_default=True,
              help="Maximum words swapped per focus-cluster collision text. "
                   "2 interleaves DOUBLE swaps ('hate buddies', 'hate bully') "
                   "with the singles — where the v25 attribution moved the "
                   "residual false-accept mass once single swaps were "
                   "head-trained.")
@click.option("--hard-pair-margin", type=float, default=0.4, show_default=True,
              help="Cosine-similarity ceiling for same-cluster rendered pairs.")
@click.option("--hard-pair-weight", type=float, default=1.0, show_default=True,
              help="Weight of the hard-pair margin loss vs NT-Xent.")
@click.option("--seed", type=int, default=0, show_default=True)
@click.option("--debug/--no-debug", default=False, is_flag=True)
def pretrain_embedding(
    output: str,
    num_texts: int,
    speakers_per_text: int,
    steps: int,
    batch_size: int,
    learning_rate: float,
    temperature: float,
    tts_backend: Optional[str],
    adversarial_fraction: float,
    focus_phrase: Optional[str],
    focus_swap_depth: int,
    focus_swap_max_swaps: int,
    hard_pair_margin: float,
    hard_pair_weight: float,
    seed: int,
    debug: bool,
) -> None:
    """Contrastively pre-train the frozen speech-embedding network.

    Two augmented speaker renderings of the same phrase attract, other phrases
    repel — producing a noise/speaker/room-invariant feature space. Afterwards
    set HEYBUDDY_EMBEDDING_WEIGHTS to the output file (and regenerate cached
    features).
    """
    from heybuddy_tpu.training.embedding_pretrain import EmbeddingPretrainer

    with _debug(debug):
        pretrainer = EmbeddingPretrainer(
            num_texts=num_texts,
            speakers_per_text=speakers_per_text,
            batch_size=batch_size,
            learning_rate=learning_rate,
            temperature=temperature,
            tts_backend=tts_backend,
            adversarial_fraction=adversarial_fraction,
            focus_phrase=focus_phrase,
            focus_swap_depth=focus_swap_depth,
            focus_swap_max_swaps=focus_swap_max_swaps,
            hard_pair_margin=hard_pair_margin,
            hard_pair_weight=hard_pair_weight,
            seed=seed,
        )
        pretrainer.train(steps=steps)
        pretrainer.save(output)
        click.echo(f"Wrote {output}; set HEYBUDDY_EMBEDDING_WEIGHTS={output} to use it.")


# ----------------------------------------------------------------------- utils


def _load_any_model(path: str) -> Any:
    """Load npz (native), .pt (reference torch), or .onnx checkpoints."""
    from heybuddy_tpu.models.wakeword import WakeWordMLPModel, load_model

    if path.endswith(".pt"):
        return WakeWordMLPModel.from_torch_file(path)
    if path.endswith(".onnx"):
        from heybuddy_tpu.runtime.onnx_model import WakeWordONNXModel

        return WakeWordONNXModel(path)
    return load_model(path)


class _debug:
    def __init__(self, enabled: bool) -> None:
        self.enabled = enabled
        self._ctx = None

    def __enter__(self) -> None:
        if self.enabled:
            self._ctx = debug_logger()
            self._ctx.__enter__()

    def __exit__(self, *exc: Any) -> None:
        if self._ctx is not None:
            self._ctx.__exit__(*exc)


if __name__ == "__main__":
    main()
