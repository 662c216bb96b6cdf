"""
VITS synthesizer (inference path) in JAX.

Architecture parity with reference ``piper/models.py`` (Synthesizer.infer,
models.py:741-793) at the piper-libritts-en-r-medium configuration
(piper/pretrained.py:44-67): text encoder (relative-attention transformer),
stochastic duration predictor (reverse spline flows), monotonic path
expansion, residual-coupling flow (reverse), and HiFiGAN decoder — all pure
functions over a parameter pytree, jitted per (text_len, frame_len) bucket
with static shapes and masks (XLA-friendly; no data-dependent shapes).

Weights load from a piper/VITS torch checkpoint or safetensors file via
:func:`import_torch_checkpoint` (weight-norm folded at load). Without a
checkpoint, deterministic random parameters keep the full pipeline runnable
(the audio is noise-like; the offline-capable alternative is
``models/formant.py``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heybuddy_tpu.models.vits import modules as m
from heybuddy_tpu.models.vits.attention import encoder, encoder_init

Params = Dict[str, Any]

__all__ = ["VitsConfig", "init_params", "infer", "generate_path", "import_torch_checkpoint"]


class VitsConfig(NamedTuple):
    """Static hyperparameters (piper-libritts-en-r-medium defaults)."""

    n_vocab: int = 256
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    resblock_kernel_sizes: Tuple[int, ...] = (3, 5, 7)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 2), (2, 6), (3, 12))
    upsample_rates: Tuple[int, ...] = (8, 8, 4)
    upsample_initial_channel: int = 256
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8)
    n_speakers: int = 904
    gin_channels: int = 512
    use_sdp: bool = True
    sample_rate: int = 22050

    @property
    def hop_samples(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


# ------------------------------------------------------------------ init


def init_params(key: jax.Array, config: VitsConfig = VitsConfig()) -> Params:
    cfg = config
    keys = jax.random.split(key, 16)

    # Text encoder
    enc_p = {
        "emb": jax.random.normal(keys[0], (cfg.n_vocab, cfg.hidden_channels))
        * (cfg.hidden_channels ** -0.5),
        "encoder": encoder_init(
            keys[1], cfg.hidden_channels, cfg.filter_channels, cfg.n_heads,
            cfg.n_layers, cfg.kernel_size,
        ),
        "proj": m.conv1d_init(keys[2], cfg.hidden_channels, 2 * cfg.inter_channels, 1),
    }

    # Stochastic duration predictor (filter_channels == in_channels, see
    # reference models.py:63).
    fc = cfg.hidden_channels
    sdp_keys = jax.random.split(keys[3], cfg.n_layers + 8)
    if cfg.use_sdp:
        dp = {
            "pre": m.conv1d_init(sdp_keys[0], cfg.hidden_channels, fc, 1),
            "proj": m.conv1d_init(sdp_keys[1], fc, fc, 1),
            "convs": m.ddsconv_init(sdp_keys[2], fc, cfg.kernel_size, 3),
            "cond": m.conv1d_init(sdp_keys[3], cfg.gin_channels, fc, 1),
            "flows": [{"affine": m.elementwise_affine_init(2)}]
            + [
                {"convflow": m.convflow_init(sdp_keys[4 + i], 2, fc, cfg.kernel_size, 3)}
                for i in range(4)
            ],
        }
    else:
        # Deterministic predictor (reference models.py:174-240); the 256
        # filter channels match piper's non-SDP export configuration.
        dfc = 256
        dp = {
            "conv_1": m.conv1d_init(sdp_keys[0], cfg.hidden_channels, dfc, cfg.kernel_size),
            "norm_1": m.channel_layernorm_init(dfc),
            "conv_2": m.conv1d_init(sdp_keys[1], dfc, dfc, cfg.kernel_size),
            "norm_2": m.channel_layernorm_init(dfc),
            "proj": m.conv1d_init(sdp_keys[2], dfc, 1, 1),
            "cond": m.conv1d_init(sdp_keys[3], cfg.gin_channels, cfg.hidden_channels, 1),
        }

    # Residual coupling flow: 4 x (coupling + flip)
    flow_keys = jax.random.split(keys[4], 4)
    flow = {
        "layers": [
            m.residual_coupling_layer_init(
                flow_keys[i], cfg.inter_channels, cfg.hidden_channels, 5, 1, 4,
                gin_channels=cfg.gin_channels,
            )
            for i in range(4)
        ]
    }

    # HiFiGAN generator
    gen_keys = jax.random.split(keys[5], 3 + len(cfg.upsample_rates) * (1 + len(cfg.resblock_kernel_sizes)))
    ups = []
    resblocks = []
    ch = cfg.upsample_initial_channel
    gi = 0
    for i, (rate, kernel) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups.append(m.conv_transpose1d_init(gen_keys[gi], ch, ch // 2, kernel))
        gi += 1
        ch //= 2
        for k_size, dilations in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(m.resblock2_init(gen_keys[gi], ch, k_size, dilations))
            gi += 1
    dec = {
        "conv_pre": m.conv1d_init(gen_keys[gi], cfg.inter_channels, cfg.upsample_initial_channel, 7),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": m.conv1d_init(gen_keys[gi + 1], ch, 1, 7),
        "cond": m.conv1d_init(gen_keys[gi + 2], cfg.gin_channels, cfg.upsample_initial_channel, 1),
    }

    params: Params = {"enc_p": enc_p, "dp": dp, "flow": flow, "dec": dec}
    if cfg.n_speakers > 1:
        params["emb_g"] = jax.random.normal(keys[6], (cfg.n_speakers, cfg.gin_channels)) * 0.1
    return params


# ------------------------------------------------------------------ components


def text_encoder(
    p: Params, x: jax.Array, x_mask: jax.Array, hidden_channels: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(b, t) ids -> hidden (b, c, t), prior mean/logstd (b, inter, t)."""
    h = p["emb"][x] * math.sqrt(hidden_channels)  # (b, t, c)
    h = jnp.transpose(h, (0, 2, 1))  # (b, c, t)
    h = encoder(p["encoder"], h, x_mask)
    stats = m.conv1d(p["proj"], h) * x_mask
    inter = stats.shape[1] // 2
    return h, stats[:, :inter], stats[:, inter:]


def duration_predictor(
    p: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: Optional[jax.Array],
) -> jax.Array:
    """
    Deterministic (non-SDP) duration predictor -> log durations.

    Reference piper/models.py:174-240: two masked conv->relu->channel-LayerNorm
    blocks then a 1x1 projection (dropout is inference-disabled). Piper voices
    exported with ``use_sdp: false`` carry this module instead of the spline
    flows; ``import_torch_checkpoint`` detects which layout the checkpoint has.
    """
    kernel = p["conv_1"]["w"].shape[-1]
    h = x
    if g is not None and "cond" in p:
        h = h + m.conv1d(p["cond"], g)
    h = m.conv1d(p["conv_1"], h * x_mask, padding=kernel // 2)
    h = m.channel_layernorm(p["norm_1"], jax.nn.relu(h))
    h = m.conv1d(p["conv_2"], h * x_mask, padding=kernel // 2)
    h = m.channel_layernorm(p["norm_2"], jax.nn.relu(h))
    return m.conv1d(p["proj"], h * x_mask) * x_mask


def stochastic_duration_reverse(
    p: Params,
    key: jax.Array,
    x: jax.Array,
    x_mask: jax.Array,
    g: Optional[jax.Array],
    noise_scale: jax.Array,
) -> jax.Array:
    """SDP reverse pass -> log durations (reference models.py:163-172)."""
    h = m.conv1d(p["pre"], x)
    if g is not None:
        h = h + m.conv1d(p["cond"], g)
    h = m.ddsconv(p["convs"], h, x_mask)
    h = m.conv1d(p["proj"], h) * x_mask

    b, _, t = x.shape
    z = jax.random.normal(key, (b, 2, t)) * noise_scale

    # VITS reverse quirk (reference models.py:163-166): reversed flow list with
    # `flows[:-2] + [flows[-1]]` — the FIRST ConvFlow is skipped at inference
    # ("remove a useless vflow"), i.e. flip3,cf3,flip2,cf2,flip1,cf1,flip0,affine.
    convflows = [layer["convflow"] for layer in p["flows"][1:]]
    for cf in reversed(convflows[1:]):
        z = m.flip_flow(z)
        z, _ = m.convflow(cf, z, x_mask, g=h, reverse=True)
    z = m.flip_flow(z)
    z, _ = m.elementwise_affine(p["flows"][0]["affine"], z, x_mask, reverse=True)
    return z[:, 0:1]


def residual_coupling_reverse(
    p: Params, z: jax.Array, y_mask: jax.Array, g: Optional[jax.Array]
) -> jax.Array:
    """Flow reverse (reference models.py ResidualCouplingBlock, reverse=True)."""
    for layer in reversed(p["layers"]):
        z = m.flip_flow(z)
        z = m.residual_coupling_layer(layer, z, y_mask, g=g, reverse=True)
    return z


def generator(p: Params, z: jax.Array, g: Optional[jax.Array], config: VitsConfig) -> jax.Array:
    """HiFiGAN decoder: (b, inter, t) latents -> (b, samples) waveform."""
    cfg = config
    x = m.conv1d(p["conv_pre"], z, padding=3)
    if g is not None:
        x = x + m.conv1d(p["cond"], g)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (rate, kernel) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, 0.1)
        x = m.conv_transpose1d(p["ups"][i], x, stride=rate, padding=(kernel - rate) // 2)
        acc = None
        for j in range(n_kernels):
            block = m.resblock2(p["resblocks"][i * n_kernels + j], x)
            acc = block if acc is None else acc + block
        x = acc / n_kernels
    x = jax.nn.leaky_relu(x, 0.1)
    x = m.conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)[:, 0]


def generate_path(duration: jax.Array, mask: jax.Array) -> jax.Array:
    """
    Monotonic path from durations (reference common.py:58-94).
    duration: (b, 1, t_x); mask: (b, 1, t_y, t_x) -> path (b, 1, t_y, t_x).
    """
    b, _, t_y, t_x = mask.shape
    cum_duration = jnp.cumsum(duration, axis=-1)  # (b, 1, t_x)
    positions = jnp.arange(t_y)[None, :, None]  # (1, t_y, 1)
    path = (positions < cum_duration[:, 0][:, None, :]).astype(jnp.float32)  # (b, t_y, t_x)
    path = path - jnp.pad(path, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    return path[:, None] * mask


# ------------------------------------------------------------------ inference


def infer(
    params: Params,
    key: jax.Array,
    phoneme_ids: jax.Array,
    phoneme_lengths: jax.Array,
    speaker_embedding: Optional[jax.Array] = None,
    noise_scale: float = 0.667,
    length_scale: float = 1.0,
    noise_scale_w: float = 0.8,
    max_frames: int = 512,
    config: VitsConfig = VitsConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """
    Synthesize speech (reference models.py:741-793) with static shapes.

    Args:
        phoneme_ids: (b, t_x) int32, zero-padded.
        phoneme_lengths: (b,) int32.
        speaker_embedding: (b, gin) precomputed (slerped) speaker vectors, or None.
        max_frames: static spectrogram-frame budget (audio = max_frames * 256
            samples at 22.05 kHz); durations are clipped into it.

    Returns (audio (b, max_frames*hop), audio_lengths (b,)).
    """
    cfg = config
    b, t_x = phoneme_ids.shape
    x_mask = m.sequence_mask(phoneme_lengths, t_x)[:, None, :]  # (b, 1, t_x)

    h, m_p, logs_p = text_encoder(params["enc_p"], phoneme_ids, x_mask, cfg.hidden_channels)

    g = None
    if speaker_embedding is not None:
        g = speaker_embedding[:, :, None]  # (b, gin, 1)

    k_dur, k_noise = jax.random.split(key)
    if "flows" in params["dp"]:  # SDP layout (pytree structure is jit-static)
        logw = stochastic_duration_reverse(
            params["dp"], k_dur, h, x_mask, g, jnp.float32(noise_scale_w)
        )
    else:
        logw = duration_predictor(params["dp"], h, x_mask, g)

    w = jnp.exp(logw) * x_mask * length_scale
    w_ceil = jnp.ceil(w)
    y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), 1, max_frames).astype(jnp.int32)
    y_mask = m.sequence_mask(y_lengths, max_frames)[:, None, :]  # (b, 1, t_y)

    attn_mask = x_mask[:, :, None, :] * y_mask[:, :, :, None]  # (b, 1, t_y, t_x)
    attn = generate_path(w_ceil, attn_mask)[:, 0]  # (b, t_y, t_x)

    m_p = jnp.einsum("byx,bcx->bcy", attn, m_p)
    logs_p = jnp.einsum("byx,bcx->bcy", attn, logs_p)

    z_p = m_p + jax.random.normal(k_noise, m_p.shape) * jnp.exp(logs_p) * noise_scale
    z = residual_coupling_reverse(params["flow"], z_p, y_mask, g)
    audio = generator(params["dec"], z * y_mask, g, cfg)
    return audio, y_lengths * cfg.hop_samples


# ------------------------------------------------------------------ weight import


def _fold_weight_norm(state: Dict[str, np.ndarray], prefix: str) -> Optional[np.ndarray]:
    """Fold torch weight-norm (weight_g * weight_v / ||weight_v||) if present."""
    if f"{prefix}.weight" in state:
        return state[f"{prefix}.weight"]
    if f"{prefix}.weight_v" in state:
        v = state[f"{prefix}.weight_v"]
        g = state[f"{prefix}.weight_g"]
        norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        return g * v / (norm + 1e-9)
    # torch >= 2.1 parametrized weight norm
    if f"{prefix}.parametrizations.weight.original1" in state:
        v = state[f"{prefix}.parametrizations.weight.original1"]
        g = state[f"{prefix}.parametrizations.weight.original0"]
        norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        return g * v / (norm + 1e-9)
    return None


def import_torch_checkpoint(path: str, config: VitsConfig = VitsConfig()) -> Params:
    """
    Load a piper/VITS checkpoint (.safetensors or torch .pt state dict) into
    this module's parameter layout. Weight norm is folded; transposed-conv
    kernels are pre-flipped for the input-dilation formulation.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        import torch

        loaded = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(loaded, dict) and "model" in loaded:
            loaded = loaded["model"]
        state = {k: v.numpy() for k, v in loaded.items()}

    def conv(prefix: str) -> Params:
        w = _fold_weight_norm(state, prefix)
        if w is None:
            raise KeyError(f"Missing weight for {prefix}")
        return {"w": jnp.asarray(w), "b": jnp.asarray(state.get(f"{prefix}.bias", np.zeros(w.shape[0])))}

    def tconv(prefix: str) -> Params:
        w = _fold_weight_norm(state, prefix)  # (in, out, k) torch layout
        if w is None:
            raise KeyError(f"Missing weight for {prefix}")
        w = np.flip(np.transpose(w, (1, 0, 2)), axis=-1).copy()  # -> (out, in, k) flipped
        return {"w": jnp.asarray(w), "b": jnp.asarray(state.get(f"{prefix}.bias", np.zeros(w.shape[0])))}

    def norm(prefix: str) -> Params:
        return {"g": jnp.asarray(state[f"{prefix}.gamma"]), "b": jnp.asarray(state[f"{prefix}.beta"])}

    def ddsconv_import(prefix: str, n_layers: int, kernel_size: int) -> Params:
        layers = []
        for i in range(n_layers):
            layers.append(
                {
                    "sep": conv(f"{prefix}.convs_sep.{i}"),
                    "pw": conv(f"{prefix}.convs_1x1.{i}"),
                    "norm1": norm(f"{prefix}.norms_1.{i}"),
                    "norm2": norm(f"{prefix}.norms_2.{i}"),
                }
            )
        return {"layers": layers, "kernel_size": m.Static(kernel_size)}

    def wn_import(prefix: str, n_layers: int, kernel_size: int, dilation_rate: int) -> Params:
        out: Params = {
            "in_layers": [conv(f"{prefix}.in_layers.{i}") for i in range(n_layers)],
            "res_skip_layers": [conv(f"{prefix}.res_skip_layers.{i}") for i in range(n_layers)],
            "kernel_size": m.Static(kernel_size),
            "dilation_rate": m.Static(dilation_rate),
        }
        try:
            out["cond_layer"] = conv(f"{prefix}.cond_layer")
        except KeyError:
            pass
        return out

    cfg = config
    params: Params = {}

    # text encoder
    enc_layers = []
    for i in range(cfg.n_layers):
        enc_layers.append(
            {
                "attn": {
                    "conv_q": conv(f"enc_p.encoder.attn_layers.{i}.conv_q"),
                    "conv_k": conv(f"enc_p.encoder.attn_layers.{i}.conv_k"),
                    "conv_v": conv(f"enc_p.encoder.attn_layers.{i}.conv_v"),
                    "conv_o": conv(f"enc_p.encoder.attn_layers.{i}.conv_o"),
                    "emb_rel_k": jnp.asarray(state[f"enc_p.encoder.attn_layers.{i}.emb_rel_k"]),
                    "emb_rel_v": jnp.asarray(state[f"enc_p.encoder.attn_layers.{i}.emb_rel_v"]),
                    "n_heads": m.Static(cfg.n_heads),
                    "window_size": m.Static(4),
                },
                "norm1": norm(f"enc_p.encoder.norm_layers_1.{i}"),
                "ffn": {
                    "conv1": conv(f"enc_p.encoder.ffn_layers.{i}.conv_1"),
                    "conv2": conv(f"enc_p.encoder.ffn_layers.{i}.conv_2"),
                    "kernel_size": m.Static(cfg.kernel_size),
                },
                "norm2": norm(f"enc_p.encoder.norm_layers_2.{i}"),
            }
        )
    params["enc_p"] = {
        "emb": jnp.asarray(state["enc_p.emb.weight"]),
        "encoder": {"layers": enc_layers},
        "proj": conv("enc_p.proj"),
    }

    # duration predictor: detect layout from the checkpoint itself.  SDP
    # checkpoints carry spline-flow tensors (dp.flows.*); non-SDP exports
    # (piper `use_sdp: false`) carry the conv/LayerNorm stack instead
    # (reference models.py:174-240 vs :63-171).
    if "dp.flows.0.m" not in state and _fold_weight_norm(state, "dp.conv_1") is not None:
        params["dp"] = {
            "conv_1": conv("dp.conv_1"),
            "norm_1": norm("dp.norm_1"),
            "conv_2": conv("dp.conv_2"),
            "norm_2": norm("dp.norm_2"),
            "proj": conv("dp.proj"),
        }
        if _fold_weight_norm(state, "dp.cond") is not None:
            params["dp"]["cond"] = conv("dp.cond")
    else:
        flows: List[Params] = [
            {
                "affine": {
                    "m": jnp.asarray(state["dp.flows.0.m"]),
                    "logs": jnp.asarray(state["dp.flows.0.logs"]),
                }
            }
        ]
        for i in range(4):
            idx = 1 + 2 * i  # flows list interleaves ConvFlow and Flip
            flows.append(
                {
                    "convflow": {
                        "pre": conv(f"dp.flows.{idx}.pre"),
                        "convs": ddsconv_import(f"dp.flows.{idx}.convs", 3, cfg.kernel_size),
                        "proj": conv(f"dp.flows.{idx}.proj"),
                        "num_bins": m.Static(10),
                    }
                }
            )
        params["dp"] = {
            "pre": conv("dp.pre"),
            "proj": conv("dp.proj"),
            "convs": ddsconv_import("dp.convs", 3, cfg.kernel_size),
            "cond": conv("dp.cond"),
            "flows": flows,
        }

    # SDP posterior flows (training-only; present in full training checkpoints)
    if "dp.post_pre.weight" in state:
        post_flows: List[Params] = [
            {
                "affine": {
                    "m": jnp.asarray(state["dp.post_flows.0.m"]),
                    "logs": jnp.asarray(state["dp.post_flows.0.logs"]),
                }
            }
        ]
        for i in range(4):
            idx = 1 + 2 * i
            post_flows.append(
                {
                    "convflow": {
                        "pre": conv(f"dp.post_flows.{idx}.pre"),
                        "convs": ddsconv_import(f"dp.post_flows.{idx}.convs", 3, cfg.kernel_size),
                        "proj": conv(f"dp.post_flows.{idx}.proj"),
                        "num_bins": m.Static(10),
                    }
                }
            )
        params["dp_posterior"] = {
            "post_pre": conv("dp.post_pre"),
            "post_proj": conv("dp.post_proj"),
            "post_convs": ddsconv_import("dp.post_convs", 3, cfg.kernel_size),
            "post_flows": post_flows,
        }

    # residual coupling flow (even indices are coupling layers, odd are flips)
    params["flow"] = {
        "layers": [
            {
                "pre": conv(f"flow.flows.{2 * i}.pre"),
                "enc": wn_import(f"flow.flows.{2 * i}.enc", 4, 5, 1),
                "post": conv(f"flow.flows.{2 * i}.post"),
            }
            for i in range(4)
        ]
    }

    # generator
    n_kernels = len(cfg.resblock_kernel_sizes)
    resblocks = []
    for i in range(len(cfg.upsample_rates)):
        for j, (k_size, dilations) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            idx = i * n_kernels + j
            resblocks.append(
                {
                    "convs": [
                        conv(f"dec.resblocks.{idx}.convs.{d}") for d in range(len(dilations))
                    ],
                    "kernel_size": m.Static(k_size),
                    "dilations": m.Static(tuple(dilations)),
                }
            )
    params["dec"] = {
        "conv_pre": conv("dec.conv_pre"),
        "ups": [tconv(f"dec.ups.{i}") for i in range(len(cfg.upsample_rates))],
        "resblocks": resblocks,
        "conv_post": conv("dec.conv_post"),
        "cond": conv("dec.cond"),
    }

    if "emb_g.weight" in state:
        params["emb_g"] = jnp.asarray(state["emb_g.weight"])
    return params
