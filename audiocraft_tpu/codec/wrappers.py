"""External-codec wrappers over the CompressionModel contract.

TPU-native counterparts of
``/root/reference/audiocraft/models/encodec.py:262-394``.  Torch backends
cannot run on TPU, so the design differs from the reference's "hold a torch
module" approach:

* :class:`HFEncodecCompressionModel` rebuilds the HuggingFace ``transformers``
  EnCodec as our own JAX :class:`~..codec.encodec.EncodecModel` (the
  architectures are identical — HF's EncodecModel *is* Meta's EnCodec) and
  imports the HF weight layout.  This is the drop-in path for published
  ``facebook/encodec_24khz`` / ``facebook/encodec_32khz`` weights, and the HF
  wrapper doubles as the conformance oracle the reference itself trusts
  (encodec.py:119-121).
* :class:`DACCompressionModel` keeps the reference DAC wrapper's *contract*
  (bandwidth/codebook bookkeeping, encode/decode signatures,
  encodec.py:262-320) over a pluggable backend, since descript-audio-codec's
  snake-activation architecture is not EnCodec; any JAX DAC port (or host
  fallback) slots in without touching callers.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import numpy as np

from ..ckpt.torch_import import StateDict, get_conv_weight, import_lstm
from ..nn.seanet import SEANetDecoder, SEANetEncoder
from ..quant.vq import ResidualVectorQuantizer
from .encodec import EncodecModel


# --------------------------------------------------------------------- HF

def _hf_conv(sd: StateDict, prefix: str) -> dict:
    """HF EncodecConv1d/ConvTranspose1d at `prefix` (one `.conv` level vs the
    reference's two)."""
    params = {"weight": get_conv_weight(sd, f"{prefix}.conv")}
    if f"{prefix}.conv.bias" in sd:
        params["bias"] = np.asarray(sd[f"{prefix}.conv.bias"])
    if f"{prefix}.norm.weight" in sd:
        params["gn_scale"] = np.asarray(sd[f"{prefix}.norm.weight"])
        params["gn_bias"] = np.asarray(sd[f"{prefix}.norm.bias"])
    return params


def _hf_resnet_block(sd: StateDict, prefix: str, n_convs: int,
                     true_skip: bool) -> dict:
    params = {}
    for j in range(n_convs):
        # convs at odd indices of HF's block list (ELU modules between)
        params[f"conv{j}"] = _hf_conv(sd, f"{prefix}.block.{2 * j + 1}")
    if not true_skip:
        params["shortcut"] = _hf_conv(sd, f"{prefix}.shortcut")
    return params


def import_hf_seanet(model, sd: StateDict, prefix: str) -> dict:
    """Import an HF Encodec encoder/decoder (``{prefix}.layers.{i}``) into our
    SEANet param tree.  HF enumerates the same module sequence as the
    reference Sequential (activations occupy indices), so our ``_layers()``
    walk lines up index-for-index."""
    params = {}
    for i, (kind, mod) in enumerate(model._layers()):
        key = f"{prefix}.layers.{i}"
        if kind in ("conv", "convtr"):
            params[f"layer{i}"] = _hf_conv(sd, key)
        elif kind == "res":
            params[f"layer{i}"] = _hf_resnet_block(
                sd, key, n_convs=len(mod.kernel_sizes), true_skip=mod.true_skip)
        elif kind == "lstm":
            params[f"layer{i}"] = import_lstm(sd, key, mod.num_layers)
    return params


def import_hf_rvq(sd: StateDict, n_q: int,
                  prefix: str = "quantizer") -> dict:
    """HF quantizer buffers: ``quantizer.layers.{q}.codebook.*``."""
    embeds, cluster_sizes, embed_avgs, initeds = [], [], [], []
    for q in range(n_q):
        base = f"{prefix}.layers.{q}.codebook"
        embeds.append(np.asarray(sd[f"{base}.embed"]))
        cluster_sizes.append(np.asarray(sd[f"{base}.cluster_size"]))
        embed_avgs.append(np.asarray(sd[f"{base}.embed_avg"]))
        if f"{base}.inited" in sd:
            initeds.append(np.asarray(sd[f"{base}.inited"]).reshape(()))
        else:
            initeds.append(np.ones(()))
    return {
        "embed": np.stack(embeds),
        "cluster_size": np.stack(cluster_sizes),
        "embed_avg": np.stack(embed_avgs),
        "inited": np.stack(initeds),
    }


@dataclasses.dataclass(frozen=True)
class HFEncodecCompressionModel:
    """CompressionModel over an HF-EnCodec-configured model
    (reference encodec.py:323-394 semantics, JAX execution)."""
    model: EncodecModel
    target_bandwidths: tp.Tuple[float, ...]

    @classmethod
    def from_hf_config(cls, cfg: tp.Mapping[str, tp.Any],
                       compute_dtype: tp.Optional[str] = None
                       ) -> "HFEncodecCompressionModel":
        """Build from a ``transformers`` EncodecConfig-style mapping (the
        ``config.json`` of facebook/encodec_* checkpoints).  ``compute_dtype``
        ('bfloat16') opts the SEANet stacks into the throughput dtype; None
        keeps the fp32 parity default."""
        def get(name, default):
            return cfg.get(name, default)
        ratios = tuple(get('upsampling_ratios', (8, 5, 4, 2)))
        common = dict(
            channels=get('audio_channels', 1),
            dimension=get('hidden_size', 128),
            n_filters=get('num_filters', 32),
            n_residual_layers=get('num_residual_layers', 1),
            ratios=ratios,
            norm='weight_norm' if get('norm_type', 'weight_norm') == 'weight_norm'
                 else 'time_group_norm',
            kernel_size=get('kernel_size', 7),
            last_kernel_size=get('last_kernel_size', 7),
            residual_kernel_size=get('residual_kernel_size', 3),
            dilation_base=get('dilation_growth_rate', 2),
            causal=get('use_causal_conv', True),
            pad_mode=get('pad_mode', 'reflect'),
            compress=get('compress', 2),
            lstm=get('num_lstm_layers', 2),
            # HF `use_conv_shortcut` is the inverse of SEANet `true_skip`
            # (True -> 1x1-conv residual shortcut, not identity)
            true_skip=not get('use_conv_shortcut', True),
        )
        sample_rate = get('sampling_rate', 24000)
        hop = int(np.prod(ratios))
        frame_rate = sample_rate / hop
        card = get('codebook_size', 1024)
        bandwidths = tuple(get('target_bandwidths', (6.0,)))
        max_n_q = int(round(max(bandwidths) * 1000
                            / (frame_rate * math.log2(card))))
        encoder = SEANetEncoder(**common)
        decoder = SEANetDecoder(
            **common, trim_right_ratio=get('trim_right_ratio', 1.0))
        codebook_dim = get('codebook_dim', None) or common['dimension']
        assert codebook_dim == common['dimension'], \
            "codebook projections unsupported (EnCodec checkpoints use none)"
        quantizer = ResidualVectorQuantizer(
            dimension=codebook_dim, n_q=max_n_q, q_dropout=False, bins=card)
        model = EncodecModel(encoder=encoder, decoder=decoder,
                             quantizer=quantizer, frame_rate=frame_rate,
                             sample_rate=sample_rate,
                             channels=common['channels'], causal=common['causal'],
                             renormalize=get('normalize', False),
                             compute_dtype=compute_dtype)
        return cls(model=model, target_bandwidths=bandwidths)

    def import_hf_state(self, sd: StateDict) -> dict:
        """Map an HF ``EncodecModel.state_dict()`` into our param tree."""
        return {
            'encoder': import_hf_seanet(self.model.encoder, sd, 'encoder'),
            'decoder': import_hf_seanet(self.model.decoder, sd, 'decoder'),
            'quantizer': import_hf_rvq(sd, self.model.quantizer.max_n_q),
        }

    # ----------------------------------------------------- contract props
    @property
    def possible_num_codebooks(self) -> tp.List[int]:
        """Bandwidth -> codebook-count map (reference encodec.py:328-338)."""
        counts = [bw * 1000 / (self.frame_rate * math.log2(self.cardinality))
                  for bw in self.target_bandwidths]
        assert all(abs(nc - round(nc)) <= 1e-3 for nc in counts), counts
        return [int(round(nc)) for nc in counts]

    @property
    def channels(self) -> int:
        return self.model.channels

    @property
    def frame_rate(self) -> float:
        return self.model.frame_rate

    @property
    def sample_rate(self) -> int:
        return self.model.sample_rate

    @property
    def cardinality(self) -> int:
        return self.model.cardinality

    @property
    def num_codebooks(self) -> int:
        return self.model.num_codebooks

    @property
    def total_codebooks(self) -> int:
        return max(self.possible_num_codebooks)

    def set_num_codebooks(self, n: int) -> "HFEncodecCompressionModel":
        if n not in self.possible_num_codebooks:
            raise ValueError(
                f"Allowed values for num codebooks: {self.possible_num_codebooks}")
        return dataclasses.replace(self, model=self.model.set_num_codebooks(n))

    # ----------------------------------------------------- encode / decode
    def init(self, key) -> dict:
        return self.model.init(key)

    def encode(self, params: dict, x, **kw):
        return self.model.encode(params, x, **kw)

    def decode(self, params: dict, codes, scale=None):
        return self.model.decode(params, codes, scale)

    def decode_latent(self, params: dict, codes):
        return self.model.decode_latent(params, codes)


# --------------------------------------------------------------------- DAC

class DACBackend(tp.Protocol):
    """What a DAC implementation must provide (mirrors the surface the
    reference wrapper consumes from ``dac.utils.load_model``,
    encodec.py:262-320)."""
    sample_rate: int
    hop_length: int
    codebook_size: int
    n_codebooks: int

    def encode(self, x) -> tp.Any: ...          # [B, 1, T] -> codes [B, K, F]
    def decode_latent(self, codes) -> tp.Any:   # codes -> z_q
        ...
    def decode(self, z_q) -> tp.Any: ...        # z_q -> waveform


@dataclasses.dataclass
class DACCompressionModel:
    """CompressionModel contract over a pluggable DAC backend
    (reference encodec.py:262-320).

    The descript-audio-codec architecture (snake activations, different
    quantizer) is not EnCodec, so until a JAX port lands the backend is
    injected — e.g. a host-side torch model or a future pallas build.  All
    bookkeeping (active-codebook clamping, latent decode chaining) lives
    here, identically to the reference.
    """
    backend: DACBackend
    n_quantizers: int = 0  # 0 -> all

    def __post_init__(self):
        if not self.n_quantizers:
            self.n_quantizers = self.total_codebooks
        assert 1 <= self.n_quantizers <= self.total_codebooks

    def encode(self, x) -> tp.Tuple[tp.Any, None]:
        codes = self.backend.encode(x)
        return codes[:, :self.n_quantizers], None

    def decode(self, codes, scale=None):
        assert scale is None
        return self.backend.decode(self.decode_latent(codes))

    def decode_latent(self, codes):
        return self.backend.decode_latent(codes)

    @property
    def channels(self) -> int:
        return 1

    @property
    def frame_rate(self) -> float:
        return self.backend.sample_rate / self.backend.hop_length

    @property
    def sample_rate(self) -> int:
        return self.backend.sample_rate

    @property
    def cardinality(self) -> int:
        return self.backend.codebook_size

    @property
    def num_codebooks(self) -> int:
        return self.n_quantizers

    @property
    def total_codebooks(self) -> int:
        return self.backend.n_codebooks

    def set_num_codebooks(self, n: int) -> "DACCompressionModel":
        assert 1 <= n <= self.total_codebooks
        return dataclasses.replace(self, n_quantizers=n)
