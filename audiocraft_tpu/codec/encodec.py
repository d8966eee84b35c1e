"""EnCodec compression model — the north-star audio tokenizer, functional JAX.

Mirrors the behavior of ``/root/reference/audiocraft/models/encodec.py``:
* ``CompressionModel`` contract (encodec.py:28-122): encode -> (codes [B,K,T],
  scale), decode, decode_latent, frame_rate/sample_rate/cardinality props.
* ``EncodecModel`` (encodec.py:125-259): optional RMS renormalization
  (preprocess, :186-204), SEANet encode, RVQ, SEANet decode with length trim
  (forward, :206-221).

TPU notes: ``encode``/``decode`` are pure functions of (params, state, x) and
jit cleanly; batch elements shard over the data axis of a mesh with codebook
tables replicated.  All compute is fp32 on the parity path with an optional
bf16 policy for the conv stacks.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..nn.seanet import SEANetDecoder, SEANetEncoder
from ..quant.vq import QuantizedResult, RVQState, ResidualVectorQuantizer


def _q_state(quantizer, params_q):
    """Quantizer state from params: rebuild the RVQState pytree when loaded
    checkpoints hand us a plain dict."""
    if isinstance(quantizer, ResidualVectorQuantizer) and isinstance(params_q, dict):
        return RVQState(**params_q)
    return params_q


@dataclasses.dataclass(frozen=True)
class EncodecModel:
    encoder: SEANetEncoder
    decoder: SEANetDecoder
    quantizer: ResidualVectorQuantizer
    frame_rate: float = 50.0
    sample_rate: int = 32000
    channels: int = 1
    causal: bool = False
    renormalize: bool = False
    # default encode compute dtype ('bfloat16' for the production throughput
    # path; None = fp32, the parity/conformance dtype).  encode() arguments
    # override per call.
    compute_dtype: tp.Optional[str] = None
    # default LSTM routing: False = lax.scan, True = always try the Pallas
    # recurrence kernel, 'auto' = kernel for batch >= 64 (where it wins
    # in-graph, PERF.md) and scan below.  encode/decode arguments override.
    lstm_kernel: tp.Union[bool, str] = False

    def __post_init__(self):
        if self.causal:
            assert not self.renormalize, 'Causal model does not support renormalize'

    # -- CompressionModel properties ----------------------------------------
    @property
    def total_codebooks(self) -> int:
        return self.quantizer.max_n_q

    @property
    def num_codebooks(self) -> int:
        return self.quantizer.n_q

    @property
    def cardinality(self) -> int:
        return self.quantizer.bins

    def set_num_codebooks(self, n: int) -> "EncodecModel":
        assert 0 < n <= self.quantizer.max_n_q
        return dataclasses.replace(
            self, quantizer=dataclasses.replace(self.quantizer, n_q=n))

    # -- params -------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            'encoder': self.encoder.init(k1),
            'decoder': self.decoder.init(k2),
            'quantizer': self.quantizer.init(k3),
        }

    def _resolve_lstm_kernel(self, batch: int) -> bool:
        """Resolve the model-level ``lstm_kernel`` default for this batch:
        'auto' enables the Pallas recurrence kernel at serving batches
        (B >= 64, where it wins in-graph — PERF.md); the kernel itself
        still falls back on ineligible shapes / non-TPU backends."""
        if self.lstm_kernel == 'auto':
            return batch >= 64
        return bool(self.lstm_kernel)

    # -- pre/post-processing (reference encodec.py:186-204) -----------------
    def preprocess(self, x: jax.Array) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
        if self.renormalize:
            mono = jnp.mean(x, axis=1, keepdims=True)
            volume = jnp.sqrt(jnp.mean(jnp.square(mono), axis=2, keepdims=True))
            scale = 1e-8 + volume
            x = x / scale
            scale = scale.reshape(-1, 1)
        else:
            scale = None
        return x, scale

    def postprocess(self, x: jax.Array,
                    scale: tp.Optional[jax.Array] = None) -> jax.Array:
        if scale is not None:
            assert self.renormalize
            x = x * scale.reshape(-1, 1, 1)
        return x

    # -- core ---------------------------------------------------------------
    def encode(self, params: dict, x: jax.Array,
               compute_dtype: tp.Optional[tp.Any] = None,
               fused: tp.Optional[bool] = None,
               conv0_kernel: tp.Optional[bool] = None,
               lstm_kernel: tp.Optional[bool] = None
               ) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
        """x: [B, C, T] float -> (codes [B, K, T_frames] int32, scale).

        ``compute_dtype=jnp.bfloat16`` runs the SEANet encoder in bf16 (the
        MXU-native dtype, ~2-3x faster); the RVQ distance search always stays
        fp32, which is what token identity is sensitive to.  When no dtype is
        passed, the model's ``compute_dtype`` field applies ('float32' parity
        default; builders set 'bfloat16' for production configs).

        ``fused`` routes the encoder front-end through the fused Pallas
        stage kernel (token-exact vs the XLA path on TPU).  Default off: on
        v5e the measured XLA conv path is currently faster (PERF.md) — the
        kernel is kept for larger-batch/multi-stage experiments.

        ``conv0_kernel`` routes the mono input conv through the banded
        Pallas kernel (PERF.md: XLA's C_in=1 conv runs ~2x off its memory
        floor and can't be reformulated away in XLA — layout relayouts eat
        the win).  Default off pending in-graph measurement.

        ``lstm_kernel`` routes the LSTM recurrence through the Pallas
        scan-in-one-program kernel (ops/lstm_pallas.py): VMEM-resident
        recurrent weight + carry, one program for all T steps.
        """
        assert x.ndim == 3
        if compute_dtype is None and self.compute_dtype is not None:
            compute_dtype = jnp.dtype(self.compute_dtype)
        if fused is None:
            fused = False
        if conv0_kernel is None:
            conv0_kernel = False
        if lstm_kernel is None:
            lstm_kernel = self._resolve_lstm_kernel(x.shape[0])
        x, scale = self.preprocess(x)
        enc_params = params['encoder']
        if compute_dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
            enc_params = cast(enc_params)
            x = x.astype(compute_dtype)
        emb = self.encoder(enc_params, x,
                           fused_stages=2 if fused else 0,
                           conv0_kernel=conv0_kernel,
                           lstm_kernel=lstm_kernel).astype(jnp.float32)
        codes = self.quantizer.encode(_q_state(self.quantizer, params['quantizer']), emb)
        return codes, scale

    def decode(self, params: dict, codes: jax.Array,
               scale: tp.Optional[jax.Array] = None,
               compute_dtype: tp.Optional[tp.Any] = None,
               lstm_kernel: tp.Optional[bool] = None) -> jax.Array:
        """codes: [B, K, T_frames] -> waveform [B, C, T] (includes padding).

        ``compute_dtype`` mirrors :meth:`encode`: when not passed, the
        model's ``compute_dtype`` field applies (fp32 parity default; the
        production builders set bf16, which the quantization noise of the
        codec itself dwarfs).  The codebook lookup stays fp32; the waveform
        returns as fp32 either way.  ``lstm_kernel`` mirrors :meth:`encode`.
        """
        emb = self.decode_latent(params, codes)
        if compute_dtype is None and self.compute_dtype is not None:
            compute_dtype = jnp.dtype(self.compute_dtype)
        if lstm_kernel is None:
            lstm_kernel = self._resolve_lstm_kernel(codes.shape[0])
        dec_params = params['decoder']
        if compute_dtype is not None:
            dec_params = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, dec_params)
            emb = emb.astype(compute_dtype)
        out = self.decoder(dec_params, emb,
                           lstm_kernel=lstm_kernel).astype(jnp.float32)
        return self.postprocess(out, scale)

    def encode_to_latent(self, params: dict, x: jax.Array,
                         compute_dtype: tp.Optional[tp.Any] = None
                         ) -> jax.Array:
        """x: [B, C, T] -> continuous encoder latent [B, D, T_frames]
        (pre-quantization).  Feature-extractor view of the codec — the
        default embedding network for the FAD/KLD metrics (metrics.py),
        standing in for the reference's VGGish/PaSST embedders
        (MODEL_CARD.md:31-37) which need network weights we can't fetch."""
        assert x.ndim == 3
        if compute_dtype is None and self.compute_dtype is not None:
            compute_dtype = jnp.dtype(self.compute_dtype)
        x, _ = self.preprocess(x)
        enc_params = params['encoder']
        if compute_dtype is not None:
            enc_params = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, enc_params)
            x = x.astype(compute_dtype)
        return self.encoder(enc_params, x).astype(jnp.float32)

    def decode_latent(self, params: dict, codes: jax.Array) -> jax.Array:
        return self.quantizer.decode(_q_state(self.quantizer, params['quantizer']), codes)

    def forward(self, params: dict, x: jax.Array, *,
                key: tp.Optional[jax.Array] = None, training: bool = False,
                n_q_active: tp.Optional[jax.Array] = None,
                axis_name: tp.Optional[str] = None,
                expiry: str = 'reference',
                compute_dtype: tp.Optional[tp.Any] = None
                ) -> tp.Tuple[QuantizedResult, dict]:
        """Training/eval forward with reconstruction (reference encodec.py:206-221).

        Returns the QuantizedResult whose ``x`` is the reconstructed waveform
        trimmed to the input length, plus updated params (EMA state).

        ``compute_dtype=jnp.bfloat16`` runs the SEANet encoder/decoder convs
        in bf16 (mixed-precision training: master params stay fp32, the cast
        happens inside the graph so gradients flow back to fp32 leaves).
        The quantizer — distances, EMA statistics, codebooks — always stays
        fp32; that is what token identity and EMA parity are sensitive to.
        Unlike :meth:`encode`, the *default* here is the parity dtype even
        for production models: training dtype is the trainer's decision
        (``dist.train.make_encodec_train_step(compute_dtype=...)``).
        """
        assert x.ndim == 3
        length = x.shape[-1]
        x, scale = self.preprocess(x)
        enc_params, dec_params = params['encoder'], params['decoder']
        if compute_dtype is not None:
            compute_dtype = jnp.dtype(compute_dtype)
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
            enc_params, dec_params = cast(enc_params), cast(dec_params)
            x = x.astype(compute_dtype)
        emb = self.encoder(enc_params, x).astype(jnp.float32)
        state = _q_state(self.quantizer, params['quantizer'])
        q_res, new_state = self.quantizer.forward(
            state, emb, self.frame_rate, key=key, training=training,
            n_q_active=n_q_active, axis_name=axis_name, expiry=expiry)
        latent = q_res.x
        if compute_dtype is not None:
            latent = latent.astype(compute_dtype)
        out = self.decoder(dec_params, latent).astype(jnp.float32)
        assert out.shape[-1] >= length, (out.shape[-1], length)
        out = out[..., :length]
        q_res = q_res.replace(x=self.postprocess(out, scale))
        new_params = dict(params)
        new_params['quantizer'] = new_state
        return q_res, new_params
